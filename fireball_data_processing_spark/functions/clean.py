"""C4-style corpus cleaning: segment-level keep/drop rules and document-level
flags, all JVM-side Column expressions (no UDFs, no shuffles).

Extends the reference's content-filter surface (P4 short-message filter,
P6 empty discard, P7 abnormal-length guard — ``heuristics/filters.py`` in
the reference) with the standard pretraining-corpus cleaning rules from
C4/MassiveText: per-line word-count and punctuation gates, bad-phrase and
brace (code) document flags. Each rule is independently togglable so
pipelines can tune per source.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# phrases whose presence flags the whole document (C4 drops docs containing
# boilerplate markers; the list is a parameter, these are the classic ones)
DEFAULT_BAD_PHRASES = ("lorem ipsum", "javascript")


def split_segments(c: Column, sep: str = "\n") -> Column:
    """Document -> trimmed segments (lines by default). Empty segments are
    dropped here so every downstream rule sees real content."""
    return F.filter(
        F.transform(F.split(c, sep), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def segment_keep(
    seg: Column,
    min_words: int = 5,
    require_terminal_punct: bool = True,
) -> Column:
    """C4 line rule: keep a segment iff it has >= ``min_words`` whitespace
    words and (optionally) ends in terminal punctuation (. ! ? ")."""
    keep = F.size(F.split(seg, r"\s+")) >= min_words
    if require_terminal_punct:
        keep = keep & seg.rlike(r'[.!?"]$')
    return keep


def clean_segments(
    c: Column,
    sep: str = "\n",
    min_words: int = 5,
    require_terminal_punct: bool = True,
) -> dict[str, Column]:
    """Apply the segment rule over a document; returns the surviving text
    (segments re-joined with ``sep``) plus audit counts. Per-row array
    math only — the segment filter never leaves the row, unlike an
    explode+filter+re-group formulation which would shuffle on doc id."""
    segs = split_segments(c, sep)
    kept = F.filter(
        segs, lambda s: segment_keep(s, min_words, require_terminal_punct)
    )
    return {
        "n_segments": F.size(segs).cast("bigint"),
        "n_kept_segments": F.size(kept).cast("bigint"),
        "kept_text": F.array_join(kept, sep),
    }


def doc_flags(
    c: Column,
    bad_phrases: tuple[str, ...] = DEFAULT_BAD_PHRASES,
) -> dict[str, Column]:
    """Document-level C4 flags (each True == drop candidate):

    - ``has_bad_phrase``: contains any configured boilerplate phrase
      (case-insensitive substring — no regex, so phrases need no escaping)
    - ``has_brace``: contains ``{`` (C4's code-document marker)
    """
    lower = F.lower(c)
    hit = F.lit(False)
    for p in bad_phrases:
        hit = hit | lower.contains(p.lower())
    return {
        "has_bad_phrase": hit,
        "has_brace": c.contains("{"),
    }
