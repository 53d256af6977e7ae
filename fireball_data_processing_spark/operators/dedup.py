"""Document deduplication for large-scale training-data pipelines.

Four strategies, cheapest to richest; all built on DataFrame primitives so
Catalyst handles pruning/pushdown and each stage is shuffle-bounded:

- **exact**: normalize -> md5 -> groupBy hash. One shuffle on a 32-byte key,
  no text comparison; at 100 TB group by the digest, never by the raw text.
- **MinHash + LSH**: shingle -> K min-hashes -> band buckets -> candidate
  pairs joined within buckets -> exact Jaccard verification. Pair generation
  is confined to LSH buckets, so the quadratic blowup is bounded by bucket
  size; a length/prefix guard keeps degenerate buckets in check.
- **SimHash**: per-token hashes folded into a weighted bit-majority
  fingerprint; near-dups differ in few bits. Fingerprint is an int64 —
  joinable/bandable like MinHash bands.
- **n-gram Jaccard**: exact pairwise similarity on candidate pairs (the
  verifier for the LSH path, or standalone on small slices).

Hashes are md5-hex (lexicographic min == uniform min-hash) so every engine
with md5 reproduces signatures bit-for-bit — which also makes the DuckDB
oracles exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from fireball_data_processing_spark.functions.text import normalize_text  # noqa: E402

__all__ = [
    "normalize_text", "exact_dedup_groups", "word_shingles",
    "shingles_of_words", "capped_shingles", "minhash_signature",
    "minhash_sig_expr", "band_structs", "build_minhash_index",
    "lsh_candidate_pairs", "jaccard_pairs", "simhash", "ngram_overlap",
    "connected_components", "duplicate_spans", "remove_duplicate_spans",
    "aligned_segments", "line_dedup", "ngram_containment",
    "contamination_spans", "content_defined_chunks", "cdc_duplicate_chunks",
    "score_threshold_sweep", "cluster_size_histogram",
    "threshold_doc_hits", "quality_survivors", "edit_distance_pairs", "lsh_tuning_curve",
]


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: one row per distinct normalized text with the
    canonical (min) id and the duplicate count."""
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def word_shingles(c: Column, k: int) -> Column:
    """Distinct k-word shingles of the normalized text (array<string>).

    Built with transform over the split words — stays in codegen, no UDF.

    PERF: pass a pre-materialized words *column* (see ``_exploded_shingles``)
    rather than a raw text column — expressions inside a higher-order-
    function lambda get NO subexpression elimination, so a split/regex child
    here would re-run once per shingle index.
    """
    words = F.split(normalize_text(c), " ")
    return shingles_of_words(words, k)


def shingles_of_words(words: Column, k: int) -> Column:
    """k-word shingles of an already-split words array column."""
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
    )
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array()))


def capped_shingles(sh: Column, max_shingles: int) -> Column:
    """Deterministic uniform subsample of a shingle array: keep the
    ``max_shingles`` shingles with the smallest md5, i.e. a bottom-k
    min-hash sample. Unbiased for Jaccard/MinHash estimation (unlike a
    lexicographic prefix, which over-selects alphabetically-early text)."""
    sampled = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    sh, lambda s: F.struct(F.md5(s).alias("h"), s.alias("s"))
                )
            ),
            1,
            max_shingles,
        ),
        lambda x: x["s"],
    )
    return F.when(F.size(sh) > max_shingles, sampled).otherwise(sh)


def _spread_words(pre: DataFrame, id_col: str) -> DataFrame:
    """Scale-gated parallelism spreader for pre-explode (id, words)
    frames (guide §2.4/§2.5 — r12).

    Small/local inputs arrive as one or two scan partitions (a file
    only splits above ``spark.sql.files.maxPartitionBytes``), so the
    shingle/gram explode and its per-element hashing would run
    serially; an id-keyed repartition to the shuffle-partition count
    fixes that, and downstream doc-grain stages reuse the partitioning.

    At corpus scale the SAME repartition is a pure extra full-corpus
    shuffle of the word arrays: the scan's byte-based splits already
    provide the parallelism, and doc-grain aggregates are cheaper
    unpartitioned (map-side partial combine + a tiny post-combine
    exchange of per-doc rows instead of a corpus-bytes exchange —
    guide §2.3, aggregate before you shuffle). So the repartition is
    GATED on the frame's Catalyst size estimate: applied only while
    the input could not have produced at least ``shuffle.partitions``
    scan splits. The probe is driver-side plan metadata — no job runs
    — and at bench scale the gate always fires, keeping the local plan
    byte-identical to the unconditional form."""
    spark = pre.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    jvm = spark.sparkContext._jvm
    max_pb = int(
        jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
    )
    est = int(pre._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est >= parts * max_pb:
        return pre
    return pre.repartition(parts, F.col(id_col))


def _pin_if_large(df: DataFrame) -> DataFrame:
    """Scale-gated persist for a frame with MULTIPLE physical consumers
    (both sides of a self-join, a broadcast build + probe) whose
    upstream pipeline is expensive at corpus scale (guide §2.4 —
    duplicated subtrees; the r12 ``prefix_candidates`` lesson).

    At corpus scale, re-executing the upstream per consumer doubles
    full-corpus passes, so sharing one materialization is the only
    sane plan. At LOCAL/bench scale the trade inverts: the upstream is
    seconds of work, the consumers' subtrees execute CONCURRENTLY
    (broadcast stages overlap the probe-side scan), and a persist
    serializes them behind one cache-materialization job plus the
    cache write (measured +50% on the LSH pair queries at sf0.1). So
    the pin is GATED on the frame's Catalyst size estimate, the same
    driver-side metadata probe (no job) as :func:`_spread_words`, with
    the same threshold: pin only when the input is big enough that the
    scan alone would have produced at least ``shuffle.partitions``
    splits — i.e. when the duplicated pass would be corpus-sized. At
    bench scale the gate always declines, keeping the local plan
    byte-identical to the unpinned form."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    jvm = spark.sparkContext._jvm
    max_pb = int(
        jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
    )
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    # Estimates above ~1 EiB are propagated UNKNOWNS, not measurements
    # (local relations under explode/aggregate multiply out to ~2^65;
    # file sources always carry real byte counts) — treat unknown as
    # small rather than pinning every in-memory test frame.
    if parts * max_pb <= est < (1 << 60):
        return df.persist()
    return df


def _exploded_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    max_shingles: int | None = None,
) -> DataFrame:
    """(id, shingle) rows, one per distinct shingle.

    Plan shape for scale AND local speed:
    1. project (id, words) — the regex/split runs exactly once per doc;
    2. repartition on the id with an EXPLICIT partition count — the
       pre-explode rows are tiny, so AQE would coalesce the exchange to one
       or two partitions and then the 50x explode fan-out runs serially;
       pinning the count keeps the expansion parallel (and the downstream
       groupBy(id) reuses the partitioning, so no extra shuffle);
    3. explode shingles from the materialized words column.

    ``max_shingles`` caps the per-doc shingle count BEFORE the explode via
    :func:`capped_shingles` — one pathological mega-document (the corpus
    the reference processes has 250 MB+ instances) otherwise fans out
    millions of rows and concentrates them back into a single aggregation
    buffer row downstream. Docs under the cap are untouched; docs over it
    contribute a deterministic uniform sample, so signatures/Jaccard become
    (tight) estimates for those docs only.
    """
    w = _spread_words(
        df.select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), " ").alias("__words"),
        ),
        id_col,
    )
    sh = shingles_of_words(F.col("__words"), k)
    if max_shingles is not None:
        sh = capped_shingles(sh, max_shingles)
    return w.select(F.col(id_col), F.explode(sh).alias("shingle"))


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    with_shingles: bool = False,
    max_shingles: int | None = None,
) -> DataFrame:
    """Per-doc MinHash signature: for hash function i, min over shingles of
    md5(i || '#' || shingle) (hex strings; lexicographic min).

    Plan shape: explode shingles -> groupBy doc -> K min() aggregates. One
    shuffle (pre-explode, on the doc id); the groupBy reuses it.

    ``with_shingles=True`` additionally collects the distinct shingle set
    into a ``__sh`` column in the SAME grouped pass, so a downstream
    Jaccard-verification stage shares this plan instead of building a
    second shingling pipeline. (Consumers of separate branches still
    re-execute the shared subtree — to pay the corpus scan exactly once at
    billion-doc scale, materialize via ``build_minhash_index``.)

    Set ``max_shingles`` (e.g. 10_000) on adversarial corpora: it bounds the
    explode fan-out, the aggregation buffer, and — with
    ``with_shingles=True`` — the collected ``__sh`` payload a mega-document
    drags through the shuffle, at the cost of signature/Jaccard becoming a
    bottom-k-sample estimate for docs above the cap (see
    :func:`capped_shingles`).
    """
    exploded = _exploded_shingles(df, text_col, id_col, shingle_k, max_shingles)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    if with_shingles:
        aggs.append(F.collect_list("shingle").alias("__sh"))
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_sig_expr(sh: Column, num_hashes: int) -> Column:
    """Per-ROW MinHash signature: ``array<string>`` whose element i is
    min over shingles of ``md5(f"{i}#" || shingle)`` — value-identical to
    :func:`minhash_signature`'s columns, but computed inside the row with
    no explode and no shuffle. This is the streaming formulation: the
    batch explode→groupBy would be a *stateful* streaming aggregation,
    while this is a plain projection (see ``streaming/dedup_stream.py``).

    Shape matters: the shingle array is the ``aggregate``'s input — outside
    any lambda — so it is evaluated ONCE per row; a transform-per-hash
    formulation would rebuild the shingles ``num_hashes`` times (HOF lambda
    bodies get no subexpression elimination). Docs with no shingles yield
    all-null elements (the batch groupBy form simply omits such docs).
    """
    seeds = F.expr(
        "array({})".format(",".join(f"'{i}#'" for i in range(num_hashes)))
    )
    init = F.expr(f"array_repeat(CAST(NULL AS STRING), {num_hashes})")
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda p: F.md5(F.concat(p, s))),
            # least() skips nulls, so the null init loses to the first hash
            lambda a, b: F.least(a, b),
        ),
    )


def band_structs(num_hashes: int, band_size: int, mh=None) -> Column:
    """``array<struct<band_idx,band_key>>`` banding expression — the ONE
    definition of how signatures map to LSH buckets, shared by the batch
    self-join, the grouped bucket form, and the streaming gate's index.
    ``mh`` maps hash index -> Column (default: the ``mh{i}`` columns of
    :func:`minhash_signature`)."""
    if mh is None:
        mh = lambda i: F.col(f"mh{i}")  # noqa: E731
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "|", *[mh(i) for i in range(b * band_size, (b + 1) * band_size)]
                ).alias("band_key"),
            )
            for b in range(num_hashes // band_size)
        ]
    )


def build_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    max_shingles: int | None = 50_000,
) -> DataFrame:
    """Near-dedup build phase — run ONCE per corpus, amortized over every
    candidate-generation + verification pass (the same build/query split as
    ``similarity.build_ivf_index``).

    Writes the per-doc signature AND distinct shingle set to parquet and
    returns the re-read table: the 100-TB corpus is scanned and shingled
    exactly once, and every downstream consumer (banded candidate
    generation — use ``lsh_candidate_pairs(grouped=True)`` here — and
    Jaccard verification via ``jaccard_pairs(shingle_sets=...)``) reads the
    compact index instead of re-executing the shingling pipeline.

    Because the index persists whole shingle sets, ``max_shingles`` defaults
    ON here (50k shingles ≈ a few MB/doc worst case) — an unguarded 250 MB
    document would otherwise write a multi-GB parquet row and blow the
    aggregation buffer long before that. Pass ``None`` to disable.
    """
    sigs = minhash_signature(
        df,
        text_col,
        id_col,
        num_hashes,
        shingle_k,
        with_shingles=True,
        max_shingles=max_shingles,
    )
    sigs.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    grouped: bool = False,
) -> DataFrame:
    """Banded LSH: docs sharing any band of ``band_size`` consecutive
    min-hashes become a candidate pair (id_a < id_b), deduplicated across
    bands. Pairs are confined to (band_idx, band_key) buckets either way —
    never corpus².

    Two formulations, same result:

    - default (``grouped=False``): equi-self-join on the band key. The
      optimizer picks broadcast (small signature table) or sort-merge (big
      one); the join keys ARE the bucket, so output stays bucket-bounded.
      Right when signatures flow straight from ``minhash_signature`` in a
      one-shot pipeline. The (id, band_idx, band_key) table feeds BOTH
      join sides; at corpus scale it is pinned (:func:`_pin_if_large`)
      so the upstream signature pipeline (scan -> shingle explode ->
      minhash aggregate) executes once instead of once per side — the
      pinned frame is doc×n_bands grain, orders of magnitude narrower
      than the corpus. At local/bench scale the gate declines the pin
      (the duplicated subtrees execute concurrently and cost less than
      serializing behind a cache materialization — measured +50% at
      sf0.1), keeping the small-scale plan unchanged.
    - ``grouped=True``: one shuffle on the band key collects each bucket's
      sorted id list and the i<j pairs explode locally inside the bucket —
      the banded table is consumed exactly ONCE. Right when ``sigs`` is a
      materialized signature table (see ``build_minhash_index``): at
      billion-doc scale this halves the shuffle volume vs the self-join.

    In-bucket work is quadratic in bucket size in both forms — bounded by
    the LSH design (a hot band key is a near-duplicate cluster, exactly
    what the bands exist to confine).
    """
    bands = band_structs(num_hashes, band_size)
    banded = sigs.select(F.col(id_col), F.explode(bands).alias("band")).select(
        F.col(id_col), F.col("band.band_idx"), F.col("band.band_key")
    )
    if grouped:
        buckets = (
            banded.groupBy("band_idx", "band_key")
            .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("__ids"))
            .filter(F.size("__ids") > 1)
        )
        # all ordered pairs within the bucket: ids[i] < ids[j] for i < j
        # holds because the list is sorted
        pair_structs = F.flatten(
            F.transform(
                F.col("__ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("__ids"), i + 2, F.size(F.col("__ids"))),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
        return (
            buckets.select(F.explode(pair_structs).alias("p"))
            .select(F.col("p.id_a"), F.col("p.id_b"))
            # positional i<j admits id_a == id_b if the caller's frame has
            # duplicate ids; the value filter keeps parity with the
            # self-join form's strict < condition
            .filter(F.col("id_a") < F.col("id_b"))
            .distinct()
        )
    # Both sides of the self-join read the banded table; at corpus
    # scale pin it so the upstream signature pipeline executes once
    # (guide §2.4; gate rationale in _pin_if_large).
    banded = _pin_if_large(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    shingle_sets: DataFrame | None = None,
    max_shingles: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A ∩ B| / |A ∪ B| over
    distinct word shingles. Verification stage of the LSH pipeline.
    ``max_shingles``: see :func:`minhash_signature` (estimate-for-capped-docs
    trade; only used when ``shingle_sets`` is not supplied).

    Shingle sets are built through the exploded+grouped path: the exchange
    is a materialization barrier, so Catalyst cannot collapse the projection
    and re-inline the shingle regex into the per-pair join (which would
    recompute every doc's shingles once per candidate pair). Pass
    ``shingle_sets`` — an (id, sh) frame, e.g. the ``__sh`` column of
    ``minhash_signature(with_shingles=True)`` — to share the signature
    stage's scan instead of re-shingling.
    """
    if shingle_sets is not None:
        sh = shingle_sets
    else:
        sh = (
            _exploded_shingles(df, text_col, id_col, shingle_k, max_shingles)
            .groupBy(id_col)
            .agg(F.collect_list("shingle").alias("sh"))
        )
    j = (
        pairs.join(
            sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        ).join(
            sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return j.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter.cast("double") / union.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """SimHash fingerprint over normalized words.

    Bit i of the fingerprint is the majority vote of bit i across the md5
    hashes of the document's distinct words. ``bits`` defaults to 16; up to
    48 supported (the word hash takes ceil(bits/4) md5 nibbles — beyond 48
    the hex->int64 conversion would overflow signed bigint).

    Plan: explode words -> groupBy(doc) with one conditional sum per bit ->
    fingerprint.
    """
    if not 1 <= bits <= 48:
        raise ValueError(f"bits must be in [1, 48], got {bits}")
    nibbles = (bits + 3) // 4
    words = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    ex = df.select(F.col(id_col), F.explode(words).alias("w")).select(
        F.col(id_col),
        # first `nibbles` hex digits of md5(w) as an integer wide enough
        # for all `bits` positions
        F.conv(F.substring(F.md5(F.col("w")), 1, nibbles), 16, 10)
        .cast("bigint")
        .alias("h16"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h16"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    fp = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        for i in range(bits)
    )
    return agg.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    k: int = 8,
    min_overlap: int = 1,
    max_shingles: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: (doc, benchmark-doc) pairs sharing at
    least ``min_overlap`` distinct k-word shingles, with the shared count.

    The standard pretraining-hygiene operator — training documents that
    textually overlap an evaluation set must be found (and usually
    dropped) before training; k=8..13 word n-grams is the published
    practice for benchmark contamination checks.

    Plan: explode both sides' DISTINCT shingles, equi-join on the shingle
    string, count per pair. Contact is confined to literally-shared
    n-grams — never |docs| x |benchmark| — and the benchmark side is small
    by nature, so its exploded table broadcasts; the docs side streams
    through one shuffle-free map + join. Output: ``(id_col,
    bench_id_col, n_shared)``.
    """
    d = _exploded_shingles(docs, text_col, id_col, k, max_shingles)
    b = (
        _exploded_shingles(benchmark, text_col, id_col, k, max_shingles)
        .withColumnRenamed(id_col, bench_id_col)
    )
    return (
        d.join(b, "shingle")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    shortcut: bool = False,
) -> DataFrame:
    """Connected components over a pair list -> ``(vertex, component)``
    with the component labeled by its minimum vertex id. The survivor-
    selection step of a dedup pipeline: candidate/verified pairs chain
    (A~B, B~C), so keeping one doc per PAIR under-deletes — clusters must
    be closed transitively first, then one canonical doc kept per cluster.

    Iterative min-label propagation: each round every vertex takes the min
    of its own label and its neighbors' labels (own label folded in via
    self-loop edges, so a round is ONE join + ONE aggregate); converged
    when a round changes nothing — detected by the label SUM going flat
    (labels only decrease, so an unchanged sum means an unchanged
    labeling). Rounds needed = cluster diameter — small for near-dup
    clusters (pairs share LSH buckets, so clusters are dense). This is a
    genuinely iterative algorithm (Spark has no recursive SQL):
    per-round ``localCheckpoint`` truncates the lineage, which would
    otherwise grow exponentially, and the convergence probe is one tiny
    aggregate action per round — driver-side control flow, executor-side
    data. ``max_iter`` guards pathological chain graphs; raises if
    unconverged.

    Action economics (guide §1.1): the checkpoints after the edge frame
    are LAZY (``eager=False``), so each round runs exactly ONE Spark
    action — the convergence probe — which materializes that round's
    checkpoint as a side effect; the self-loop union and initial labels
    materialize inside the first round's probe the same way (the edge
    frame itself stays eager — see the inline comment).
    There is no probe of the INITIAL labeling: on any edge set with a
    non-self-loop pair, the pair's larger endpoint must take the smaller
    label in round 1, so round 1 never equals round 0 and the first
    comparison that can say "converged" is round 2 vs round 1 (an empty
    edge set yields a NULL sum immediately and returns after one trivial
    round). Pre-partitioning the static edge frame on the join key was
    probed and rejected: PySpark's ``localCheckpoint`` surfaces as
    ``Scan ExistingRDD`` with ``UnknownPartitioning``, so the planner
    cannot reuse a checkpointed layout and the repartition would be a
    pure extra exchange.

    **Escape hatch for chain-shaped graphs** (``max_iter`` exceeded, or
    known-adversarial inputs): ``shortcut=True`` adds pointer jumping —
    after each propagation round every label is replaced by its OWN
    label (``component := component[component]``, one label⋈label
    self-join), so label chains halve each round and convergence drops
    from O(diameter) to O(log diameter) rounds: a million-vertex path
    finishes in ~20 rounds instead of a million. The per-round cost adds
    one join of two label-sized frames; for typical LSH near-dup graphs
    (dense, tiny diameter) plain propagation does fewer total shuffles,
    which is why shortcutting is opt-in. The shuffle-optimal published
    alternative at adversarial extreme scale is alternating
    large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC '14) — the same O(log) round bound via
    edge relinking; pointer jumping is implemented here instead because
    it reuses the label frame this loop already maintains and keeps one
    code path. Both modes return identical (vertex, min-id component)
    output.
    """
    # ONE traversal of the pairs subtree: both edge directions come out of
    # a single explode instead of a two-branch union that re-executed the
    # (possibly expensive — LSH candidate generation) pair pipeline twice
    # per action (guide §2.4: remove duplicated subtrees feeding a shuffle).
    e = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("__e")
        )
        .select(F.col("__e.src").alias("src"), F.col("__e.dst").alias("dst"))
        .distinct()
        # EAGER on purpose, alone among the checkpoints here: `e` holds
        # the (possibly expensive — LSH candidate generation) pair
        # pipeline and is read by TWO independent subtrees (`e_all`,
        # `labels`). Lazy, round 1's single job would schedule both
        # subtrees' map stages concurrently against the not-yet-
        # materialized cache and compute the pair pipeline twice.
        .localCheckpoint()
    )
    verts = e.select(F.col("src").alias("vertex")).distinct()
    # Self-loop edges fold each vertex's OWN label into the neighbor-min
    # aggregate, collapsing the old two-join round (neighbor-min join +
    # least()-merge join) into ONE join + ONE aggregate per round
    # (guide §2.4). Every vertex appears as src in `e` (both directions
    # are present), so groupBy(src) still emits every vertex.
    e_all = e.unionByName(
        verts.select(
            F.col("vertex").alias("src"), F.col("vertex").alias("dst")
        )
    ).localCheckpoint(eager=False)
    labels = (
        verts.withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=False)
    )
    # Convergence probe: labels only ever DECREASE (min-fold over a set
    # containing the current label), so the label sum strictly decreases
    # until the fixpoint — one tiny aggregate replaces the old per-round
    # __changed bookkeeping columns. decimal(38,0) keeps a 1e9-vertex
    # sum of 64-bit ids exactly representable (no overflow, no FP fuzz).
    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    # No probe of the initial labeling (see docstring): prev_sum = None
    # can never equal a non-empty round's decimal sum, and an EMPTY edge
    # set sums to NULL (None) in round 1 and returns immediately.
    prev_sum = None
    for _ in range(max_iter):
        updated = (
            e_all.join(labels, e_all["dst"] == labels["vertex"])
            .groupBy("src")
            .agg(F.min("component").alias("component"))
            .select(F.col("src").alias("vertex"), "component")
            .localCheckpoint(eager=False)
        )
        if shortcut:
            # pointer jump: component := component's own label. A label
            # value is always a vertex id present in `updated` (labels
            # start as vertex ids and only min-fold over them), so the
            # left join always matches; coalesce is belt-and-braces.
            # Jump-only progress still moves the label sum down, so the
            # convergence probe sees it.
            l2 = updated.select(
                F.col("vertex").alias("__v2"), F.col("component").alias("__c2")
            )
            updated = (
                updated.join(l2, updated["component"] == l2["__v2"], "left")
                .select(
                    "vertex",
                    F.coalesce("__c2", "component").alias("component"),
                )
                .localCheckpoint(eager=False)
            )
        new_sum = _label_sum(updated)
        labels = updated
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the pair graph has a longer chain than expected — raise max_iter "
        "or pass shortcut=True (pointer jumping: O(log diameter) rounds)"
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document exact-substring spans (the ExactSubstr dedup mode of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): word positions covered by any ``k``-gram that also appears
    in at least ``min_docs - 1`` OTHER documents, merged into maximal
    spans. Downstream pipelines cut the spans out (suffix-array semantics
    at n-gram resolution) instead of dropping whole near-dup documents.

    Output: ``(id_col, span_start, span_end, span_words)`` — word offsets
    over the normalized text, ``end`` exclusive; overlapping AND
    contiguous gram hits merge into one span.

    Plan: one scan -> per-row gram hashes (array math, the raw text never
    leaves the row) -> explode -> the duplicate-gram set via groupBy on
    the 32-char md5 (never gram text) -> join back co-partitioned on the
    gram key -> per-doc gaps-and-islands (running max-end window, one
    shuffle on the doc key) -> island aggregation reuses that exchange.
    Candidate volume is bounded by truly-duplicated grams, not corpus
    size; the quadratic blowup of pairwise comparison never appears.
    """
    # materialize the split words BEHIND a pre-explode exchange (house
    # pattern, see _exploded_shingles: HOF lambdas get no subexpression
    # elimination, so the gram lambda must reference a materialized
    # column, not the split expression — otherwise normalize+split
    # re-executes per gram index, O(words^2) per document), then decide
    # duplicate-ness with a WINDOW over the gram key instead of
    # groupBy+join-back — one consumer of the exploded rows, so nothing
    # re-executes. countDistinct isn't a window function; max(dense_rank
    # ordered by doc) over the gram partition counts distinct docs
    # exactly, with no per-group set buffer.
    pre = _spread_words(
        docs.select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), " ").alias("__words"),
        ),
        id_col,
    )
    words = F.col("__words")
    grams = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hits = pre.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
    w_gram_rank = Window.partitionBy("gram").orderBy(id_col)
    w_gram = Window.partitionBy("gram")
    nd = F.max(F.dense_rank().over(w_gram_rank)).over(w_gram)
    dup_hits = (
        hits.withColumn("__nd", nd)
        .filter(F.col("__nd") >= min_docs)
        .select(id_col, "pos")
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.coalesce(F.max(F.col("pos") + k).over(w_prev), F.lit(-1))
    brk = F.when(F.col("pos") > prev_end, 1).otherwise(0)
    islands = dup_hits.withColumn("__island", F.sum(brk).over(w_run))
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + k).cast("bigint").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_words"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut :func:`duplicate_spans` hits out of the text — the second half
    of the ExactSubstr recipe (Lee et al.: remove the duplicated
    substring, KEEP the document; dropping whole near-dup docs loses the
    unique remainder).

    Output: ``(id_col, clean_text, n_words, n_removed_words)`` where
    ``clean_text`` is the normalized text with every span's words
    removed and ``n_words`` counts the pre-removal words. Word offsets
    follow the same normalization ``duplicate_spans`` used, so spans
    index cleanly.

    Plan: spans collapse to one per-doc struct list (bounded by spans
    per doc, not corpus size), LEFT-join back on the doc key — most
    docs carry no spans and pass through untouched — and the cut is a
    single indexed ``filter`` HOF over the materialized word array
    (per-row array math, zero extra shuffles beyond the span rollup's
    doc-key exchange, which co-partitions the join).
    """
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    # materialize the split BEFORE the HOF consumes it (house rule: HOF
    # lambdas get no subexpression elimination)
    pre = docs.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("__words"),
    ).join(per_doc, on=id_col, how="left")
    words = F.col("__words")
    covered = lambda _w, i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
    )
    kept = F.when(F.col("__spans").isNull(), words).otherwise(
        F.filter(words, lambda w, i: ~covered(w, i))
    )
    sized = pre.select(
        F.col(id_col),
        words.alias("__words"),
        kept.alias("__kept"),
    )
    return sized.select(
        F.col(id_col),
        F.concat_ws(" ", F.col("__kept")).alias("clean_text"),
        F.size("__words").cast("bigint").alias("n_words"),
        (F.size("__words") - F.size("__kept"))
        .cast("bigint")
        .alias("n_removed_words"),
    )


def aligned_segments(
    docs: DataFrame,
    seg_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic segmentation for cross-document line dedup: the
    normalized text cut into NON-overlapping ``seg_words``-word windows
    (the trailing remainder is its own, shorter, segment). Corpora with
    real line structure should segment with
    :func:`fireball_data_processing_spark.functions.clean.split_segments`
    instead; this word-aligned form is the fallback for single-line text.

    Output: ``(id_col, seg_idx, segment)``. Per-row array math + one
    explode; the words array is materialized behind an id-keyed exchange
    (house rule: HOF lambdas get no subexpression elimination, so the
    slice lambda must reference a materialized column — and the explode
    consumer's doc-key stages reuse this partitioning).
    """
    pre = _spread_words(
        docs.select(
            F.col(id_col),
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda s: s != "",
            ).alias("__words"),
        ),
        id_col,
    )
    words = F.col("__words")
    segs = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(seg_words)),
        lambda st: F.concat_ws(" ", F.slice(words, st + 1, seg_words)),
    )
    return pre.select(
        F.col(id_col),
        F.posexplode(segs).alias("seg_idx", "segment"),
    ).withColumn("seg_idx", F.col("seg_idx").cast("bigint"))


def line_dedup(
    docs: DataFrame,
    seg_words: int = 8,
    min_docs: int = 2,
    keep_first: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    skew_safe: bool = False,
) -> DataFrame:
    """Cross-document line/segment deduplication — the C4 / RefinedWeb
    pipeline stage (Raffel et al. 2020 removed any three-sentence span
    occurring more than once in C4; RefinedWeb drops repeated lines):
    a segment occurring in at least ``min_docs`` DISTINCT documents is
    removed from every document — except, when ``keep_first``, from the
    lowest-``id_col`` document holding it (C4 keeps one occurrence;
    ``keep_first=False`` is the RefinedWeb remove-everywhere form).

    Output: ``(id_col, n_segments, n_removed_segments, kept_text)`` —
    ``kept_text`` re-joins the surviving segments in document order, so
    unique content inside mostly-boilerplate documents survives (the
    whole point vs doc-level dedup).

    Plan: one scan -> aligned segments (no shuffle) -> duplicate-ness
    decided by WINDOWS over the segment hash (house pattern: max of
    dense_rank counts distinct docs with no per-group set buffer; min
    over the partition elects the keeper) -> per-doc rollup. Two
    shuffles total (segment-hash key, then doc key); candidate volume
    is corpus segments, never pairs. At 100 TB the segment-hash
    exchange partitions on md5 — uniform by construction ACROSS
    segments, but a single ultra-hot boilerplate segment (one segment in
    10^9 docs) still lands on one reducer: for adversarial corpora pass
    ``skew_safe=True``, which computes the per-segment stats with a
    two-stage groupBy — the (hash, doc) composite first key spreads the
    hot segment across reducers, the second stage combines tiny partial
    counts map-side — and LEFT-joins the one-row-per-segment stats table
    back (a hash-join probe is skew-indifferent). Identical output,
    one extra exchange; the window form stays the default because it
    avoids the join on normal corpora.
    """
    segs = aligned_segments(docs, seg_words, text_col, id_col).withColumn(
        "__h", F.md5(F.col("segment"))
    )
    if skew_safe:
        stats = (
            segs.select("__h", id_col)
            .distinct()
            .groupBy("__h")
            .agg(
                F.count(F.lit(1)).alias("__nd"),
                F.min(id_col).alias("__keeper"),
            )
        )
        marked = segs.join(stats, "__h", "left")
    else:
        w_rank = Window.partitionBy("__h").orderBy(id_col)
        w_seg = Window.partitionBy("__h")
        n_docs = F.max(F.dense_rank().over(w_rank)).over(w_seg)
        keeper = F.min(id_col).over(w_seg)
        marked = segs.withColumn("__nd", n_docs).withColumn("__keeper", keeper)
    removed = F.col("__nd") >= min_docs
    if keep_first:
        removed = removed & (F.col(id_col) != F.col("__keeper"))
    marked = marked.withColumn("__removed", removed)
    kept_structs = F.sort_array(
        F.collect_list(
            F.when(
                ~F.col("__removed"), F.struct("seg_idx", "segment")
            )
        )
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.col("__removed").cast("bigint")).alias("n_removed_segments"),
        F.concat_ws(
            " ", F.transform(kept_structs, lambda s: s["segment"])
        ).alias("kept_text"),
    )


def ngram_containment(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    k: int = 8,
    min_containment: float = 0.0,
    max_shingles: int | None = None,
) -> DataFrame:
    """Asymmetric contamination score — the normalized form of
    :func:`ngram_overlap` used by published decontamination protocols
    (GPT-3 appendix C / PaLM style): for each (training doc, benchmark
    item) pair, the FRACTION of the benchmark item's distinct k-grams
    present in the doc. Containment, not Jaccard — a long training doc
    that swallows a short benchmark item whole scores 1.0 even though
    its Jaccard is tiny, which is exactly the leak being hunted.

    Output: ``(id_col, bench_id_col, n_bench_grams, n_shared,
    containment)`` with containment rounded 6dp (the filter runs on the
    unrounded single division, cross-engine exact).

    Plan: the shared-gram counting of ``ngram_overlap`` plus a per-item
    gram-count aggregate on the benchmark side, joined back broadcast
    (the benchmark is small by nature). Contact stays confined to
    literally-shared n-grams.
    """
    shared = ngram_overlap(
        docs, benchmark, text_col, id_col, bench_id_col, k, 1, max_shingles
    )
    bench_sizes = (
        _exploded_shingles(benchmark, text_col, id_col, k, max_shingles)
        .groupBy(F.col(id_col).alias(bench_id_col))
        .agg(F.count(F.lit(1)).alias("n_bench_grams"))
    )
    cont = F.col("n_shared") / F.col("n_bench_grams")
    return (
        shared.join(F.broadcast(bench_sizes), bench_id_col)
        .filter(cont >= min_containment)
        .select(
            id_col,
            bench_id_col,
            F.col("n_bench_grams").cast("bigint").alias("n_bench_grams"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(F.col("n_shared") / F.col("n_bench_grams"), 6).alias(
                "containment"
            ),
        )
    )


def contamination_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingles: int | None = None,
) -> DataFrame:
    """Span-level decontamination — the surgical complement of
    :func:`ngram_overlap`/:func:`ngram_containment`: the maximal word
    spans of each training document covered by any ``k``-gram that also
    appears ANYWHERE in the benchmark set. Downstream pipelines cut the
    spans out with :func:`remove_duplicate_spans` (same offsets contract)
    and keep the document — dropping whole docs for one leaked paragraph
    wastes the unique remainder.

    Output: ``(id_col, span_start, span_end, span_words)`` — word
    offsets over the normalized text, end exclusive, contiguous/
    overlapping gram hits merged (identical shape to
    :func:`duplicate_spans`, so the removal step is shared).

    Plan: per-row gram hashes on the docs side -> LEFT SEMI join against
    the benchmark's DISTINCT gram hashes (benchmark-sized, broadcastable
    — no distinct-doc counting windows needed, membership is the whole
    question) -> per-doc gaps-and-islands. Contact is bounded by grams
    literally shared with the benchmark.
    """
    pre = _spread_words(
        docs.select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), " ").alias("__words"),
        ),
        id_col,
    )
    words = F.col("__words")
    grams = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hits = pre.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
    bench_grams = (
        _exploded_shingles(benchmark, text_col, id_col, k, max_shingles)
        .select(F.md5(F.col("shingle")).alias("gram"))
        .distinct()
    )
    dirty = hits.join(F.broadcast(bench_grams), "gram", "left_semi").select(
        id_col, "pos"
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.coalesce(F.max(F.col("pos") + k).over(w_prev), F.lit(-1))
    brk = F.when(F.col("pos") > prev_end, 1).otherwise(0)
    islands = dirty.withColumn("__island", F.sum(brk).over(w_run))
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + k).cast("bigint").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_words"),
        )
    )


def content_defined_chunks(
    docs: DataFrame,
    boundary_mod: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the rolling-hash boundary idea behind
    LBFS/rsync and FastCDC, applied at word granularity): cut each
    document AFTER every word whose md5 satisfies
    ``hash(word) % boundary_mod == 0``. Because boundaries depend only on
    LOCAL content, an insertion or deletion re-chunks ONLY the chunk it
    touches — every other chunk's text (and hash) is unchanged — whereas
    any fixed-width segmentation (:func:`aligned_segments`) shifts every
    segment after the edit and loses all dedup contact. This is the
    chunking to use when near-identical documents differ by small edits
    (licence headers, templated pages, version-bumped docs); expected
    chunk length is geometric with mean ``boundary_mod`` words.

    Output: ``(id_col, chunk_idx, chunk_text, chunk_md5, n_words)``, one
    row per chunk, ``chunk_idx`` counting from 0 in document order.

    Plan shape: explode words with position -> boundary flag as a pure
    md5 expression -> chunk index = running sum of PRIOR boundary flags
    (one window over the doc key) -> per-chunk rollup rebuilding word
    order via ``sort_array(collect_list(struct(pos, word)))`` (no second
    ordering shuffle; the groupBy reuses the doc-key partitioning). The
    boundary rule is portable md5 arithmetic, so any engine reproduces
    identical chunks — the min/max chunk-bound refinement of FastCDC
    requires a sequential FSM and is deliberately left out to keep the
    operator window-expressible (document the trade: a pathological
    corpus whose every word is a boundary yields 1-word chunks; raise
    ``boundary_mod`` or pre-filter such rows).
    """
    pre = _spread_words(
        docs.select(
            F.col(id_col),
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda s: s != "",
            ).alias("__words"),
        ),
        id_col,
    )
    occ = pre.select(
        F.col(id_col), F.posexplode("__words").alias("pos", "word")
    ).withColumn(
        "__brk",
        (
            F.pmod(
                F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast(
                    "bigint"
                ),
                F.lit(boundary_mod),
            )
            == 0
        ).cast("int"),
    )
    w_prior = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = occ.withColumn(
        "chunk_idx", F.coalesce(F.sum("__brk").over(w_prior), F.lit(0)).cast("int")
    )
    return (
        chunked.groupBy(id_col, "chunk_idx")
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "word"))).alias("__ws")
        )
        .select(
            id_col,
            "chunk_idx",
            F.concat_ws(
                " ", F.transform(F.col("__ws"), lambda s: s["word"])
            ).alias("chunk_text"),
            F.size("__ws").cast("bigint").alias("n_words"),
        )
        .withColumn("chunk_md5", F.md5(F.col("chunk_text")))
        .select(id_col, "chunk_idx", "chunk_text", "chunk_md5", "n_words")
    )


def cdc_duplicate_chunks(
    docs: DataFrame,
    boundary_mod: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate CDC chunks: which content-defined chunks
    appear in >= ``min_docs`` distinct documents, and how often — the
    storage-dedup measurement (shared boilerplate mass robust to small
    edits) that fixed-alignment line dedup undercounts on edited copies.

    Output: ``(chunk_md5, n_docs, n_occurrences, n_words)``.
    Contact is confined to chunk-hash groups (one groupBy over the chunk
    frame); raw chunk text never enters the shuffle (md5 + the word
    count are carried; re-join :func:`content_defined_chunks` on
    chunk_md5 to recover text)."""
    chunks = content_defined_chunks(docs, boundary_mod, text_col, id_col)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct(id_col).cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.first("n_words").alias("n_words"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def score_threshold_sweep(
    pairs: DataFrame,
    score_col: str = "jaccard",
    thresholds_pct: tuple[int, ...] = (10, 20, 30, 40, 50, 60, 70, 80, 90),
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_dp: int = 6,
) -> DataFrame:
    """Dedup-threshold sweep: for each candidate cutoff, how many verified
    pairs and how many distinct documents the dedup pass would touch —
    the datasheet a pipeline owner reads BEFORE committing to a Jaccard
    (or cosine) threshold, instead of inheriting 0.8 from folklore. The
    published dedup pipelines all pick a similarity cutoff empirically
    (Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    Better" §4; Penedo et al. 2023 RefinedWeb §G); this emits the whole
    removal-rate-vs-threshold curve in one pass over the verified pairs.

    Input: any scored pair frame — n-gram Jaccard from
    :func:`jaccard_pairs`, embedding cosine pairs, SimHash similarity.
    Output: one row per threshold, ``(threshold_pct, n_pairs, n_docs)``
    with ``n_pairs = |{pairs: round(score, round_dp) >= pct/100}|`` and
    ``n_docs`` the distinct documents appearing in those pairs (an upper
    bound on removals: survivors are picked per connected cluster, one
    kept each, so removals fall between ``n_docs/2`` and ``n_docs - 1``
    per component). Thresholds with no qualifying pair emit a zero row —
    the curve always has ``len(thresholds_pct)`` points.

    Plan shape: the 9-row threshold grid is the BROADCAST side of a
    nested-loop join against the pair frame (already candidate-bounded
    by LSH/banding — never the corpus); each qualifying pair explodes
    into its two doc ids so ONE grouped aggregate yields both curves
    (``n_pairs = count/2`` — exact, every pair contributes exactly two
    rows — and ``n_docs = count distinct``), consuming the scored
    subtree once instead of once per output column; a broadcast merge
    back onto the grid restores the zero rows. Scores are rounded
    before the comparison so the cut line is engine-reproducible (the
    same 6-dp boundary rule as the percentile gate)."""
    spark = pairs.sparkSession
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(int(p)).cast("long") for p in thresholds_pct])
        ).alias("threshold_pct")
    )
    exploded = (
        pairs.crossJoin(F.broadcast(grid))
        .filter(
            F.round(F.col(score_col), round_dp)
            >= F.col("threshold_pct").cast("double") / F.lit(100.0)
        )
        .select(
            "threshold_pct",
            F.explode(F.array(id_a, id_b)).alias("__doc"),
        )
    )
    counts = exploded.groupBy("threshold_pct").agg(
        (F.count(F.lit(1)) / F.lit(2)).cast("bigint").alias("n_pairs"),
        F.countDistinct("__doc").cast("bigint").alias("n_docs"),
    )
    return grid.join(F.broadcast(counts), "threshold_pct", "left").select(
        "threshold_pct",
        F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs"),
        F.coalesce("n_docs", F.lit(0).cast("bigint")).alias("n_docs"),
    )


def cluster_size_histogram(
    components: DataFrame,
    n_total_docs: DataFrame | None = None,
    vertex_col: str = "vertex",
    component_col: str = "component",
) -> DataFrame:
    """Duplicate-cluster size distribution — the other half of the dedup
    datasheet: how much of the corpus sits in clusters of each size, i.e.
    the duplicate MASS (``n_docs - n_clusters`` removals at size s) and
    its shape (two mirror copies everywhere vs a few megaclusters of
    boilerplate). Published corpus reports tabulate exactly this curve
    (Lee et al. 2021 fig. 1's cluster-size histogram).

    Input: the ``(vertex, component)`` frame from
    :func:`connected_components` (every vertex there belongs to a >= 2
    cluster, since each came from a pair). If ``n_total_docs`` — a 1-row
    ``(n_tot bigint)`` aggregate of the corpus — is supplied, a
    ``cluster_size = 1`` row is prepended for the documents in NO pair,
    so the histogram's ``sum(n_docs)`` equals the corpus size exactly.

    Output: ``(cluster_size, n_clusters, n_docs)`` with
    ``n_docs = cluster_size * n_clusters``, ordered by size.

    Plan shape: two grouped aggregates (component -> size, size ->
    count), both over component-label frames that are pair-bounded, never
    corpus-bounded; the singleton row is a 1-row broadcast-merged
    aggregate (bounded driver-side scalar, no collect)."""
    sizes = components.groupBy(component_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )
    out = hist.select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
    )
    if n_total_docs is not None:
        covered = components.agg(
            F.count(F.lit(1)).cast("bigint").alias("__n_cov")
        )
        singleton = (
            n_total_docs.crossJoin(covered)
            .select(
                F.lit(1).cast("bigint").alias("cluster_size"),
                (F.col("n_tot") - F.col("__n_cov")).alias("n_clusters"),
                (F.col("n_tot") - F.col("__n_cov")).alias("n_docs"),
            )
        )
        out = out.unionByName(singleton)
    return out


def threshold_doc_hits(
    pairs: DataFrame,
    score_col: str = "jaccard",
    thresholds_pct: tuple[int, ...] = (10, 20, 30, 40, 50, 60, 70, 80, 90),
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_dp: int = 6,
) -> DataFrame:
    """The sweep's per-document form: ``(threshold_pct, doc_id)`` — each
    document touched by at least one qualifying pair at each cutoff,
    deduplicated. The join-ready complement to
    :func:`score_threshold_sweep`'s aggregate curve: joining a weight
    column (token counts, byte sizes) against this frame turns the
    removal curve into the unit budget planners actually reason in —
    token mass at risk per threshold, not document count (a handful of
    giant boilerplate docs can carry more tokens than thousands of
    small mirrors). Same cut-line semantics (rounded score vs pct/100);
    the distinct is per (threshold, doc) and the frame stays
    pair-bounded x |grid|."""
    spark = pairs.sparkSession
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(int(p)).cast("long") for p in thresholds_pct])
        ).alias("threshold_pct")
    )
    return (
        pairs.crossJoin(F.broadcast(grid))
        .filter(
            F.round(F.col(score_col), round_dp)
            >= F.col("threshold_pct").cast("double") / F.lit(100.0)
        )
        .select(
            "threshold_pct", F.explode(F.array(id_a, id_b)).alias("doc_id")
        )
        .distinct()
    )


def quality_survivors(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    vertex_col: str = "vertex",
    component_col: str = "component",
) -> DataFrame:
    """Quality-aware survivor selection: ONE survivor per duplicate
    cluster, chosen by ``(score desc, id asc)`` instead of the min-id
    default — the form production dedup actually ships (keep the
    longest / highest-quality copy; near-dups differ, and which copy
    survives decides what the model trains on). Min-id selection is the
    degenerate case ``score = const``.

    Input: the ``(vertex, component)`` frame from
    :func:`connected_components` plus a ``(id_col, score_col)`` frame
    (word counts, Gopher quality, LM logprob — any orderable signal).
    Output: one row per cluster,
    ``(cluster_id, survivor_id, survivor_score, cluster_size)``.

    Scores need not cover every vertex: the join is a LEFT join from
    the cluster membership, an unscored vertex gets a NULL score
    ordered LAST (``desc_nulls_last``), and ``cluster_size`` counts
    ALL members — so a partially-scored cluster still elects its best
    scored copy (or, fully unscored, the lowest id) instead of
    silently vanishing from the output (ADVICE r6).

    Plan shape: the corpus-sized score frame STREAMS against a
    broadcast semi-join on the (pair-bounded) member set — a left outer
    join preserving the small side can't keep the big side streaming
    (BroadcastHashJoin only builds the non-preserved side), so the
    outer join itself runs AFTER the semi restriction, between two
    pair-bounded frames, with the restricted scores broadcast. The
    per-cluster argmax is a ``row_number() <= 1`` window — the
    WindowGroupLimit shape that computes a partial per-partition limit
    before the exchange, so only one candidate row per cluster per
    input partition shuffles."""
    member_scores = scores.select(
        F.col(id_col).alias(vertex_col), F.col(score_col).alias("__s")
    ).join(
        F.broadcast(components.select(vertex_col)), vertex_col, "semi"
    )
    joined = components.join(F.broadcast(member_scores), vertex_col, "left")
    w = Window.partitionBy(component_col).orderBy(
        F.col("__s").desc_nulls_last(), F.col(vertex_col).asc()
    )
    sizes = components.groupBy(component_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    top = (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col(component_col).alias("cluster_id"),
            F.col(vertex_col).alias("survivor_id"),
            F.col("__s").alias("survivor_score"),
        )
    )
    return top.join(
        F.broadcast(sizes.withColumnRenamed(component_col, "cluster_id")),
        "cluster_id",
    )


def edit_distance_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
    max_chars: int | None = 2000,
    round_dp: int = 6,
) -> DataFrame:
    """Character-level edit-distance verification for candidate pairs —
    the fuzzy-dedup family's finest granularity (exact hash, MinHash/
    Jaccard shingles, SimHash bits, embedding cosine, CDC chunks, line
    and substring dedup all see TOKENS or coarser; typo-level mirror
    detection needs characters): per candidate pair, Levenshtein
    distance over dedup-normalized text, optionally as the
    length-normalized ratio ``dist / max(len_a, len_b)`` (0 identical,
    1 disjoint) — threshold at ~0.2 for near-dup verification.

    Levenshtein is O(len_a x len_b) PER PAIR, which is exactly why this
    is a VERIFICATION stage, never a generation stage: candidates come
    from LSH bands / SimHash buckets / CDC chunk hits (pair-bounded),
    and ``max_chars`` truncates both sides (documents beyond a few KB
    that still band together are near-dups whose head decides; the cap
    bounds the per-pair cost to max_chars², the same
    estimate-for-capped-docs trade as ``minhash_signature``'s
    max_shingles). ``F.levenshtein`` is JVM codegen — no Python
    anywhere — and DuckDB's ``levenshtein`` replays it exactly, so the
    verification is oracle-checkable.

    Output: ``(id_a, id_b, edit_dist, edit_ratio?)`` — ratio only when
    ``normalize`` (empty-vs-empty pairs get ratio 0.0)."""
    norm = normalize_text(F.col(text_col))
    if max_chars is not None:
        norm = F.substring(norm, 1, max_chars)
    t = df.select(F.col(id_col), norm.alias("__t"))
    j = (
        pairs.join(
            t.select(
                F.col(id_col).alias("id_a"), F.col("__t").alias("__ta")
            ),
            "id_a",
        ).join(
            t.select(
                F.col(id_col).alias("id_b"), F.col("__t").alias("__tb")
            ),
            "id_b",
        )
    )
    dist = F.levenshtein(F.col("__ta"), F.col("__tb"))
    out = j.select(
        "id_a", "id_b", dist.cast("bigint").alias("edit_dist"),
        F.length("__ta").alias("__la"), F.length("__tb").alias("__lb"),
    )
    if not normalize:
        return out.select("id_a", "id_b", "edit_dist")
    longest = F.greatest(F.col("__la"), F.col("__lb"))
    ratio = F.when(
        longest > 0,
        F.round(F.col("edit_dist").cast("double") / longest, round_dp),
    ).otherwise(F.lit(0.0))
    return out.select(
        "id_a", "id_b", "edit_dist", ratio.alias("edit_ratio")
    )


def lsh_tuning_curve(
    spark,
    num_hashes: int = 8,
    band_size: int = 2,
    step_pct: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """The LSH banding S-curve — the planner's datasheet for
    :func:`lsh_candidate_pairs`: with ``b = num_hashes // band_size``
    bands of ``r = band_size`` rows, a pair at Jaccard similarity ``s``
    becomes a candidate with probability

        P(s) = 1 - (1 - s^r)^b

    (Leskovec/Rajaraman/Ullman, *Mining of Massive Datasets* §3.4 —
    the standard tuning tool, e.g. datasketch's optimal-param search).
    The curve's inflection ``(1/b)^(1/r)`` is the effective similarity
    threshold; reading the emitted grid is how a pipeline picks
    (num_hashes, band_size) for a target threshold BEFORE paying for a
    corpus-scale run, and the false-positive/false-negative masses are
    the areas under/over the curve either side of the cut.

    Output: one row per ``step_pct`` grid point — ``(similarity,
    p_candidate, n_bands, band_size)``, probabilities rounded (pow's
    engine ulp differences absorbed, the weighted-sampling idiom).
    Driver-grid-sized (a planning table, never corpus work)."""
    if num_hashes % band_size != 0:
        raise ValueError("num_hashes must be divisible by band_size")
    b = num_hashes // band_size
    grid = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.lit(p / 100.0)
                    for p in range(step_pct, 100, step_pct)
                ]
            )
        ).alias("similarity")
    )
    p = F.lit(1.0) - F.pow(
        F.lit(1.0) - F.pow(F.col("similarity"), F.lit(float(band_size))),
        F.lit(float(b)),
    )
    return grid.select(
        F.round("similarity", round_dp).alias("similarity"),
        F.round(p, round_dp).alias("p_candidate"),
        F.lit(b).cast("int").alias("n_bands"),
        F.lit(int(band_size)).cast("int").alias("band_size"),
    )
