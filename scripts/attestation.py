"""Attestation-freshness auditor: cross-reference every driver
CORRECTNESS_r*.json against the LIVE query catalog and report, per
query, the newest round with a green driver row — then propose the
next-round `_PRIORITY` head mechanically (never-attested queries
first, then stalest-round-first, alphabetical within a round).

This is the bookkeeping VERDICT r8 flagged as structural: with a
200+-query catalog and a ~50-slot driver head, rotation has to be
computed, not remembered. Run at round start to build the head and at
round end to check the "nothing dates before rN" invariant.

Usage:
    python scripts/attestation.py            # freshness table + summary
    python scripts/attestation.py --head 50  # proposed next-round head
A row counts as green when rows_match is true and err is null; oracle
rows additionally need schema_match + hash_match (rows-only entries
have no hash to match).
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fireball_data_processing_spark import queries as catalog


def green(rec: dict, has_oracle: bool) -> bool:
    if not has_oracle:
        # rows-only entry: the driver records err="no_oracle" with the
        # spark row count — green means it ran and returned rows
        return rec.get("err") in (None, "no_oracle") and (
            rec.get("spark_rows") or 0
        ) > 0
    return (
        rec.get("err") is None
        and bool(rec.get("rows_match"))
        and bool(rec.get("schema_match"))
        and bool(rec.get("hash_match"))
    )


def newest_rounds() -> dict[str, int]:
    """query name -> newest round with a green driver row (0 = never)."""
    oracles = catalog.oracle_sql()
    newest: dict[str, int] = {name: 0 for name in catalog.queries()}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, rec in json.load(open(path)).items():
            if name in newest and green(rec, name in oracles):
                newest[name] = max(newest[name], rnd)
    return newest


def main() -> None:
    head_n = 0
    if "--head" in sys.argv:
        head_n = int(sys.argv[sys.argv.index("--head") + 1])
    newest = newest_rounds()
    by_round: dict[int, list[str]] = {}
    for name, rnd in newest.items():
        by_round.setdefault(rnd, []).append(name)
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        tag = "NEVER" if rnd == 0 else f"r{rnd}"
        print(f"{tag:>6} ({len(names):3d}): {', '.join(names)}")
    print(
        f"\ntotal {len(newest)} queries; "
        + "; ".join(
            f"{'never' if r == 0 else f'r{r}'}={len(by_round[r])}"
            for r in sorted(by_round)
        )
    )
    if head_n:
        order = sorted(newest.items(), key=lambda kv: (kv[1], kv[0]))
        head = [name for name, _ in order[:head_n]]
        print(f"\n# proposed _PRIORITY head ({head_n} slots, stalest-first):")
        for name in head:
            print(f'    "{name}",')


if __name__ == "__main__":
    main()
