"""Per-query micro-profiler for the optimization round.

For each named query: wall time of the noop-sink run (N samples, min
kept), the number of Spark JOBS the run launched (status-tracker delta —
each job is a driver round-trip + scheduling overhead, the dominant fixed
cost at tiny scale), and the time spent before the first job starts
(plan construction + optimization, measured as wall minus executor span
is not separable here, so we report build time = time to produce the
executedPlan string separately).

Usage: python scripts/profile_queries.py <query> [query ...] [--n 3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=")[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])

    from fireball_data_processing_spark import queries as catalog
    from fireball_data_processing_spark.session import get_spark

    spark = get_spark(app_name="profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        fn = catalog.REGISTRY[name].fn
        # warm once at sf0.001 (codegen/classload)
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        samples = []
        jobs = None
        for _ in range(n):
            pre = getattr(catalog, "_BPE_MERGES_CACHE", None)
            if name.startswith("bpe") and pre is not None:
                pre.clear()
            spark.catalog.clearCache()  # same per-sample hygiene as bench.py
            j0 = tracker.getJobIdsForGroup(None)
            nj0 = len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            nj1 = len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None) or [])
            samples.append((round(t1 - t0, 3), round(t2 - t1, 3), round(t2 - t0, 3)))
            jobs = nj1 - nj0
        best = min(samples, key=lambda s: s[2])
        print(
            f"{name:40s} build={best[0]:6.3f}s exec={best[1]:6.3f}s "
            f"total={best[2]:6.3f}s jobs={jobs} all={samples}"
        )


if __name__ == "__main__":
    main()
