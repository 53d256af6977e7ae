"""Phase-level wall-clock breakdown of the two streaming ingest capstones.

Replays exactly what q_streaming_ingest_pipeline / q_streaming_ingest_near_pipeline
do, but times each phase (staging writes, index build+pin, stream run,
final merge) separately so the optimization round knows which seconds are
stream machinery, which are staging I/O, and which are the gate itself.

Usage: python scripts/profile_capstone.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fireball_data_processing_spark.session import get_spark  # noqa: E402
from fireball_data_processing_spark.sources.tables import load_table  # noqa: E402
from fireball_data_processing_spark.operators.dedup import minhash_signature  # noqa: E402
from fireball_data_processing_spark.streaming.capstone import (  # noqa: E402
    read_pipeline_totals,
    run_ingest_pipeline,
    stage_incoming_slices,
)
from fireball_data_processing_spark.streaming.dedup_stream import (  # noqa: E402
    corpus_band_index,
    corpus_hash_index,
)


def profile(spark, sf_dir: str, gate: str) -> dict[str, float]:
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.pmod(F.col("doc_id"), F.lit(4)) == 0)
    incoming = d.filter(F.pmod(F.col("doc_id"), F.lit(4)) != 0)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"fb_profile_capstone_{gate}_{os.getpid()}_{tag}"
    )
    shutil.rmtree(base, ignore_errors=True)
    staging = f"{base}/staging"
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    stage_incoming_slices(incoming, staging, n_slices=4)
    out["stage_slices"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if gate == "exact":
        index = corpus_hash_index(corpus).localCheckpoint()
        kw = {}
    else:
        index = corpus_band_index(
            minhash_signature(corpus), num_hashes=8, band_size=2
        ).localCheckpoint()
        kw = dict(gate="near",
                  min_parallelism=spark.sparkContext.defaultParallelism)
    out["index_build_pin"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    run_ingest_pipeline(
        spark, staging, incoming.schema, index,
        f"{base}/out", f"{base}/ckpt", **kw,
    )
    out["stream_run"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    read_pipeline_totals(spark, f"{base}/out").localCheckpoint()
    out["final_merge"] = time.perf_counter() - t0
    shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="capstone-profile")
    spark.sparkContext.setLogLevel("ERROR")
    for gate in ("exact", "near"):
        # warm once (codegen/JIT), then two timed passes
        profile(spark, "/root/testdata/sf0.001", gate)
        for i in range(2):
            t0 = time.perf_counter()
            phases = profile(spark, sf_dir, gate)
            total = time.perf_counter() - t0
            parts = " ".join(f"{k}={v:.3f}" for k, v in phases.items())
            print(f"{gate} run{i}: total={total:.3f}  {parts}", flush=True)


if __name__ == "__main__":
    main()
