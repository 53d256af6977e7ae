"""Data-dominated core-scaling capture (VERDICT r12 ask #7).

At sf0.1 every query is per-job-fixed-cost-bound, so the driver's 8-vs-32
core ratio cannot distinguish serial paths from parallel ones (every r12
ratio was <=1). This script materializes a x10 id-shifted amplification of
the sf0.1 tables (~"sf1": 50k docs / 6M lineitem rows — deterministic, the
amplify_probe recipe with FK-consistent key shifts; an INPUT for
measurement only, never a cached result) and times the 19 legacy headline
queries on it at two core counts, in FRESH subprocesses so
`$SPARK_GRAFT_CPUS` takes effect exactly as the driver's own bench does.

Usage:
    python scripts/scaling_capture_r13.py gen          # build /tmp input
    python scripts/scaling_capture_r13.py run 32|8     # one timing pass
    python scripts/scaling_capture_r13.py report       # merge + write
Writes benchmarks/SCALING_r13.json: per query sec@32, sec@8, ratio
(sec@8/sec@32; data-bound parallel paths should read >>1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMP_DIR = "/tmp/fb_scaling_x10"
FACTOR = 10
SHIFT = 10_000_000
QUERIES = (
    "heuristics_matrix", "asof_state_backward", "nearest_purchase",
    "run_lengths", "triples_summary", "pricing_summary", "revenue_by_nation",
    "znorm_user_values", "exact_dedup_groups", "doc_quality",
    "minhash_signatures", "near_dup_pairs", "simhash_fingerprints",
    "ann_cosine_topk", "bm25_search", "cross_doc_line_dedup",
    "kmeans_cluster_profile", "pq_adc_topk_neighbors",
    "markov_stationary_profile",
)


def gen() -> None:
    from pyspark.sql import functions as F

    from fireball_data_processing_spark.session import get_spark
    from fireball_data_processing_spark.sources.tables import load_table

    spark = get_spark(app_name="scaling-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(AMP_DIR, exist_ok=True)
    base = "/root/testdata/sf0.1"

    def amp(name, copies):
        out = copies[0]
        for p in copies[1:]:
            out = out.unionByName(p)
        (out.repartition(32).write.mode("overwrite")
            .parquet(f"{AMP_DIR}/{name}.parquet"))

    d = spark.read.parquet(f"{base}/documents.parquet")
    amp("documents", [
        d.select((F.col("doc_id") + i * SHIFT).alias("doc_id"),
                 F.concat_ws(" ", F.col("text"), F.lit(f"cv{i}")).alias("text"),
                 "lang", "source", "n_chars")
        for i in range(FACTOR)])
    ev = spark.read.parquet(f"{base}/events.parquet")
    amp("events", [
        ev.select((F.col("event_id") + i * SHIFT).alias("event_id"), "ts",
                  (F.col("user_id") + i * SHIFT).alias("user_id"),
                  "event_type",
                  (F.col("value") + F.lit(i % 97) * 0.001).alias("value"),
                  "props")
        for i in range(FACTOR)])
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    amp("lineitem", [
        li.select((F.col("l_orderkey") + i * SHIFT).alias("l_orderkey"),
                  (F.col("l_partkey") + i * SHIFT).alias("l_partkey"),
                  (F.col("l_suppkey") + i * SHIFT).alias("l_suppkey"),
                  "l_linenumber", "l_quantity", "l_extendedprice",
                  "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                  "l_shipdate")
        for i in range(FACTOR)])
    o = spark.read.parquet(f"{base}/orders.parquet")
    amp("orders", [
        o.select((F.col("o_orderkey") + i * SHIFT).alias("o_orderkey"),
                 (F.col("o_custkey") + i * SHIFT).alias("o_custkey"),
                 "o_orderstatus", "o_totalprice", "o_orderdate",
                 "o_orderpriority")
        for i in range(FACTOR)])
    c = spark.read.parquet(f"{base}/customer.parquet")
    amp("customer", [
        c.select((F.col("c_custkey") + i * SHIFT).alias("c_custkey"),
                 "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        for i in range(FACTOR)])
    p = spark.read.parquet(f"{base}/part.parquet")
    amp("part", [
        p.select((F.col("p_partkey") + i * SHIFT).alias("p_partkey"),
                 "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        for i in range(FACTOR)])
    s = spark.read.parquet(f"{base}/supplier.parquet")
    amp("supplier", [
        s.select((F.col("s_suppkey") + i * SHIFT).alias("s_suppkey"),
                 "s_name", "s_nationkey", "s_acctbal")
        for i in range(FACTOR)])
    em = spark.read.parquet(f"{base}/embeddings.parquet")
    amp("embeddings", [
        em.select((F.col("vec_id") + i * SHIFT).alias("vec_id"),
                  F.transform(
                      "embedding",
                      lambda x: x + F.lit((i % 7) * 1e-4)).alias("embedding"),
                  "label")
        for i in range(FACTOR)])
    # dims referenced by FK values that are NOT shifted stay verbatim
    for name in ("nation", "region"):
        spark.read.parquet(f"{base}/{name}.parquet").write.mode(
            "overwrite").parquet(f"{AMP_DIR}/{name}.parquet")
    print("generated", AMP_DIR)


def run(cpus: str) -> None:
    from fireball_data_processing_spark import queries as catalog
    from fireball_data_processing_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-run-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    times = {}
    for name in QUERIES:
        fn = catalog.REGISTRY[name].fn
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite").save()  # warm codegen
        samples = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, AMP_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        times[name] = {"min": min(samples), "samples": samples}
        print(name, samples, flush=True)
    with open(f"/tmp/scaling_r13_c{cpus}.json", "w") as f:
        json.dump({"cpus": int(cpus), "loadavg1": os.getloadavg()[0],
                   "times": times}, f, indent=1)


def report() -> None:
    a = json.load(open("/tmp/scaling_r13_c32.json"))
    b = json.load(open("/tmp/scaling_r13_c8.json"))
    out = {"factor": FACTOR, "base_sf": 0.1, "cpus_main": 32, "cpus_low": 8,
           "loadavg1_c32": a["loadavg1"], "loadavg1_c8": b["loadavg1"],
           "per_query": {}}
    for q in QUERIES:
        s32 = a["times"][q]["min"]
        s8 = b["times"][q]["min"]
        out["per_query"][q] = {
            "sec_c32": s32, "sec_c8": s8,
            "ratio_c8_over_c32": round(s8 / s32, 2) if s32 else None,
            "samples_c32": a["times"][q]["samples"],
            "samples_c8": b["times"][q]["samples"],
        }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "SCALING_r13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", path)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "gen":
        gen()
    elif cmd == "run":
        run(sys.argv[2])
    elif cmd == "report":
        report()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
