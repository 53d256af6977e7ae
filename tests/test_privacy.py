"""Privacy-release auditing: k-anonymity/l-diversity semantics on a
hand-built frame, and the seeded-Laplace mechanism's determinism,
Python-replay parity, and hash-lattice noise bound."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from fireball_data_processing_spark.operators.privacy import (
    k_anonymity_audit,
    k_anonymity_classes,
    laplace_noise,
)


def _mk_release(spark):
    # QI = (region, band); sensitive = seg.
    # class (a,0): 1 row            -> k=1, l=1   bucket '1'
    # class (a,1): 3 rows, 2 segs   -> k=3, l=2   bucket '2-4'
    # class (b,0): 5 rows, 1 seg    -> k=5, l=1   bucket '5-9'
    # class (b,1): 12 rows, 3 segs  -> k=12, l=3  bucket '10+'
    rows = (
        [("a", 0, "x")]
        + [("a", 1, "x"), ("a", 1, "y"), ("a", 1, "y")]
        + [("b", 0, "x")] * 5
        + [("b", 1, ["x", "y", "z"][i % 3]) for i in range(12)]
    )
    return spark.createDataFrame(rows, ["region", "band", "seg"])


def test_k_anonymity_classes_counts(spark):
    cls = k_anonymity_classes(_mk_release(spark), ["region", "band"], "seg")
    got = {(r["region"], r["band"]): (r["k"], r["l"]) for r in cls.collect()}
    assert got == {
        ("a", 0): (1, 1),
        ("a", 1): (3, 2),
        ("b", 0): (5, 1),
        ("b", 1): (12, 3),
    }


def test_k_anonymity_audit_buckets(spark):
    cls = k_anonymity_classes(_mk_release(spark), ["region", "band"], "seg")
    out = k_anonymity_audit(cls).collect()
    assert [r["k_bucket"] for r in out] == ["1", "2-4", "5-9", "10+"]
    by = {r["k_bucket"]: r for r in out}
    assert by["1"]["n_classes"] == 1 and by["1"]["n_rows"] == 1
    assert by["2-4"]["n_rows"] == 3 and by["2-4"]["min_l"] == 2
    assert by["5-9"]["n_rows"] == 5 and by["5-9"]["avg_l"] == 1.0
    assert by["10+"]["n_rows"] == 12 and by["10+"]["min_l"] == 3
    total = sum(r["n_rows"] for r in out)
    assert total == 21
    assert abs(sum(r["pct_rows"] for r in out) - 1.0) < 1e-5
    assert by["1"]["pct_rows"] == round(1 / 21, 6)


def _laplace_replay(key: str, b: float = 1.0, salt: str = "dp") -> float:
    u = int(hashlib.md5(f"{salt}#{key}".encode()).hexdigest()[:12], 16) / 2.0**48
    c = u - 0.5
    mag = max(1.0 - 2.0 * abs(c), 2.0**-48)
    return -b * math.copysign(1.0, c) * math.log(mag) if c != 0 else 0.0


def test_laplace_noise_replays_in_python(spark):
    keys = [f"eps1#{t}#{d}" for t in ("view", "click") for d in range(5)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"]).select(
        "key", laplace_noise(F.col("key")).alias("noise")
    )
    got = {r["key"]: r["noise"] for r in df.collect()}
    for k in keys:
        assert abs(got[k] - _laplace_replay(k)) < 1e-9, k
    # determinism: a second plan over the same keys is identical
    again = {
        r["key"]: r["noise"]
        for r in spark.createDataFrame([(k,) for k in keys], ["key"])
        .select("key", laplace_noise(F.col("key")).alias("noise"))
        .collect()
    }
    assert again == got


def test_laplace_noise_bounded_by_hash_lattice(spark):
    # 1 - 2|u - 1/2| is floored at 2^-48, so |noise| <= b * 48 ln 2.
    df = spark.createDataFrame([(str(i),) for i in range(2000)], ["key"])
    mx = df.select(
        F.max(F.abs(laplace_noise(F.col("key"), epsilon=1.0))).alias("m")
    ).collect()[0]["m"]
    assert mx <= 48 * math.log(2.0) + 1e-12
    # scale: b = sensitivity/epsilon stretches the same seed linearly
    one = df.limit(1).select(
        laplace_noise(F.col("key"), epsilon=1.0).alias("n1"),
        laplace_noise(F.col("key"), epsilon=0.5).alias("n2"),
    ).collect()[0]
    assert abs(one["n2"] - 2.0 * one["n1"]) < 1e-12


# --- property: the bucketed audit replays a literal Python computation ---

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_release_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2), st.sampled_from("xyz")),
    min_size=1,
    max_size=60,
)

_BANDS = [("1", 1, 1), ("2-4", 2, 4), ("5-9", 3, 9), ("10+", 4, 10**9)]


def _audit_replay(rows):
    k = Counter((r, b) for r, b, _ in rows)
    l = {q: len({s for r, b, s in rows if (r, b) == q}) for q in k}
    out = {}
    # each class lands in its first matching band
    assign = {}
    for q in k:
        for label, order, hi in _BANDS:
            if k[q] <= hi:
                assign[q] = (label, order)
                break
    total = len(rows)
    for q, (label, order) in assign.items():
        row = out.setdefault(label, {"order": order, "n_classes": 0, "n_rows": 0, "ls": []})
        row["n_classes"] += 1
        row["n_rows"] += k[q]
        row["ls"].append(l[q])
    from fireball_data_processing_spark.functions.rounding import spark_round
    return {
        label: (
            r["order"], r["n_classes"], r["n_rows"], min(r["ls"]),
            spark_round(sum(r["ls"]) / len(r["ls"]), 6),
            spark_round(r["n_rows"] / total, 6),
        )
        for label, r in out.items()
    }


@given(rows=_release_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_k_anonymity_audit_matches_python_replay(spark, rows):
    df = spark.createDataFrame(rows, ["region", "band", "seg"])
    got = k_anonymity_audit(
        k_anonymity_classes(df, ["region", "band"], "seg")
    ).collect()
    want = _audit_replay(rows)
    assert len(got) == len(want)
    for r in got:
        o, nc, nr, mn, avg, pct = want[r["k_bucket"]]
        assert (r["bucket_order"], r["n_classes"], r["n_rows"], r["min_l"]) == (
            o, nc, nr, mn,
        )
        assert r["avg_l"] == avg and r["pct_rows"] == pct


def test_laplace_noise_null_key_propagates(spark):
    # NULL cell key -> NULL noise (matches the oracle's || semantics);
    # release queries coalesce key components to a sentinel instead.
    df = spark.createDataFrame([(None,), ("k",)], "key: string")
    out = {r["key"]: r["n"] for r in df.select(
        "key", laplace_noise(F.col("key")).alias("n")
    ).collect()}
    assert out[None] is None and out["k"] is not None
