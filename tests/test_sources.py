"""End-to-end ingestion tests on a real instance-dir corpus: gzipped JSONL
chunk files under per-instance directories, exactly the reference's layout
(dataset/utils.py:38-61), including a corrupt chunk."""

from __future__ import annotations

import gzip
import json
import os
import tempfile

import pytest

from pyspark.sql import functions as F

from fireball_data_processing_spark.schema import EVENT_SCHEMA
from fireball_data_processing_spark.sources.checksum import dataset_checksum
from fireball_data_processing_spark.sources.events import load_event_stream
from fireball_data_processing_spark.sources import sinks


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("fireball_corpus")
    instances = {
        "inst_a": [
            [
                {"combat_id": "inst_a", "event_type": "message", "timestamp": 1.0,
                 "author_id": "u1", "content": "hello there"},
                {"combat_id": "inst_a", "event_type": "command", "timestamp": 2.0,
                 "author_id": "u1", "content": "!attack", "command_name": "attack"},
            ],
            [
                {"combat_id": "inst_a", "event_type": "message", "timestamp": 3.0,
                 "author_id": "u2", "content": "later chunk"},
            ],
        ],
        "inst_b": [
            [
                {"combat_id": "inst_b", "event_type": "combat_state_update",
                 "timestamp": 9.5, "human_readable": "round 1"},
            ],
        ],
    }
    for inst, chunks in instances.items():
        d = root / inst
        d.mkdir()
        for i, chunk in enumerate(chunks):
            with gzip.open(d / f"chunk-{i:03d}.jsonl.gz", "wt") as f:
                for ev in chunk:
                    f.write(json.dumps(ev) + "\n")
    # a corrupt gz chunk the loader must tolerate (reference skips
    # BadGzipFile with a warning, dataset/utils.py:22-27)
    with open(root / "inst_b" / "chunk-999.jsonl.gz", "wb") as f:
        f.write(b"this is not gzip data")
    return str(root)


def test_load_event_stream_layout(spark, corpus):
    df = load_event_stream(spark, corpus, schema=EVENT_SCHEMA)
    rows = df.orderBy("instance_id", "seq").collect()
    by_inst = {}
    for r in rows:
        by_inst.setdefault(r["instance_id"], []).append(r)
    assert set(by_inst) == {"inst_a", "inst_b"}
    a = by_inst["inst_a"]
    # file order then line order -> canonical seq
    assert [r["seq"] for r in a] == [1, 2, 3]
    assert a[0]["content"] == "hello there"
    assert a[2]["content"] == "later chunk"
    assert a[1]["command_name"] == "attack"
    # typed schema: absent columns are null, not missing
    assert a[0]["command_name"] is None
    assert by_inst["inst_b"][0]["human_readable"] == "round 1"


def test_corrupt_chunk_tolerated(spark, corpus):
    df = load_event_stream(spark, corpus, schema=EVENT_SCHEMA)
    assert df.count() == 4  # corrupt chunk skipped, good rows intact


def test_checksum_memoization_roundtrip(spark, corpus):
    cs1 = dataset_checksum(spark, corpus)
    cs2 = dataset_checksum(spark, corpus)
    assert cs1 == cs2 and len(cs1) == 32

    out = os.path.join(tempfile.mkdtemp(), "result")
    df = load_event_stream(spark, corpus, schema=EVENT_SCHEMA)
    res = df.groupBy("instance_id").count()
    sinks.write_results_csv(res, out, checksum=cs1)
    assert sinks.memoized(out, cs1)
    assert not sinks.memoized(out, cs1, force_recompute=True)
    assert not sinks.memoized(out, "different")

    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2


def test_jsonl_gz_roundtrip(spark, corpus):
    df = load_event_stream(spark, corpus, schema=EVENT_SCHEMA)
    out = os.path.join(tempfile.mkdtemp(), "events_out")
    sinks.write_jsonl(
        df.select("instance_id", "seq", "event_type", "content"), out,
        gzip=True, single_file=True,
    )
    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert len(files) == 1  # S13 single-file merge
    back = spark.read.json(out)
    assert back.count() == 4
    assert set(back.columns) >= {"instance_id", "seq", "event_type"}


def test_fireball_dataset_api(spark, corpus, tmp_path):
    from fireball_data_processing_spark.dataset import FireballDataset

    ds = FireballDataset(spark, corpus, results_dir=str(tmp_path / "res"))
    assert sorted(ds.instances()) == ["inst_a", "inst_b"]
    assert len(ds.checksum()) == 32

    m1 = ds.heuristics()
    assert m1.count() == 2
    # second call is served from the memoized CSV (checksum unchanged)
    m2 = ds.heuristics()
    assert m2.count() == 2
    assert {r["instance_id"] for r in m2.collect()} == {"inst_a", "inst_b"}

    ev = ds.events("inst_a").collect()
    assert [r["seq"] for r in ev] == [1, 2, 3]

    out = str(tmp_path / "export")
    ds.export_heuristics_csv(out)
    import os

    assert os.path.exists(os.path.join(out, "_checksum"))


def test_stream_events_jsonl_chunks(spark, corpus, tmp_path):
    # S12: the explorer /events/{id} generator — ordered JSONL, bounded
    # chunks, 404 (KeyError) for unknown instances
    import json

    from fireball_data_processing_spark.dataset import FireballDataset

    ds = FireballDataset(spark, corpus, results_dir=str(tmp_path / "res"))
    chunks = list(ds.stream_events("inst_a", chunk_size=2))
    assert len(chunks) == 2  # 3 events -> chunk of 2 + chunk of 1
    events = [json.loads(l) for c in chunks for l in c.strip().splitlines()]
    assert [e["seq"] for e in events] == [1, 2, 3]
    assert all(e["instance_id"] == "inst_a" for e in events)

    import pytest as _pytest

    with _pytest.raises(KeyError):
        next(ds.stream_events("nope"))


def test_stream_heuristics_csv(spark, corpus, tmp_path):
    import csv
    import io

    from fireball_data_processing_spark.dataset import FireballDataset

    ds = FireballDataset(spark, corpus, results_dir=str(tmp_path / "res"))
    body = "".join(ds.stream_heuristics_csv(chunk_size=1))
    rows = list(csv.reader(io.StringIO(body)))
    header, data = rows[0], rows[1:]
    assert header[0] == "instance_id"
    assert {r[0] for r in data} == {"inst_a", "inst_b"}
    assert len(data) == 2


def test_embeddings_load_attaches_dim_metadata(spark, sf_dir):
    """load_table attaches {"dim": N} column metadata to the embeddings
    table (memoized one-row peek per path), so _infer_dim — and every
    ANN operator behind it — never pays a per-query driver job."""
    from fireball_data_processing_spark.operators.similarity import (
        _infer_dim,
    )
    from fireball_data_processing_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    meta = e.schema["embedding"].metadata
    assert meta.get("dim") == 64
    # the metadata value must agree with the data
    true_dim = e.selectExpr("size(embedding) as d").first()["d"]
    assert meta["dim"] == true_dim
    assert _infer_dim(e, "embedding") == true_dim
    # second load serves from the memo and carries the same metadata
    e2 = load_table(spark, sf_dir, "embeddings")
    assert e2.schema["embedding"].metadata.get("dim") == true_dim


def test_load_table_memoized_per_application(spark, sf_dir):
    """Repeat loads of the same (app, path) return the SAME DataFrame —
    file listing + footer reads paid once per application, the
    metastore-CatalogFileIndex shape. refresh=True rebuilds."""
    from fireball_data_processing_spark.sources.tables import load_table

    a = load_table(spark, sf_dir, "lineitem")
    b = load_table(spark, sf_dir, "lineitem")
    assert a is b
    c = load_table(spark, sf_dir, "lineitem", refresh=True)
    assert c is not b
    assert c.schema == b.schema
    # the refreshed frame replaces the memo entry
    assert load_table(spark, sf_dir, "lineitem") is c
