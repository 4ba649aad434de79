"""Streaming incremental dedup: stream output == batch exact_dedup, and
restarting with new files emits only never-seen documents (cross-batch
state survives on the lake, T2/T4 semantics for the dedup state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakerunner_spark.dataops.dedup import exact_dedup
from lakerunner_spark.streaming.dedup import (
    dedup_batch_against_store,
    run_dedup_stream,
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _docs_schema(spark, path):
    return spark.read.parquet(path).schema


def test_stream_dedup_matches_batch_and_is_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: two files with intra- and cross-file duplicates
    _write_docs(spark, inp, [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")])
    _write_docs(spark, inp, [(4, "gamma delta"), (5, "epsilon zeta")])
    schema = _docs_schema(spark, inp)

    q = run_dedup_stream(spark, inp, out, state, ckpt, schema)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out)
    batch1 = exact_dedup(spark.read.parquet(inp), "text", "doc_id")
    assert sorted(r["text"] for r in got1.select("text").collect()) == sorted(
        r["text"] for r in batch1.select("text").collect()
    )
    # lowest doc_id won each hash
    assert sorted(r["doc_id"] for r in got1.collect()) == [1, 2, 5]

    # wave 2: restart with one duplicate of wave 1 and one novel doc
    _write_docs(spark, inp, [(6, "alpha beta"), (7, "eta theta")])
    q2 = run_dedup_stream(spark, inp, out, state, ckpt, schema)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out)
    # only the novel doc was appended
    assert sorted(r["doc_id"] for r in got2.collect()) == [1, 2, 5, 7]
    # and the union still equals batch dedup over everything ingested
    batch2 = exact_dedup(spark.read.parquet(inp), "text", "doc_id")
    assert sorted(r["text"] for r in got2.select("text").collect()) == sorted(
        r["text"] for r in batch2.select("text").collect()
    )


def test_dedup_batch_retry_is_idempotent(spark, tmp_path):
    """A batch retried AFTER its state write landed must re-emit its own
    rows (not lose them to the anti-join against its own hashes)."""
    state = str(tmp_path / "state")
    b = spark.createDataFrame(
        [(10, "aa bb"), (11, "cc dd")], ["doc_id", "text"]
    )
    first = dedup_batch_against_store(b, 0, state, "text", "doc_id")
    first.select("_h", F.lit(0).alias("batch")).write.mode("append").parquet(
        state
    )
    # simulate the retry: state for batch 0 exists; same batch id re-runs
    retried = dedup_batch_against_store(b, 0, state, "text", "doc_id")
    assert sorted(r["doc_id"] for r in retried.collect()) == [10, 11]
    # a later batch with one of those hashes IS filtered
    c = spark.createDataFrame([(12, "aa bb"), (13, "ee ff")], ["doc_id", "text"])
    nxt = dedup_batch_against_store(c, 1, state, "text", "doc_id")
    assert sorted(r["doc_id"] for r in nxt.collect()) == [13]
