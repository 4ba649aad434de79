"""Bucketed-layout tests: correctness parity + shuffle elimination.

The scale claim behind plans/bucketed.py is checkable locally: the
physical plan of a join/groupBy over bucketed tables must contain no
shuffle Exchange, and results must equal the plain-parquet plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakerunner_spark.plans.bucketed import (
    exchange_count,
    read_bucketed,
    write_bucketed_segments,
    write_bucketed_table,
)
from lakerunner_spark.testdata import events_stream, load_table

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed_table(
        li, "li_b", "l_orderkey", N_BUCKETS,
        sort_cols=["l_orderkey"], path=str(root / "li_b"),
    )
    write_bucketed_table(
        orders, "ord_b", "o_orderkey", N_BUCKETS,
        sort_cols=["o_orderkey"], path=str(root / "ord_b"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def _join_revenue(li, orders):
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum("l_extendedprice")).alias("rev_floor"),
        )
    )


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    joined = _join_revenue(read_bucketed(spark, "li_b"), read_bucketed(spark, "ord_b"))
    # one exchange remains for the final small groupBy; the join itself
    # (the 100 TB cost) must not shuffle either side
    n_exchanges = exchange_count(joined)
    assert n_exchanges <= 1, f"expected only the agg exchange, got {n_exchanges}"


def test_plain_join_does_shuffle(spark, sf_dir):
    # force SMJ (at test scale Catalyst would broadcast tiny orders;
    # at 100 TB neither side broadcasts — that is the case bucketing wins)
    joined = _join_revenue(
        load_table(spark, sf_dir, "lineitem").hint("merge"),
        load_table(spark, sf_dir, "orders"),
    )
    assert exchange_count(joined) >= 2  # both join sides + agg


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    bucketed = _join_revenue(
        read_bucketed(spark, "li_b"), read_bucketed(spark, "ord_b")
    )
    plain = _join_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )
    b = sorted(map(tuple, bucketed.collect()))
    p = sorted(map(tuple, plain.collect()))
    assert b == p


def test_bucketed_groupby_on_key_is_shuffle_free(spark, bucketed_tables):
    li = read_bucketed(spark, "li_b")
    # grouping on (bucket key, more) — HashPartitioning(l_orderkey)
    # satisfies the clustered distribution, so zero exchanges
    agg = li.groupBy("l_orderkey", "l_returnflag").agg(
        F.sum("l_quantity").alias("qty")
    )
    assert exchange_count(agg) == 0


def test_bucketed_segments_family_keys(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed_seg")
    ev = events_stream(spark, sf_dir).withColumn(
        "chq_tid", F.xxhash64("event_type", "user_id")
    )
    write_bucketed_segments(
        ev, "metrics_b", "metrics", N_BUCKETS, path=str(root / "metrics_b")
    )
    try:
        per_series = (
            read_bucketed(spark, "metrics_b")
            .groupBy("chq_tid", (F.col("chq_timestamp") - F.col("chq_timestamp") % 60000))
            .agg(F.sum("value"))
        )
        assert exchange_count(per_series) == 0
        assert read_bucketed(spark, "metrics_b").count() == ev.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS metrics_b")
