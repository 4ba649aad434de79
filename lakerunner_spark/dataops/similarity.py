"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The dot product stays JVM-side via ``zip_with``+``aggregate`` (no
  Python UDF); norms are computed once per side before the join.
- ``lsh_bucket_topk``: the scale path — random-hyperplane signs bucket
  vectors so the pairwise join only touches same-bucket candidates
  (recall < 1; probe multiple buckets to trade compute for recall).

Scale notes (100 TB): brute force is O(Q×N) — fine when Q is small
(a query batch) because the corpus scan parallelizes per partition and
the per-row work is a 64-float fma loop in codegen. For N×N all-pairs,
use the LSH bucket variant: shuffle keys are bucket signatures,
cardinality 2^planes, so choose planes ≈ log2(corpus/target_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(col: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    Output: qid, cid, cosine (rounded; ranking on the rounded value with
    cid tiebreak keeps results deterministic across engines).
    """
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("_qv"),
        _norm(vec_col).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("_cv"),
        _norm(vec_col).alias("_cn"),
    )
    # queries side is small -> broadcast; corpus scan streams once
    pairs = c.crossJoin(F.broadcast(q))
    scored = pairs.select(
        "qid",
        "cid",
        F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), round_dp).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def lsh_bucket_signature(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of <v, plane_i> -> bucket id."""
    sig = None
    for p in planes:
        arr = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), arr, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        sig = bit if sig is None else (sig * 2 + bit)
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """ANN top-k: compare only same-bucket pairs (single-probe)."""
    qb = lsh_bucket_signature(queries, planes, id_col, vec_col).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_qv"), "bucket"
    )
    cb = lsh_bucket_signature(corpus, planes, id_col, vec_col).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("_cv"), "bucket"
    )
    pairs = cb.join(F.broadcast(qb), "bucket")
    scored = pairs.select(
        "qid",
        "cid",
        F.round(
            _dot("_qv", "_cv")
            / (
                F.sqrt(_dot("_qv", "_qv")) * F.sqrt(_dot("_cv", "_cv"))
            ),
            round_dp,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
