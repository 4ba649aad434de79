"""Multimodal + ANN scale-path query catalog.

``mm1`` exercises the binary-column plumbing end-to-end with an exact
oracle (payloads synthesized from ASCII text, histogram over hex-parsed
bytes). The ANN variants are rows-only here; recall-vs-brute-force is
asserted in tests/test_multimodal_ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakerunner_spark.dataops.multimodal import byte_histogram_features
from lakerunner_spark.dataops.similarity import ivf_topk, lsh_bucket_topk
from lakerunner_spark.functions.rounding import portable_round as _pr
from lakerunner_spark.queries import register
from lakerunner_spark.testdata import load_table


@register(
    "mm1_byte_histogram",
    """
    SELECT lang,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           pround(avg(h0), 6) AS avg_h0, pround(avg(h1), 6) AS avg_h1,
           pround(avg(h2), 6) AS avg_h2, pround(avg(h3), 6) AS avg_h3
    FROM (
      SELECT lang, length(text) AS n_bytes,
             len(list_filter(bytes, b -> b // 64 = 0)) * 1.0 / length(text) AS h0,
             len(list_filter(bytes, b -> b // 64 = 1)) * 1.0 / length(text) AS h1,
             len(list_filter(bytes, b -> b // 64 = 2)) * 1.0 / length(text) AS h2,
             len(list_filter(bytes, b -> b // 64 = 3)) * 1.0 / length(text) AS h3
      FROM (
        SELECT lang, text,
               list_transform(range(1, length(text) + 1),
                              i -> ord(substr(text, i, 1))) AS bytes
        FROM documents
      )
    )
    GROUP BY lang
    """,
)
def mm1_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: opaque binary payload -> codec-free byte-histogram
    features, aggregated per lang. Payload synthesized from the ASCII
    text column so the oracle can reproduce byte values exactly."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        "lang",
    )
    feats = byte_histogram_features(
        media.select("media_id", "media_type", "payload"), buckets=4
    )
    joined = feats.join(
        media.select(F.col("media_id"), "lang"), "media_id"
    )
    return joined.groupBy("lang").agg(
        F.sum("n_bytes").alias("total_bytes"),
        *[
            _pr(F.avg(F.element_at("features", i + 1)), 6).alias(f"avg_h{i}")
            for i in range(4)
        ],
    )


@register("sim2_ivf_topk")
def sim2_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: IVF cells + multi-probe (recall vs brute force
    asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    c = emb.filter(F.col("vec_id") >= 3)
    return ivf_topk(q, c, k=5, n_cells=16, n_probe=8)


@register("sim3_lsh_topk")
def sim3_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH buckets (single-probe)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    c = emb.filter(F.col("vec_id") >= 3)
    # deterministic pseudo-random hyperplanes: L tables of b bits
    import random

    rng = random.Random(42)
    tables = [
        [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(3)]
        for _ in range(6)
    ]
    return lsh_bucket_topk(q, c, tables, k=5)


_MM2_PX = """
      SELECT m, y, x, c,
             CAST((m*37 + y*17 + x*5 + c*11) % 256 AS DOUBLE) AS v
      FROM range(0, 10) t0(m) CROSS JOIN range(0, 8) t1(y)
           CROSS JOIN range(0, 8) t2(x) CROSS JOIN range(0, 3) t3(c)
"""


@register(
    "mm2_png_features",
    f"""
    WITH px AS ({_MM2_PX}),
    gray AS (SELECT m, y, x, avg(v) AS g FROM px GROUP BY 1, 2, 3),
    chan AS (
      SELECT m, avg(CASE WHEN c = 0 THEN v END) AS mean_r,
             avg(CASE WHEN c = 1 THEN v END) AS mean_g,
             avg(CASE WHEN c = 2 THEN v END) AS mean_b
      FROM px GROUP BY m
    ),
    g2 AS (SELECT m, avg(g) AS mean_gray, min(g) AS min_gray,
                  max(g) AS max_gray
           FROM gray GROUP BY m)
    SELECT m AS media_id, 8.0 AS width, 8.0 AS height,
           pround(mean_r, 6) AS mean_r, pround(mean_g, 6) AS mean_g,
           pround(mean_b, 6) AS mean_b, pround(mean_gray, 6) AS mean_gray,
           pround(min_gray, 6) AS min_gray, pround(max_gray, 6) AS max_gray
    FROM chan JOIN g2 USING (m)
    """,
)
def mm2_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode, no injection: deterministic 8x8 RGB PNGs are
    encoded and decoded with the engine's stdlib PNG codec
    (zlib+struct, multimodal.decode_png) inside mapInPandas; the oracle
    computes the same pixel statistics in closed form from the generator
    formula — any codec defect breaks the hash."""
    from lakerunner_spark.dataops.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        extract_features,
    )

    rows = []
    for m in range(10):
        rgb = bytes(
            (m * 37 + y * 17 + x * 5 + c * 11) % 256
            for y in range(8)
            for x in range(8)
            for c in range(3)
        )
        rows.append((m, "image", 8, 8, None, bytearray(encode_png(8, 8, rgb))))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media)
    names = [
        "width", "height", "mean_r", "mean_g", "mean_b",
        "mean_gray", "min_gray", "max_gray",
    ]
    return feats.select(
        "media_id",
        *[
            _pr(F.element_at("features", i + 1), 6).alias(n)
            for i, n in enumerate(names)
        ],
    )
