"""chq_sketch binary interop: golden validation against the reference's
own artifacts, plus codec round-trip/fuzz and the Spark bridge.

The golden test is the strongest parity proof in the repo: the
reference's queryworker fixtures pair every sketches-go-encoded sketch
BLOB with the rollups the reference itself computed from that very
sketch (rollup_count, rollup_p50/p95/p99). Our pure-Python decoder +
quantile walk must reproduce ALL of them. Skipped when the reference
checkout isn't present."""

from __future__ import annotations

import glob
import math
import os
import random
import struct

import pytest

from lakerunner_spark.sources.chq_sketch import (
    decode_chq_sketch,
    encode_chq_sketch,
    read_varfloat64,
    sketch_quantile,
    write_varfloat64,
)

_REF_DB = "/root/reference/queryworker/testdata/db"
_REF_METRICS = "/root/reference/testdata/metrics"


@pytest.mark.skipif(
    not os.path.isdir(_REF_DB), reason="reference artifacts not present"
)
def test_golden_rollup_parity_all_reference_rows():
    """Every queryworker fixture row: decoded total count equals
    rollup_count and the quantile walk reproduces rollup_p50/p95/p99
    to 1e-9 relative. These rollups were computed by the reference
    (sketches-go) from the same blobs — bit-level format drift, index
    convention drift, or quantile-rule drift would all fail here."""
    import duckdb

    con = duckdb.connect()
    total = 0
    for f in sorted(glob.glob(os.path.join(_REF_DB, "*.parquet"))):
        rows = con.execute(
            f"select sketch, rollup_count, rollup_p50, rollup_p95,"
            f" rollup_p99 from read_parquet('{f}')"
            f" where sketch is not null"
        ).fetchall()
        for blob, rc, p50, p95, p99 in rows:
            sk = decode_chq_sketch(bytes(blob))
            tot = (
                sk["zero_count"]
                + sum(sk["pos"].values())
                + sum(sk["neg"].values())
            )
            assert abs(tot - rc) < 1e-6 * max(1.0, rc)
            for q, want in ((0.5, p50), (0.95, p95), (0.99, p99)):
                got = sketch_quantile(sk, q)
                assert got is not None
                assert abs(got - want) <= 1e-9 * max(1e-9, abs(want)), (
                    f"{f}: q={q} got {got} want {want}"
                )
            total += 1
    assert total > 10_000  # the fixture set is ~17k rows


@pytest.mark.skipif(
    not os.path.isdir(_REF_METRICS), reason="reference artifacts not present"
)
def test_golden_every_cooked_blob_parses_to_its_end():
    """Structural soundness over the second, independent artifact set:
    every cooked-metric sketch blob parses exactly to its last byte
    with a logarithmic mapping and sane gamma."""
    import duckdb

    con = duckdb.connect()
    n = 0
    for f in sorted(glob.glob(os.path.join(_REF_METRICS, "*.parquet"))):
        try:
            rows = con.execute(
                f"select sketch from read_parquet('{f}')"
                f" where sketch is not null"
            ).fetchall()
        except Exception:
            continue
        for (blob,) in rows:
            sk = decode_chq_sketch(bytes(blob))
            assert 1.0 < sk["gamma"] < 1.1
            n += 1
    assert n > 2000


def test_varfloat64_roundtrip_fuzz():
    """The count codec stores exactly float64(v+1)-1 (the format's
    own v+1 transform — sub-ulp-of-1.0 information is out of contract,
    as in the reference library): decode(encode(v)) must equal that
    value bit-for-bit, which is v itself for every count the sketch
    path produces (non-negative integers below 2^52), and encoding is
    a fixpoint under re-encode for arbitrary doubles."""
    rng = random.Random(7)
    cases = [0.0, 1.0, 2.0, 3.0, 0.5, 191.0, 1e-300, 1e300, 123456.789]
    cases += [float(rng.randint(0, 10**9)) for _ in range(200)]
    cases += [rng.random() * 10 ** rng.randint(-30, 30) for _ in range(200)]
    for v in cases:
        out = bytearray()
        write_varfloat64(out, v)
        got, i = read_varfloat64(bytes(out), 0)
        assert i == len(out)
        want = (v + 1.0) - 1.0
        assert struct.pack("<d", got) == struct.pack("<d", want), (v, got)
        if v == int(v) and 0 <= v < 2**52:
            assert got == v
        out2 = bytearray()
        write_varfloat64(out2, got)
        assert bytes(out2) == bytes(out)


def test_encode_decode_sketch_roundtrip():
    rng = random.Random(11)
    for _ in range(50):
        gamma = (1 + 0.01) / (1 - 0.01)
        pos = {rng.randint(-300, 600): float(rng.randint(1, 50))
               for _ in range(rng.randint(1, 40))}
        neg = {rng.randint(-300, 600): float(rng.randint(1, 9))
               for _ in range(rng.randint(0, 5))}
        zero = float(rng.randint(0, 4))
        blob = encode_chq_sketch(gamma, pos, neg, zero)
        sk = decode_chq_sketch(blob)
        assert sk["pos"] == pos and sk["neg"] == neg
        assert sk["zero_count"] == zero and sk["gamma"] == gamma


def test_decoder_rejects_truncation_and_unknown_flags():
    blob = encode_chq_sketch(1.02, {3: 2.0}, None, 1.0)
    with pytest.raises((ValueError, IndexError)):
        decode_chq_sketch(blob[:-1] if blob[-1] & 0x80 == 0 else blob[:5])
    with pytest.raises((ValueError, IndexError)):
        decode_chq_sketch(blob + b"\x01\x02")  # unknown trailing flag


@pytest.mark.skipif(
    not os.path.isdir(_REF_DB), reason="reference artifacts not present"
)
def test_spark_bridge_matches_reference_rollups_sample(spark):
    """End-to-end through the ENGINE: real reference blobs -> Spark
    mapInPandas decode -> bucket rows -> the engine's cumulative-walk
    quantile == the reference's recorded rollup_p50/p95 (counts in
    these artifacts are integers, where the engine's floor(q*(n-1))
    rank rule coincides with sketches-go's)."""
    from pyspark.sql import functions as F

    from lakerunner_spark.operators.ddsketch import ddsketch_quantile
    from lakerunner_spark.sources.chq_sketch import chq_sketch_bucket_rows

    f = sorted(glob.glob(os.path.join(_REF_DB, "*.parquet")))[0]
    src = (
        spark.read.parquet(f)
        .filter(F.col("sketch").isNotNull())
        .select(
            F.monotonically_increasing_id().alias("rid"),
            "sketch",
            F.col("rollup_count").alias("rc"),
            F.col("rollup_p50").alias("rp50"),
            F.col("rollup_p95").alias("rp95"),
        )
        .limit(500)
        .cache()
    )
    rows = chq_sketch_bucket_rows(src, "sketch", keep=["rid"])
    p50 = ddsketch_quantile(rows, ["rid"], 0.5, out_col="p50")
    p95 = ddsketch_quantile(rows, ["rid"], 0.95, out_col="p95")
    n = rows.groupBy("rid").agg(F.sum("count").alias("n"))
    got = {
        r.rid: r
        for r in n.join(p50, "rid").join(p95, "rid").collect()
    }
    want = {r.rid: r for r in src.select("rid", "rc", "rp50", "rp95").collect()}
    assert len(got) == len(want) > 0
    for rid, w in want.items():
        g = got[rid]
        assert abs(g.n - w.rc) < 1e-6 * max(1.0, w.rc)
        assert math.isclose(g.p50, w.rp50, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(g.p95, w.rp95, rel_tol=1e-9, abs_tol=1e-12)


@pytest.mark.skipif(
    not os.path.isdir(_REF_METRICS), reason="reference artifacts not present"
)
def test_encode_roundtrips_every_reference_blob():
    """decode(encode(decode(x))) == decode(x) for EVERY sketch blob in
    BOTH reference artifact sets (all ~2.5k cooked-metric blobs plus
    all ~17k queryworker fixture blobs). Our encoder always picks the
    sparse deltas+counts store form; the library picks store encodings
    adaptively, so bytes may legally differ — the decoded sketch
    (gamma, offset, zero count, every bin and count, bit-for-bit
    floats) must be identical. This is the write-side half of the
    interop loop: anything the reference ever wrote, we can re-emit
    losslessly in a form both decoders accept."""
    import duckdb

    con = duckdb.connect()
    n_metrics = n_db = 0
    for root, counter in ((_REF_METRICS, "m"), (_REF_DB, "d")):
        for f in sorted(glob.glob(os.path.join(root, "*.parquet"))):
            try:
                rows = con.execute(
                    f"select sketch from read_parquet('{f}')"
                    f" where sketch is not null"
                ).fetchall()
            except Exception:
                continue
            for (blob,) in rows:
                sk = decode_chq_sketch(bytes(blob))
                blob2 = encode_chq_sketch(
                    sk["gamma"], sk["pos"], sk["neg"], sk["zero_count"],
                    sk["index_offset"],
                )
                assert decode_chq_sketch(blob2) == sk
                if counter == "m":
                    n_metrics += 1
                else:
                    n_db += 1
    assert n_metrics > 2000 and n_db > 10_000


def test_encode_engine_sketch_inverts_bucket_bridge():
    """encode_engine_sketch is the exact inverse of the
    chq_sketch_bucket_rows index bridge: an engine bucket map with
    positive, zero, and mirrored-negative buckets round-trips through
    wire bytes back to the identical map."""
    from lakerunner_spark.operators.ddsketch import _NEG_BASE, _ZERO_BUCKET
    from lakerunner_spark.sources.chq_sketch import encode_engine_sketch

    gamma = 1.02
    buckets = {
        17: 3.0,
        -4: 2.5,
        0: 1.0,
        _ZERO_BUCKET: 4.0,
        _NEG_BASE - 9: 7.0,
        _NEG_BASE - (-3): 1.0,
    }
    sk = decode_chq_sketch(encode_engine_sketch(buckets, gamma))
    assert sk["gamma"] == gamma and sk["index_offset"] == 0.0
    back = {i + 1: c for i, c in sk["pos"].items()}
    if sk["zero_count"]:
        back[_ZERO_BUCKET] = sk["zero_count"]
    back.update({_NEG_BASE - (i + 1): c for i, c in sk["neg"].items()})
    assert back == buckets


def test_bucket_rows_folds_integral_index_offset(spark):
    """value(i) = gamma^(i - offset) * 2g/(g+1): a blob encoded with an
    INTEGRAL nonzero index_offset must land in the same engine buckets
    as the equivalent offset-0 blob with every index pre-shifted by
    -offset; a fractional offset has no integer-bucket equivalent and
    must fail loudly (not silently mis-bucket every count)."""
    gamma = 1.02
    pos = {10: 3.0, 25: 1.0}
    neg = {4: 2.0}
    with_off = encode_chq_sketch(gamma, pos, neg, 1.0, index_offset=5.0)
    no_off = encode_chq_sketch(
        gamma,
        {i - 5: c for i, c in pos.items()},
        {i - 5: c for i, c in neg.items()},
        1.0,
    )
    from lakerunner_spark.sources.chq_sketch import chq_sketch_bucket_rows

    def rows(blob):
        df = spark.createDataFrame([(1, bytearray(blob))], "rid int, sketch binary")
        # r["count"], not r.count — Row.count is a builtin method
        return sorted(
            (r["bucket"], r["count"])
            for r in chq_sketch_bucket_rows(df, "sketch", keep=["rid"]).collect()
        )

    assert rows(with_off) == rows(no_off)

    frac = encode_chq_sketch(gamma, pos, neg, 0.0, index_offset=2.5)
    with pytest.raises(Exception, match="non-integral index_offset"):
        rows(frac)


def test_streaming_decode_matches_batch(spark, tmp_path):
    """The interop decode is a stateless mapInPandas over blob rows,
    so it runs unchanged under Structured Streaming: a readStream over
    a parquet of sketch blobs yields the identical bucket rows the
    batch plan does (the ingest-side shape: reference-written segments
    arriving continuously)."""
    from pyspark.sql import functions as F

    from lakerunner_spark.operators.ddsketch import gamma_for
    from lakerunner_spark.sources.chq_sketch import (
        chq_sketch_bucket_rows,
        encode_chq_sketch,
    )

    gamma = gamma_for(0.01)
    rows = [
        (f"m{s}", bytearray(encode_chq_sketch(
            gamma,
            {s * 3 + j: float(j + 1) for j in range(4)},
            {-(s + 1): 2.0},
            float(s % 2),
        )))
        for s in range(6)
    ]
    indir = str(tmp_path / "blobs")
    spark.createDataFrame(rows, "metric string, sketch binary").write.parquet(
        indir
    )
    schema = spark.read.parquet(indir).schema

    def build(df):
        return chq_sketch_bucket_rows(df, "sketch", keep=["metric"])

    batch = {tuple(r) for r in build(spark.read.parquet(indir)).collect()}
    q = (
        build(spark.readStream.schema(schema).parquet(indir))
        .writeStream.format("memory")
        .queryName("chq_stream_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = {
        tuple(r)
        for r in spark.sql("SELECT * FROM chq_stream_parity").collect()
    }
    assert batch == stream and batch
