"""F15/F16 hash parity: golden vectors for fnv64a and the Java-style
string hash (index compatibility requires bit-for-bit identity), plus
TID determinism over a DataFrame."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakerunner_spark.functions.hashing import (
    compute_tid,
    fnv64a_py,
    java_string_hash_py,
)

# Published FNV-1a 64-bit test vectors (offset basis & canonical strings)
FNV64A_GOLDEN = {
    "": -3750763034362895579,          # 0xcbf29ce484222325 as int64
    "a": -5808556873153909620,         # 0xaf63dc4c8601ec8c
    "foobar": -8821353812377114648,    # 0x85944171f73967e8
}

# Java String.hashCode semantics
JAVA_HASH_GOLDEN = {
    "": 0,
    "a": 97,
    "abc": 96354,
    "hello world": 1794106052,
}


def test_fnv64a_golden_vectors():
    for s, want in FNV64A_GOLDEN.items():
        assert fnv64a_py(s) == want, s


def test_java_hash_golden_vectors():
    for s, want in JAVA_HASH_GOLDEN.items():
        assert java_string_hash_py(s) == want, s


def test_java_hash_overflow_wraps_like_jvm():
    # a string long enough to overflow 32 bits repeatedly
    s = "x" * 64
    h = java_string_hash_py(s)
    assert -(2**31) <= h < 2**31


def test_compute_tid_deterministic_and_order_free(spark):
    df = spark.createDataFrame(
        [("cpu", "api", "us"), ("cpu", "api", None), ("mem", "api", "us")],
        ["metric_name", "svc", "region"],
    )
    # attr order must not matter (keys are sorted, tid.go:69-117)
    t1 = df.select(compute_tid("metric_name", "svc", "region").alias("tid")).collect()
    t2 = df.select(compute_tid("metric_name", "region", "svc").alias("tid")).collect()
    assert [r.tid for r in t1] == [r.tid for r in t2]
    # null attr skipped -> differs from present attr
    tids = [r.tid for r in t1]
    assert len(set(tids)) == 3
    # python-side equivalence for row 0
    expect = fnv64a_py("metric_name=cpu|region=us|svc=api")
    assert tids[0] == expect


def test_hash_expressions_match_python(spark):
    """The JVM-side SQL expressions (no Python in the ingest hot path)
    must agree bit-for-bit with the golden Python implementations,
    including multi-byte UTF-8, surrogate pairs, and NULL."""
    from lakerunner_spark.functions.hashing import fnv64a, java_string_hash

    cases = [
        "", "a", "foobar", "metric_name=cpu|region=us|svc=api",
        "héllo wörld", "日本語テキスト", "emoji 🎉🚀 test", "x" * 64,
        "tab\tand\nnewline", chr(0x10000),
    ]
    df = spark.createDataFrame([(s,) for s in cases] + [(None,)], ["s"])
    rows = df.select(
        "s", fnv64a("s").alias("f"), java_string_hash("s").alias("j")
    ).collect()
    for r in rows:
        if r.s is None:
            assert r.f is None and r.j is None
        else:
            assert r.f == fnv64a_py(r.s), repr(r.s)
            assert r.j == java_string_hash_py(r.s), repr(r.s)


def test_hash_expressions_no_python_in_plan(spark):
    """The plan for TID computation must contain no Python UDF eval."""
    df = spark.createDataFrame([("cpu", "api")], ["metric_name", "svc"])
    out = df.select(compute_tid("metric_name", "svc").alias("tid"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hash_expressions_fuzz_batch(spark):
    """Batched fuzz: 200 random strings (mixed ASCII/Latin/CJK/emoji/
    controls, lengths 0-300) through both SQL expressions in ONE job,
    compared bit-for-bit with the Python golden implementations."""
    import random

    from lakerunner_spark.functions.hashing import fnv64a, java_string_hash

    rng = random.Random(1234)
    pools = [
        lambda: chr(rng.randrange(32, 127)),          # ASCII
        lambda: chr(rng.randrange(0xA0, 0x250)),      # Latin ext
        lambda: chr(rng.randrange(0x4E00, 0x9FFF)),   # CJK (3-byte UTF-8)
        lambda: chr(rng.randrange(0x1F300, 0x1F700)),  # emoji (4-byte, surrogate pair)
        lambda: chr(rng.randrange(1, 32)),            # controls
    ]
    cases = [
        "".join(rng.choice(pools)() for _ in range(rng.randrange(0, 300)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    rows = df.select(
        "s", fnv64a("s").alias("f"), java_string_hash("s").alias("j")
    ).collect()
    assert len(rows) == 200
    for r in rows:
        assert r.f == fnv64a_py(r.s), repr(r.s)
        assert r.j == java_string_hash_py(r.s), repr(r.s)


def test_fast_kernels_match_expressions(spark):
    """The vectorized Arrow kernels (bulk-ingest fast path) must produce
    the SAME bits as the SQL expressions and the Python goldens — fuzz
    over mixed scripts, empty strings, and NULLs, plus the pandas-level
    batch kernels directly."""
    import random

    import pandas as pd

    from lakerunner_spark.functions.hashing import (
        fnv64a,
        fnv64a_batch,
        fnv64a_fast,
        java_string_hash,
        java_string_hash_batch,
        java_string_hash_fast,
    )

    rng = random.Random(99)
    pools = [
        lambda: chr(rng.randrange(32, 127)),
        lambda: chr(rng.randrange(0xA0, 0x250)),
        lambda: chr(rng.randrange(0x4E00, 0x9FFF)),
        lambda: chr(rng.randrange(0x1F300, 0x1F700)),  # astral -> surrogates
    ]
    cases: list[str | None] = [
        "".join(rng.choice(pools)() for _ in range(rng.randrange(0, 120)))
        for _ in range(150)
    ]
    cases += ["", None, "a", "metric_name=x|user_id=42"]

    # pandas-level kernels vs Python goldens (incl. null propagation)
    ser = pd.Series(cases, dtype="object")
    fb, jb = fnv64a_batch(ser), java_string_hash_batch(ser)
    for i, s in enumerate(cases):
        if s is None:
            assert fb[i] is pd.NA and jb[i] is pd.NA
        else:
            assert fb[i] == fnv64a_py(s), repr(s)
            assert jb[i] == java_string_hash_py(s), repr(s)

    # Spark-level: fast UDF vs expression, one job
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    rows = df.select(
        fnv64a("s").alias("fe"),
        fnv64a_fast("s").alias("ff"),
        java_string_hash("s").alias("je"),
        java_string_hash_fast("s").alias("jf"),
    ).collect()
    for r in rows:
        assert r.fe == r.ff
        assert r.je == r.jf


def test_compute_tid_fast_matches_slow(spark):
    from lakerunner_spark.functions.hashing import compute_tid

    df = spark.createDataFrame(
        [("m1", "u1"), ("m2", None), ("m3", ""), (None, "u4")],
        ["metric_name", "user_id"],
    )
    rows = df.select(
        compute_tid("metric_name", "user_id").alias("slow"),
        compute_tid("metric_name", "user_id", fast=True).alias("fast"),
    ).collect()
    for r in rows:
        assert r.slow == r.fast
