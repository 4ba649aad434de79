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
