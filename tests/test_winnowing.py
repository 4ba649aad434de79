"""Winnowing fingerprint guarantees (dataops/text.winnow_fingerprints)."""

from __future__ import annotations

from lakerunner_spark.dataops.text import winnow_fingerprints

K, W = 5, 4


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, "text", "doc_id", k=K, w=W)
    res: dict[int, set[int]] = {}
    for r in out.collect():
        res.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    return res


def test_shared_run_shares_a_fingerprint(spark):
    # winnowing guarantee: any shared token run of length >= k + w - 1
    # (8 tokens here) produces at least one common fingerprint
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"unrelated preamble words here {shared} and a different tail"),
        (2, f"{shared} completely other continuation tokens follow now"),
        (3, "nothing in common with the others at all whatsoever indeed"),
    ]
    fps = _fps(spark, rows)
    assert fps[1] & fps[2], "docs sharing an 8-token run must share a print"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_identical_docs_identical_prints(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    fps = _fps(spark, [(1, text), (2, text)])
    assert fps[1] == fps[2]


def test_short_docs(spark):
    fps = _fps(
        spark,
        [
            (1, "only four tokens here"),      # < k -> no fingerprints
            (2, "exactly five tokens right here"),  # k tokens, 1 gram
        ],
    )
    assert 1 not in fps
    assert len(fps[2]) == 1


def test_storage_is_sublinear_vs_shingles(spark):
    text = " ".join(f"tok{i}" for i in range(100))
    fps = _fps(spark, [(1, text)])
    n_grams = 100 - K + 1
    # winnowing keeps roughly 2/(w+1) of gram hashes; assert well under
    assert len(fps[1]) < n_grams / 2


def test_substring_dedup_reliable_checkpoint(spark, tmp_path):
    """substring_dedup_pairs(checkpoint_dir=...) — the cluster-reliable
    materialization mode (same contract as connected_components) —
    returns exactly the rows the default localCheckpoint path does."""
    from lakerunner_spark.dataops.dedup import substring_dedup_pairs

    text = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, text),
        (2, text + " extra trailing words here"),
        (3, "completely different content " + " ".join(f"z{i}" for i in range(40))),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    base = {
        tuple(r) for r in substring_dedup_pairs(docs, k=5, w=4).collect()
    }
    ckpt = {
        tuple(r)
        for r in substring_dedup_pairs(
            docs, k=5, w=4, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert base == ckpt
    assert any(a == 1 and b == 2 for a, b, _ in base)
