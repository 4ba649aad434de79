"""Bench-artifact survivability (r9 verdict task #1: BENCH_r09 was
rc=124/parsed-null — the official per-query perf record for the round
did not exist). The driver keeps only a ~2000-char tail of merged
output and parses the bench JSON from it (tools/bench_tail.py states
the rule + evidence), so bench.py must guarantee a parseable line
lives in that window at EVERY instant: compact bounded summaries,
cumulative per-section emission, a heartbeat during sections, and a
wall budget that skips sections instead of letting the driver
truncate them. No Spark here — sections are faked; these tests drive
the PARENT's emission machinery, including a hard SIGKILL mid-sf10.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from tools.bench_tail import parse_tail  # noqa: E402


def _fake_result(n_queries: int = 76, sec: float = 0.5) -> dict:
    # realistic name lengths: the compact line must fit the window
    # even with the repo's longest query names
    names = [f"dd12s_semantic_dedup_sampled_{i:03d}" for i in range(n_queries)]
    return {
        "queries": {n: sec + i * 0.01 for i, n in enumerate(names)},
        "total": round(sum(sec + i * 0.01 for i in range(n_queries)), 3),
        "calib_sec": 0.55,
        "calib_end_sec": 0.57,
        "iters": {n: 2 for n in names},
        "diff": None,
    }


def test_compact_summary_always_fits_the_tail_window():
    out = {
        "metric": "headline_queries_total",
        "value": 77.5,
        "unit": "sec",
        "sf": 0.1,
        "queries": _fake_result()["queries"],
        "calib_sec": 0.55,
        "calib_end_sec": 0.57,
        "sf1_total_sec": 253.7,
        "sf1_calib_sec": 0.61,
        "sf10_total_sec": 892.4,
        "sf10_calib_sec": 0.59,
        "budget_sec": 1350.0,
        "skipped_sections": {"sf10": {"est_sec": 1638.0, "remaining_sec": 500.0}},
    }
    line = json.dumps(bench.compact_summary(out))
    assert len(line) <= 1800  # margin under the 2000-char window
    c = json.loads(line)
    assert c["metric"] == "headline_queries_total"
    assert c["value"] == 77.5 and c["sf"] == 0.1
    assert c["sf1_total_sec"] == 253.7 and c["sf10_total_sec"] == 892.4
    assert c["queries_n"] == 76
    assert c["queries_truncated"] is True
    # the SLOWEST queries survive the truncation
    slowest = max(out["queries"], key=out["queries"].get)
    assert slowest in c["queries"]
    # full record small enough -> untruncated
    small = dict(out, queries={"q1": 1.0, "q2": 2.0})
    c2 = bench.compact_summary(small)
    assert c2["queries_truncated"] is False and len(c2["queries"]) == 2


def test_parse_tail_rule():
    full = json.dumps({"metric": "headline_queries_total", "x": "y" * 3000})
    compact = json.dumps({"metric": "headline_queries_total", "value": 1.0})
    noise = "\r".join(f"[Stage {i}:===>(1 + 4) / 5]" for i in range(10))
    # full line outgrew the window -> its truncated head never parses,
    # the compact line after it does
    assert parse_tail(f"{full}\n{compact}\n") == json.loads(compact)
    # stderr noise after the compact line, still within window -> ok
    assert parse_tail(f"{compact}\n{noise}\n") == json.loads(compact)
    # 2000+ chars of noise after it -> gone (this is WHY the heartbeat
    # exists)
    assert parse_tail(f"{compact}\n{'x' * 2100}\n") is None


_STUB = textwrap.dedent(
    """
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    import bench

    def fake_spawn(section, section_budget=None):
        if section == "sf10":
            # flood stderr with progress-bar-like noise (pushes every
            # earlier emission out of the tail window), then hang like
            # a real 10-minute section
            for i in range(60):
                print(f"[Stage {{i}}:====>                (1 + 4) / 5]",
                      file=sys.stderr)
            sys.stderr.flush()
            time.sleep(600)
        names = [f"q{{i:02d}}_some_longish_query_name" for i in range(40)]
        return {{
            "queries": {{n: 0.5 for n in names}},
            "total": 20.0,
            "calib_sec": 0.5,
            "calib_end_sec": 0.5,
            "iters": {{n: 2 for n in names}},
            "diff": None,
        }}

    bench._spawn = fake_spawn
    bench.main()
    """
)


def _run_stub(tmp_path, env_extra: dict, wait_for: str, timeout: float = 60.0):
    stub = tmp_path / "stub.py"
    stub.write_text(_STUB.format(repo=REPO))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        SPARK_GRAFT_BENCH_LATEST=str(tmp_path / "latest.json"),
        **env_extra,
    )
    proc = subprocess.Popen(
        [sys.executable, str(stub)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,  # the driver's merged-stream view
        env=env,
        cwd=str(tmp_path),
    )
    buf = b""
    deadline = time.monotonic() + timeout
    os.set_blocking(proc.stdout.fileno(), False)
    while time.monotonic() < deadline:
        chunk = proc.stdout.read()
        if chunk:
            buf += chunk
        if wait_for.encode() in buf:
            return proc, buf
        if proc.poll() is not None:
            buf += proc.stdout.read() or b""
            return proc, buf
        time.sleep(0.05)
    proc.kill()
    raise AssertionError(f"stub never printed {wait_for!r}\n{buf.decode()[-2000:]}")


def test_sigkill_mid_sf10_leaves_parseable_main_and_sf1(tmp_path):
    """The r9 failure mode, retro-tested: the run dies mid-sf10 with
    noise flooding the tail — and the heartbeat still leaves a
    complete compact line carrying main + sf1 inside the window."""
    proc, buf = _run_stub(
        tmp_path,
        {
            "SPARK_GRAFT_BENCH_BUDGET": "0",  # unlimited: sf10 attempted
            "SPARK_GRAFT_BENCH_HEARTBEAT": "1",
        },
        wait_for='"in_progress": "sf10"',
    )
    try:
        # let the noise land and at least one more heartbeat fire
        time.sleep(2.5)
        chunk = proc.stdout.read()
        if chunk:
            buf += chunk
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=10)
        buf += proc.stdout.read() or b""
    finally:
        if proc.poll() is None:
            proc.kill()

    parsed = parse_tail(buf.decode())
    assert parsed is not None, buf.decode()[-2000:]
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["value"] == 20.0          # main survived
    assert parsed["sf1_total_sec"] == 20.0  # sf1 survived
    assert parsed["queries"]                # per-query timings present
    assert parsed.get("in_progress") == "sf10"
    # the full cumulative record also survived on disk
    latest = json.loads((tmp_path / "latest.json").read_text())
    assert len(latest["queries"]) == 40 and latest["sf1_total_sec"] == 20.0


def test_budget_skips_sf10_before_sf1_and_never_main(tmp_path):
    """A tight wall budget records explicit skips (sf10 first — it
    runs last and estimates biggest) instead of dying mid-section;
    main always completes and stays in the parsed record."""
    proc, buf = _run_stub(
        tmp_path,
        {"SPARK_GRAFT_BENCH_BUDGET": "5", "SPARK_GRAFT_BENCH_HEARTBEAT": "0"},
        wait_for='"skipped_sections"',
        timeout=120.0,
    )
    proc.wait(timeout=30)
    buf += proc.stdout.read() or b""
    assert proc.returncode == 0
    parsed = parse_tail(buf.decode())
    assert parsed is not None, buf.decode()[-2000:]
    assert parsed["value"] == 20.0  # main ran in full
    # r11: a skipped sf10 normally triggers the small rotation
    # re-witness; with no budget left, that skip is recorded too
    assert set(parsed["skipped_sections"]) == {
        "sf1", "sf10", "sf10_rotation"
    }
    assert "sf1_total_sec" not in parsed


def test_section_child_failure_keeps_earlier_sections(tmp_path, monkeypatch):
    """An sf1 child crash records the error and the run continues to
    emit (and attempt sf10) instead of raising away the main record."""
    calls = []

    def fake(section, section_budget=None):
        calls.append(section)
        if section == "sf1":
            raise RuntimeError("bench section sf1 failed rc=1")
        return _fake_result(10)

    monkeypatch.setattr(bench, "_spawn", fake)
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET", "0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_HEARTBEAT", "0")
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_LATEST", str(tmp_path / "latest.json")
    )

    import io
    from contextlib import redirect_stdout

    f = io.StringIO()
    with redirect_stdout(f):
        bench.main()
    out = f.getvalue()
    assert calls == ["main", "sf1", "sf10"]
    parsed = parse_tail(out)
    assert parsed["value"] == _fake_result(10)["total"]
    assert "sf1" in parsed["section_errors"]
    assert parsed["sf10_total_sec"] == _fake_result(10)["total"]


def test_estimates_survive_a_smoke_run_overwriting_latest(tmp_path, monkeypatch):
    """A sf0.001 smoke writes BENCH_LATEST.json without scale totals;
    the budget estimator must keep reading sf1/sf10 estimates from the
    committed baseline instead of falling back to pessimistic
    defaults (which would skip sf1 unnecessarily on driver runs)."""
    import json

    latest = tmp_path / "latest.json"
    latest.write_text(json.dumps(
        {"metric": "headline_queries_total", "value": 50.0, "sf": 0.001,
         "queries": {"q": 1.0}}
    ))
    # _previous_full reads fixed repo-root names; emulate by composing
    # the same merge it performs
    baseline = json.load(open(os.path.join(REPO, "BENCH_BASELINE.json")))
    merged = dict(baseline)
    merged.update(json.loads(latest.read_text()))
    assert merged["sf"] == 0.001            # latest wins where present
    assert merged["sf1_total_sec"] == baseline["sf1_total_sec"]  # kept
    est = bench._estimate_sec("sf1", merged)
    assert est == baseline["sf1_total_sec"] * 1.5 + 120.0
    # and the real reader agrees (repo has both files present or not;
    # either way sf1 estimates must come from a record that has them)
    prev = bench._previous_full()
    assert bench._estimate_sec("sf1", prev) < 500.0 or "sf1_total_sec" not in prev


def test_second_main_pass_min_merges_and_records_discipline():
    """r11 verdict task #4: leftover driver budget funds a second main
    child; per-query mins merge (the committed baseline's min-of-N
    discipline inside the driver window), iters sum, and the artifact
    records main_passes/main2_* so the judge sees a min-of-2."""
    import bench

    out = {
        "queries": {"q1": 2.0, "q2": 0.5, "q3": 1.0},
        "iters": {"q1": 2, "q2": 6, "q3": 3},
        "value": 3.5,
    }
    main_res = {"calib_sec": 0.5, "calib_end_sec": 0.7, "work": {"q1": {}}}
    res2 = {
        "queries": {"q1": 1.4, "q2": 0.9, "q3": 1.0},
        "iters": {"q1": 2, "q2": 5, "q3": 3},
        "total": 3.3,
        "calib_sec": 0.6,
        "calib_end_sec": 0.6,
    }
    merged_res = bench.merge_main_pass(out, main_res, res2)
    assert out["queries"] == {"q1": 1.4, "q2": 0.5, "q3": 1.0}
    assert out["value"] == 2.9
    assert out["iters"] == {"q1": 4, "q2": 11, "q3": 6}
    assert out["main_passes"] == 2
    assert out["main2_total_sec"] == 3.3
    # diff re-adjudication input: one effective anchor per pass
    assert merged_res["calib_sec"] == 0.6
    assert merged_res["calib_end_sec"] == 0.6
    assert merged_res["work"] == {"q1": {}}
    # the compact summary surfaces the discipline in the tail window
    c = bench.compact_summary(out | {"metric": "m", "sf": 0.1})
    assert c["main_passes"] == 2 and c["main2_total_sec"] == 3.3


def test_partial_second_pass_picks_flagged_then_slowest_within_budget():
    """r12 verdict task #4: when the full second main pass does not fit
    the leftover budget, a partial min-merged pass runs instead —
    flagged queries first, then the slowest, greedily by estimated
    per-query cost (3.5x best + 1s) after a fixed 150s allowance."""
    import bench

    queries = {f"q{i}": float(i) for i in range(1, 11)}  # 1s..10s
    # plenty of room: everything fits, flagged lead the order
    picked, est = bench.pick_main2_subset(queries, ["q2"], remaining=1000.0)
    assert picked[0] == "q2" and set(picked) == set(queries)
    assert est <= 1000.0
    # tight room: the flagged entry first, then the slowest that fit
    picked, est = bench.pick_main2_subset(queries, ["q2"], remaining=260.0)
    assert picked is not None and picked[0] == "q2"
    assert est <= 260.0 and len(picked) >= 5
    # too tight for a meaningful pass -> None (JVM start dominates)
    picked, est = bench.pick_main2_subset(queries, [], remaining=165.0)
    assert picked is None


def test_main_subset_env_filters_headline_in_order():
    """The child honors SPARK_GRAFT_MAIN_SUBSET while preserving the
    HEADLINE order (the parent sends an arbitrary pick order; the run
    order stays the section's canonical one)."""
    import bench

    want = {"dd7_neardup_clusters", "tpch_q1_pricing_summary"}
    names = [n for n in bench.HEADLINE if n in want]
    assert names == ["tpch_q1_pricing_summary", "dd7_neardup_clusters"]
