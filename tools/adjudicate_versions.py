"""Same-window A/B adjudication of a cross-round bench drift.

Three rounds of flag adjudication (r8/r9/r10) plus the r11 dd13/txt12s
question all ended the same way: a wall-clock elevation that repeated
across measurement windows was the MACHINE, not the code. The protocol
that settles it — alternating fresh-JVM probes of the two code
versions within one wall-clock session, so both versions sample the
same noise distribution — lived in ad-hoc scripts until now.

Usage:
    git worktree add /tmp/r9wt <old-commit>
    python tools/adjudicate_versions.py /tmp/r9wt \
        dd13_substring_decontaminate=/root/repo/.localdata/sf1 \
        txt12s_ccnet_sketch_buckets=/root/testdata/sf0.1

Each query=sf_dir pair is probed warm best-of-2 with a same-child
calibration anchor, HEAD and the worktree alternating for three
round-trips. Read the output as per-round-trip normalized ratios: a
code regression shows HEAD/old consistently above the band in EVERY
pairing; ratios straddling 1.0 are environment. (bench_diff's
work-metric counters are the first line of defense; this is the
manual second opinion for wall-only questions against rounds whose
baselines predate the counters.)
"""

from __future__ import annotations

import json
import subprocess
import sys

_CHILD = r'''
import json, sys, time
sys.path.insert(0, sys.argv[1])
from lakerunner_spark.session import get_spark
import __spark_entry__ as m
spark = get_spark(app_name="adjudicate")
qs = m.queries()
pairs = [a.split("=", 1) for a in sys.argv[2:]]
out = {}
def calib():
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(2_000_000_000).selectExpr(
            "sum((id % 100003) * 3 + (id % 13))").collect()
        best = min(best, time.perf_counter() - t0)
    return best
for name, sf in pairs:  # warmup pass first (codegen/broadcast)
    qs[name](spark, sf).count()
out["calib"] = round(calib(), 3)
for name, sf in pairs:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf).count()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print(json.dumps(out))
'''


def probe(repo: str, pairs: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, *pairs],
        capture_output=True,
        text=True,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-500:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    old_repo = sys.argv[1]
    pairs = sys.argv[2:]
    if not pairs:
        raise SystemExit(__doc__)
    rows = []
    for rt in range(int(__import__("os").environ.get(
            "SPARK_GRAFT_ADJUDICATE_TRIPS", "3"))):
        for tag, repo in (("HEAD", "."), ("old", old_repo)):
            r = probe(repo, pairs)
            r["version"], r["rt"] = tag, rt
            rows.append(r)
            print(json.dumps(r), flush=True)
    # per-round-trip normalized HEAD/old ratios
    names = [p.split("=", 1)[0] for p in pairs]
    for name in names:
        ratios = []
        for rt in range(len(rows) // 2):
            h = next(r for r in rows if r["rt"] == rt and r["version"] == "HEAD")
            o = next(r for r in rows if r["rt"] == rt and r["version"] == "old")
            ratios.append(
                round((h[name] / h["calib"]) / (o[name] / o["calib"]), 3)
            )
        print(json.dumps({"query": name, "head_over_old_norm": ratios}))


if __name__ == "__main__":
    main()
