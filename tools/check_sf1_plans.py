#!/usr/bin/env python
"""Compare post-execution plan shapes at sf0.1 vs sf1 (and, with
--sf10, at sf10 for the bench's sf10 decade list) — the evidence behind
PLANS.md's "no plan degraded at the larger size" claim. Prints, per query, the join/exchange operator
multiset at both sizes and flags BNLJ/CartesianProduct appearances or
broadcast->SMJ flips (flips are usually the DESIRED asymptote; they are
reported, not failed)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange",
)


def shape(df) -> dict:
    # NOT count(): count() builds a DIFFERENT QueryExecution (a new
    # agg plan), so this df's own adaptive plan would never finalize
    # and toString would print the INITIAL plan — missing every
    # runtime SMJ<->BHJ re-plan. toLocalIterator() executes THIS
    # QueryExecution while holding at most one partition's rows on
    # the driver — several listed queries emit per-pair/per-doc
    # outputs (dd2 candidates, dd12s delete lists ~198k rows at
    # sf10), so a full collect() would be the exact driver-OOM hazard
    # this tool audits for. (r7 fix: earlier rounds' shapes were
    # static-estimate plans, which still caught size-driven flips but
    # not AQE runtime conversions.)
    for _ in df.toLocalIterator():
        pass
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        "AdaptiveSparkPlan" not in plan or "isFinalPlan=true" in plan
    ), "plan not finalized — shape would be the initial plan"
    return {op: len(re.findall(op, plan)) for op in OPS if op in plan}


def main() -> None:
    from bench import (
        MEDIA_N,
        SECTION_OVERRIDES,
        SF1_HEADLINE,
        SF10_HEADLINE,
        _media_dir,
    )

    import __spark_entry__ as entry_mod
    from lakerunner_spark.session import get_spark
    from tools.make_sf1 import make_sf1

    spark = get_spark(app_name="check_sf1_plans")
    local = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".localdata")
    if "--sf10" in sys.argv:
        big = make_sf1(SF01, os.path.join(local, "sf10"), replicas=100)
        names, tag = SF10_HEADLINE, "sf10"
    else:
        big = make_sf1(SF01, os.path.join(local, "sf1"))
        names, tag = SF1_HEADLINE, "sf1"
    if tag in MEDIA_N:
        # the ddm overrides read the scaled image corpus
        from tools.make_media import make_media

        make_media(MEDIA_N[tag], _media_dir(MEDIA_N[tag]))
    qs = entry_mod.queries()
    # mirror bench: scale-contract overrides (e.g. dd12s's k grows
    # with n) apply on the BIG side; running the registered k=8
    # variant at sf10 would be the mega-cluster quadratic bench.py's
    # SECTION_OVERRIDES exists to avoid
    overrides = SECTION_OVERRIDES.get(tag, {})
    # the engine-wide plan-guard allowlist: BNLJ shapes whose build
    # side is a broadcast 1-row scalar / bounded query set BY DESIGN
    # (tests/test_plan_guards.py documents each) — present at every
    # size, not a scale regression
    from tests.test_plan_guards import NLJ_ALLOWED

    bad = 0
    for name in names:
        a = shape(qs[name](spark, SF01))
        b = shape((overrides.get(name) or qs[name])(spark, big))
        note = ""
        if "CartesianProduct" in b:
            note, bad = f"  <-- CARTESIAN AT {tag.upper()}", bad + 1
        elif "BroadcastNestedLoopJoin" in b:
            if name not in NLJ_ALLOWED:
                note, bad = f"  <-- UNBOUNDED JOIN AT {tag.upper()}", bad + 1
            elif b.get("BroadcastNestedLoopJoin", 0) > a.get(
                "BroadcastNestedLoopJoin", 0
            ):
                # the allowlist covers the by-design shapes present at
                # the SMALL size; a NEW BNLJ appearing only at scale is
                # exactly the regression this audit exists to catch
                note, bad = (
                    f"  <-- NEW BNLJ AT {tag.upper()} (allowlisted query,"
                    f" but the small size has fewer)",
                    bad + 1,
                )
            else:
                note = "  (BNLJ allowlisted: broadcast-bounded by design)"
        elif a == b:
            note = "  (identical)"
        print(f"{name}: sf0.1={a} {tag}={b}{note}")
    print("unbounded-join regressions:", bad)


if __name__ == "__main__":
    main()
