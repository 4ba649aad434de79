#!/usr/bin/env python
"""Compare post-execution plan shapes at sf0.1 vs sf1 for the bench's
sf1 section — the evidence behind PLANS.md's "no plan degraded at the
larger size" claim. Prints, per query, the join/exchange operator
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
    df.count()  # execute so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {op: len(re.findall(op, plan)) for op in OPS if op in plan}


def main() -> None:
    from bench import SF1_HEADLINE

    import __spark_entry__ as entry_mod
    from lakerunner_spark.session import get_spark
    from tools.make_sf1 import make_sf1

    spark = get_spark(app_name="check_sf1_plans")
    sf1 = make_sf1(SF01, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".localdata/sf1"))
    qs = entry_mod.queries()
    bad = 0
    for name in SF1_HEADLINE:
        a = shape(qs[name](spark, SF01))
        b = shape(qs[name](spark, sf1))
        note = ""
        if any(k in b for k in ("BroadcastNestedLoopJoin", "CartesianProduct")):
            note, bad = "  <-- UNBOUNDED JOIN AT SF1", bad + 1
        elif a == b:
            note = "  (identical)"
        print(f"{name}: sf0.1={a} sf1={b}{note}")
    print("unbounded-join regressions:", bad)


if __name__ == "__main__":
    main()
