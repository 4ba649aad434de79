"""Rollup-tier selection (SURVEY §4: 'aggregate pushdown to MV').

Reference: the segment lookup picks the best frequency_ms tier for the
query step (queryapi/metrics_evaluator.go:414-550) — the coarsest tier
that still divides the step, so each step bucket re-aggregates the
fewest rows.
"""

from __future__ import annotations

ROLLUP_TIERS_MS = [10_000, 60_000, 300_000, 1_200_000, 3_600_000]


def pick_rollup_tier(step_ms: int, tiers: list[int] | None = None) -> int:
    """Coarsest tier t with t <= step and step % t == 0.

    A step no tier divides (e.g. 15s over a 10s grain) raises: serving
    it from rollups would split tier buckets across step boundaries and
    silently mis-assign samples. The reference can't serve such steps
    from rollups either — its step ladder (queryapi/dates.go:23-42)
    only emits multiples of the 10s grain.
    """
    avail = tiers or ROLLUP_TIERS_MS
    candidates = [t for t in avail if t <= step_ms and step_ms % t == 0]
    if candidates:
        return max(candidates)
    finest = min(avail)
    if finest > step_ms:
        # only coarser-than-step tiers exist: legitimate — each tier
        # bucket lands wholly in one step bucket and the range functions
        # switch to the sparse-cadence semantics (frequency_ms >
        # step) downstream. No re-bucketing, no misalignment.
        return finest
    raise ValueError(
        f"no rollup tier divides step {step_ms}ms (tiers: {avail}); "
        "query raw data or use a step that is a multiple of "
        f"{finest}ms"
    )
