"""Rollup-tier selection (SURVEY §4: 'aggregate pushdown to MV').

Reference: the segment lookup picks the best frequency_ms tier for the
query step (queryapi/metrics_evaluator.go:414-550) — the coarsest tier
that still divides the step, so each step bucket re-aggregates the
fewest rows.
"""

from __future__ import annotations

ROLLUP_TIERS_MS = [10_000, 60_000, 300_000, 1_200_000, 3_600_000]


def pick_rollup_tier(step_ms: int, tiers: list[int] | None = None) -> int:
    """Coarsest tier t with t <= step and step % t == 0 (fallback: finest)."""
    candidates = [t for t in (tiers or ROLLUP_TIERS_MS) if t <= step_ms and step_ms % t == 0]
    return max(candidates) if candidates else min(tiers or ROLLUP_TIERS_MS)
