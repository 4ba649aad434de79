"""Cross-round bench regression comparator.

The dd12 regression (2.74s -> 4.58s, round 6) shipped in a round whose
own BENCH artifact contained the evidence — nobody diffed it against
the previous round. This module automates that diff: bench.py's parent
mode calls :func:`compare_to_previous` with the freshly measured main
section, and any query whose CALIB-NORMALIZED time grew beyond the
threshold lands in the emitted JSON under ``bench_diff``.

Calib normalization is the load-bearing part: whole runs drift ±10-15%
together with VM frequency/steal (bench.py module docstring), so raw
wall-clock ratios cross rounds are noise — query_sec/calib_sec cancels
the uniform drift. The threshold (1.3x) sits above the residual
per-query jitter band; sub-150ms queries are skipped (their relative
jitter exceeds any signal).
"""

from __future__ import annotations

import glob
import json
import os
import re

# flag when calib-normalized time grows beyond this
RATIO_THRESHOLD = 1.3
# ignore queries faster than this (seconds) in the CURRENT run:
# relative jitter on sub-150ms queries exceeds the signal
MIN_CURRENT_SEC = 0.15


def _parse_artifact(path: str) -> dict | None:
    """Extract {queries, calib_sec} from a driver BENCH_r*.json, which
    wraps the bench JSON line as {"tail": ..., "parsed": ...} — tail
    may be TRUNCATED mid-line, so fall back to regex scraping."""
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    sf = doc.get("sf")
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return {
            "queries": parsed["queries"],
            "calib_sec": parsed.get("calib_sec"),
            "sf": parsed.get("sf", sf),
        }
    tail = doc.get("tail") or ""
    # the sf1/sf10 sections repeat MAIN query names at other data
    # sizes, and r7+ artifacts embed a bench_diff block whose
    # prev/cur/norm_ratio numbers would scrape as phantom queries —
    # scrape only the text before the first such marker (tail
    # truncation cuts the FRONT of the line, so the main section may
    # be partial; missing keys just don't compare)
    for marker in ('"bench_diff"', '"sf1_queries"', '"sf10_queries"'):
        cut = tail.find(marker)
        if cut >= 0:
            tail = tail[:cut]
    pairs = re.findall(r'"([A-Za-z0-9_]+)": ([0-9.]+)', tail)
    if not pairs:
        return None
    scraped = {k: float(v) for k, v in pairs}
    calib = scraped.pop("calib_sec", None)
    # meta fields plus bench_diff residue: a FRONT-truncation landing
    # inside the embedded bench_diff block removes the cut marker
    # itself, leaving its per-entry numbers to scrape as phantom
    # queries — drop them by name (no real query is named like these)
    for meta in ("value", "n", "rc", "cpus",
                 "prev", "cur", "norm_ratio", "threshold",
                 "vs_round", "calib_ratio"):
        scraped.pop(meta, None)
    tail_sf = scraped.pop("sf", sf)
    if not scraped:
        return None  # nothing real survived the truncation
    return {"queries": scraped, "calib_sec": calib, "sf": tail_sf}


def find_previous(repo_dir: str, sf=None) -> tuple[int, dict] | None:
    """Latest BENCH_r{N}.json by round number, parsed; None if absent.
    When ``sf`` is given, only artifacts recorded at the same scale
    factor qualify — a sf0.001 smoke must not diff against a sf0.1
    round (everything would compare meaninglessly faster)."""
    best = None
    for path in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            parsed = _parse_artifact(path)
            if not (parsed and parsed["queries"]):
                continue
            if sf is not None and parsed.get("sf") not in (None, sf):
                continue
            best = (rnd, parsed)
    return best


def compare_to_previous(
    queries: dict[str, float],
    calib_sec: float | None,
    repo_dir: str | None = None,
    sf=None,
) -> dict | None:
    """Diff this run's main-section timings against the latest recorded
    round. Returns a summary dict for the bench JSON line (or None when
    no prior artifact exists):

        {"vs_round": N, "calib_ratio": cur/prev,
         "flagged": {name: {"prev": s, "cur": s, "norm_ratio": r}}}

    norm_ratio = (cur/cur_calib) / (prev/prev_calib); > 1.3 flags.
    When either calib is missing the raw ratio is used and marked.
    """
    repo_dir = repo_dir or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = find_previous(repo_dir, sf=sf)
    if prev is None:
        return None
    rnd, art = prev
    prev_q, prev_calib = art["queries"], art["calib_sec"]
    have_calib = bool(calib_sec) and bool(prev_calib)
    calib_ratio = (calib_sec / prev_calib) if have_calib else None
    flagged = {}
    for name, cur in queries.items():
        p = prev_q.get(name)
        if p is None or p <= 0 or cur < MIN_CURRENT_SEC:
            continue
        ratio = (cur / p) / calib_ratio if have_calib else cur / p
        if ratio > RATIO_THRESHOLD:
            flagged[name] = {
                "prev": p,
                "cur": cur,
                "norm_ratio": round(ratio, 3),
            }
    flagged = dict(
        sorted(flagged.items(), key=lambda kv: -kv[1]["norm_ratio"])
    )
    out = {
        "vs_round": rnd,
        "threshold": RATIO_THRESHOLD,
        "calib_normalized": have_calib,
        "flagged": flagged,
    }
    if calib_ratio is not None:
        out["calib_ratio"] = round(calib_ratio, 3)
    return out
