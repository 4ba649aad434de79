"""Skew-resistant aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles joins, but a groupBy with one giant
key still funnels that key's rows through a single reducer. Salting
splits each key into ``salt_n`` subkeys for the first (wide) exchange,
then merges the tiny per-salt partials — the standard remedy when a
telemetry tenant or dedup bucket dominates (SURVEY 'skewed keys hurt').

Only algebraic aggregates are offered (sum/count/min/max — the
engine's rollup core), because they compose across salts exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add across salts
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


# Rows of scan input that justify one spread task. The r12 spread fanned
# EVERY small scan to defaultParallelism tasks regardless of volume; the
# driver's r12 artifact priced that at +93% main-section tasks and a
# measured sf0.1 regression class (dd10/dd12/ds12 — many near-empty
# tasks whose scheduling overhead exceeds the map work they carry).
# Sizing the target by the scan's row count (parquet footer metadata —
# no job, no data read) keeps the sf1/sf10 wins (enough rows -> full
# fan-out) while a tiny fixture gets 2-4 partitions. Both knobs are
# per-task BATCH sizes (how many rows make one task worthwhile), not
# core counts — the core count enters only through the
# defaultParallelism cap, so the sizing stays scale-adaptive. Env
# overrides for cluster tuning; the defaults are measured locally
# (OPTIMIZATION_r13.md #1).
ROWS_PER_PART = int(
    os.environ.get("SPARK_GRAFT_SPREAD_ROWS_PER_PART", "1536")
)
# vector/embedding scans carry ~64 doubles per row and their consumers
# (brute topk folds, k-means assignment) do k*d work per row — a
# smaller batch saturates the cores at one decade lower volume
VEC_ROWS_PER_PART = int(
    os.environ.get("SPARK_GRAFT_SPREAD_VEC_ROWS_PER_PART", "640")
)
# media rows carry whole payloads (KB-MB) and each costs a Python
# decode (~ms per row even vectorized) — a media task earns its keep
# at a few hundred rows
MEDIA_ROWS_PER_PART = int(
    os.environ.get("SPARK_GRAFT_SPREAD_MEDIA_ROWS_PER_PART", "256")
)

# (path, mtime) -> parquet footer row count; footer reads are ~1ms but
# every query construction re-probes its scan
_FOOTER_ROWS: dict[tuple[str, float], int] = {}


def scan_rows(df: DataFrame) -> int | None:
    """Row count of ``df``'s file scan from parquet footer metadata —
    driver-side only, no Spark job, no data pages read. None when the
    relation is not a local parquet file set (in-memory test frames,
    object-store URIs) or the file list is large enough that footer
    probing would itself cost (at that point the scan has plenty of
    partitions and the caller's partition-count check short-circuits
    first anyway)."""
    try:
        files = df.inputFiles()
    except Exception:  # streaming/local relations
        return None
    if not files or len(files) > 64:
        return None
    total = 0
    for uri in files:
        path = uri[7:] if uri.startswith("file://") else uri
        path = path[5:] if path.startswith("file:") else path
        if not os.path.isfile(path):
            return None
        try:
            key = (path, os.path.getmtime(path))
            n = _FOOTER_ROWS.get(key)
            if n is None:
                import pyarrow.parquet as pq  # noqa: PLC0415

                n = pq.ParquetFile(path).metadata.num_rows
                _FOOTER_ROWS[key] = n
            total += n
        except Exception:
            return None
    return total


_SCAN_NODES = frozenset(
    {"Project", "Filter", "SubqueryAlias", "LogicalRelation", "View"}
)


def _scan_like(df: DataFrame) -> bool:
    """True when ``df``'s analyzed plan is a pure scan tree —
    projections/filters/aliases over file relations, nothing else.
    Driver-side metadata walk with early exit; no job, no execution.
    Anything beyond a scan tree (joins, aggregates, generates,
    checkpoints) both mis-maps the footer row count (the relation's
    rows are not the file's rows) and may EXECUTE work under the
    ``.rdd`` partition probe (a broadcast exchange fires during RDD
    construction — the r12 probe bug, re-measured this round on
    txt13's rebuilt corpus: +3 construction jobs for a spread that
    was a no-op anyway)."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() not in _SCAN_NODES:
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return True
    except Exception:  # pragma: no cover - py4j surface drift
        return False


def spread_small_scan(
    df: DataFrame,
    min_parts: int | None = None,
    probe: DataFrame | None = None,
    rows_per_part: int | None = None,
    floor: int = 1,
) -> DataFrame:
    """Round-robin repartition a scan that yields fewer partitions than
    the cluster has cores — otherwise every map operator adjacent to the
    scan (tokenize/hash/explode pipelines) runs on a single task while
    the rest of the cluster idles (the guide's input-skew remedy:
    "repartition immediately after the read").

    Scale-adaptive, not a local[32] constant: the target is
    ``defaultParallelism`` (tracks the session's core count, so the
    driver's low-core bench run sees a proportionally lower target), and
    when the scan already carries at least that many partitions — the
    normal case at production scale, where inputs are many files — this
    is a NO-OP adding no exchange. Only small single-row-group inputs
    (like the bench fixtures) pay the one cheap shuffle of the projected
    columns. Round-robin keeps retry-determinism via Spark's
    sort-before-repartition (on by default, SPARK-23207).

    ``probe``: partition count is read from this DataFrame instead of
    ``df`` when given. Building ``df.rdd`` EXECUTES any broadcast
    exchange inside ``df``'s plan (executeBroadcast fires during RDD
    construction, before any action) — so a caller spreading e.g. the
    pruned side of a broadcast semi-join must pass the underlying pure
    scan-projection as ``probe``; the stream side of such a join keeps
    the scan's partitioning, so the probe's count is the right answer.
    ``df`` itself must only be passed bare when its plan is
    scan+project (no joins, no subqueries).

    Streaming DataFrames pass through untouched: the partition probe
    (``df.rdd``) is illegal on a streaming plan, and a micro-batch's
    partitioning is the stream source's to decide — the spread is a
    batch-scan remedy.

    ``rows_per_part`` (r13): rows of input that justify one task —
    defaults to :data:`ROWS_PER_PART`; vector call sites pass
    :data:`VEC_ROWS_PER_PART`. The target is
    ``min(defaultParallelism, ceil(scan_rows / rows_per_part))`` so a
    tiny fixture stops fanning to every core (the r12 driver's measured
    +93%-tasks regression class) while a scan with a core's worth of
    rows per task still spreads fully. When the row count is unknowable
    (derived/checkpointed/in-memory relation, not a bounded local file
    scan) the spread is a NO-OP: this operator is a small-FILE-SCAN
    remedy, and whoever produced a derived relation already chose its
    partitioning. The earlier cap-only fallback blind-fanned such
    inputs to every core — measured this round shuffling txt13's full
    rebuilt-corpus text payload ahead of a map-side-collapsing
    aggregation (sf1 norm x2.06, sf10 x1.59, +387MB shuffle — the
    guide §2.3 class r12 already reverted once for file scans), and
    re-fanning sim8's already-sized checkpointed corpus inside every
    member operator.

    ``floor``: minimum spread target once the scan is below the cap.
    A caller whose downstream relies on the spread EXCHANGE as an AQE
    reuse boundary (a shared subtree consumed by several branches —
    ds12) passes 2: a single-partition child satisfies every hash
    distribution, so with no exchange anywhere Spark plans the shared
    subtree once PER CONSUMER. The two-partition round-robin of a
    sub-batch input costs microseconds; recomputing the subtree at
    scale does not.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    cap = min_parts or sc.defaultParallelism
    src = probe if probe is not None else df
    target = cap
    rpp = rows_per_part if rows_per_part is not None else ROWS_PER_PART
    if rpp > 0:
        # The scan-likeness gate and row sizing run BEFORE the
        # partition probe: both are driver-only metadata (no job),
        # while src.rdd on a derived plan EXECUTES any broadcast
        # exchange it contains (executeBroadcast fires during RDD
        # construction — the r12 probe bug). A non-scan relation is
        # never sized (footer rows are not its rows) and never
        # .rdd-probed at all.
        if not _scan_like(src):
            return df
        rows = scan_rows(src)
        if rows is None:
            return df
        target = min(cap, max(floor, -(-rows // rpp) or 1))
    cur = src.rdd.getNumPartitions()
    if target <= cur:
        return df
    return df.repartition(target)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) then groupBy(keys).

    ``aggs`` maps output column -> (func, input column), func in
    {sum, count, min, max}. Result is EXACTLY equal to the direct
    groupBy (tested), with the first shuffle's key cardinality
    multiplied by salt_n so no reducer owns a whole hot key.

    The salt is a DETERMINISTIC function of (map partition, row), never
    ``rand()``: a random salt is a nondeterministic shuffle key, and a
    fetch-failure map-stage retry would re-salt rows differently —
    reducers that committed partials from the first attempt then
    double-count (or drop) rows silently. ``spark_partition_id()`` is
    retry-deterministic (the same map partition recomputes with the
    same id) and spreads a hot key across as many salts as the input
    partitions holding it, independent of value cardinality — hashing
    the aggregated columns ALONE collapses to a handful of salts when a
    hot key's values are low-cardinality (e.g. a 0/1 flag under count),
    silently defeating the mitigation. The value-column hash is mixed
    in on top so a single giant input partition still fans out.
    """
    for func, _ in aggs.values():
        if func not in _PARTIAL:
            raise ValueError(f"salted_agg: non-algebraic func {func!r}")
    in_cols = sorted({col for _, col in aggs.values()})
    salted = df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), *[F.col(c) for c in in_cols]),
            salt_n,
        ),
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[func](F.col(col)).alias(out)
            for out, (func, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[func](F.col(out)).alias(out)
            for out, (func, _col) in aggs.items()
        ]
    )
