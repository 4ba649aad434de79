"""O4: ordered incremental result emission for range queries.

Reference: the query-api evaluates a range query as time-disjoint
segment-group jobs running in parallel and streams each group's rows
to the caller STRICTLY IN TIME ORDER, starting as soon as the first
group finishes — the client renders the head of the chart while the
tail still computes (queryapi/README.md:96-104,
queryapi/metrics_evaluator.go runOrderedCoordinator: "concat groups
in index order; streams as soon as idx=0 registers").

Spark posture: the engine's batch-complete contract (README ADR
"Batch-complete query results") stands for the correctness gates —
but the same latency behavior is available as a PLAN-SLICING harness,
because the PromQL compiler's start_ms/end_ms make every time slice
an independent, partition-pruned plan with its own lookback widening
(compiler.py: the leaf scans ``start - range_ms`` but emission clips
to [start, end), so concatenated slices equal the one-shot window
exactly). This module is that harness: slice jobs run concurrently on
Spark's scheduler (the reference's computeMaxParallel), results are
yielded in slice order the moment the next-expected slice lands — the
runOrderedCoordinator's pending-map, as a generator.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

from pyspark.sql import DataFrame


def range_slices(
    start_ms: int, end_ms: int, n_slices: int, step_ms: int
) -> list[tuple[int, int]]:
    """Split [start_ms, end_ms) into ``n_slices`` contiguous windows
    aligned DOWN to step boundaries (a bucket belongs to exactly one
    slice; misaligned cuts would emit the boundary bucket twice or
    not at all). The last slice absorbs the remainder."""
    if n_slices < 1:
        raise ValueError("range_slices: n_slices >= 1")
    if end_ms <= start_ms:
        raise ValueError("range_slices: end_ms > start_ms")
    span = end_ms - start_ms
    cuts = [start_ms]
    for i in range(1, n_slices):
        c = start_ms + span * i // n_slices
        if step_ms > 0:
            c -= c % step_ms  # buckets are globally step-aligned
        if c > cuts[-1]:
            cuts.append(c)
    cuts.append(end_ms)
    return [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]


def ordered_slice_results(
    build_slice: Callable[[int, int], DataFrame],
    slices: list[tuple[int, int]],
    max_parallel: int = 3,
) -> Iterator[tuple[int, int, int, list]]:
    """Evaluate ``build_slice(lo, hi)`` for every slice concurrently
    (up to ``max_parallel`` Spark jobs — the reference's
    computeMaxParallel default) and yield ``(idx, lo, hi, rows)``
    STRICTLY in slice order, each the moment the next-expected slice
    completes: slice 0's rows reach the caller while later slices are
    still running. This is runOrderedCoordinator's contract — ordered
    concat over out-of-order completion — with the pending map
    replaced by in-order future waits (a future that completed early
    just returns immediately when its turn comes).

    The per-slice ``.collect()`` is the API emission boundary (result
    rows, already aggregated to chart cardinality), not a compute
    pattern — identical to the one-shot path's final collect, paid
    per slice."""
    if max_parallel < 1:
        raise ValueError("ordered_slice_results: max_parallel >= 1")
    pool = ThreadPoolExecutor(max_workers=max_parallel)
    try:
        futures = [
            pool.submit(lambda lo=lo, hi=hi: build_slice(lo, hi).collect())
            for lo, hi in slices
        ]
        for idx, ((lo, hi), fut) in enumerate(zip(slices, futures)):
            yield idx, lo, hi, fut.result()
    finally:
        # abandonment/latency contract: a consumer that closes the
        # generator early (or a slice that raised) must not block for
        # every queued slice's collect — cancel what hasn't started;
        # already-running Spark jobs finish (collect is not
        # interruptible from here) but at most max_parallel of them.
        pool.shutdown(wait=True, cancel_futures=True)


def build_slice_plan(
    query: str,
    catalog,
    step_ms: int,
    start_ms: int,
    lo: int,
    hi: int,
) -> DataFrame:
    """ONE slice's plan: the PromQL query compiled over [lo, hi) (the
    compiler widens the scan by the selector's range for lookback) with
    the OUTPUT clipped to the slice's own window — lookback rows feed
    the range window, they are never emitted twice. The first slice
    (lo == start_ms) owns the floored opening bucket, because the grid
    floors start to the step; later cuts arrive step-aligned from
    :func:`range_slices`.

    This is the single definition of slice semantics: both the
    ordered-emission harness (:func:`promql_ordered_range`) and the
    driver-gated batch-concat equality entry (queries_frontends.py
    o4_ordered_slices_concat) call it, so the clip/slicing rules
    cannot silently diverge between the gate and the harness."""
    from pyspark.sql import functions as F

    from lakerunner_spark.promql.compiler import compile_promql

    df = compile_promql(query, catalog, step_ms, start_ms=lo, end_ms=hi)
    lo_clip = lo - lo % step_ms if lo == start_ms else lo
    return df.filter(
        (F.col("bucket_ts") >= lo_clip) & (F.col("bucket_ts") < hi)
    )


def logql_ordered_range(
    query: str,
    source,
    step_ms: int,
    start_ms: int,
    end_ms: int,
    n_slices: int,
    max_parallel: int = 3,
) -> Iterator[tuple[int, int, int, list]]:
    """:func:`promql_ordered_range`'s contract for LogQL AGGREGATE
    queries (the reference's evaluator streams logs-plane range
    queries through the same runOrderedCoordinator): each slice
    compiles with its own start/end (logql/compiler.py widens the
    scan by the range for lookback, exactly like the PromQL leaf) and
    clips its OUTPUT to its window. Exactness scope is the PromQL
    one: shapes whose window needs no cross-slice history — window
    <= step (the gate is trivially satisfied), last_over_time — are
    exact; wider gated windows re-warm per slice (the documented O4
    scope)."""
    from pyspark.sql import functions as F

    from lakerunner_spark.logql.compiler import compile_logql

    slices = range_slices(start_ms, end_ms, n_slices, step_ms)

    def build(lo: int, hi: int) -> DataFrame:
        df = compile_logql(query, source, step_ms, start_ms=lo, end_ms=hi)
        lo_clip = lo - lo % step_ms if lo == start_ms else lo
        return df.filter(
            (F.col("bucket_ts") >= lo_clip) & (F.col("bucket_ts") < hi)
        )

    return ordered_slice_results(build, slices, max_parallel)


def ordered_limited_slices(
    build_slice: Callable[[int, int], DataFrame],
    slices: list[tuple[int, int]],
    limit: int,
    max_parallel: int = 2,
) -> Iterator[list]:
    """The exemplar early-stop core shared by the logs and spans
    planes: evaluate ``build_slice(lo, hi)`` (a plan already sorted
    and limited WITHIN its slice) over time-disjoint ``slices`` in the
    given walk order, yield each slice's surviving rows, and STOP —
    cancelling queued slices — the moment ``limit`` rows have been
    emitted. A walk whose first slice already holds ``limit`` matches
    never evaluates the later slices at all: the reference's
    newest-first segment walk with its early exit (querier.go exemplar
    path), which a batch-complete global top-n cannot do. Up to
    ``max_parallel`` later slices prefetch concurrently (bounded
    overfetch: ``limit`` rows per in-flight slice); time-disjoint
    windows mean concatenation preserves the per-slice order
    globally."""
    if limit < 1:
        raise ValueError("ordered_limited_slices: limit >= 1")
    remaining = limit
    gen = ordered_slice_results(build_slice, slices, max_parallel)
    try:
        for _idx, _lo, _hi, rows in gen:
            if not rows:
                continue
            take = rows[:remaining]
            remaining -= len(take)
            yield take
            if remaining <= 0:
                return  # generator close cancels queued slices
    finally:
        gen.close()


def logql_ordered_exemplars(
    query: str,
    source,
    start_ms: int,
    end_ms: int,
    limit: int,
    n_slices: int,
    max_parallel: int = 2,
    tiebreak: list | None = None,
    descending: bool = True,
) -> Iterator[list]:
    """Exemplar streaming with LAZY early stop: the window splits into
    time-disjoint slices walked newest-first (``descending``, the
    default and the reference's exemplar order) or oldest-first, each
    slice's own TakeOrderedAndProject serves up to ``limit`` rows, and
    rows stream to the caller in global time order with the early-stop
    contract of :func:`ordered_limited_slices`."""
    from lakerunner_spark.logql.compiler import compile_logql_exemplar

    slices = range_slices(start_ms, end_ms, n_slices, 1)
    if descending:
        slices = list(reversed(slices))

    def build(lo: int, hi: int) -> DataFrame:
        return compile_logql_exemplar(
            query, source, limit=limit, descending=descending,
            tiebreak=tiebreak, start_ms=lo, end_ms=hi,
        )

    yield from ordered_limited_slices(build, slices, limit, max_parallel)


def build_trace_slice(
    spans: DataFrame,
    trace_id: str,
    lo: int,
    hi: int,
    limit: int,
    descending: bool = True,
) -> DataFrame:
    """ONE slice of a trace lookup: the span table filtered to the
    trace id and the slice's time window, sorted by (chq_timestamp,
    span_id) in the walk direction, limited — a
    TakeOrderedAndProject per slice, so a slice never returns more
    than ``limit`` rows no matter how hot the trace. Module-level (not
    a closure) so tests can count compile calls to prove lazy early
    stop, mirroring the logs plane's compile_logql_exemplar seam."""
    from pyspark.sql import functions as F

    ts, sid = F.col("chq_timestamp"), F.col("span_id")
    order = (
        [ts.desc(), sid.desc()] if descending else [ts.asc(), sid.asc()]
    )
    return (
        spans.filter(
            (F.col("span_trace_id") == trace_id)
            & (ts >= lo)
            & (ts < hi)
        )
        .orderBy(*order)
        .limit(limit)
    )


def spans_ordered_trace(
    spans: DataFrame,
    trace_id: str,
    start_ms: int,
    end_ms: int,
    limit: int,
    n_slices: int,
    max_parallel: int = 2,
    descending: bool = True,
) -> Iterator[list]:
    """O4 on the spans plane: newest-first trace browsing with lazy
    early stop — the reference orders a trace's exemplar spans
    newest-first and stops at the limit (spans_worker_sql.go:85-112
    exemplar ordering); here the trace window splits into time-disjoint
    slices and a trace whose newest slice already holds ``limit``
    spans never evaluates the old slices (the logs plane's
    :func:`logql_ordered_exemplars` contract, same core)."""
    slices = range_slices(start_ms, end_ms, n_slices, 1)
    if descending:
        slices = list(reversed(slices))

    def build(lo: int, hi: int) -> DataFrame:
        return build_trace_slice(
            spans, trace_id, lo, hi, limit, descending=descending
        )

    yield from ordered_limited_slices(build, slices, limit, max_parallel)


def promql_ordered_range(
    query: str,
    catalog,
    step_ms: int,
    start_ms: int,
    end_ms: int,
    n_slices: int,
    max_parallel: int = 3,
) -> Iterator[tuple[int, int, int, list]]:
    """Ordered incremental evaluation of a PromQL range query: the
    window splits into ``n_slices`` step-aligned slices, each compiled
    as an independent partition-pruned plan (the compiler widens the
    scan by the selector's range for lookback), evaluated concurrently
    and emitted strictly in time order. Each slice's OUTPUT is clipped
    to its own window — the lookback rows exist to feed the range
    window, not to be emitted twice.

    Exactness contract: for gate-free shapes — instant vectors (no
    window) and the ungated pair functions irate/idelta (range_agg.py
    keeps them outside the coverage gate; their lag(1) at a slice's
    first bucket is fed by the lookback rows) — the concatenation
    equals the one-shot plan row for row. WINDOWED functions
    (rate/increase/sum_over_time/...) all carry the reference's
    coverage gate ("series must have >= range of history",
    leaf_node.go:357,394) evaluated against the slice's own scan, so
    a sparse series warms up again in each slice's first ``range`` of
    buckets — the same per-group warm-up the reference's evaluator
    has, since runOrderedCoordinator's groups each replay only their
    own segments (metrics_evaluator.go); outside that region sliced
    values are exact (tests/test_ordered_emission.py pins both)."""
    slices = range_slices(start_ms, end_ms, n_slices, step_ms)

    def build(lo: int, hi: int) -> DataFrame:
        return build_slice_plan(query, catalog, step_ms, start_ms, lo, hi)

    return ordered_slice_results(build, slices, max_parallel)
