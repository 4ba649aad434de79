"""Loki-conformance sweep: table-driven cases derived from Loki's
documented LogQL semantics (grafana/loki docs + logql package tests;
expectations re-derived by hand). Line-mode cases assert which rows
survive the pipeline; metric-mode cases assert aggregated values.

Divergences from upstream Loki are deliberate and reference-faithful:
range windows evaluate over step buckets (no per-entry timestamps
inside the window), `count_over_time`/`rate` rewrite onto synthetic
per-row values (rewrite_result.go), and the json/logfmt parsers emit
``__error__`` while regexp stays a lenient extractor (as in Loki).
"""

from __future__ import annotations

import math

import pytest

from lakerunner_spark.logql.compiler import (
    LogSource,
    compile_logql,
    compile_logql_lines,
)

STEP = 60_000

LINES = [
    # ts, app, line
    (0, "api", 'level=info msg="GET /users 200" dur=120ms bytes=1024'),
    (1, "api", 'level=error msg="GET /users 500" dur=2.5s bytes=512'),
    (2, "api", 'level=info msg="POST /users 201" dur=80ms bytes=2048'),
    (3, "web", 'level=warn msg="GET /assets 304" dur=5ms bytes=100'),
    (4, "web", '{"level": "error", "route": "/api", "code": 503}'),
]

LINE_CASES = [
    dict(name="contains", q='{app="api"} |= "GET"', keep=[0, 1]),
    dict(name="not_contains", q='{app="api"} != "GET"', keep=[2]),
    dict(
        name="regex_unanchored",
        q='{app="api"} |~ "20[01]"',
        keep=[0, 2],
    ),
    dict(name="not_regex", q='{app="api"} !~ "/users 5.."', keep=[0, 2]),
    dict(
        name="chained_filters_and",
        q='{app="api"} |= "GET" |= "200"',
        keep=[0],
    ),
    dict(
        name="selector_regex_anchored",
        # matcher regexes are fully anchored: "a" must NOT match "api"
        q='{app=~"a"} |= ""',
        keep=[],
    ),
    dict(name="selector_regex_full", q='{app=~"a.*"} != "XYZ"', keep=[0, 1, 2]),
    dict(
        name="logfmt_label_filter",
        q='{app="api"} | logfmt | level = "error"',
        keep=[1],
    ),
    dict(
        name="logfmt_quoted_value",
        q='{app="api"} | logfmt | msg =~ "GET /users .*"',
        keep=[0, 1],
    ),
    dict(
        # regexp parser: named group becomes a label, filterable
        name="regexp_parser_label_filter",
        q='{app="api"} | regexp "msg=\\"(?P<method>GET|POST) " | method = "POST"',
        keep=[2],
    ),
    dict(
        # label_format rename: the new name carries the old value
        name="label_format_rename_filter",
        q='{app="api"} | logfmt | label_format lvl=level | lvl = "error"',
        keep=[1],
    ),
    dict(
        # drop removes the label: a filter on it then compares the
        # empty value (Loki's missing-label convention), keeping none
        name="drop_then_filter_empty",
        q='{app="api"} | logfmt | drop level | level = "error"',
        keep=[],
    ),
    dict(
        name="json_extract_filter",
        q='{app="web"} | json code="$.code" | code = "503"',
        keep=[4],
    ),
    dict(
        name="duration_filter",
        q='{app="api"} | logfmt | dur >= 1s',
        keep=[1],
    ),
    dict(
        name="bytes_filter",
        q='{app=~".+"} | logfmt | bytes > 1000B',
        keep=[0, 2],
    ),
    dict(
        name="numeric_label_filter",
        q='{app="web"} | json code="$.code" | code > 500',
        keep=[4],
    ),
    dict(
        # promtail pack format: _entry replaces the body, other keys
        # become labels; non-packed lines pass through untouched
        name="unpack_filters_on_entry",
        q='{app="web"} | unpack |= "level"',
        keep=[3, 4],  # ts3 logfmt line contains "level"; ts4 json has
        # no _entry so its body (containing "level") passes unchanged
    ),
    dict(
        name="line_format_rewrites_body",
        q='{app="api"} | logfmt | line_format "{{.level}}" |= "error"',
        keep=[1],
    ),
    dict(
        # Loki 3.x `or` chains: any term matches
        name="or_chain_contains",
        q='{app="api"} |= "POST" or "500"',
        keep=[1, 2],
    ),
    dict(
        # negation applies to the WHOLE disjunction: neither term
        name="or_chain_negated",
        q='{app="api"} != "GET" or "POST"',
        keep=[],
    ),
    dict(
        name="or_chain_regex",
        q='{app="api"} |~ "20[01]" or "50." or "XYZ"',
        keep=[0, 1, 2],
    ),
    # label-filter combinators (Loki label filter expressions)
    dict(
        name="label_or",
        q='{app=~".+"} | logfmt | level = "error" or level = "warn"',
        keep=[1, 3],
    ),
    dict(
        name="label_or_mixed_conversions",
        q='{app=~".+"} | logfmt | dur >= 1s or bytes > 1500',
        keep=[1, 2],
    ),
    dict(
        name="label_and",
        q='{app="api"} | logfmt | level = "info" and dur <= 100ms',
        keep=[2],
    ),
    dict(
        name="label_comma_is_and",
        q='{app="api"} | logfmt | level = "info", bytes > 1500',
        keep=[2],
    ),
    dict(
        name="label_mixed_and_or_rejected",
        q='{app="api"} | logfmt | level = "info" or level = "warn" and dur <= 100ms',
        error=True,
    ),
]


METRIC_CASES = [
    dict(
        name="count_over_time",
        q='sum by (app) (count_over_time({app=~".+"} [1m]))',
        at=2 * STEP,
        # only api logged in the [2m, 3m) bucket; web's series has no
        # sample there (absent, not zero)
        expect={("api",): 1.0},
    ),
    dict(
        name="rate_per_second",
        q='rate({app="api"} [2m])',
        at=1 * STEP,
        expect={("api",): 2.0 / 120.0},
    ),
    dict(
        name="bytes_over_time_counts_bytes",
        q='sum(bytes_over_time({app="api"} [1m]))',
        at=0,
        expect={(): float(len(LINES[0][2]))},
    ),
    dict(
        # keep collapses the auto-extracted per-line labels so the
        # three api lines form ONE series and the [3m] window is covered
        # at bucket 2m (coverage gate: reference leaf_node semantics)
        name="unwrap_max",
        q='max(max_over_time({app="api"} | logfmt | keep bytes '
        "| unwrap bytes [3m]))",
        at=2 * STEP,
        expect={(): 2048.0},
    ),
    dict(
        name="unwrap_duration_conv",
        q='max(max_over_time({app="api"} | logfmt | keep dur '
        "| unwrap duration(dur) [3m]))",
        at=2 * STEP,
        expect={(): 2.5},
    ),
    dict(
        # api's series is coverage-complete at bucket 2m ([3m] window
        # spans its first sample); web's is not (first sample at 3m) —
        # so the ranking sees api only
        name="topk_streams",
        q='topk(1, sum by (app) (count_over_time({app=~".+"} [3m])))',
        at=2 * STEP,
        expect={("api",): 3.0},
    ),
    dict(
        name="offset_shifts_window",
        q='sum(count_over_time({app=~".+"} [1m] offset 2m))',
        at=4 * STEP,
        expect={(): 1.0},  # sees ts=2m data at the 4m bucket
    ),
]


def _src(spark):
    import pyspark.sql.functions as F

    rows = [(ts * STEP, app, line) for ts, app, line in LINES]
    df = spark.createDataFrame(
        rows, "chq_timestamp LONG, app STRING, log_message STRING"
    )
    _ = F
    return LogSource(df, ["app"])


@pytest.mark.parametrize("case", LINE_CASES, ids=lambda c: c["name"])
def test_line_conformance(case, spark):
    src = _src(spark)
    if case.get("error"):
        with pytest.raises(ValueError):
            compile_logql_lines(case["q"], src).collect()
        return
    got = sorted(
        r.chq_timestamp // STEP
        for r in compile_logql_lines(case["q"], src).collect()
    )
    assert got == case["keep"], f"{case['name']}: {got} != {case['keep']}"


@pytest.mark.parametrize("case", METRIC_CASES, ids=lambda c: c["name"])
def test_metric_conformance(case, spark):
    import pyspark.sql.functions as F

    src = _src(spark)
    out = compile_logql(case["q"], src, STEP)
    rows = out.filter(F.col("bucket_ts") == case["at"]).collect()
    label_cols = sorted(set(out.columns) - {"bucket_ts", "value"})
    got = {
        tuple(getattr(r, c) for c in label_cols): r.value
        for r in rows
        if r.value is not None
    }
    expect = case["expect"]
    assert set(got) == set(expect), f"{case['name']}: {set(got)} != {set(expect)}"
    for k, v in expect.items():
        assert math.isclose(got[k], v, rel_tol=1e-9), (
            f"{case['name']}[{k}]: {got[k]} != {v}"
        )


# ---- ip()/__error__ sweep (separate fixture so the main LINES set and
# its {app=~".+"} expectations stay untouched) -------------------------

IP_LINES = [
    # ts, app, line
    (0, "net", "conn from 10.1.2.3 ok"),
    (1, "net", "conn from 10.1.2.250 ok"),
    (2, "net", "release v10.1.2.3-build7 deployed"),   # version, not an IP
    (3, "net", "range 10.1.2.3456 scanned"),           # digit-run, not an IP
    (4, "net", "peer 2001:db8::a1 connected"),
    (5, "net", "peer 2001:DB8:0:0::00a2 connected"),   # mixed case, long form
    (6, "net", "peer ::ffff:10.1.2.3 connected"),      # v4-mapped is v6 family
    (7, "net", 'addr="fe80::1" scope local'),
    (8, "net", 'k="unterminated msg v=1'),
    # escaped quotes are VALUE CONTENT (Go string escapes): ts9 has an
    # escaped quote inside a terminated value PLUS an unterminated
    # value — even raw quote count, but go-logfmt errors; ts10 is the
    # clean mirror (escaped quote, properly terminated)
    (9, "net", 'a="x\\"" b="y'),
    (10, "net", 'a="x\\"done" b=2'),
]

IP_LINE_CASES = [
    dict(
        name="ipv4_single",
        q='{app="net"} |= ip("10.1.2.3")',
        keep=[0],  # 2/3 are boundary-rejected, 6 is v6 family
    ),
    dict(
        name="ipv4_cidr",
        q='{app="net"} |= ip("10.1.2.0/24")',
        keep=[0, 1],
    ),
    dict(
        name="ipv4_negated",
        q='{app="net"} != ip("10.0.0.0/8")',
        keep=[2, 3, 4, 5, 6, 7, 8, 9, 10],
    ),
    dict(
        name="ipv6_single_compressed_matches_long_form",
        q='{app="net"} |= ip("2001:db8::a2")',
        keep=[5],
    ),
    dict(
        name="ipv6_cidr",
        q='{app="net"} |= ip("2001:db8::/32")',
        keep=[4, 5],
    ),
    dict(
        name="ipv6_range",
        q='{app="net"} |= ip("2001:db8::a1-2001:db8::a2")',
        keep=[4, 5],
    ),
    dict(
        name="ipv4_mapped_is_v6_family",
        q='{app="net"} |= ip("::ffff:10.1.2.0/120")',
        keep=[6],
    ),
    dict(
        name="ipv6_label_matcher",
        q='{app="net"} | logfmt | addr = ip("fe80::/10")',
        keep=[7],
    ),
    dict(
        name="logfmt_error_selects_malformed",
        q='{app="net"} | logfmt | __error__ != ""',
        keep=[8, 9],
    ),
    dict(
        name="logfmt_error_empty_keeps_clean",
        q='{app="net"} | logfmt | __error__ = ""',
        keep=[0, 1, 2, 3, 4, 5, 6, 7, 10],
    ),
    dict(
        # `or` chain mixing a string term with an ip() term
        name="or_chain_string_and_ip",
        q='{app="net"} |= ip("10.1.2.250") or "release"',
        keep=[1, 2],
    ),
    dict(
        # ts6's ::ffff:10.1.2.3 is v6-FAMILY (v4-mapped), so neither
        # the v4 nor the (non-mapped-range) v6 pattern matches it
        name="or_chain_two_ips_negated",
        q='{app="net"} != ip("10.0.0.0/8") or ip("2001:db8::/32")',
        keep=[2, 3, 6, 7, 8, 9, 10],
    ),
]


@pytest.mark.parametrize("case", IP_LINE_CASES, ids=lambda c: c["name"])
def test_ip_line_conformance(case, spark):
    rows = [(ts * STEP, app, line) for ts, app, line in IP_LINES]
    df = spark.createDataFrame(
        rows, "chq_timestamp LONG, app STRING, log_message STRING"
    )
    src = LogSource(df, ["app"])
    got = sorted(
        r.chq_timestamp // STEP
        for r in compile_logql_lines(case["q"], src).collect()
    )
    assert got == case["keep"], f"{case['name']}: {got} != {case['keep']}"
