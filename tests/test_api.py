"""API surface tests: every reference route answers, and the HTTP
adapter serves the same handlers over a real socket."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from lakerunner_spark.api import QueryAPI, serve


@pytest.fixture(scope="module")
def api(spark, sf_dir):
    return QueryAPI(spark, sf_dir)


def test_all_routes_answer(api):
    params_by_route = {
        "/api/v1/metrics/tags": {"metric": "events"},
        "/api/v1/metrics/tagvalues": {"metric": "events", "tag": "event_type"},
        "/api/v1/metrics/query": {
            "query": "sum by (event_type) (events)", "step_ms": 3_600_000
        },
        "/api/v1/query_range": {
            "query": "sum by (event_type) (events)", "step": 3600
        },
        "/api/v1/logs/tagvalues": {"tag": "event_type"},
        "/api/v1/logs/query": {"query": '{event_type="error"}', "limit": 5},
        "/api/v1/spans/tagvalues": {"tag": "span_name"},
        "/api/v1/spans/query": {"limit": 5},
        "/api/v1/spans/trace": {"trace_id": "_none_"},
        "/api/v1/promql/validate": {"query": "rate(events[5m])"},
        "/api/v1/logql/validate": {"query": '{a="b"} |= "x"'},
    }
    for route in QueryAPI.ROUTES:
        out = api.handle(route, params_by_route.get(route))
        assert isinstance(out, dict) and out, route


def test_metrics_query_shape(api):
    out = api.metrics_query(
        {"query": "sum by (event_type) (events)", "step_ms": 3_600_000}
    )
    assert out["step_ms"] == 3_600_000
    assert out["result"]
    s = out["result"][0]
    assert set(s["labels"]) == {"event_type"}
    assert all(len(v) == 2 for v in s["values"])
    ts = [v[0] for v in s["values"]]
    assert ts == sorted(ts)


def test_logs_query_exemplar_vs_aggregate(api):
    ex = api.logs_query({"query": '{event_type="error"}', "limit": 7})
    assert len(ex["streams"]) == 7
    agg = api.logs_query(
        {
            "query": 'sum by (event_type) (count_over_time({event_type="error"}[10m]))',
            "step_ms": 600_000,
        }
    )
    assert agg["result"] and "value" in agg["result"][0]


def test_validate_rejects_bad_queries(api):
    assert api.promql_validate({"query": "sum by ((("})["valid"] is False
    assert api.promql_validate({"query": "a / group_left b"})["valid"] is False
    assert api.logql_validate({"query": "rate({a='b'})"})["valid"] is False


def test_step_ladder_applied(api):
    out = api.metrics_query(
        {
            "query": "sum by (event_type) (events)",
            "start_ms": 1_704_067_200_000,
            "end_ms": 1_704_067_200_000 + 2 * 3_600_000,
        }
    )
    assert out["step_ms"] == 60_000  # <=12h -> 1m ladder rung


def test_http_adapter_round_trip(api):
    server = serve(api, port=18321)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, params):
            req = urllib.request.Request(
                f"http://127.0.0.1:18321{path}",
                data=json.dumps(params).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())

        code, out = post("/api/v1/ping", {})
        assert code == 200 and out == {"status": "ok"}
        code, out = post(
            "/api/v1/metrics/query",
            {"query": "sum by (event_type) (events)", "step_ms": 3_600_000},
        )
        assert code == 200 and out["result"]
        # unknown route -> 404
        req = urllib.request.Request("http://127.0.0.1:18321/nope", data=b"{}")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # bad promql -> 400
        req = urllib.request.Request(
            "http://127.0.0.1:18321/api/v1/metrics/query",
            data=json.dumps({"query": "((("}).encode(),
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_missing_param_is_400_not_404(api):
    server = serve(api, port=18322)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:18322/api/v1/metrics/query", data=b"{}"
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            # missing 'query' param: client error, NOT route-miss
            assert e.code == 400
            assert "missing parameter" in json.loads(e.read())["error"]
    finally:
        server.shutdown()


def test_step_ladder_applies_at_epoch_zero(api):
    """start_ms=0 is a legitimate epoch value; the falsy-zero check
    used to silently fall back to a hardcoded 60s step."""
    out = api.metrics_query(
        {
            "query": "sum by (event_type) (events)",
            "start_ms": 0,
            "end_ms": 3_600_000,
        }
    )
    assert out["step_ms"] == 10_000  # <=65m rung, not the 60s fallback


def test_prometheus_query_range_shape(api):
    """The /api/v1/query_range shim renders the Prometheus wire format:
    matrix resultType, [sec, "str"] sample pairs, per-series metric
    label objects — and accepts Prometheus-style second-based params."""
    out = api.handle(
        "/api/v1/query_range",
        {
            "query": 'sum by (event_type) (rate(events[5m]))',
            "start": 0,
            "end": 10**10,
            "step": 60,
        },
    )
    assert out["status"] == "success"
    assert out["data"]["resultType"] == "matrix"
    result = out["data"]["result"]
    assert result, "expected at least one series"
    for series in result:
        assert set(series["metric"]) == {"event_type"}
        for ts, v in series["values"]:
            assert isinstance(ts, float) and isinstance(v, str)
            float(v)  # parseable sample value
        assert series["values"] == sorted(series["values"])


def test_http_adapter_serves_prometheus_client_shapes(api):
    """Real Prometheus clients send GET with a query string (duration
    step, RFC3339 start) or POST form bodies; both must reach the
    query_range handler through the HTTP adapter, and bad queries get
    the Prometheus error envelope."""
    import http.client
    import json as _json
    import threading
    from urllib.parse import urlencode

    srv = serve(api, port=0)  # ephemeral port
    try:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        qs = urlencode({
            "query": "sum by (event_type) (events)",
            "start": "1970-01-01T00:00:00Z",
            "end": 10**10,
            "step": "1h",
        })
        conn.request("GET", f"/api/v1/query_range?{qs}")
        resp = conn.getresponse()
        out = _json.loads(resp.read())
        assert resp.status == 200 and out["status"] == "success"
        assert out["data"]["result"], out

        body = urlencode({"query": "rate(events[5m]", "step": "60"})
        conn.request(
            "POST", "/api/v1/query_range", body,
            {"Content-Type": "application/x-www-form-urlencoded"},
        )
        resp = conn.getresponse()
        out = _json.loads(resp.read())
        assert out["status"] == "error" and out["errorType"] == "bad_data"
        conn.close()
    finally:
        srv.shutdown()


def test_spans_trace_lookup(api):
    """The trace endpoint returns every span of the requested trace,
    time-ordered, and an unknown id yields an empty span list."""
    # pick a real trace id from the synthetic view
    from lakerunner_spark.queries_spans import _traced_spans

    tid = (
        _traced_spans(api.spark, api.sf_dir)
        .limit(1)
        .collect()[0]
        .span_trace_id
    )
    out = api.handle("/api/v1/spans/trace", {"trace_id": tid})
    assert out["trace_id"] == tid and out["spans"]
    ts = [s["chq_timestamp"] for s in out["spans"]]
    assert ts == sorted(ts)
    assert all(s["span_trace_id"] == tid for s in out["spans"])
    empty = api.handle("/api/v1/spans/trace", {"trace_id": "_none_"})
    assert empty["spans"] == []
