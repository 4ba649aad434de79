"""LogQL recursive-descent parser -> AST.

Covers the reference's supported surface (logql/parser.go:182-543):
stream selectors, line filters (|= != |~ !~), json/logfmt/regexp
parser stages, label filters (string + numeric), unwrap (plain /
duration() / bytes()), range aggregations (A10 family:
count_over_time, rate, bytes_over_time, bytes_rate, and the unwrap
aggs sum/avg/min/max/last_over_time), and an optional outer vector
aggregation with by/without (sum/avg/min/max/count/topk/bottomk).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from lakerunner_spark.promql.parser import parse_duration_ms

LOG_RANGE_FUNCS = {
    "count_over_time", "rate", "bytes_over_time", "bytes_rate",
    "sum_over_time", "avg_over_time", "min_over_time", "max_over_time",
    "last_over_time", "rate_counter",
    # extensions (Loki ops beyond the reference's rewriter):
    "first_over_time", "stddev_over_time", "stdvar_over_time",
    "quantile_over_time",
}
VECTOR_AGG_OPS = {"sum", "avg", "min", "max", "count", "topk", "bottomk"}
_UNWRAP_AGGS = {"sum_over_time", "avg_over_time", "min_over_time",
                "max_over_time", "last_over_time", "rate_counter",
                "first_over_time", "stddev_over_time", "stdvar_over_time",
                "quantile_over_time"}


@dataclass
class LabelMatcher:
    label: str
    op: str  # = != =~ !~
    value: str


@dataclass
class LineFilter:
    op: str  # |= != |~ !~ |> !>
    needle: str
    # True for `|= ip("...")` / `!= ip("...")`: needle is the ip()
    # pattern and the line matches when ANY address it contains is
    # inside the cidr/range/single-address pattern
    is_ip: bool = False
    # Loki `or` chains (`|= "a" or "b" or ip("...")`): extra terms
    # OR-composed with the head needle under the head's op class;
    # negated ops negate the whole disjunction (Loki semantics).
    # Each entry is ("ip"|"str", value).
    ors: list = field(default_factory=list)


@dataclass
class JsonStage:
    mappings: dict[str, str]  # out column -> $.path


@dataclass
class LogfmtStage:
    keys: list[str]


@dataclass
class RegexpStage:
    pattern: str           # java-regex with numbered groups
    groups: dict[str, int]  # out column -> group index


@dataclass
class LabelFilter:
    label: str
    op: str  # = != =~ !~ > >= < <=
    value: str | float
    # "" plain; "duration"/"bytes": value is seconds/bytes and the LABEL
    # value is unit-parsed before comparing (Loki duration/bytes label
    # filters); "ip": value is an ip()-matcher pattern (cidr/range/
    # single) tested against the label value
    conv: str = ""


@dataclass
class LabelFilterOr:
    """Loki label-filter disjunction: ``| dur >= 20ms or size == 20kb``
    — the row passes when ANY predicate holds (each predicate carries
    its own op, including negations)."""

    terms: list  # list[LabelFilter]


@dataclass
class Unwrap:
    label: str
    conv: str  # "" | "duration" | "bytes"


@dataclass
class KeepStage:
    labels: list[str]


@dataclass
class DropStage:
    labels: list[str]


@dataclass
class LabelFormatStage:
    # out -> source label name (rename) or template string with {{.x}}
    assignments: list[tuple[str, str, bool]]  # (out, value, is_template)


@dataclass
class LineFormatStage:
    template: str  # with {{.label}} placeholders


@dataclass
class UnpackStage:
    """``| unpack``: promtail pack format (extension; neither the
    reference nor its parser handle it) — the line is a JSON object
    whose ``_entry`` key holds the original log line; every other key
    becomes a label and the line body is replaced by ``_entry``."""


@dataclass
class DecolorizeStage:
    """``| decolorize``: strip ANSI SGR color sequences from the line
    (accepted by the reference pipeline parser, logql/parser.go:677)."""


@dataclass
class LabelReplaceStage:
    """``| label_replace(dst, "replacement", src, "regex")`` inside a log
    pipeline (reference parser accepts label_replace as a pipeline stage,
    logql/parser.go:677); PromQL label_replace semantics applied per row."""

    dst: str
    repl: str
    src: str
    regex: str


@dataclass
class LogLeaf:
    """Selector + ordered pipeline (logql/exec_planner.go:60-82 LogLeaf)."""

    matchers: list[LabelMatcher] = field(default_factory=list)
    stages: list = field(default_factory=list)  # LineFilter/JsonStage/.../LabelFilter
    unwrap: Unwrap | None = None
    range_ms: int | None = None
    # `[5m] offset 1m` — evaluate against data shifted back by offset
    # (logql/exec_planner.go:71 Offset)
    offset_ms: int = 0


@dataclass
class LogRangeAgg:
    fn: str
    leaf: LogLeaf
    param: float | None = None  # q for quantile_over_time


@dataclass
class LogVectorAgg:
    op: str
    inner: "LogRangeAgg | LogVectorAgg"
    by: list[str] | None = None
    without: list[str] | None = None
    param: float | None = None  # k for topk/bottomk


_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<BYTES>\d+(?:\.\d+)?(?i:[kmgtpe]i?b|b))
  | (?P<DUR>(?:\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h|d|w))+)
  | (?P<NUM>\d+\.\d+|\d+|\.\d+)
  | (?P<ID>[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<STR>"(?:\\.|[^"\\])*"|`[^`]*`)
  | (?P<OP>\|=|\|~|\|>|!=|!~|!>|=~|>=|<=|==|[-(){}\[\],=|><])
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str


def _tokenize(q: str) -> list[_Tok]:
    toks, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            raise ValueError(f"logql: unexpected char {q[pos]!r} at {pos}")
        pos = m.end()
        if m.lastgroup == "WS":
            continue
        toks.append(_Tok(m.lastgroup, m.group()))
    toks.append(_Tok("EOF", ""))
    return toks


def _unquote(s: str) -> str:
    if s.startswith("`"):
        return s[1:-1]
    # see promql/parser.py _unquote: latin-1 + backslashreplace keeps
    # non-ASCII intact while decoding escape sequences
    return (
        s[1:-1].encode("latin-1", "backslashreplace").decode("unicode_escape")
    )


def _translate_named_groups(pattern: str) -> tuple[str, dict[str, int]]:
    """RE2 ``(?P<name>...)`` -> numbered groups + name->index map.

    Regex-dialect bridge (SURVEY §7.4 item 5): capture-group *names*
    are the only RE2 feature the pipeline needs that Java spells
    differently; extraction is by index on both engines. Delegates to
    the shared scanner (functions/regexops), which — unlike a regex
    rewrite — does not miscount escaped parens or parens inside
    character classes as capture groups.
    """
    from lakerunner_spark.functions.regexops import java_pattern, scan_groups

    _, names = scan_groups(pattern)
    return java_pattern(pattern), dict(names)


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> _Tok:
        t = self.next()
        if t.text != text:
            raise ValueError(f"logql: expected {text!r}, got {t.text!r}")
        return t

    def parse_query(self):
        t = self.peek()
        if t.kind == "ID" and t.text in VECTOR_AGG_OPS:
            return self._parse_vector_agg()
        if t.kind == "ID" and t.text in LOG_RANGE_FUNCS:
            return self._parse_range_agg()
        return self._parse_leaf()

    def _parse_vector_agg(self) -> LogVectorAgg:
        op = self.next().text
        by = without = None
        if self.peek().text in ("by", "without"):
            kw = self.next().text
            labels = self._label_list()
            by, without = (labels, None) if kw == "by" else (None, labels)
        self.expect("(")
        param = None
        if self.peek().kind == "NUM":
            param = float(self.next().text)
            self.expect(",")
        inner_tok = self.peek()
        if inner_tok.kind == "ID" and inner_tok.text in VECTOR_AGG_OPS:
            # nested vector aggregation (Loki: topk(1, sum by (x) (...)))
            inner = self._parse_vector_agg()
        elif inner_tok.kind == "ID" and inner_tok.text in LOG_RANGE_FUNCS:
            inner = self._parse_range_agg()
        else:
            raise ValueError(
                "logql: vector agg must wrap a range or vector aggregation"
            )
        self.expect(")")
        if by is None and without is None and self.peek().text in ("by", "without"):
            kw = self.next().text
            labels = self._label_list()
            by, without = (labels, None) if kw == "by" else (None, labels)
        if op in ("topk", "bottomk") and param is None:
            raise ValueError(f"logql: {op} requires a parameter")
        return LogVectorAgg(op, inner, by=by, without=without, param=param)

    def _parse_range_agg(self) -> LogRangeAgg:
        fn = self.next().text
        self.expect("(")
        param = None
        if fn == "quantile_over_time":
            t = self.next()
            if t.kind != "NUM":
                raise ValueError(
                    "logql: quantile_over_time(q, selector | unwrap x [range])"
                )
            param = float(t.text)
            if not 0.0 <= param <= 1.0:
                # out-of-range q would index past the sample array at
                # execution (ANSI error); reject at parse time instead
                raise ValueError("logql: quantile_over_time q must be in [0, 1]")
            self.expect(",")
        leaf = self._parse_leaf()
        self.expect(")")
        if leaf.range_ms is None:
            raise ValueError(f"logql: {fn} requires a [range]")
        if fn in _UNWRAP_AGGS and leaf.unwrap is None:
            raise ValueError(f"logql: {fn} requires an unwrap stage")
        # rate over an unwrapped range IS valid Loki ("per second rate of
        # the sum of all values in the interval"); the reference likewise
        # rewrites unwrapped rates onto the PromQL rate path
        # (rewrite_result.go:73). The count/bytes forms take lines only.
        if fn in ("count_over_time", "bytes_over_time", "bytes_rate") \
                and leaf.unwrap is not None:
            raise ValueError(f"logql: {fn} does not take an unwrap")
        return LogRangeAgg(fn, leaf, param=param)

    def _label_list(self) -> list[str]:
        self.expect("(")
        labels = []
        while self.peek().text != ")":
            t = self.next()
            if t.kind != "ID":
                raise ValueError(f"logql: expected label, got {t.text!r}")
            labels.append(t.text)
            if self.peek().text == ",":
                self.next()
        self.expect(")")
        return labels

    def _parse_or_terms(self, lf: LineFilter) -> None:
        """Loki `or` chains after a line filter: `|= "a" or "b" or
        ip("...")` — extra terms join the head filter's disjunction
        (negated ops negate the whole disjunction)."""
        while self.peek().kind == "ID" and self.peek().text == "or":
            self.next()
            t = self.next()
            if t.kind == "ID" and t.text == "ip" and self.peek().text == "(":
                if lf.op not in ("|=", "!="):
                    raise ValueError(
                        "logql: ip() line filter supports |= and != only"
                    )
                self.next()
                pat = self.next()
                if pat.kind != "STR":
                    raise ValueError("logql: ip() takes a quoted pattern")
                self.expect(")")
                lf.ors.append(("ip", _unquote(pat.text)))
            elif t.kind == "STR":
                lf.ors.append(("str", _unquote(t.text)))
            else:
                raise ValueError(
                    "logql: line filter `or` needs a string or ip(), "
                    f"got {t.text!r}"
                )

    def _parse_leaf(self) -> LogLeaf:
        leaf = LogLeaf()
        self.expect("{")
        while self.peek().text != "}":
            label = self.next()
            if label.kind != "ID":
                raise ValueError(f"logql: expected label, got {label.text!r}")
            op = self.next().text
            if op not in ("=", "!=", "=~", "!~"):
                raise ValueError(f"logql: bad matcher op {op!r}")
            val = self.next()
            if val.kind != "STR":
                raise ValueError("logql: matcher value must be a string")
            leaf.matchers.append(LabelMatcher(label.text, op, _unquote(val.text)))
            if self.peek().text == ",":
                self.next()
        self.expect("}")

        while True:
            t = self.peek()
            if t.text in ("|=", "|~", "|>", "!>"):
                self.next()
                needle = self.next()
                if (
                    needle.kind == "ID"
                    and needle.text == "ip"
                    and self.peek().text == "("
                ):
                    if t.text != "|=":
                        raise ValueError(
                            "logql: ip() line filter supports |= and != only"
                        )
                    self.next()
                    pat = self.next()
                    if pat.kind != "STR":
                        raise ValueError("logql: ip() takes a quoted pattern")
                    self.expect(")")
                    lf = LineFilter("|=", _unquote(pat.text), is_ip=True)
                    leaf.stages.append(lf)
                    self._parse_or_terms(lf)
                    continue
                if needle.kind != "STR":
                    raise ValueError(
                        f"logql: line filter {t.text} needs a string, "
                        f"got {needle.text!r}"
                    )
                lf = LineFilter(t.text, _unquote(needle.text))
                leaf.stages.append(lf)
                self._parse_or_terms(lf)
            elif t.text in ("!=", "!~") and (
                self.toks[self.i + 1].kind == "STR"
                or (
                    t.text == "!="
                    and self.toks[self.i + 1].kind == "ID"
                    and self.toks[self.i + 1].text == "ip"
                    and self.toks[self.i + 2].text == "("
                )
            ):
                self.next()
                needle = self.next()
                if needle.kind == "ID" and needle.text == "ip":
                    self.next()
                    pat = self.next()
                    if pat.kind != "STR":
                        raise ValueError("logql: ip() takes a quoted pattern")
                    self.expect(")")
                    lf = LineFilter("!=", _unquote(pat.text), is_ip=True)
                    leaf.stages.append(lf)
                    self._parse_or_terms(lf)
                else:
                    lf = LineFilter(t.text, _unquote(needle.text))
                    leaf.stages.append(lf)
                    self._parse_or_terms(lf)
            elif t.text == "|":
                self.next()
                self._parse_pipe_stage(leaf)
            elif t.text == "[":
                self.next()
                dur = self.next()
                if dur.kind != "DUR":
                    raise ValueError(f"logql: expected duration, got {dur.text!r}")
                self.expect("]")
                leaf.range_ms = parse_duration_ms(dur.text)
                if self.peek().text == "offset":
                    self.next()
                    off = self.next()
                    if off.kind != "DUR":
                        raise ValueError(
                            f"logql: expected duration after offset, got {off.text!r}"
                        )
                    leaf.offset_ms = parse_duration_ms(off.text)
                return leaf
            else:
                return leaf

    def _parse_pipe_stage(self, leaf: LogLeaf) -> None:
        t = self.next()
        if t.text == "json":
            # empty mappings = auto-discovery mode (worker_sql.go:455-530)
            mappings: dict[str, str] = {}
            while self.peek().kind == "ID":
                out = self.next().text
                if self.peek().text == "=":
                    self.next()
                    path = _unquote(self.next().text)
                else:
                    path = f"$.{out}"
                mappings[out] = path
                if self.peek().text == ",":
                    self.next()
            leaf.stages.append(JsonStage(mappings))
            return
        if t.text == "logfmt":
            # empty keys = auto-discovery mode
            keys = []
            while self.peek().kind == "ID":
                keys.append(self.next().text)
                if self.peek().text == ",":
                    self.next()
            leaf.stages.append(LogfmtStage(keys))
            return
        if t.text == "regexp":
            pat = self.next()
            if pat.kind != "STR":
                raise ValueError("logql: | regexp takes a pattern string")
            translated, groups = _translate_named_groups(_unquote(pat.text))
            if not groups:
                raise ValueError("logql: | regexp needs named capture groups")
            leaf.stages.append(RegexpStage(translated, groups))
            return
        if t.text == "pattern":
            tmpl = self.next()
            if tmpl.kind != "STR":
                raise ValueError("logql: | pattern takes a template string")
            from lakerunner_spark.logql.stages import pattern_to_regex

            translated, groups = pattern_to_regex(_unquote(tmpl.text))
            leaf.stages.append(RegexpStage(translated, groups))
            return
        if t.text == "decolorize":
            leaf.stages.append(DecolorizeStage())
            return
        if t.text == "label_replace":
            self.expect("(")
            dst = self.next()
            if dst.kind != "ID":
                raise ValueError("logql: label_replace(dst, \"repl\", src, \"regex\")")
            self.expect(",")
            repl = self.next()
            if repl.kind != "STR":
                raise ValueError("logql: label_replace replacement must be a string")
            self.expect(",")
            src = self.next()
            if src.kind != "ID":
                raise ValueError("logql: label_replace src must be a label name")
            self.expect(",")
            regex = self.next()
            if regex.kind != "STR":
                raise ValueError("logql: label_replace regex must be a string")
            self.expect(")")
            leaf.stages.append(
                LabelReplaceStage(
                    dst.text, _unquote(repl.text), src.text, _unquote(regex.text)
                )
            )
            return
        if t.text in ("keep", "drop", "keep_labels", "drop_labels"):
            labels = []
            while self.peek().kind == "ID":
                labels.append(self.next().text)
                if self.peek().text == ",":
                    self.next()
            if not labels:
                raise ValueError(f"logql: | {t.text} requires labels")
            leaf.stages.append(
                KeepStage(labels)
                if t.text in ("keep", "keep_labels")
                else DropStage(labels)
            )
            return
        if t.text == "label_format":
            assignments: list[tuple[str, str, bool]] = []
            while self.peek().kind == "ID":
                out = self.next().text
                self.expect("=")
                v = self.next()
                if v.kind == "STR":
                    assignments.append((out, _unquote(v.text), True))
                elif v.kind == "ID":
                    assignments.append((out, v.text, False))
                else:
                    raise ValueError("logql: label_format value must be a "
                                     "label or template string")
                if self.peek().text == ",":
                    self.next()
            if not assignments:
                raise ValueError("logql: | label_format requires assignments")
            leaf.stages.append(LabelFormatStage(assignments))
            return
        if t.text == "line_format":
            v = self.next()
            if v.kind != "STR":
                raise ValueError("logql: | line_format takes a template string")
            leaf.stages.append(LineFormatStage(_unquote(v.text)))
            return
        if t.text == "unpack":
            leaf.stages.append(UnpackStage())
            return
        if t.text == "unwrap":
            nxt = self.next()
            if nxt.kind != "ID":
                raise ValueError("logql: | unwrap <label>")
            if nxt.text in ("duration", "bytes") and self.peek().text == "(":
                self.next()
                label = self.next().text
                self.expect(")")
                leaf.unwrap = Unwrap(label, nxt.text)
            else:
                leaf.unwrap = Unwrap(nxt.text, "")
            return
        # label filter stage: one predicate, an `or` disjunction, or an
        # `and`/`,` conjunction (Loki label filter expressions; mixing
        # and/or in one stage is rejected — write conjunctions as
        # separate `|` stages)
        if t.kind == "ID":
            first = self._label_predicate(t.text)
            is_or = self.peek().kind == "ID" and self.peek().text == "or"
            if is_or:
                terms = [first]
                while self.peek().kind == "ID" and self.peek().text == "or":
                    self.next()
                    nt = self.next()
                    if nt.kind != "ID":
                        raise ValueError(
                            "logql: label filter `or` needs a predicate"
                        )
                    terms.append(self._label_predicate(nt.text))
                if self._peek_is_and():
                    raise ValueError(
                        "logql: mixed and/or in one label filter stage — "
                        "write the conjunction as separate `|` stages"
                    )
                leaf.stages.append(LabelFilterOr(terms))
                return
            leaf.stages.append(first)
            while self._peek_is_and():
                self.next()
                nt = self.next()
                if nt.kind != "ID":
                    raise ValueError(
                        "logql: label filter `and` needs a predicate"
                    )
                # conjunction == sequential filters
                leaf.stages.append(self._label_predicate(nt.text))
                if self.peek().kind == "ID" and self.peek().text == "or":
                    raise ValueError(
                        "logql: mixed and/or in one label filter stage — "
                        "write the conjunction as separate `|` stages"
                    )
            return
        raise ValueError(f"logql: unsupported stage {t.text!r}")

    def _peek_is_and(self) -> bool:
        return self.peek().text == "," or (
            self.peek().kind == "ID" and self.peek().text == "and"
        )

    def _label_predicate(self, name: str) -> LabelFilter:
        """One ``k <op> value`` label-filter predicate (value may be a
        string, number, duration/bytes literal, or ip() pattern)."""
        op = self.next().text
        if op not in ("=", "==", "!=", "=~", "!~", ">", ">=", "<", "<="):
            raise ValueError(f"logql: bad label filter op {op!r}")
        v = self.next()
        if v.kind == "ID" and v.text == "ip" and self.peek().text == "(":
            if op not in ("=", "!="):
                raise ValueError(
                    "logql: ip() label matcher supports = and != only"
                )
            self.next()
            pat = self.next()
            if pat.kind != "STR":
                raise ValueError("logql: ip() takes a quoted pattern")
            self.expect(")")
            return LabelFilter(name, op, _unquote(pat.text), conv="ip")
        if v.kind == "STR":
            return LabelFilter(name, op, _unquote(v.text))
        if v.kind == "NUM":
            return LabelFilter(name, op, float(v.text))
        if v.kind == "DUR":
            from lakerunner_spark.promql.parser import parse_duration_s

            return LabelFilter(name, op, parse_duration_s(v.text), conv="duration")
        if v.kind == "BYTES":
            from lakerunner_spark.promql.parser import parse_bytes

            return LabelFilter(name, op, parse_bytes(v.text), conv="bytes")
        raise ValueError(f"logql: bad label filter value {v.text!r}")


def parse_logql(query: str):
    """Parse a LogQL query into LogLeaf / LogRangeAgg / LogVectorAgg."""
    p = _Parser(_tokenize(query))
    node = p.parse_query()
    if p.peek().kind != "EOF":
        raise ValueError(f"logql: trailing input at {p.peek().text!r}")
    return node
