"""RE2 → Java regex interop helpers shared by the PromQL and LogQL
front-ends (SURVEY §7.4.5: LogQL/Prometheus use RE2; Spark executes
Java regex — named-group syntax and replacement-expand rules differ at
the edges)."""

from __future__ import annotations


def count_capture_groups(pattern: str) -> int:
    """Count capturing groups in a regex (unescaped ``(`` that are not
    ``(?:``/lookaround; ``(?<name>`` and ``(?P<name>`` count)."""
    n = 0
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "(":
            nxt = pattern[i + 1 : i + 2]
            if nxt != "?":
                n += 1
            elif pattern[i + 2 : i + 3] == "P" and pattern[i + 3 : i + 4] == "<":
                n += 1
            elif pattern[i + 2 : i + 3] == "<" and pattern[i + 3 : i + 4] not in (
                "=",
                "!",
            ):
                n += 1
        i += 1
    return n


def re2_replacement_to_java(repl: str, pattern: str) -> str:
    """Translate an RE2 Expand replacement string to Java regexp_replace.

    PromQL's label_replace uses RE2 expansion: ``$1``/``$name``/
    ``${name}`` expand groups (name = longest run of ``[A-Za-z0-9_]``,
    so ``$1foo`` means a group NAMED "1foo", not group 1 + "foo");
    references to groups that don't exist expand to the empty string;
    ``$$`` and a dangling ``$`` are literal. Java's replacement syntax
    instead throws on a dangling ``$`` or an out-of-range group and
    treats ``\\`` as an escape — so each token is rewritten to its safe
    Java equivalent here.
    """
    ngroups = count_capture_groups(pattern)
    out: list[str] = []
    i = 0
    while i < len(repl):
        c = repl[i]
        if c == "\\":
            out.append("\\\\")
            i += 1
            continue
        if c != "$":
            out.append(c)
            i += 1
            continue
        j = i + 1
        if j < len(repl) and repl[j] == "$":
            out.append("\\$")
            i = j + 1
            continue
        if j < len(repl) and repl[j] == "{":
            k = repl.find("}", j)
            if k == -1:  # unterminated ${ -> literal $
                out.append("\\$")
                i += 1
                continue
            name = repl[j + 1 : k]
            i = k + 1
        else:
            k = j
            while k < len(repl) and (repl[k].isalnum() or repl[k] == "_"):
                k += 1
            name = repl[j:k]
            i = k
            if not name:  # dangling $ -> literal
                out.append("\\$")
                continue
        if name.isdigit():
            if int(name) <= ngroups:  # $0 = whole match, always valid
                out.append("$" + name)
            # out-of-range numeric ref -> empty (RE2 Expand)
        elif f"<{name}>" in pattern:
            out.append("${" + name + "}")
        # unknown named ref -> empty (RE2 Expand)
    return "".join(out)
