"""RE2 → Java regex interop helpers shared by the PromQL and LogQL
front-ends (SURVEY §7.4.5: LogQL/Prometheus use RE2; Spark executes
Java regex — named-group syntax and replacement-expand rules differ at
the edges).

Replacement expansion is NOT delegated to Java's ``regexp_replace``
replacement parser (which throws on dangling ``$``/out-of-range groups
and greedily mis-parses ``$10`` / ``${1}0``): instead the replacement
string is tokenized here into literals and group indexes, and callers
assemble the expansion as ``concat(lit, regexp_extract(src, pat, i),
...)`` — every token's semantics is decided by THIS code, matching RE2
Expand exactly.
"""

from __future__ import annotations


def scan_groups(pattern: str) -> tuple[int, dict[str, int]]:
    """Scan a regex for capturing groups.

    Returns (count, name -> index). Skips escaped parens and parens
    inside character classes; ``(?P<name>`` (RE2) and ``(?<name>``
    (Java) both count as capturing with a name; other ``(?`` forms
    (non-capturing, lookaround, flags) don't capture.
    """
    n = 0
    names: dict[str, int] = {}
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(":
            rest = pattern[i + 1 :]
            if not rest.startswith("?"):
                n += 1
            elif rest.startswith("?P<") or (
                rest.startswith("?<")
                and not rest.startswith("?<=")
                and not rest.startswith("?<!")
            ):
                n += 1
                j = pattern.find(">", i)
                if j != -1:
                    names[pattern[i + 1 : j].split("<", 1)[1]] = n
        i += 1
    return n, names


def _is_name_char(ch: str) -> bool:
    """Go RE2 Expand name charset: unicode letter, Nd digit, or '_'
    (Python isalpha/isdecimal match Go's IsLetter/IsDigit categories)."""
    return ch.isalpha() or ch.isdecimal() or ch == "_"


def replacement_parts(repl: str, pattern: str) -> list[str | int]:
    """Tokenize an RE2 Expand replacement string against ``pattern``.

    Returns a list of literal strings and capture-group indexes
    (0 = whole match). RE2 Expand rules (Go regexp's ``extract``):
    ``$1``/``$name``/``${name}`` expand groups (a bare ``$name`` takes
    the LONGEST run of name chars — unicode letters/digits/underscore —
    so ``$1foo`` means a group NAMED "1foo", not group 1 + "foo"); a
    numeric ref is ASCII digits only; references to groups that don't
    exist expand to the empty string; ``$$``, a dangling ``$``, and an
    invalid ``${...}`` are literal. Braced numeric refs (``${1}0``)
    stay unambiguous here because the index is resolved at tokenize
    time, never re-parsed by Java.
    """
    ngroups, names = scan_groups(pattern)
    parts: list[str | int] = []

    def lit(s: str) -> None:
        if parts and isinstance(parts[-1], str):
            parts[-1] += s
        elif s:
            parts.append(s)

    i = 0
    while i < len(repl):
        c = repl[i]
        if c != "$":
            lit(c)
            i += 1
            continue
        j = i + 1
        if j < len(repl) and repl[j] == "$":
            lit("$")
            i = j + 1
            continue
        if j < len(repl) and repl[j] == "{":
            k = repl.find("}", j)
            if k == -1:  # unterminated ${ -> literal $
                lit("$")
                i += 1
                continue
            name = repl[j + 1 : k]
            if not name or not all(_is_name_char(ch) for ch in name):
                # invalid ${...}: Go emits only the '$' literally and
                # RE-SCANS from '{' (refs inside the braces still expand)
                lit("$")
                i += 1
                continue
            i = k + 1
        else:
            k = j
            while k < len(repl) and _is_name_char(repl[k]):
                k += 1
            name = repl[j:k]
            i = k
            if not name:  # dangling $ -> literal
                lit("$")
                continue
        if (
            name.isascii()
            and name.isdigit()
            and not (len(name) > 1 and name[0] == "0")
        ):
            # Go treats a leading-zero run ('01') as a NAME, not a number
            idx = int(name)
            if idx <= ngroups:  # $0 = whole match, always valid
                parts.append(idx)
            # out-of-range numeric ref -> empty (RE2 Expand)
        elif name in names:
            parts.append(names[name])
        # unknown named ref -> empty (RE2 Expand)
    return parts


def java_pattern(pattern: str) -> str:
    """Strip group NAMES for Java execution: ``(?P<name>`` / ``(?<name>``
    -> plain capturing ``(``.

    Groups are referenced by index only (``replacement_parts`` resolves
    names via :func:`scan_groups`), and Java restricts group names to
    ``[a-zA-Z][a-zA-Z0-9]*`` — translating an RE2 name containing ``_``
    or starting with a digit would make Pattern.compile throw. Stripping
    is scanner-based (escapes and character classes respected), not a
    blanket replace.
    """
    out: list[str] = []
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            continue
        if c == "(":
            rest = pattern[i + 1 :]
            if rest.startswith("?P<") or (
                rest.startswith("?<")
                and not rest.startswith("?<=")
                and not rest.startswith("?<!")
            ):
                j = pattern.find(">", i)
                if j != -1:
                    out.append("(")
                    i = j + 1
                    continue
        out.append(c)
        i += 1
    return "".join(out)


def expand_replacement(src_col, anchored_pattern: str, repl: str, pattern: str):
    """Build the RE2-Expand result as a Column: concat of literals and
    ``regexp_extract`` group captures against the anchored pattern.
    Only meaningful on rows where the pattern matches (callers gate with
    ``rlike``); on non-matching rows regexp_extract yields "" harmlessly.

    Cost note: one regex execution per distinct group reference (plus
    the caller's rlike) instead of the single regexp_replace this
    replaced — accepted because replacements reference one or two groups
    in practice and Java's replacement parser cannot express RE2's
    out-of-range/longest-name/``${1}0`` semantics safely.
    """
    from pyspark.sql import functions as F

    parts = replacement_parts(repl, pattern)
    if not parts:
        return F.lit("")
    cols = [
        F.lit(p)
        if isinstance(p, str)
        else F.regexp_extract(src_col, java_pattern(anchored_pattern), p)
        for p in parts
    ]
    return F.concat(*cols) if len(cols) > 1 else cols[0]
