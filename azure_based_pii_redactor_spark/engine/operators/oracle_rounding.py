"""Cross-engine rounding alignment for the DuckDB oracles.

Spark's ``round`` on a DOUBLE goes through ``BigDecimal.valueOf`` --
i.e. it rounds the SHORTEST DECIMAL REPR of the double, HALF_UP.
DuckDB's ``round(double, n)`` is multiply-based, and the ``x * 10^n``
step can drift one ulp across a .5 boundary, flipping the last rounded
digit.  Observed: value sum 3147.6899999999996 / 56 -> avg
56.208749999999995, Spark round(.,4) = 56.2087 (the exact value is
below the half), DuckDB round(.,4) = 56.2088 -- a driver hash mismatch
with both raw doubles bit-identical.

DuckDB's direct double->DECIMAL cast is ALSO float-multiply based
(verified: inconsistent expansions at every scale), so the exact route
is through VARCHAR: ``CAST(double AS VARCHAR)`` emits the shortest
repr, string->DECIMAL parses it exactly, and ``round`` on DECIMAL is
exact HALF_UP.  ``CAST(round(CAST(CAST(x AS VARCHAR) AS
DECIMAL(38,18)), n) AS DOUBLE)`` therefore reproduces Spark's rounding
digit-for-digit (parity spot-checked on 6000 random doubles incl.
negatives and exponent-notation values).  ``duck_round_like_spark``
rewrites every ``round(expr, n)`` in an oracle to that form, so oracle
authors keep writing plain ``round`` and the alignment is applied
uniformly at registration.
"""

from __future__ import annotations


def _iter_unquoted(s: str, start: int = 0):
    """Yield ``(idx, ch)`` for every character of ``s[start:]`` that sits
    OUTSIDE a single-quoted SQL string literal (``''`` inside a literal
    is an escaped quote, not a terminator) and OUTSIDE a ``--`` line
    comment (whose content -- including apostrophes, which would
    otherwise flip the in-literal state and derail everything after --
    is opaque until the newline).  The scanner below uses this so a
    literal containing ``(``, ``)``, ``,`` or the word ``round(`` (e.g.
    ``split(x, '(')``), or a comment like ``-- the builder's filter``,
    can never derail paren matching or the argument split."""
    i, n, in_q = start, len(s), False
    while i < n:
        ch = s[i]
        if in_q:
            if ch == "'":
                if i + 1 < n and s[i + 1] == "'":
                    i += 2  # escaped quote, stay in the literal
                    continue
                in_q = False
        elif ch == "-" and i + 1 < n and s[i + 1] == "-":
            nl = s.find("\n", i)
            i = n if nl == -1 else nl  # resume AT the newline (yielded)
            continue
        elif ch == "'":
            in_q = True
        else:
            yield i, ch
        i += 1


def _strip_comments(s: str) -> str:
    """Excise ``--`` line comments (quote-aware) -- used on the argument
    text of a ``round()`` call before re-embedding it in the generated
    CAST expression, where the original newline that terminated the
    comment would be lost to ``.strip()`` and the comment would swallow
    the rest of the generated line."""
    out: list[str] = []
    i, n, in_q = 0, len(s), False
    while i < n:
        ch = s[i]
        if not in_q and ch == "-" and i + 1 < n and s[i + 1] == "-":
            nl = s.find("\n", i)
            i = n if nl == -1 else nl  # keep the newline itself
            out.append(" ")
            continue
        if in_q:
            if ch == "'":
                if i + 1 < n and s[i + 1] == "'":
                    out.append("''")
                    i += 2
                    continue
                in_q = False
        elif ch == "'":
            in_q = True
        out.append(ch)
        i += 1
    return "".join(out)


def _find_round(sql: str, start: int) -> int:
    """Index of the next un-quoted, non-identifier-suffix ``round(``
    (CASE-INSENSITIVE, like SQL function resolution -- an uppercase
    ``ROUND(`` in an oracle must get the same parity rewrite, not
    silently skip it; ADVICE r5)."""
    for i, ch in _iter_unquoted(sql, start):
        if (
            ch in "rR"
            and sql[i : i + 6].lower() == "round("
            # don't match identifiers ending in 'round' (e.g. bround)
            and not (i > 0 and (sql[i - 1].isalnum() or sql[i - 1] == "_"))
        ):
            return i
    return -1


def duck_round_like_spark(sql: str) -> str:
    """Rewrite every ``round(EXPR, N)`` call in ``sql`` (recursively,
    innermost included) to the decimal-cast form above.  Quote-aware:
    string literals are opaque to the scanner."""
    out: list[str] = []
    i = 0
    while True:
        j = _find_round(sql, i)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        k = -1
        depth = 1
        for idx, ch in _iter_unquoted(sql, j + len("round(")):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    k = idx + 1
                    break
        if k == -1:
            raise ValueError(f"unbalanced parens after round( at {j}: {sql[j:j+80]!r}")
        inner = sql[j + 6 : k - 1]
        split = -1
        depth = 0
        for idx, ch in _iter_unquoted(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                split = idx  # last top-level comma wins
        if split == -1:
            # round(x) with no scale: leave untouched
            out.append(sql[j:k])
        else:
            # comments inside the call are excised before re-embedding:
            # the generated expression is one line, so a surviving '--'
            # would comment out everything after it
            expr = duck_round_like_spark(
                _strip_comments(inner[:split]).strip()
            )
            n = _strip_comments(inner[split + 1 :]).strip()
            out.append(
                f"CAST(round(CAST(CAST(({expr}) AS VARCHAR)"
                f" AS DECIMAL(38,18)), {n}) AS DOUBLE)"
            )
        i = k
    return "".join(out)
