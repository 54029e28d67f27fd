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


def duck_round_like_spark(sql: str) -> str:
    """Rewrite every ``round(EXPR, N)`` call in ``sql`` (recursively,
    innermost included) to the decimal-cast form above."""
    out: list[str] = []
    i = 0
    while True:
        j = sql.find("round(", i)
        if j == -1:
            out.append(sql[i:])
            break
        # don't match identifiers ending in 'round' (e.g. bround)
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i : j + 6])
            i = j + 6
            continue
        out.append(sql[i:j])
        k = j + len("round(")
        depth = 1
        while depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        inner = sql[j + 6 : k - 1]
        depth = 0
        split = -1
        for idx, ch in enumerate(inner):
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
            expr = duck_round_like_spark(inner[:split].strip())
            n = inner[split + 1 :].strip()
            out.append(
                f"CAST(round(CAST(CAST(({expr}) AS VARCHAR)"
                f" AS DECIMAL(38,18)), {n}) AS DOUBLE)"
            )
        i = k
    return "".join(out)
