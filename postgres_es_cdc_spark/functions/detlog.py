"""Cross-engine-deterministic natural log of an integer ratio.

libm's ``ln`` is NOT correctly rounded, so Spark (Java ``Math.log``) and
DuckDB (C ``log``) can disagree in the last ulps — which breaks
hash-compared oracles (see docs_term_frequency's no-log policy). This
module sidesteps libm entirely: ``ln(a/b)`` for positive int64 ``a, b``
is computed from ONLY correctly-rounded IEEE-754 primitives (+ - * /),
so an identical op sequence yields bit-identical doubles in every
conforming engine.

Algorithm (all steps exact or correctly rounded):

1. Range-reduce with integer bit tricks, no ``log2``:
   ``e = length(bin(a)) - length(bin(b))`` = floor(log2 a) - floor(log2 b),
   so ``m = (a/b) / 2^e`` lies in (0.5, 2). ``a/b`` is one correctly
   rounded division; the divide by ``2^e`` (built via ``1 << e``) is
   exact. Requires ``a >= b`` (e >= 0), which BM25's idf ratio satisfies.
2. ``ln m`` via the atanh series: ``t = (m-1)/(m+1)`` (|t| < 1/3),
   ``ln m = 2t · (1 + t²/3 + t⁴/5 + … )`` — Horner with ``N_TERMS``
   coefficient divisions written literally (1.0E0/3.0E0, …): every
   engine rounds those identically. Truncation error < 4e-9 relative —
   irrelevant for determinism (both engines run the SAME truncation),
   plenty for ranking.
3. ``ln(a/b) = ln m + e·LN2`` with LN2 the closest double to ln 2.

Literals use scientific notation (``1.0E0``) because both Spark and
DuckDB parse plain ``1.0`` as DECIMAL — E-notation forces DOUBLE in
both. Stages are expressed as named columns (not one mega-expression)
so the Spark `withColumn` chain and the SQL CTE chain share the exact
same strings — op-sequence identity by construction.
"""

from __future__ import annotations

LN2 = "6.931471805599453E-1"
N_TERMS = 8  # 1 + t2/3 + ... + t^14/15


def _horner_p(t2: str) -> str:
    """Horner form of 1 + t2/3 + t2^2/5 + ... over N_TERMS terms."""
    expr = f"(1.0E0/{2 * N_TERMS - 1}.0E0)"
    for k in range(N_TERMS - 2, 0, -1):
        expr = f"((1.0E0/{2 * k + 1}.0E0) + {t2} * {expr})"
    return f"(1.0E0 + {t2} * {expr})"


def ln_ratio_stages(a: str, b: str, out: str = "ln_ab",
                    prefix: str = "_ln") -> list[tuple[str, str]]:
    """Ordered (column_name, sql_expr) stages computing ``out`` =
    ln(a/b). Each expr references only input columns and earlier stage
    columns; the same strings drive Spark ``F.expr`` and a DuckDB CTE
    chain. Requires a >= b >= 1 (integer expressions).
    """
    e, m, t, t2 = (f"{prefix}_e", f"{prefix}_m", f"{prefix}_t",
                   f"{prefix}_t2")
    return [
        (e, f"length(bin({a})) - length(bin({b}))"),
        (m, f"(CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE))"
            f" / CAST(CAST(1 AS BIGINT) << {e} AS DOUBLE)"),
        (t, f"({m} - 1.0E0) / ({m} + 1.0E0)"),
        (t2, f"{t} * {t}"),
        (out, f"2.0E0 * {t} * {_horner_p(t2)}"
              f" + CAST({e} AS DOUBLE) * {LN2}"),
    ]


def apply_stages_spark(df, stages):
    """Fold the stages onto a DataFrame as withColumn(F.expr(...))."""
    from pyspark.sql import functions as F

    for name, expr in stages:
        df = df.withColumn(name, F.expr(expr))
    return df


def stages_cte_sql(src: str, stages: list[tuple[str, str]],
                   cte_prefix: str) -> tuple[str, str]:
    """Render the stages as a chain of CTE bodies over table ``src``.

    Returns (cte_clause_body, final_cte_name): each stage becomes
    ``<prefix>N AS (SELECT *, expr AS name FROM prev)``.
    """
    parts = []
    prev = src
    for i, (name, expr) in enumerate(stages):
        cte = f"{cte_prefix}{i}"
        parts.append(f"{cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return ", ".join(parts), prev
