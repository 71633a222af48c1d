"""Float discipline: make double aggregates bit-identical to the oracle.

Summing doubles is order-dependent, and Spark's shuffled partial
aggregation visits rows in a different order than DuckDB — so a naive
``sum(double)`` can differ in final ulps and fail an exact value-hash.
The fix (SURVEY.md section 7.4 "decimal semantics"): round each row-level
term to a fixed decimal scale (exact, order-independent integer
arithmetic), sum exactly, and cast the exact total back to double. Both
engines then produce identical bits. Averages divide two such doubles —
IEEE division of identical operands is identical everywhere.

``DECIMAL(25, 10)`` holds |x| < 10^15 at 10 decimal places: far beyond any
row-level term in the testdata, and sums stay within decimal range after
Spark's sum-precision promotion (+10 digits).

At 100 TB this costs nothing: the decimal cast is per-row JVM codegen, and
exact decimal summation is how money aggregation should be done anyway.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SUM_DECIMAL = "decimal(25,10)"
SQL_SUM_DECIMAL = "DECIMAL(25,10)"

#: The rounding scale must stay COARSE relative to the term's double ulp:
#: Spark rounds the double's shortest decimal repr (BigDecimal.valueOf)
#: while DuckDB rounds its exact binary expansion, and the two agree only
#: when no rounding boundary falls within one ulp. Scale 10 is safe for
#: term magnitudes up to ~1e4 (ulp 2e-12 << half-step 5e-11); for larger
#: terms (e.g. price*quantity ~ 5e6, ulp ~ 1e-9) pass a smaller scale.


def dsum(col: Column | str, scale: int = 10) -> Column:
    """Order-independent double sum: per-row decimal round, exact sum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 10) -> Column:
    """Order-independent double average: exact sum / count, divided in IEEE."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(F.lit(1)).cast("double")


def sql_dsum(expr: str, scale: int = 10) -> str:
    """DuckDB twin of `dsum`.

    The decimal->double cast goes through VARCHAR because DuckDB's direct
    DECIMAL->DOUBLE cast is not correctly rounded (it divides a
    hugeint-converted double by 10^scale — two roundings), while both
    Spark's BigDecimal.doubleValue() and strtod parsing are single-rounded.
    Verified empirically: 10/25 groups differed in the last ulp without this.
    """
    dec = f"DECIMAL(25,{scale})"
    return f"CAST(CAST(SUM(CAST(({expr}) AS {dec})) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 10) -> str:
    """DuckDB twin of `davg`."""
    return f"({sql_dsum(expr, scale)} / CAST(COUNT(*) AS DOUBLE))"


def gavg(col: Column | str, grid: int = 100) -> Column:
    """Floor-quantized integer-grid average — for UNBOUNDED terms.

    ``davg``'s shared decimal grid is only exact while term magnitudes
    stay under ~1e4 (see module doc); a ratio with a micro denominator
    (relative spread off a micro-price mid) has no safe decimal scale.
    Floor each term onto a 1/grid lattice instead: the BIGINT partial
    sums are order-independent and engine-identical at ANY term
    magnitude, at the cost of quantizing each term to the grid (0.01 bp
    at the default grid=100 with bp-scaled terms). Exact while the group
    sum of grid terms stays inside BIGINT — beyond that DuckDB's HUGEINT
    sum diverges loudly from Spark's wrap, the bounded-regime caveat of
    all lattice aggregates here.

    Same convention as ``tick_implementation_shortfall``'s shortfall
    average (plans/microstructure.py), promoted to a shared helper.
    """
    c = F.col(col) if isinstance(col, str) else col
    g = float(grid)
    return F.sum(F.floor(c * F.lit(g)).cast("long")).cast("double") / (
        F.lit(g) * F.count(F.lit(1)).cast("double")
    )


def sql_gavg(expr: str, grid: int = 100) -> str:
    """DuckDB twin of `gavg` (same lattice, same division order)."""
    return (
        f"(CAST(SUM(CAST(floor(({expr}) * {grid}.0) AS BIGINT)) AS DOUBLE)"
        f" / ({grid}.0 * CAST(COUNT(*) AS DOUBLE)))"
    )


def fmt_ts(col: Column | str, alias: str | None = None) -> Column:
    """Render a timestamp as ``yyyy-MM-dd HH:mm:ss`` (UTC session tz).

    For sub-second event times use `unix_micros` / DuckDB ``epoch_us``.

    Oracle-compared queries exchange timestamps as strings (or epoch
    micros) so naive-vs-tz-aware dtype differences between Spark and
    DuckDB cannot perturb the value hash (SURVEY.md section 7.4).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return out.alias(alias) if alias else out


def sql_fmt_ts(expr: str) -> str:
    """DuckDB twin of `fmt_ts` (second granularity)."""
    return f"strftime(({expr}), '%Y-%m-%d %H:%M:%S')"
