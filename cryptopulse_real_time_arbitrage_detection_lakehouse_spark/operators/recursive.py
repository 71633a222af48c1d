"""Exact fixed-point recursive filters: `keyed_exact_macd`.

EMA-family indicators (EMA / MACD / signal) are RECURSIVE —
``y_t = α·x_t + (1-α)·y_{t-1}`` — which no window frame expresses and,
unlike `operators.chunked_lag` / `operators.rolling`'s shapes, cannot be
chunk-stitched either: the per-step floor rounding that makes the
recursion exactly reproducible across engines also breaks the
associativity a carry-composition scheme would need (an EMA carried
across a chunk boundary as ``A·y_in + B`` is only exact in real
arithmetic; with integer floor at every step the chunk boundary changes
the rounding pattern). So this operator is honestly sequential PER KEY
— and that is fine at any corpus scale, because its input is the 1-row-
per-(key, minute) candle SUMMARY series: the per-key length is bounded
by wall-clock minutes (a year is ~525 k rows), not by tick volume, and
keys (symbols) are the parallel unit. 100 TB of ticks and 100 GB of
ticks produce the same candle series.

Exactness contract (what makes the DuckDB oracle hash-identical):
every state variable is an INTEGER on the ``1 << 20`` price grid, and
every step is ``floor((2·x + (n-1)·y) / (n+1))`` evaluated as a DOUBLE
division + floor in SQL and as Python integer ``//`` here. Those agree
exactly because all intermediates stay far below 2^53 (inputs are
``q = floor(price · 2^20)``; with the 2^40 sign-shift the largest
intermediate is ``2·m + 8·s ≈ 2^44``) and a non-divisible quotient's
distance to the next integer is ≥ 1/(n+1) ≫ one double ulp (2^-12 at
these magnitudes), so the double division can never round across the
floor boundary. MACD can be negative, so its signal-EMA runs on
``m_t = macd_t + SHIFT`` (SHIFT = 2^40): the recursion is exactly
shift-equivariant under floor (``floor(v + C) = floor(v) + C`` for
integer C), and the shift is subtracted once at the end.

Reference parity note: the reference computes indicator series in its
dashboard layer (`/root/reference/src/dashboard/app.py`); this engine
treats them as first-class gold-layer queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: price quantization grid, shared with `plans.medallion._IND_SCALE`
MACD_SCALE = 1 << 20
#: sign-shift for the signal EMA over (possibly negative) MACD values
MACD_SHIFT = 1 << 40

FAST, SLOW, SIGNAL = 12, 26, 9


def keyed_exact_macd(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    q_col: str,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-key exact fixed-point MACD(12, 26, 9) over the quantized
    integer series ``q_col`` ordered by ``order_col``.

    Returns the input keys + ``order_col`` + ``passthrough`` columns
    plus INTEGER state columns ``e12``, ``e26``, ``macd_q`` (= e12-e26)
    and ``sig_q`` (signal EMA, already un-shifted) — the caller divides
    by `MACD_SCALE` exactly once per output column so both engines
    round each final double from identical integer operands.

    Seeding follows the standard convention: each EMA starts at the
    series' first value (macd_0 = 0, signal_0 = 0).
    """
    passthrough = passthrough or []
    out_fields = (
        [df.schema[c] for c in key_cols]
        + [df.schema[order_col]]
        + [df.schema[c] for c in passthrough]
        + [
            T.StructField("e12", T.LongType()),
            T.StructField("e26", T.LongType()),
            T.StructField("macd_q", T.LongType()),
            T.StructField("sig_q", T.LongType()),
        ]
    )
    out_schema = T.StructType(out_fields)
    cols = key_cols + [order_col] + passthrough + [q_col]

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")
        qs = [int(v) for v in pdf[q_col]]
        e12 = e26 = None
        sig = MACD_SHIFT  # m_0 = macd_0 + SHIFT = SHIFT
        o12, o26, omacd, osig = [], [], [], []
        for q in qs:
            if e12 is None:
                e12, e26 = q, q
            else:
                e12 = (2 * q + (FAST - 1) * e12) // (FAST + 1)
                e26 = (2 * q + (SLOW - 1) * e26) // (SLOW + 1)
                m = (e12 - e26) + MACD_SHIFT
                sig = (2 * m + (SIGNAL - 1) * sig) // (SIGNAL + 1)
            o12.append(e12)
            o26.append(e26)
            omacd.append(e12 - e26)
            osig.append(sig - MACD_SHIFT)
        out = pdf[key_cols + [order_col] + passthrough].copy()
        out["e12"] = pd.Series(o12, index=pdf.index, dtype="int64")
        out["e26"] = pd.Series(o26, index=pdf.index, dtype="int64")
        out["macd_q"] = pd.Series(omacd, index=pdf.index, dtype="int64")
        out["sig_q"] = pd.Series(osig, index=pdf.index, dtype="int64")
        return out

    return df.select(*cols).groupBy(*key_cols).applyInPandas(
        kernel, out_schema
    )


def keyed_exact_heikin_ashi(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    q_open: str,
    q_high: str,
    q_low: str,
    q_close: str,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-key exact fixed-point Heikin-Ashi candles over quantized
    integer OHLC columns ordered by ``order_col``.

    The smoothing recursion is ``ha_open_t = (ha_open_{t-1} +
    ha_close_{t-1}) / 2`` (seeded ``(o_0 + c_0) / 2``) — one carried
    integer, same exactness contract as `keyed_exact_macd`: halving is
    floor division of positive ints, equal to the oracle's
    floor(double/2) below 2^53. ``ha_close = floor((o+h+l+c)/4)`` is
    row-local; ha_high/ha_low are integer max/min — so only ha_open
    forces the sequential scan, and the per-key length is calendar-
    bounded summary rows.

    Returns keys + order + passthrough + integer columns ``ha_open_q
    ha_close_q ha_high_q ha_low_q``; the caller divides by the grid
    once per output.
    """
    passthrough = passthrough or []
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [df.schema[order_col]]
        + [df.schema[c] for c in passthrough]
        + [
            T.StructField("ha_open_q", T.LongType()),
            T.StructField("ha_close_q", T.LongType()),
            T.StructField("ha_high_q", T.LongType()),
            T.StructField("ha_low_q", T.LongType()),
        ]
    )
    cols = key_cols + [order_col] + passthrough + [
        q_open, q_high, q_low, q_close,
    ]

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")
        qo = [int(v) for v in pdf[q_open]]
        qh = [int(v) for v in pdf[q_high]]
        ql = [int(v) for v in pdf[q_low]]
        qc = [int(v) for v in pdf[q_close]]
        ho_prev = hc_prev = None
        o_out, c_out, h_out, l_out = [], [], [], []
        for o, h, lo, c in zip(qo, qh, ql, qc):
            hc = (o + h + lo + c) // 4
            ho = (
                (o + c) // 2
                if ho_prev is None
                else (ho_prev + hc_prev) // 2
            )
            hh = max(h, ho, hc)
            hl = min(lo, ho, hc)
            o_out.append(ho)
            c_out.append(hc)
            h_out.append(hh)
            l_out.append(hl)
            ho_prev, hc_prev = ho, hc
        out = pdf[key_cols + [order_col] + passthrough].copy()
        out["ha_open_q"] = pd.Series(o_out, index=pdf.index, dtype="int64")
        out["ha_close_q"] = pd.Series(c_out, index=pdf.index, dtype="int64")
        out["ha_high_q"] = pd.Series(h_out, index=pdf.index, dtype="int64")
        out["ha_low_q"] = pd.Series(l_out, index=pdf.index, dtype="int64")
        return out

    return df.select(*cols).groupBy(*key_cols).applyInPandas(
        kernel, out_schema
    )


#: Holt's linear method smoothing constants as exact rationals:
#: alpha = 1/HOLT_A (level), beta = 1/HOLT_B (trend).
HOLT_A, HOLT_B = 5, 10
#: sign-shift for the (possibly negative) trend state, same algebra as
#: MACD_SHIFT: floor is shift-equivariant for integer shifts.
HOLT_SHIFT = 1 << 40


def keyed_exact_holt(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    q_col: str,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-key exact fixed-point Holt linear smoothing (double
    exponential: level + trend) over the quantized series ``q_col``.

    The TWO-state recursion no window frame or chunk-carry expresses:

        l_t = floor((x_t + (A-1)*(l_{t-1} + b_{t-1})) / A)     (alpha=1/A)
        b_t = floor(((l_t - l_{t-1}) + (B-1)*b_{t-1}) / B)     (beta=1/B)

    run on ``s = b + HOLT_SHIFT`` so every intermediate stays positive:
    ``s_t = floor(((l_t - l_{t-1}) + (B-1)*s_{t-1} + HOLT_SHIFT) / B)``
    (expand ``b = s - SHIFT``: the -(B-1)SHIFT and +B·SHIFT collapse to
    one +SHIFT inside the floor). Exactness argument is `keyed_exact_
    macd`'s verbatim: intermediates < 2^44 << 2^53 and a non-divisible
    quotient sits >= 1/B from the next integer, so the oracle's
    floor(double division) can never round across the Python ``//``
    result. Seeding: l_0 = x_0, b_0 = 0.

    Returns keys + order + passthrough + integer ``l_q`` (level),
    ``b_q`` (trend, un-shifted) and ``f_q`` (= l+b, the one-step-ahead
    forecast). Sequential per key, bounded by CALENDAR series length.
    """
    passthrough = passthrough or []
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [df.schema[order_col]]
        + [df.schema[c] for c in passthrough]
        + [
            T.StructField("l_q", T.LongType()),
            T.StructField("b_q", T.LongType()),
            T.StructField("f_q", T.LongType()),
        ]
    )
    cols = key_cols + [order_col] + passthrough + [q_col]

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")
        qs = [int(v) for v in pdf[q_col]]
        lev = None
        s = HOLT_SHIFT  # b_0 = 0
        ol, ob, of = [], [], []
        for q in qs:
            if lev is None:
                lev = q
            else:
                prev = lev
                lev = (q + (HOLT_A - 1) * (prev + s - HOLT_SHIFT)) // HOLT_A
                s = ((lev - prev) + (HOLT_B - 1) * s + HOLT_SHIFT) // HOLT_B
            ol.append(lev)
            ob.append(s - HOLT_SHIFT)
            of.append(lev + s - HOLT_SHIFT)
        out = pdf[key_cols + [order_col] + passthrough].copy()
        out["l_q"] = pd.Series(ol, index=pdf.index, dtype="int64")
        out["b_q"] = pd.Series(ob, index=pdf.index, dtype="int64")
        out["f_q"] = pd.Series(of, index=pdf.index, dtype="int64")
        return out

    return df.select(*cols).groupBy(*key_cols).applyInPandas(
        kernel, out_schema
    )


def keyed_exact_clamped_cumsum(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_cols: list[str],
    x_col: str,
    floor_value: int = 0,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-key clamped running sum: ``y_t = max(floor_value, y_{t-1} +
    x_t)`` over integer ``x_col`` ordered by ``order_cols``.

    The canonical NON-ASSOCIATIVE scan: a plain prefix sum decomposes
    into chunk-local prefixes plus offsets (`rolling.chunked_cumsum`),
    but the clamp makes each step depend on the clamped PRIOR state —
    max(0, a+b+c) tells you nothing about max(0, max(0, a+b)+c) — so
    no chunk-carry scheme is exact and the scan is honestly sequential
    per key (inventory floors, credit balances, drawdown-reset
    accumulators all have this shape). Keys are the parallel unit;
    per-key cost is the key's own history. Pure integer arithmetic —
    both engines' recursions are exact with no rounding argument
    needed at all.

    Unlike the candle-summary kernels above (3 symbol groups), this one
    is keyed by a HIGH-cardinality key (users), so the r12 form runs
    per shuffle PARTITION, not per group: repartition on the key,
    sort (key, order) within each partition, and stream one Arrow batch
    at a time through a single sequential pass that resets state at key
    boundaries. The per-group `applyInPandas` form paid a pandas
    DataFrame construction per user (guide §4: thousands of tiny groups
    serialized through one coalesced task = 4.1 s warm at sf0.1; this
    form is one pass, 1.1 s). State carries across batch boundaries, so
    memory stays O(batch) regardless of key size; values are identical
    because each key's rows still arrive contiguous and in order.
    """
    import pandas as pd

    passthrough = passthrough or []
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [df.schema[c] for c in order_cols]
        + [df.schema[c] for c in passthrough]
        + [
            T.StructField(x_col, T.LongType()),
            T.StructField("balance", T.LongType()),
        ]
    )
    cols = key_cols + order_cols + passthrough + [x_col]

    def kernel(batches):
        cur_key = None
        y = floor_value
        for pdf in batches:
            xs = pdf[x_col].to_list()
            keys = list(zip(*(pdf[k] for k in key_cols)))
            out_y = []
            for i, x in enumerate(xs):
                k = keys[i]
                if k != cur_key:
                    cur_key = k
                    y = floor_value
                y = max(floor_value, y + int(x))
                out_y.append(y)
            out = pdf[cols].copy()
            out["balance"] = pd.Series(out_y, index=pdf.index, dtype="int64")
            yield out

    return (
        df.select(*cols)
        .repartition(*key_cols)
        .sortWithinPartitions(*key_cols, *order_cols)
        .mapInPandas(kernel, out_schema)
    )


def keyed_momentum_replay(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    q_col: str,
    cap: int,
) -> DataFrame:
    """Per-key inventory-clamped momentum backtest over the quantized
    integer price series ``q_col`` ordered by ``order_col`` — the
    canonical strategy-replay state machine, and (like
    `keyed_exact_clamped_cumsum`) inherently sequential: the position
    clamp makes each step depend on the clamped PRIOR state, so no
    chunk-carry scheme is exact.

    Step t (from the second observation): the move m = q_t - q_{t-1}
    first marks the held position (pnl += pos * m), then the position
    chases the move's sign one unit, clamped to [-cap, +cap]. Running
    peak/drawdown track the cumulative PnL. ALL state is integer
    (position, grid PnL, peak, max drawdown, trade count), so both
    engines' recursions are exact with no rounding argument needed.

    Emits ONE summary row per key: n_obs, n_trades, final_pos,
    total_pnl_q, max_drawdown_q. Per-key cost is the key's own summary
    series (bounded by calendar, not corpus bytes); keys are the
    parallel unit.
    """
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [
            T.StructField("n_obs", T.LongType()),
            T.StructField("n_trades", T.LongType()),
            T.StructField("final_pos", T.LongType()),
            T.StructField("total_pnl_q", T.LongType()),
            T.StructField("max_drawdown_q", T.LongType()),
        ]
    )
    cols = key_cols + [order_col, q_col]

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")
        qs = [int(v) for v in pdf[q_col]]
        pos = cum = peak = mdd = ntr = 0
        prev = None
        for q in qs:
            if prev is not None:
                m = q - prev
                cum += pos * m
                peak = max(peak, cum)
                mdd = max(mdd, peak - cum)
                step = 1 if m > 0 else (-1 if m < 0 else 0)
                new_pos = max(-cap, min(cap, pos + step))
                if new_pos != pos:
                    ntr += 1
                pos = new_pos
            prev = q
        head = pdf.iloc[:1][key_cols].copy()
        head["n_obs"] = pd.Series([len(qs)], index=head.index, dtype="int64")
        head["n_trades"] = pd.Series([ntr], index=head.index, dtype="int64")
        head["final_pos"] = pd.Series([pos], index=head.index, dtype="int64")
        head["total_pnl_q"] = pd.Series([cum], index=head.index, dtype="int64")
        head["max_drawdown_q"] = pd.Series(
            [mdd], index=head.index, dtype="int64"
        )
        return head

    return df.select(*cols).groupBy(*key_cols).applyInPandas(
        kernel, out_schema
    )
