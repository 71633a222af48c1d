"""Brute-force references for the Hayashi-Yoshida family.

The DuckDB oracles share the BUCKETED pair-generation structure with the
Spark plans, so a bucketing/credit bug could cancel out in the
oracle comparison. These tests recompute HY from the definition — an
O(n^2) double loop over ALL interval pairs, no buckets — on synthetic
tapes engineered to stress the exactly-once credit rule (intervals
spanning multiple buckets, overlaps straddling bucket boundaries, tied
timestamps, and lags shifting overlap starts across buckets).
"""

from __future__ import annotations

import datetime as dt
import json
import math
import random

import pytest

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans

EPOCH = dt.datetime(2024, 1, 1)
US = 1_000_000


def _mk_events(spark, tmp_path, ticks):
    """ticks: list of (symbol_idx 0..2, ts_us, price). Role-play the events
    mapping (operators/ticks.py): symbol = user_id % 3, ticker gate via
    event_type/props.k; event_id keeps arrival order deterministic."""
    rows = [
        (
            i * 2,  # even -> venue coinbase; irrelevant here
            EPOCH + dt.timedelta(microseconds=ts_us),
            sym,
            "click",
            float(price),
            json.dumps({"k": i % 11}),
        )
        for i, (sym, ts_us, price) in enumerate(ticks)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "hy_events")
    # single file so the chunked-lag order key sees one deterministic
    # layout regardless of worker count (FIXTURES.md convention)
    df.coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def _brute_hy(ticks, lag_us=0):
    """O(n^2) HY from the definition, on the same 0.01 product grid.
    Returns {(sym_a, sym_b): (n_pairs, cov_q)} plus per-symbol var_q."""
    per = {}
    for i, (sym, ts, price) in enumerate(ticks):
        # engine order key is (ts_us, trade_id) — trade_id = event_id = 2*i
        per.setdefault(sym, []).append((ts, 2 * i, price))
    iv = {}
    for sym, rows in per.items():
        rows.sort()
        out = []
        for (t0, _i0, p0), (t1, _i1, p1) in zip(rows, rows[1:]):
            if t0 < t1:
                out.append((t0, t1, p1 - p0))
        iv[sym] = out
    var_q = {
        s: sum(math.floor(r * r * 100.0) for _, _, r in rows)
        for s, rows in iv.items()
    }
    cov = {}
    syms = sorted(iv)
    for i, sa in enumerate(syms):
        for sb in syms[i + 1 :]:
            n, c = 0, 0
            for (a0, a1, ra) in iv[sa]:
                for (b0, b1, rb) in iv[sb]:
                    if max(a0, b0 - lag_us) < min(a1, b1 - lag_us):
                        n += 1
                        c += math.floor(ra * rb * 100.0)
            cov[(sa, sb)] = (n, c)
    return cov, var_q


def _rand_ticks(seed, n=120, span_us=7_200 * US):
    """Random tape whose avg gap lands the adaptive width mid-ladder, so
    intervals straddle bucket boundaries and span multiple buckets."""
    rng = random.Random(seed)
    ticks = []
    for i in range(n):
        sym = rng.randrange(3)
        ts = rng.randrange(span_us)
        price = round(rng.uniform(1.0, 500.0), 2)
        ticks.append((sym, ts, price))
    # force some tied timestamps (zero-length intervals must drop)
    for j in range(0, 12, 2):
        ticks[j + 1] = (ticks[j + 1][0], ticks[j][1], ticks[j + 1][2])
    return ticks


@pytest.mark.parametrize("seed", [7, 41, 1999])
def test_hy_matches_bruteforce(spark, tmp_path, seed):
    ticks = _rand_ticks(seed)
    d = _mk_events(spark, tmp_path, ticks)
    got = {
        (r.symbol_a, r.symbol_b): (r.n_pairs, r.hy_cov_q)
        for r in plans.get("tick_hayashi_yoshida_covariance")
        .fn(spark, d)
        .collect()
    }
    cov, var_q = _brute_hy(ticks)
    want = {
        (f"S{a}", f"S{b}"): (n, c)
        for (a, b), (n, c) in cov.items()
        if n > 0
    }
    assert got == want
    vars_got = {
        (r.symbol_a, r.symbol_b): (r.hy_var_a_q, r.hy_var_b_q)
        for r in plans.get("tick_hayashi_yoshida_covariance")
        .fn(spark, d)
        .collect()
    }
    for (sa, sb), (va, vb) in vars_got.items():
        assert va == var_q[int(sa[1])]
        assert vb == var_q[int(sb[1])]


@pytest.mark.parametrize("seed", [23])
def test_lead_lag_hy_matches_bruteforce(spark, tmp_path, seed):
    ticks = _rand_ticks(seed, n=90)
    d = _mk_events(spark, tmp_path, ticks)
    got = {
        (r.symbol_a, r.symbol_b, r.lag_s): (r.n_pairs, r.hy_cov_q)
        for r in plans.get("tick_lead_lag_hy").fn(spark, d).collect()
    }
    for lag_s in (-60, -10, 0, 10, 60):
        cov, _ = _brute_hy(ticks, lag_us=lag_s * US)
        for (a, b), (n, c) in cov.items():
            if n > 0:
                assert got[(f"S{a}", f"S{b}", lag_s)] == (n, c), lag_s


def _mk_events_venued(spark, tmp_path, ticks):
    """ticks: (symbol_idx, venue_odd, ts_us, price); venue role-play is
    event_id parity (even = coinbase, odd = binance)."""
    rows = [
        (
            i * 2 + (1 if venue_odd else 0),
            EPOCH + dt.timedelta(microseconds=ts_us),
            sym,
            "click",
            float(price),
            json.dumps({"k": i % 11}),
        )
        for i, (sym, venue_odd, ts_us, price) in enumerate(ticks)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "hyv_events")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def _brute_venue_hy(ticks, lag_us=0):
    """O(n^2) per-symbol coinbase-vs-binance HY (binance shifted)."""
    per = {}
    for i, (sym, venue_odd, ts, price) in enumerate(ticks):
        per.setdefault((sym, venue_odd), []).append((ts, 2 * i, price))
    iv = {}
    for key, rows in per.items():
        rows.sort()
        iv[key] = [
            (t0, t1, p1 - p0)
            for (t0, _a, p0), (t1, _b, p1) in zip(rows, rows[1:])
            if t0 < t1
        ]
    out = {}
    for sym in sorted({s for s, _v in per}):
        n, c = 0, 0
        for (a0, a1, ra) in iv.get((sym, False), []):
            for (b0, b1, rb) in iv.get((sym, True), []):
                if max(a0, b0 - lag_us) < min(a1, b1 - lag_us):
                    n += 1
                    c += math.floor(ra * rb * 100.0)
        out[sym] = (n, c)
    return out


def test_venue_lead_lag_hy_matches_bruteforce(spark, tmp_path):
    rng = random.Random(99)
    ticks = []
    for i in range(110):
        ticks.append(
            (
                rng.randrange(3),
                bool(rng.getrandbits(1)),
                rng.randrange(7_200 * US),
                round(rng.uniform(1.0, 500.0), 2),
            )
        )
    d = _mk_events_venued(spark, tmp_path, ticks)
    got = {
        (r.symbol, r.lag_s): (r.n_pairs, r.hy_cov_q)
        for r in plans.get("tick_venue_lead_lag_hy").fn(spark, d).collect()
    }
    for lag_s in (-60, -10, 0, 10, 60):
        want = _brute_venue_hy(ticks, lag_us=lag_s * US)
        for sym, (n, c) in want.items():
            if n > 0:
                assert got[(f"S{sym}", lag_s)] == (n, c), lag_s
