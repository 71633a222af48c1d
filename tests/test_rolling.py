"""chunked_rolling == plain trailing-frame window (given the dense-chunk
precondition), across chunk boundaries, partial leading frames, and
missing chunks in the calendar."""

from __future__ import annotations

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.rolling import (
    chunked_rolling,
)


def _naive(df, frame_rows):
    w = (
        W.partitionBy("k")
        .orderBy("pos")
        .rowsBetween(-(frame_rows - 1), 0)
    )
    return df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
        F.max("v").over(w).alias("mx"),
    )


def _chunked(df, frame_rows, chunk_size=10):
    return chunked_rolling(
        df,
        key_cols=["k"],
        order_col="pos",
        chunk=F.floor(F.col("pos") / chunk_size),
        frame_rows=frame_rows,
        cols={
            "n": lambda w: F.count(F.lit(1)).over(w),
            "s": lambda w: F.sum("v").over(w),
            "mx": lambda w: F.max("v").over(w),
        },
    )


def _cmp(got, expect):
    g = {(r.k, r.pos): (r.n, r.s, r.mx) for r in got.collect()}
    e = {(r.k, r.pos): (r.n, r.s, r.mx) for r in expect.collect()}
    assert g == e


def test_matches_plain_window_across_boundaries(spark):
    # two keys, 35 contiguous positions -> chunks of 10; frame 5 crosses
    # every boundary and the leading frames are partial
    rows = [
        (k, p, (p * 3 + ki) % 17)
        for ki, k in enumerate(["a", "b"])
        for p in range(35)
    ]
    df = spark.createDataFrame(rows, "k string, pos long, v long")
    _cmp(_chunked(df, 5), _naive(df, 5))


def test_missing_chunks_stay_adjacent(spark):
    # calendar gap: positions 0-9 then 40-49 (chunks 0 and 4). The dense
    # chunk index must make chunk 4 the SUCCESSOR of chunk 0, so frames
    # at positions 40-43 reach back into 6..9 — a naive cidx=chunk+1
    # carry would strand the rows.
    rows = [("a", p, p) for p in [*range(10), *range(40, 50)]]
    df = spark.createDataFrame(rows, "k string, pos long, v long")
    _cmp(_chunked(df, 5), _naive(df, 5))


def test_frame_equals_chunk_size(spark):
    # frame_rows == chunk row count: carry is the ENTIRE previous chunk
    rows = [("a", p, p) for p in range(30)]
    df = spark.createDataFrame(rows, "k string, pos long, v long")
    _cmp(_chunked(df, 10), _naive(df, 10))


def test_refuses_degenerate_frame(spark):
    df = spark.createDataFrame([("a", 0, 0)], "k string, pos long, v long")
    with pytest.raises(ValueError, match="frame_rows"):
        chunked_rolling(
            df,
            key_cols=["k"],
            order_col="pos",
            chunk=F.lit(0),
            frame_rows=1,
            cols={},
        )


class TestChunkedCumsum:
    """chunked_cumsum == plain UNBOUNDED-PRECEDING window, across chunk
    boundaries, gaps in the chunk calendar, and negative values."""

    def _naive(self, df):
        w = (
            W.partitionBy("k")
            .orderBy("pos")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        return df.select("*", F.sum("v").over(w).alias("c"))

    def _chunked(self, df, chunk_size=10):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.rolling import (  # noqa: E501
            chunked_cumsum,
        )

        return chunked_cumsum(
            df,
            key_cols=["k"],
            order_col="pos",
            value_col="v",
            chunk=F.floor(F.col("pos") / chunk_size),
            out_col="c",
        )

    def _cmp(self, got, expect):
        g = {(r.k, r.pos): r.c for r in got.collect()}
        e = {(r.k, r.pos): r.c for r in expect.collect()}
        assert g == e

    def test_matches_plain_window(self, spark):
        rows = [
            (k, p, ((p * 7 + ki * 3) % 13) - 6)  # signed values
            for ki, k in enumerate(["a", "b"])
            for p in range(35)
        ]
        df = spark.createDataFrame(rows, "k string, pos long, v long")
        self._cmp(self._chunked(df), self._naive(df))

    def test_gaps_in_chunk_calendar(self, spark):
        # positions 0-9 and 40-49: two whole chunks missing between them;
        # the offset pass must carry the prefix across the gap
        rows = [
            ("a", p, p + 1) for p in [*range(10), *range(40, 50)]
        ]
        df = spark.createDataFrame(rows, "k string, pos long, v long")
        self._cmp(self._chunked(df), self._naive(df))

    def test_single_row_chunks(self, spark):
        df = spark.createDataFrame(
            [("a", p, 1) for p in range(7)], "k string, pos long, v long"
        )
        self._cmp(self._chunked(df, chunk_size=1), self._naive(df))


class TestChunkedLocf:
    """chunked_locf == plain last(ignorenulls) UNBOUNDED-PRECEDING window,
    across chunk boundaries, all-null chunks, and leading nulls."""

    def _naive(self, df):
        w = (
            W.partitionBy("k")
            .orderBy("pos")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        return df.select(
            "*", F.last("v", ignorenulls=True).over(w).alias("c")
        )

    def _chunked(self, df, chunk_size=10):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.rolling import (  # noqa: E501
            chunked_locf,
        )

        return chunked_locf(
            df,
            key_cols=["k"],
            order_col="pos",
            value_col="v",
            chunk=F.floor(F.col("pos") / chunk_size),
            out_col="c",
        )

    def _cmp(self, got, expect):
        g = {(r.k, r.pos): r.c for r in got.collect()}
        e = {(r.k, r.pos): r.c for r in expect.collect()}
        assert g == e

    def test_matches_plain_window_sparse(self, spark):
        # observation only every 7th position: most fills cross at least
        # one value-less stretch; key b leads with nulls (stay null)
        rows = [
            (k, p, (p * 3 + ki) if p % 7 == ki else None)
            for ki, k in enumerate(["a", "b"])
            for p in range(40)
        ]
        df = spark.createDataFrame(rows, "k string, pos long, v long")
        self._cmp(self._chunked(df), self._naive(df))

    def test_all_null_chunks_carry_through(self, spark):
        # one observation at pos 3, then three whole chunks of nulls:
        # every later row must carry the pos-3 value through the empty
        # chunks (absent from the summary, present in the chunk frame)
        rows = [("a", p, 42 if p == 3 else None) for p in range(40)]
        df = spark.createDataFrame(rows, "k string, pos long, v long")
        self._cmp(self._chunked(df), self._naive(df))

    def test_leading_nulls_stay_null(self, spark):
        rows = [("a", p, None if p < 25 else p) for p in range(30)]
        df = spark.createDataFrame(rows, "k string, pos long, v long")
        got = {r.pos: r.c for r in self._chunked(df).collect()}
        assert all(got[p] is None for p in range(25))
        assert all(got[p] == p for p in range(25, 30))


class TestKeyedExactMacd:
    """operators.recursive.keyed_exact_macd: exact fixed-point EMA
    recursion — kernel output must equal a brute-force Python model,
    be independent of input row order, and respect the sign-shift
    equivariance the oracle relies on."""

    def _model(self, qs):
        e12 = e26 = None
        SHIFT = 1 << 40
        sig = SHIFT
        out = []
        for q in qs:
            if e12 is None:
                e12, e26 = q, q
            else:
                e12 = (2 * q + 11 * e12) // 13
                e26 = (2 * q + 25 * e26) // 27
                sig = (2 * ((e12 - e26) + SHIFT) + 8 * sig) // 10
            out.append((e12, e26, e12 - e26, sig - SHIFT))
        return out

    def test_matches_model_and_order_independent(self, spark):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.recursive import (  # noqa: E501
            keyed_exact_macd,
        )

        import random

        rnd = random.Random(7)
        rows = []
        series = {}
        for sym in ("A", "B"):
            qs = [rnd.randrange(0, 1 << 30) for _ in range(200)]
            series[sym] = qs
            rows += [
                (sym, f"t{idx:04d}", q) for idx, q in enumerate(qs)
            ]
        rnd.shuffle(rows)  # kernel must sort per key itself
        df = spark.createDataFrame(rows, "symbol string, ts string, q long")
        got = keyed_exact_macd(
            df.repartition(7),
            key_cols=["symbol"],
            order_col="ts",
            q_col="q",
        )
        by_sym = {}
        for r in got.collect():
            by_sym.setdefault(r["symbol"], []).append(
                (r["ts"], r["e12"], r["e26"], r["macd_q"], r["sig_q"])
            )
        for sym, qs in series.items():
            want = self._model(qs)
            rows_sorted = sorted(by_sym[sym])
            assert [(t[1], t[2], t[3], t[4]) for t in rows_sorted] == want
            # negative MACD values occur and survive the sign shift
        assert any(
            t[3] < 0 for ts in by_sym.values() for t in ts
        ), "test series never produced a negative MACD"


class TestChunkedRangeRolling:
    """chunked_range_rolling == plain RANGE-frame window: boundary
    straddles, duplicate timestamps (peers), empty calendar buckets,
    and the bucket>=span precondition."""

    def _naive(self, df, span):
        w = W.partitionBy("k").orderBy("pos").rangeBetween(-span, 0)
        return df.select(
            "*",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("v").over(w).alias("s"),
        )

    def _chunked(self, df, span, bucket):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.rolling import (
            chunked_range_rolling,
        )

        return chunked_range_rolling(
            df,
            key_cols=["k"],
            order_col="pos",
            bucket=bucket,
            span=span,
            cols={
                "n": lambda w: F.count(F.lit(1)).over(w),
                "s": lambda w: F.sum("v").over(w),
            },
        )

    def _cmp(self, got, expect):
        # duplicate (k, pos) rows are peers: compare sorted multisets
        g = sorted((r.k, r.pos, r.v, r.n, r.s) for r in got.collect())
        e = sorted((r.k, r.pos, r.v, r.n, r.s) for r in expect.collect())
        assert g == e

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k string, pos long, v long")

    def test_matches_plain_range_window(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            ("a" if rng.random() < 0.6 else "b", rng.randrange(0, 97), rng.randrange(-5, 9))
            for _ in range(400)
        ]
        df = self._df(spark, rows)
        self._cmp(self._chunked(df, span=7, bucket=10), self._naive(df, 7))

    def test_duplicate_timestamps_are_peers(self, spark):
        # three rows at pos=19 straddling the bucket-20 boundary frame
        rows = [("a", 19, 1), ("a", 19, 2), ("a", 19, 4), ("a", 21, 8), ("a", 30, 16)]
        df = self._df(spark, rows)
        got = {(r.pos, r.v): (r.n, r.s) for r in self._chunked(df, span=5, bucket=10).collect()}
        # every pos=19 peer sees all three; pos=21 (next bucket) reaches
        # back across the boundary via carry
        assert got[(19, 1)] == (3, 7)
        assert got[(19, 2)] == (3, 7)
        assert got[(21, 8)] == (4, 15)
        # pos=30: frame [25,30] — sees nothing from [19..21]
        assert got[(30, 16)] == (1, 16)

    def test_empty_bucket_blocks_reach(self, spark):
        # bucket [10,20) empty: pos=20 must NOT see pos=9 even though it
        # is the previous populated bucket's trailing row
        rows = [("a", 9, 1), ("a", 20, 2)]
        df = self._df(spark, rows)
        got = {r.pos: (r.n, r.s) for r in self._chunked(df, span=5, bucket=10).collect()}
        assert got[20] == (1, 2)

    def test_exact_span_boundary_inclusive(self, spark):
        # RANGE includes the row exactly span older, including via carry
        rows = [("a", 5, 1), ("a", 10, 2)]
        df = self._df(spark, rows)
        got = {r.pos: (r.n, r.s) for r in self._chunked(df, span=5, bucket=10).collect()}
        assert got[10] == (2, 3)

    def test_negative_order_values_floor_not_truncate(self, spark):
        # ADVICE r9: (pos / bucket).cast(long) truncated toward zero, so
        # pos=-7 with bucket=10 landed in bucket 0 (with pos 0..9) instead
        # of bucket -1 — carry rows mis-placed, frames silently wrong.
        # Floor division must agree with the plain RANGE window across a
        # sign-straddling domain, including the exact -span boundary.
        import random

        rng = random.Random(11)
        rows = [
            (
                "a" if rng.random() < 0.5 else "b",
                rng.randrange(-53, 53),
                rng.randrange(-5, 9),
            )
            for _ in range(300)
        ] + [("a", -10, 1), ("a", -5, 2), ("a", 0, 4)]  # boundary pins
        df = self._df(spark, rows)
        self._cmp(self._chunked(df, span=7, bucket=10), self._naive(df, 7))

    def test_refuses_bucket_smaller_than_span(self, spark):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.rolling import (
            chunked_range_rolling,
        )

        df = self._df(spark, [("a", 1, 1)])
        with pytest.raises(ValueError, match="bucket"):
            chunked_range_rolling(
                df, key_cols=["k"], order_col="pos", bucket=5, span=6,
                cols={"n": lambda w: F.count(F.lit(1)).over(w)},
            )


class TestKeyedExactHolt:
    """operators.recursive.keyed_exact_holt: two-state (level+trend)
    exact recursion — matches a brute-force model, is input-order
    independent, and produces negative trends that survive the shift."""

    def _model(self, qs):
        SHIFT = 1 << 40
        lev = None
        s = SHIFT
        out = []
        for q in qs:
            if lev is None:
                lev = q
            else:
                prev = lev
                lev = (q + 4 * (prev + s - SHIFT)) // 5
                s = ((lev - prev) + 9 * s + SHIFT) // 10
            out.append((lev, s - SHIFT, lev + s - SHIFT))
        return out

    def test_matches_model_and_order_independent(self, spark):
        import random

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.recursive import (  # noqa: E501
            keyed_exact_holt,
        )

        rnd = random.Random(11)
        rows = []
        series = {}
        for sym in ("A", "B"):
            # trending-then-falling series: guarantees negative trend
            qs = [i * 1000 + rnd.randrange(0, 500) for i in range(100)]
            qs += [qs[-1] - i * 2000 for i in range(1, 101)]
            series[sym] = qs
            rows += [(sym, f"t{idx:04d}", q) for idx, q in enumerate(qs)]
        rnd.shuffle(rows)
        df = spark.createDataFrame(rows, "symbol string, ts string, q long")
        got = keyed_exact_holt(
            df.repartition(5),
            key_cols=["symbol"],
            order_col="ts",
            q_col="q",
        )
        by_sym = {}
        for r in got.collect():
            by_sym.setdefault(r["symbol"], []).append(
                (r["ts"], r["l_q"], r["b_q"], r["f_q"])
            )
        for sym, qs in series.items():
            want = self._model(qs)
            rows_sorted = sorted(by_sym[sym])
            assert [(t[1], t[2], t[3]) for t in rows_sorted] == want
        assert any(
            t[2] < 0 for ts in by_sym.values() for t in ts
        ), "test series never produced a negative trend"


class TestKeyedExactClampedCumsum:
    """operators.recursive.keyed_exact_clamped_cumsum: the clamp makes
    the scan non-associative — kernel must match a sequential model,
    be input-order independent, and differ from the unclamped prefix
    sum exactly where the floor binds."""

    def test_matches_model_and_clamps(self, spark):
        import random

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.recursive import (  # noqa: E501
            keyed_exact_clamped_cumsum,
        )

        rnd = random.Random(3)
        rows, series = [], {}
        for k in ("a", "b"):
            xs = [rnd.randrange(-50, 40) for _ in range(300)]
            series[k] = xs
            rows += [(k, i, x) for i, x in enumerate(xs)]
        rnd.shuffle(rows)
        df = spark.createDataFrame(rows, "k string, pos long, x long")
        got = keyed_exact_clamped_cumsum(
            df.repartition(6), key_cols=["k"], order_cols=["pos"], x_col="x"
        )
        by_k = {}
        for r in got.collect():
            by_k.setdefault(r.k, []).append((r.pos, r.balance))
        clamped_ever = False
        for k, xs in series.items():
            y, want = 0, []
            run = 0
            for x in xs:
                y = max(0, y + x)
                run += x
                want.append(y)
                if y != max(0, run):
                    clamped_ever = True  # clamp genuinely bound mid-series
            assert [b for _, b in sorted(by_k[k])] == want
        assert clamped_ever, "series never exercised the non-associativity"


class TestVpinOrderKeyGuard:
    """tick_vpin_volume_buckets enforces (not assumes) the invariant its
    lexicographic order key needs: non-negative ts_us/trade_id (ADVICE
    r10 — a '-' sorts before digits and lpad truncates >20 chars, which
    would silently reorder the prefix-volume scan)."""

    def test_negative_trade_id_raises(self, spark, tmp_path):
        import pandas as pd

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import (
            plans,
        )

        sf = tmp_path / "sf"
        sf.mkdir()
        pd.DataFrame(
            {
                "event_id": [-1, 2],  # negative trade_id breaks the key
                "ts": pd.to_datetime(
                    ["2024-01-01 00:00:01", "2024-01-01 00:00:02"]
                ),
                "user_id": [1, 2],
                "event_type": ["purchase", "click"],
                "value": [10.0, 11.0],
                "props": ['{"k": 3}', '{"k": 4}'],
            }
        ).to_parquet(sf / "events.parquet", index=False)
        df = plans.get("tick_vpin_volume_buckets").fn(spark, str(sf))
        with pytest.raises(Exception, match="negative ts_us/trade_id"):
            df.collect()

    def test_non_negative_rows_unaffected(self, spark):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import (
            plans,
        )

        df = plans.get("tick_vpin_volume_buckets").fn(
            spark, "/root/testdata/sf0.001"
        )
        assert df.count() > 0
