"""Drive the __spark_entry__ contract vs the DuckDB oracle, outside-in.

Usage: python tools/verify_contract.py [name-prefix ...]
With no args, verifies every registered query (the full driver protocol);
with prefixes, only the matching names (fast targeted loop).
Prints one line per query; exits non-zero on any mismatch.
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(d: pd.DataFrame) -> pd.DataFrame:
    d = d.reindex(sorted(d.columns), axis=1)
    for c in d.columns:
        if pd.api.types.is_datetime64_any_dtype(d[c]):
            s = d[c]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            d[c] = s.astype("datetime64[us]")
    return d.sort_values(list(d.columns), ignore_index=True)


def main() -> int:
    prefixes = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    oracles = e.oracle_sql()
    n_bad = 0
    for name, fn in sorted(e.queries().items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            sdf = fn(spark, "/root/testdata/sf0.01").toPandas()
            sql = oracles.get(name)
            if sql is None:
                print(f"{name}: rows-only {len(sdf)}")
                continue
            l, r = canon(sdf), canon(con.execute(sql).df())
            ok = (
                l.shape == r.shape
                and list(l.columns) == list(r.columns)
                and l.equals(r)
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        print(f"{name}: rows={len(l)} match={ok}")
        if not ok:
            n_bad += 1
    print(f"FAILURES: {n_bad}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
