"""Local replica of the driver's correctness gate: run a queries()
entry in Spark and its oracle_sql() in DuckDB over the same sf dir,
compare row count, column names/types (loosely), and order-insensitive
values.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def compare(spark_df, con, sql: str, float_tol: float = 1e-9):
    """Returns (ok, message)."""
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()

    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    if s_cols != d_cols:
        return False, f"column mismatch: spark={s_cols} duck={d_cols}"
    if len(sdf) != len(ddf):
        return False, f"row count mismatch: spark={len(sdf)} duck={len(ddf)}"

    from collections import Counter

    s_rows = Counter(
        tuple(_canon(v) for v in row)
        for row in sdf[s_cols].itertuples(index=False, name=None)
    )
    d_rows = Counter(
        tuple(_canon(v) for v in row)
        for row in ddf[d_cols].itertuples(index=False, name=None)
    )
    if s_rows != d_rows:
        only_s = list((s_rows - d_rows).keys())[:3]
        only_d = list((d_rows - s_rows).keys())[:3]
        return False, (
            f"value mismatch (cols={s_cols}):\n"
            f"  spark-only rows (3 of {sum((s_rows - d_rows).values())}): {only_s}\n"
            f"  duck-only rows  (3 of {sum((d_rows - s_rows).values())}): {only_d}"
        )
    return True, f"OK ({len(sdf)} rows)"
