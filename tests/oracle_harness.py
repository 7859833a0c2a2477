"""Local replica of the driver's Spark-vs-DuckDB comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive canonical value multiset. Keeping this strict locally
means the driver's CORRECTNESS gate holds no surprises.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime

import duckdb

from collect_mobile_devices_datalake_spark import TABLES


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip shortest repr; collapses -0.0 vs 0.0
        return repr(v + 0.0)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(val)}" for k, val in sorted(v.items())) + "}"
    return str(v)


def _row_key(row, cols_order):
    return "|".join(_canon(row[i]) for i in cols_order)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_conn(sf_dir)
    res = con.execute(oracle_sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    report = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": spark_cols,
        "duck_cols": duck_cols,
        "ok": True,
        "errors": [],
    }
    if sorted(spark_cols) != sorted(duck_cols):
        report["ok"] = False
        report["errors"].append(f"columns differ: {spark_cols} vs {duck_cols}")
        return report
    if len(spark_rows) != len(duck_rows):
        report["ok"] = False
        report["errors"].append(f"row count {len(spark_rows)} vs {len(duck_rows)}")
    # compare value multisets with columns sorted by name (driver semantics)
    s_order = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_order = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_hash = Counter(_row_key(r, s_order) for r in spark_rows)
    d_hash = Counter(_row_key(r, d_order) for r in duck_rows)
    if s_hash != d_hash:
        report["ok"] = False
        only_s = list((s_hash - d_hash).items())[:5]
        only_d = list((d_hash - s_hash).items())[:5]
        report["errors"].append(f"value mismatch; spark-only={only_s} duck-only={only_d}")
    return report
