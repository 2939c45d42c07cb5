"""Local mirror of the driver's DuckDB-oracle comparison.

Runs each registry query on Spark and its SQL on DuckDB over the same
parquet, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).
"""

from __future__ import annotations

import datetime
import hashlib
import math
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(spark, name: str, spark_fn, sql: str, sf_dir: str) -> dict:
    df = spark_fn(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    d_cols, d_rows = duckdb_run(sql, sf_dir)
    res = {
        "name": name,
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "rows_match": len(s_rows) == len(d_rows),
    }
    res["hash_match"] = (
        res["cols_match"]
        and value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
    )
    res["ok"] = res["rows_match"] and res["cols_match"] and res["hash_match"]
    return res
