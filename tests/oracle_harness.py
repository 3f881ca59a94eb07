"""Local mimic of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row count, column names, and an order-insensitive value hash.

Usage: python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = ["\x1f".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def run(sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    from kmers_spark.session import get_spark

    # reuse an already-active session (pytest fixture) and leave it running;
    # only stop sessions this harness created itself
    existing = SparkSession.getActiveSession()
    spark = existing or get_spark("oracle_harness", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # extra_queries: oracle-verified here but kept OUT of the driver's
    # 50-row gate (see __spark_entry__.queries docstring)
    qs = {**qs, **entrymod.extra_queries()}
    oracles = {**oracles, **entrymod.extra_oracle_sql()}
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
            rec["spark_cols"] = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            rec["spark_error"] = f"{type(e).__name__}: {str(e)[:400]}"
            results[name] = rec
            continue
        sql = oracles.get(name)
        if sql is None:
            rec["status"] = "rows_only"
            rec["ok"] = rec["spark_rows"] >= 0
            results[name] = rec
            continue
        try:
            odf = con.sql(sql).df()
            rec["oracle_rows"] = len(odf)
            rec["oracle_cols"] = sorted(odf.columns)
        except Exception as e:  # noqa: BLE001
            rec["oracle_error"] = f"{type(e).__name__}: {str(e)[:400]}"
            results[name] = rec
            continue
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["cols_match"] = rec["spark_cols"] == rec["oracle_cols"]
        sh, oh = frame_hash(sdf), frame_hash(odf)
        rec["hash_match"] = sh == oh
        rec["ok"] = rec["rows_match"] and rec["cols_match"] and rec["hash_match"]
        if not rec["ok"]:
            rec["spark_head"] = sdf.head(3).to_dict("records")
            rec["oracle_head"] = odf.head(3).to_dict("records")
        results[name] = rec
    if existing is None:
        spark.stop()
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    res = run(sf, only)
    n_ok = sum(1 for r in res.values() if r.get("ok"))
    for name, r in res.items():
        status = "OK " if r.get("ok") else ("ROWS" if r.get("status") == "rows_only" else "FAIL")
        print(f"{status} {name}: {({k: v for k, v in r.items() if k not in ('spark_head', 'oracle_head')})}")
        if not r.get("ok"):
            for k in ("spark_head", "oracle_head"):
                if k in r:
                    print(f"    {k}: {r[k]}")
    print(f"\n{n_ok}/{len(res)} ok")
