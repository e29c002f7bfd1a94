"""Self-check harness mirroring the driver's Spark-vs-DuckDB compare:
row count + column set + order-insensitive value equality, columns
sorted by name. Running this locally before the driver does is the
point — any mismatch here is a mismatch in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mit6_5840_6_824_lab1_mapreduce_spark.plans import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    # Register whichever tables the fixture dir carries (the driver's
    # sf dirs have all of them; synthetic test fixtures may provide a
    # subset — DuckDB validates CREATE VIEW eagerly).
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Stringify everything so dtype differences (int32 vs int64,
    # Decimal vs float) don't mask value-level agreement.
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        def conv(v):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return "<null>"
            if isinstance(v, float):
                return repr(v)
            if isinstance(v, (list, tuple)):
                return "[" + ",".join(conv(x) for x in v) + "]"
            return str(v)
        # astype(object): map() on an EMPTY column preserves its numeric
        # dtype, and DataFrame.equals would then fail two 0-row frames
        # on dtype alone (the driver's value-hash treats them as equal).
        out[c] = col.map(conv).astype(object)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def compare_query(spark, fn, sql: str, sf_dir: str, name: str = "?") -> None:
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        odf = con.sql(sql).df()
    finally:
        con.close()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"

    s, o = _normalize(sdf), _normalize(odf)
    if not s.equals(o):
        neq = (s != o).any(axis=1)
        diff = pd.concat(
            [s[neq].head(5).add_suffix("_spark"), o[neq].head(5).add_suffix("_oracle")],
            axis=1,
        )
        raise AssertionError(f"{name}: value mismatch on {int(neq.sum())} rows:\n{diff}")
