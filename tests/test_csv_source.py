"""CSV edge round-trip: parquet → csv → DataFrame must be lossless
under a declared schema, and malformed rows must quarantine instead
of failing the ingest."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit6_5840_6_824_lab1_mapreduce_spark.plans import table
from mit6_5840_6_824_lab1_mapreduce_spark.sources.csv import (
    quarantine_split,
    read_csv,
    write_csv,
)

from .conftest import SF_SMOKE

ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderpriority string"
)


def _hash(df):
    cols = sorted(df.columns)
    return (
        df.select(
            F.md5(
                F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()[0][0]
    )


def test_csv_round_trip_lossless(spark, tmp_path):
    # o_orderdate stays out: CSV has no timestamp type — the schema
    # contract is the caller's, which is the point of declaring it.
    o = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    out = str(tmp_path / "orders_csv")
    write_csv(o, out)
    back = read_csv(spark, out, ORDERS_SCHEMA).drop("_corrupt_record")
    assert back.count() == o.count()
    assert _hash(back) == _hash(o)


def test_csv_malformed_rows_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text(
        "o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderpriority\n"
        "1,10,O,99.5,1-URGENT\n"
        "not-a-number,xx,O,abc,also bad\n"
        "2,20,F,12.25,5-LOW\n"
    )
    df = read_csv(spark, str(p), ORDERS_SCHEMA)
    clean, bad = quarantine_split(df)
    assert clean.count() == 2
    assert sorted(r.o_orderkey for r in clean.collect()) == [1, 2]
    assert bad.count() == 1
    assert "not-a-number" in bad.collect()[0]._corrupt_record


def test_csv_gzip_shards_read_back(spark, tmp_path):
    o = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    out = str(tmp_path / "orders_gz")
    write_csv(o, out, compress=True)
    back = read_csv(spark, out, "o_orderkey long, o_custkey long")
    clean, bad = quarantine_split(back)
    assert bad.count() == 0
    assert clean.count() == o.count()
