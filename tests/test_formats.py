"""Round-trip tests for the interchange-format wrappers (sources/formats).

Each writer/reader pair must preserve values AND types — including the
csv path's json-encoding of complex columns, which csv itself cannot
represent. Lossless round-trip is the contract a lake export relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from collect_mobile_devices_datalake_spark.session import load_table
from collect_mobile_devices_datalake_spark.sources import formats

from .conftest import SF_SMOKE


@pytest.fixture
def tmp(tmp_path):
    return str(tmp_path)


def _sorted_rows(df):
    return sorted(df.collect(), key=lambda r: tuple(str(v) for v in r))


def test_csv_round_trip_flat(spark, tmp):
    src = load_table(spark, "nation", SF_SMOKE)
    formats.write_csv(src, f"{tmp}/nation_csv")
    back = formats.read_csv(spark, f"{tmp}/nation_csv", src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_round_trip_complex_and_nulls(spark, tmp):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("attrs", T.MapType(T.StringType(), T.LongType())),
            T.StructField("note", T.StringType()),
        ]
    )
    src = spark.createDataFrame(
        [
            Row(id=1, tags=["a", "b"], attrs={"x": 1}, note=None),
            Row(id=2, tags=[], attrs={}, note="\\N literal survives"),
            Row(id=3, tags=None, attrs=None, note="plain"),
        ],
        schema,
    )
    formats.write_csv(src, f"{tmp}/complex_csv")
    back = formats.read_csv(spark, f"{tmp}/complex_csv", schema)
    assert back.schema == schema
    got = {r["id"]: r for r in back.collect()}
    assert got[1]["tags"] == ["a", "b"] and got[1]["attrs"] == {"x": 1}
    assert got[1]["note"] is None
    assert got[3]["tags"] is None and got[3]["attrs"] is None


def test_jsonl_round_trip(spark, tmp):
    src = load_table(spark, "customer", SF_SMOKE).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    formats.write_jsonl(src, f"{tmp}/cust_jsonl")
    back = formats.read_jsonl(spark, f"{tmp}/cust_jsonl", src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_jsonl_is_splittable_lines(spark, tmp):
    """JSON Lines contract: every output file is one object per line, so a
    100 TB directory parallelizes per-block instead of per-document."""
    import glob
    import json

    src = load_table(spark, "region", SF_SMOKE)
    formats.write_jsonl(src, f"{tmp}/region_jsonl")
    n = 0
    for path in glob.glob(f"{tmp}/region_jsonl/part-*"):
        with open(path) as fh:
            for line in fh:
                if line.strip():
                    json.loads(line)
                    n += 1
    assert n == src.count()


def test_orc_round_trip(spark, tmp):
    src = load_table(spark, "supplier", SF_SMOKE)
    formats.write_orc(src, f"{tmp}/supp_orc")
    back = formats.read_orc(spark, f"{tmp}/supp_orc")
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_explicit_schema_no_inference(spark, tmp):
    """read_csv must honor the declared schema even when inference would
    guess differently (e.g. an all-digit string column stays a string)."""
    schema = T.StructType(
        [
            T.StructField("code", T.StringType()),
            T.StructField("qty", T.LongType()),
        ]
    )
    src = spark.createDataFrame([Row(code="007", qty=1), Row(code="42", qty=2)], schema)
    formats.write_csv(src, f"{tmp}/codes_csv")
    back = formats.read_csv(spark, f"{tmp}/codes_csv", schema)
    assert back.schema == schema
    assert {r["code"] for r in back.collect()} == {"007", "42"}
