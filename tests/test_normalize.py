"""Unit tests for the normalization function library (reference semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.functions.normalize import (
    brand_model_split,
    merge_last_wins,
    strip_trailing_underscores,
    to_key,
    url_dequery,
    value_unit_concat,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_to_key_matches_reference(spark):
    # app.js:99 — lowercase, whitespace+punct → '_'
    cases = {
        "Display Size": "display_size",
        "CPU (GHz)": "cpu__ghz_",
        "Multi-core Score!": "multi_core_score_",
        "a.b,c;d": "a_b_c_d",
        "UPPER lower": "upper_lower",
        "tab\there": "tab_here",
    }
    for raw, want in cases.items():
        got = _one(spark, to_key(F.lit(raw)))
        assert got == want, f"{raw!r}: {got!r} != {want!r}"


def test_to_key_idempotent_and_charset(spark):
    import string

    raw = "Mixed CASE & Punct-uation!!"
    once = _one(spark, to_key(F.lit(raw)))
    twice = _one(spark, to_key(to_key(F.lit(raw))))
    assert once == twice
    assert set(once) <= set(string.ascii_lowercase + string.digits + "_")


def test_strip_trailing_underscores(spark):
    assert _one(spark, strip_trailing_underscores(F.lit("key___"))) == "key"
    assert _one(spark, strip_trailing_underscores(F.lit("k_e_y"))) == "k_e_y"


def test_merge_last_wins(spark):
    # app.js:100 — later duplicate keys overwrite; trailing _ stripped first
    entries = F.array(
        F.struct(F.lit("brand__").alias("key"), F.lit("first").alias("value")),
        F.struct(F.lit("brand").alias("key"), F.lit("second").alias("value")),
        F.struct(F.lit("other").alias("key"), F.lit("x").alias("value")),
    )
    got = _one(spark, merge_last_wins(entries))
    assert got == {"brand": "second", "other": "x"}


def test_brand_model_split_plain(spark):
    row = spark.range(1).select(brand_model_split(F.lit("Samsung Galaxy S21")).alias("s")).first()["s"]
    assert row["brand"] == "Samsung" and row["model"] == "Galaxy S21"


def test_brand_model_split_single_token(spark):
    # app.js:581 — single-token models keep the token as model too
    row = spark.range(1).select(brand_model_split(F.lit("Nexus")).alias("s")).first()["s"]
    assert row["brand"] == "Nexus" and row["model"] == "Nexus"


def test_brand_model_split_ios_override(spark):
    # app.js:630-635 — ios devices force brand Apple, model not shifted
    row = (
        spark.range(1)
        .select(brand_model_split(F.lit("iPhone 12 Pro"), F.lit("ios")).alias("s"))
        .first()["s"]
    )
    assert row["brand"] == "Apple" and row["model"] == "iPhone 12 Pro"


def test_value_unit_concat(spark):
    # app.js:702 — JS Array.toString comma-join + optional unit, trimmed
    got = _one(
        spark,
        value_unit_concat(F.array(F.lit("1"), F.lit("2")), F.lit(" GB")),
    )
    assert got == "1,2 GB"
    got2 = _one(spark, value_unit_concat(F.array(F.lit("x")), F.lit(None).cast("string")))
    assert got2 == "x"


def test_url_dequery(spark):
    assert (
        _one(spark, url_dequery(F.lit("https://a.b/c?x=1#frag"))) == "https://a.b/c"
    )
    assert _one(spark, url_dequery(F.lit("https://a.b/c"))) == "https://a.b/c"
