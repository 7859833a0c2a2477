"""Bucketed tables: co-located joins with NO shuffle on either side.

The 100 TB join strategy: land fact tables bucketed by their join key
once at write time, and every subsequent equi-join on that key skips
both exchanges entirely (plan-asserted here).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.plans.explain import formatted_plan
from collect_mobile_devices_datalake_spark.session import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    for name, df, key in [("b_orders", orders, "o_orderkey"), ("b_lineitem", li, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark
    for name in ["b_orders", "b_lineitem"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the join strategy is the bucketed sort-merge path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        l = spark.table("b_lineitem")
        j = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderstatus").agg(
            F.count("*").alias("n")
        )
        plan = formatted_plan(j)
        join_section = plan.split("HashAggregate")[0]
        # the join inputs read pre-bucketed data: no hash exchange below the join
        assert "SortMergeJoin" in plan
        exchanges_before_join = len(re.findall(r"\(\d+\) Exchange", join_section))
        assert exchanges_before_join == 0, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_matches_unbucketed(bucketed):
    spark = bucketed
    o = spark.table("b_orders")
    l = spark.table("b_lineitem")
    got = {
        (r["o_orderstatus"], r["n"])
        for r in o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    want = {
        (r["o_orderstatus"], r["n"])
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
