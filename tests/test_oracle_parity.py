"""Every registered query with an oracle must match DuckDB at sf0.01."""

from __future__ import annotations

import pytest

from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle_harness import compare

_ensure_loaded()
ORACLED = [n for n, s in sorted(REGISTRY.items()) if s.oracle is not None]


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, SF_ORACLE)
    report = compare(df, spec.oracle, SF_ORACLE)
    assert report["ok"], f"{name}: {report['errors']}"
    assert report["spark_rows"] > 0, f"{name}: empty result"


def test_no_complex_typed_output_columns(spark):
    """The driver's pandas canonicalizer cannot hash list/dict cells, so no
    registered query may expose array/map/struct output columns — stringify
    (array_join / to_json) instead. Schema-only check, nothing executes."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, spec in sorted(REGISTRY.items()):
        df = spec.spark(spark, SF_SMOKE)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders


def test_all_queries_return_rows(spark):
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            df = spec.spark(spark, SF_ORACLE)
            assert df.count() > 0, f"{name}: empty result"
