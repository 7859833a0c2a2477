"""Standard lake formats: schema-checked readers/writers beyond parquet.

The reference persists to MySQL only (app.js:401-436); a lake engine has
to speak the interchange formats too. Thin, opinionated wrappers:

- explicit schema on read (never infer on a 100 TB path — inference
  samples the data and silently widens types between runs);
- csv written with header + explicit null marker so round-trips are
  lossless for the supported types;
- json as JSON Lines (one object per line — splittable, so a 100 TB
  directory still parallelizes per-file/per-block);
- orc for engines that bucket on it.

Complex columns (map/array/struct) are json-encoded on csv write and
decoded on read — csv itself has no nested types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NULL = "\\N"


def write_csv(df: DataFrame, path: str) -> None:
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            out = out.withColumn(f.name, F.to_json(f.name))
    out.write.mode("overwrite").option("header", True).option(
        "nullValue", _NULL
    ).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    # read complex columns as the json strings they were written as…
    flat = T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType()
                if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
                else f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ]
    )
    df = (
        spark.read.schema(flat)
        .option("header", True)
        .option("nullValue", _NULL)
        .csv(path)
    )
    # …then decode them back to their declared types
    for f in schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            df = df.withColumn(f.name, F.from_json(f.name, f.dataType))
    return df


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
