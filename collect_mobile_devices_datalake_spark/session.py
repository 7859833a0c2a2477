"""SparkSession factory + table registry.

The session is tuned for the local[32] test harness but every knob is the
one you would set on a real cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on (vectorized pandas-UDF edge),
sane shuffle-partition default that AQE then right-sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "collect-mobile-devices-datalake-spark", *, shuffle_partitions: int = 32) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    AQE is the scale story: at 100 TB the static ``shuffle.partitions``
    is only a ceiling — AQE coalesces post-shuffle partitions to target
    size and splits skewed ones, so the same plan survives a 1000×
    scale-up with a larger initial partition count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type, so
        # read as long and rebuild micros in load_table (matches DuckDB's
        # ns→us truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one driver-generated parquet table.

    Plain ``spark.read.parquet`` keeps predicate pushdown + column pruning
    available to every downstream plan (check ``PushedFilters`` /
    ``ReadSchema`` in ``.explain``).
    """
    # The driver / an embedding app may hand us a vanilla SparkSession that
    # was NOT built by get_spark, so the nanos conf must be (re)applied at
    # runtime — it is runtime-settable — or reading events.parquet throws
    # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as nanos-since-epoch longs (see
    # nanosAsLong in get_spark); truncate to micros exactly like DuckDB does.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Spread a narrow-parallelism scan across the session's cores.

    The local test parquet is written as ONE row group per table, so a scan
    yields one task and every per-row computation downstream (HOF shingling,
    hash signatures, pandas-UDF parses) runs on a single core of 32. A real
    100 TB table has thousands of splits, where this helper detects
    enough splits and returns the frame UNCHANGED — the repartition only
    ever fires where it is already cheap (few, small files).
    Hash-partitioning on the row key keeps the distribution deterministic.

    Width is decided from pure METADATA — ``inputFiles()`` (plan traversal)
    and the optimizer's size estimate (file-size sum for scans) — never
    ``df.rdd``: converting to an RDD materializes a Python-serialized plan
    on every registered query that passes through here and bypasses
    Catalyst for the probe.
    """
    from pyspark.sql import functions as F

    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) >= target:
        return df  # already at least one split per core
    # Few files can still be WIDE: a 10 GB file scans as ~80 splits under
    # maxPartitionBytes. The optimizer's sizeInBytes for a file relation is
    # the file-size sum (a py4j metadata call, no job), so size >= one
    # default split per core means the scan is already parallel.
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # non-JVM-backed or estimation failure: assume narrow
        est = 0
    if est >= target * (128 << 20):
        return df
    cols = [F.col(k) for k in keys]
    return df.repartition(target, *cols) if cols else df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every driver table and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def table_fingerprint(sf_dir: str, table: str) -> str:
    """Cheap content fingerprint of one source table: sorted
    (relpath, size, mtime_ns, tail-bytes) over every file under
    ``{table}.parquet``. Folded into plan-probe / index cache keys so
    regenerating a corpus in place (a test fixture rewriting the same
    path) can never be served stale cached state built from the previous
    bytes. The 16-byte tail sample (a parquet file's footer-length +
    magic plus the end of its serialized metadata) defends against
    rewrites that preserve size AND mtime (``cp -p`` / ``rsync -t`` /
    archive extraction) — metadata alone can't distinguish those. One
    seek+read per file, no Spark job; at 100 TB the same identity comes
    from the lake manifest's snapshot id.
    """
    import hashlib

    def _tail(p: str, n: int = 16) -> bytes:
        try:
            with open(p, "rb") as f:
                if os.path.getsize(p) >= n:
                    f.seek(-n, os.SEEK_END)
                return f.read(n)
        except OSError:
            return b""

    root = os.path.join(sf_dir, f"{table}.parquet")
    h = hashlib.sha1()
    if os.path.isdir(root):
        n_files = 0
        for dirpath, _dirs, files in sorted(os.walk(root)):
            for fn in sorted(files):
                n_files += 1
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                h.update(
                    f"{os.path.relpath(p, root)}:{st.st_size}:{st.st_mtime_ns}:".encode()
                    + _tail(p)
                    + b";"
                )
        h.update(f"#{n_files}".encode())
    else:
        st = os.stat(root)
        h.update(f"{st.st_size}:{st.st_mtime_ns}:".encode() + _tail(root))
    return h.hexdigest()[:12]


from contextlib import contextmanager  # noqa: E402

# r15: scoped_shuffle_width disables AQE when the scoped width fits the
# executor parallelism (module-level so perf harnesses can A/B it).
SCOPED_AQE_OFF = True


@contextmanager
def scoped_shuffle_width(
    spark, n_rows: int, rows_per_partition: int = 50_000, aqe_off: bool = True
):
    """Temporarily size ``spark.sql.shuffle.partitions`` to the data.

    Iterative algorithms (connected components, PageRank, BFS) pay the
    per-round cost of every shuffle task even when the working set is a
    few thousand rows — on the session default width, task overhead
    dominates each round. One partition per ~50k rows (floor 1, ceiling
    4x the executor parallelism) keeps small graphs on a few tasks while
    a billion-row working set still spreads across the cluster. Restores
    the previous width on exit; only the enclosed query plans are
    affected.

    When the computed width is ONE partition, AQE is also disabled for
    the scope (r15): partition coalescing and skew splitting cannot do
    anything to single-partition exchanges, but every exchange still
    pays the adaptive re-planning round trip — measured ~10% of a
    tokenizer learn loop on a quiet box. Data-adaptive, not a
    local-mode constant: any working set above rows_per_partition
    computes parts > 1 and keeps AQE on. Callers whose scope runs a
    Structured Streaming protocol pass ``aqe_off=False`` (the streaming
    guard rows measured AQE-off as noise-level at best there, and those
    rows are gate-guarded).
    """
    parts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism * 4,
            int(n_rows) // rows_per_partition + 1,
        ),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    if aqe_off and SCOPED_AQE_OFF and parts == 1:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
