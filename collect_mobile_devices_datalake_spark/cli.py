"""CLI entry point mirroring the reference dispatch (app.js:756-801).

    python -m collect_mobile_devices_datalake_spark.cli <source> init
    python -m collect_mobile_devices_datalake_spark.cli <source> crawl [parallel]
    python -m collect_mobile_devices_datalake_spark.cli <source> status

- ``init``  — render the source's fixture pages and (over)write its
  frontier (create_source_list, app.js:156-317; TRUNCATE semantics via
  overwrite, app.js:147).
- ``crawl`` — incremental ingest of pending pages (crawl_stack /
  crawl_parallel, app.js:484-537). Parallelism is the cluster's task
  scheduler, so ``parallel`` only widens shuffle partitions — there is
  no chunk-of-5 loop to port.
- ``status`` — per-source progress (the reference's console counters).
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

SOURCES = ["gsmarena", "geekbench", "productz", "versus", "phonearena"]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="collect-mobile-devices-datalake-spark")
    ap.add_argument("source", choices=SOURCES + ["all"])
    ap.add_argument("mode", choices=["init", "crawl", "status"])
    ap.add_argument("parallel", nargs="?", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--lake-dir", default=os.environ.get("SPARK_GRAFT_LAKE", "/tmp/cmd_lake"))
    args = ap.parse_args(argv)

    from .ingest.pipeline import device_specs_view, ingest_source
    from .session import get_spark, load_table
    from .sources.fixtures import spec_pages

    shuffle = 64 if args.parallel == "parallel" else 32
    spark = get_spark("cli", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    sources = SOURCES if args.source == "all" else [args.source]
    part = load_table(spark, "part", args.sf_dir)

    for source in sources:
        pages = spec_pages(part, source)
        if args.mode == "init":
            pages.select("url").write.mode("overwrite").parquet(
                os.path.join(args.lake_dir, "source_list", source)
            )
            print(f"{source}: frontier initialized ({pages.count()} urls)")
        elif args.mode == "crawl":
            n = ingest_source(spark, pages, args.lake_dir, source)
            print(f"{source}: ingested {n} new records")
        else:
            try:
                view = device_specs_view(spark, args.lake_dir)
                n = view.filter(F.col("source") == source).count()
            except Exception:
                n = 0
            print(f"{source}: {n} records in lake")
    return 0


if __name__ == "__main__":
    sys.exit(main())
