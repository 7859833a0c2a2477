"""Cross-fixture oracle-parity audit: every oracled query vs DuckDB at
an ALTERNATE scale factor (default sf0.001).

The driver's CORRECTNESS gate and tests/test_oracle_parity.py both run
at sf0.01, so an oracle convention that only holds on that fixture
(the doc_heaps_law blank-document class: DuckDB's
string_split_regex(trim(''), '\\s+') yields [''] while Spark tokens()
yields []) would pass CI and still be latent. Running the SAME strict
compare (tests/oracle_harness.py) on a different fixture flushes that
class out: a query that matches on two independently-generated corpora
is structurally exact, not fixture-lucky.

Run: python tools/cross_fixture_parity.py [sf_dir]
Default: /root/testdata/sf0.001. Exit code = number of failures.
Round-8 audit result: 240/240 green at sf0.001 (384 s).
Not part of the default pytest run (it would roughly double suite
wall time for a property the sf0.01 suite already covers per-round);
run it whenever an oracle's token/NULL/empty-set convention changes.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from collect_mobile_devices_datalake_spark import registry  # noqa: E402
from collect_mobile_devices_datalake_spark.session import get_spark  # noqa: E402
from oracle_harness import compare  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry._ensure_loaded()
    spark = get_spark("cross-fixture-parity")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    failures = 0
    for name, spec in registry.REGISTRY.items():
        if not spec.oracle:
            continue
        try:
            rep = compare(spec.spark(spark, sf), spec.oracle, sf)
            ok = rep.get("ok", False)
        except Exception as ex:  # noqa: BLE001 — audit must keep going
            ok, rep = False, {"errors": [f"{type(ex).__name__}: {ex}"]}
        if not ok:
            failures += 1
            print(f"FAIL {name}: {rep.get('errors')}", flush=True)
    print(f"done in {time.monotonic() - t0:.0f}s; failures: {failures}")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
