"""Report driver-gate coverage: which registered queries have a hard
CORRECTNESS row from any round, and which never made the sample.

Run from the repo root: ``python tools/rotation_report.py``. The driver
prefix is no longer hand-pinned: ``registry._ensure_loaded()`` derives
``_DRIVER_PRIORITY`` from the CORRECTNESS_r*.json history (never-sampled
first, then latest-red, then least-recently-certified backfill — policy
documented in registry.py). This report shows what that policy produced.
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from collect_mobile_devices_datalake_spark.registry import (  # noqa: E402
    REGISTRY,
    _ensure_loaded,
)


def main() -> None:
    _ensure_loaded()
    checked: set[str] = set()
    per_round: dict[str, set[str]] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        keys = set(json.load(open(f)))
        per_round[f] = keys
        checked |= keys
    order = list(REGISTRY)
    never = [k for k in order if k not in checked]
    print(f"registered: {len(order)}; driver-checked (any round): "
          f"{len(checked & set(order))}; never checked: {len(never)}")
    for f, keys in per_round.items():
        print(f"  {f}: {len(keys)} keys")
    print("\nnever-checked, in current registration order:")
    for k in never:
        print(f"  {k}")
    in_sample = order[:50]
    stale = [k for k in in_sample if k in checked]
    print(f"\ncurrent first-50 sample: {len(in_sample) - len(stale)} "
          f"first-time keys, {len(stale)} re-certifications")

    # breakdown of the derived prefix by policy tier
    last_round: dict[str, int] = {}
    for f, keys in per_round.items():
        import re
        rnd = int(re.search(r"r(\d+)", f).group(1))
        for k in keys:
            last_round[k] = max(last_round.get(k, 0), rnd)
    recert = [(k, last_round[k]) for k in stale]
    print("\nre-certified keys (key, last driver round):")
    for k, rnd in recert:
        print(f"  {k}  r{rnd}")


if __name__ == "__main__":
    main()
