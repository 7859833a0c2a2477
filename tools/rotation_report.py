"""Report driver-gate coverage: which registered queries have a hard
CORRECTNESS row from any round, and which never made the sample.

Run from the repo root: ``python tools/rotation_report.py``. Feed the
never-checked list into ``registry._DRIVER_PRIORITY`` next round so the
driver's first-50 sample certifies new surface instead of re-certifying
the same keys.
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


if __name__ == "__main__":
    main()
