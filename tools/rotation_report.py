"""Report driver-gate coverage: which registered queries have a hard
CORRECTNESS row from any round, and which never made the sample.

Run from the repo root: ``python tools/rotation_report.py``. The driver
prefix is no longer hand-pinned: ``registry._ensure_loaded()`` derives
``_DRIVER_PRIORITY`` from the CORRECTNESS_r*.json history (latest-red
first, then never-sampled, then least-recently-certified backfill —
policy documented in registry.py). This report shows what that policy
produced, using the SAME history fold the policy uses (no parallel
implementation to drift).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from collect_mobile_devices_datalake_spark.registry import (  # noqa: E402
    DRIVER_SAMPLE_SIZE,
    REGISTRY,
    _correctness_history,
    _ensure_loaded,
)


def main() -> None:
    _ensure_loaded()
    history = _correctness_history()
    checked: set[str] = set()
    last_round: dict[str, int] = {}
    for rnd, rows in history:
        for k in rows:
            checked.add(k)
            last_round[k] = rnd
    order = list(REGISTRY)
    never = [k for k in order if k not in checked]
    print(f"registered: {len(order)}; driver-checked (any round): "
          f"{len(checked & set(order))}; never checked: {len(never)}")
    for rnd, rows in history:
        print(f"  round {rnd}: {len(rows)} keys")
    print("\nnever-checked, in current registration order:")
    for k in never:
        print(f"  {k}")
    in_sample = order[:DRIVER_SAMPLE_SIZE]
    stale = [k for k in in_sample if k in checked]
    print(f"\ncurrent first-{DRIVER_SAMPLE_SIZE} sample: "
          f"{len(in_sample) - len(stale)} first-time keys, "
          f"{len(stale)} re-certifications")
    print("\nre-certified keys (key, last driver round):")
    for k in stale:
        print(f"  {k}  r{last_round[k]}")


if __name__ == "__main__":
    main()
