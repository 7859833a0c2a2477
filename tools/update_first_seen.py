"""Maintain registry_first_seen.json — the seniority ledger the driver
rotation uses to order the never-sampled bucket (registry.py policy).

Any registered key missing from the ledger is stamped with
(latest recorded CORRECTNESS round) + 1 — i.e. "new as of the round
currently being built". Run this after adding operators (the registry
invariant test fails if the ledger is incomplete). Keys that left the
registry are dropped.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from collect_mobile_devices_datalake_spark import registry  # noqa: E402


def main() -> None:
    registry._ensure_loaded()
    hist = registry._correctness_history()
    current_round = (hist[-1][0] if hist else 0) + 1
    path = os.path.join(
        os.path.dirname(os.path.abspath(registry.__file__)),
        "registry_first_seen.json",
    )
    ledger = registry._first_seen()
    added = [k for k in registry.REGISTRY if k not in ledger]
    removed = [k for k in ledger if k not in registry.REGISTRY]
    for k in added:
        ledger[k] = current_round
    for k in removed:
        del ledger[k]
    with open(path, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
    print(f"{path}: {len(ledger)} keys (+{len(added)}, -{len(removed)})")


if __name__ == "__main__":
    main()
