"""Time every registered query and flag stragglers.

Usage: ``python tools/perf_sweep.py [sf_dir] [threshold_sec]``
(defaults: /root/testdata/sf0.01, 3.0). Prints one JSON line per query
(sorted slowest-first) and a straggler summary. Wall time includes plan
build + execution (count()), the same shape the driver measures.

This is the perf feedback loop for the LONG TAIL — bench.py covers the
headline queries; this sweep catches a new operator that silently ships
an anti-scale plan.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from collect_mobile_devices_datalake_spark import registry  # noqa: E402
from collect_mobile_devices_datalake_spark.session import get_spark  # noqa: E402


def check_calibration_drift(
    repo_root: str | None = None, max_ratio: float = 1.2
) -> list[str]:
    """Flag BENCH_r*.json rounds whose calibration row drifted >max_ratio
    from the recorded-round median — those rounds measured the machine as
    much as the code, and their per-query ratios need a clean-box re-read
    before being treated as regressions. Returns the flagged round names
    (also printed to stderr by main)."""
    import glob
    import os
    import statistics

    if repo_root is None:
        # resolve relative to this file, not the caller's cwd — running
        # the sweep from elsewhere used to silently find zero BENCH files
        # and report no drift (ADVICE r12)
        repo_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cals: dict[str, float] = {}
    for p in sorted(glob.glob(os.path.join(repo_root, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        c = d.get("calibration_sec")
        if isinstance(c, (int, float)) and c > 0:
            cals[os.path.basename(p)] = float(c)
    # with only 2 calibrated rounds median == mean and either round
    # drifting flags the other symmetrically — require 3+ (ADVICE r12)
    if len(cals) < 3:
        return []
    med = statistics.median(cals.values())
    return [
        f"{name}: calibration {c:.2f}s vs median {med:.2f}s ({c / med:.2f}x)"
        for name, c in cals.items()
        if c / med > max_ratio
    ]


def baseline_v2_ratios(
    bench_path: str, v2_path: str | None = None, gate: float = 2.0
) -> list[str]:
    """Per-query ratios of a BENCH_rN.json against the calibrated §C-v2
    baseline (docs/BASELINE_V2.json), load-normalized: each side's time
    is divided by its own run's calibration_sec before comparing, so the
    gate measures CODE, not box drift — closing the r12 phantom-ratio
    problem (§C first-green rows predate calibration and can't be
    normalized). Returns 'query: Nx' lines exceeding ``gate``; prints
    nothing itself. Queries absent from the v2 table (added after its
    recording) are skipped — record them into v2 on the next quiet box."""
    import os

    if v2_path is None:
        v2_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "docs",
            "BASELINE_V2.json",
        )
    try:
        with open(bench_path) as f:
            bench = json.load(f)
        with open(v2_path) as f:
            v2 = json.load(f)
    except (OSError, json.JSONDecodeError):
        return []
    bcal, vcal = bench.get("calibration_sec"), v2.get("calibration_sec")
    if not bcal or not vcal:
        return []
    # Streaming-protocol rows are fs-bound (availableNow checkpoint /
    # compaction traffic), so CPU calibration OVER-corrects them on a
    # busy box — normalize them by the fs calibration row when both
    # sides carry one (bench.py's write-fsync-read-delete loop),
    # falling back to the CPU row otherwise.
    _root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    if _root not in sys.path:
        sys.path.insert(0, _root)
    try:
        from bench import STREAMING as _streaming
    except ImportError:  # pragma: no cover - bench.py always at repo root
        _streaming = []
    bfs, vfs = bench.get("calibration_fs_sec"), v2.get("calibration_fs_sec")
    out = []
    for name, v2_sec in sorted(v2.get("queries", {}).items()):
        b_sec = bench.get("queries", {}).get(name)
        if b_sec is None or v2_sec <= 0:
            continue
        if name in _streaming and bfs and vfs:
            ratio = (b_sec / bfs) / (v2_sec / vfs)
        else:
            ratio = (b_sec / bcal) / (v2_sec / vcal)
        if ratio > gate:
            out.append(f"{name}: {ratio:.2f}x (raw {b_sec:.2f}s vs v2 {v2_sec:.2f}s)")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    registry._ensure_loaded()
    spark = get_spark("perf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    for name, spec in registry.REGISTRY.items():
        t0 = time.time()
        try:
            spec.spark(spark, sf_dir).count()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # pragma: no cover - diagnostic path
            times[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print(json.dumps({"sf_dir": sf_dir, "total_sec": round(sum(max(v, 0) for v in times.values()), 1),
                      "slowest": ranked[:20]}))
    stragglers = [(n, t) for n, t in ranked if t >= threshold]
    if stragglers:
        print(f"{len(stragglers)} stragglers >= {threshold}s:", file=sys.stderr)
        for n, t in stragglers:
            print(f"  {t:7.2f}s  {n}", file=sys.stderr)
    drifted = check_calibration_drift()
    if drifted:
        print("calibration drift (>1.2x of recorded-round median) — treat "
              "these rounds' BENCH ratios as load-suspect:", file=sys.stderr)
        for line in drifted:
            print(f"  {line}", file=sys.stderr)
    # load-normalized 2x gate against the calibrated §C-v2 baseline for
    # the newest recorded round
    import glob
    import os

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if benches:
        flagged = baseline_v2_ratios(benches[-1])
        if flagged:
            print(f"§C-v2 gate (>2x load-normalized) in {benches[-1]}:",
                  file=sys.stderr)
            for line in flagged:
                print(f"  {line}", file=sys.stderr)


if __name__ == "__main__":
    main()
