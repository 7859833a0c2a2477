"""fan_out helper: spreads narrow scans, no-op at real parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.session import fan_out, load_table

from .conftest import SF_SMOKE


def test_fan_out_spreads_single_partition_scan(spark):
    d = load_table(spark, "documents", SF_SMOKE)
    assert d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    f = fan_out(d, "doc_id")
    assert f.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # values untouched
    assert f.count() == d.count()
    h = lambda x: x.select(F.bit_xor(F.xxhash64("doc_id", "text"))).first()[0]  # noqa: E731
    assert h(f) == h(d)


def test_fan_out_noop_when_scan_already_wide(spark, tmp_path):
    """fan_out decides from scan metadata (file count / size estimate), never
    df.rdd — a many-file table, the 100 TB shape, passes through unchanged."""
    d = load_table(spark, "documents", SF_SMOKE)
    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "wide_docs")
    d.repartition(target + 5, "doc_id").write.parquet(path)
    wide = spark.read.parquet(path)
    assert len(wide.inputFiles()) >= target
    same = fan_out(wide, "doc_id")
    # unchanged frame: no extra repartition inserted
    assert same is wide


def test_fan_out_without_keys_round_robins(spark):
    d = load_table(spark, "nation", SF_SMOKE)
    f = fan_out(d)
    assert f.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert f.count() == d.count()


def test_table_fingerprint_detects_preserved_mtime_rewrite(tmp_path):
    """A corpus rewritten in place with size AND mtime preserved (cp -p,
    rsync -t, archive extraction) must still change the fingerprint —
    the 16-byte tail sample catches what metadata alone cannot. Stale
    fingerprints would serve cached PPJoin mode / doc counts built from
    the previous bytes (ADVICE r8)."""
    import os

    from collect_mobile_devices_datalake_spark.session import table_fingerprint

    root = tmp_path / "documents.parquet"
    root.mkdir()
    f = root / "part-0.parquet"
    f.write_bytes(b"A" * 64)
    st = os.stat(f)
    fp1 = table_fingerprint(str(tmp_path), "documents")

    # same size, same mtime, different trailing bytes
    f.write_bytes(b"A" * 48 + b"B" * 16)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    fp2 = table_fingerprint(str(tmp_path), "documents")
    assert fp1 != fp2

    # identical bytes + restored mtime -> identical fingerprint (cache
    # hits survive a byte-identical rewrite)
    f.write_bytes(b"A" * 64)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert table_fingerprint(str(tmp_path), "documents") == fp1

    # file-count changes are folded in even when tails/sizes repeat
    (root / "part-1.parquet").write_bytes(b"A" * 64)
    assert table_fingerprint(str(tmp_path), "documents") != fp1


def test_ann_index_sweep_liveness_rules(tmp_path, monkeypatch):
    """Dead-pid + aged roots go; live-pid and young roots stay; unmarked
    roots obey the age bar — the stream-temp-root rules applied to the
    persisted ANN index dirs."""
    import os
    import time

    import collect_mobile_devices_datalake_spark.operators.similarity as S

    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    old = time.time() - 7200
    live = tmp_path / f"ann_index_pid{os.getpid()}_x"  # me: alive
    dead_old = tmp_path / "ann_index_pid999999999_x"
    dead_young = tmp_path / "ann_index_pid999999998_y"
    unmarked_old = tmp_path / "ann_index_legacy"
    for d in (live, dead_old, dead_young, unmarked_old):
        d.mkdir()
    os.utime(live, (old, old))
    os.utime(dead_old, (old, old))
    os.utime(unmarked_old, (old, old))
    S.sweep_stale_ann_indexes(min_age_sec=3600)
    assert live.exists()          # alive pid, never swept inside TTL
    assert not dead_old.exists()  # dead pid + aged
    assert dead_young.exists()    # dead pid but young (recycling guard)
    assert not unmarked_old.exists()  # legacy, age bar only

    # ADVICE r12: the live-pid exemption is capped at 4x the hard TTL —
    # a pid recycled by an unrelated long-lived process must not pin an
    # orphaned index dir forever
    ancient = time.time() - 10 * 86400
    live_ancient = tmp_path / f"ann_index_pid{os.getpid()}_z"
    live_ancient.mkdir()
    os.utime(live_ancient, (ancient, ancient))
    S.sweep_stale_ann_indexes(min_age_sec=3600, hard_ttl_sec=2 * 86400)
    assert live.exists()              # alive + under the cap: stays
    assert not live_ancient.exists()  # alive but past 4x hard TTL: goes
