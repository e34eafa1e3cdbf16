"""ManifestTable format semantics: version isolation, commit atomicity,
compaction content-preservation, and time travel across compaction."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from bigdatawork_spark.io import load
from bigdatawork_spark.sources.io_ops import _tmp
from bigdatawork_spark.sources.manifest_format import ManifestTable


def _fresh(spark, name):
    path = _tmp(name)
    shutil.rmtree(path, ignore_errors=True)
    return ManifestTable(spark, path), path


def test_version_isolation_and_time_travel(spark, sf_dir):
    t, _ = _fresh(spark, "mt_isolation")
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    n1 = t.append(ev.filter(F.col("event_id") % 2 == 0))
    c1 = t.read(n1).count()
    n2 = t.append(ev.filter(F.col("event_id") % 2 == 1))
    assert t.versions() == [1, 2] and (n1, n2) == (1, 2)
    # v1 read is unchanged by the later append
    assert t.read(1).count() == c1
    assert t.read(2).count() == ev.count()


def test_no_inprogress_manifest_left_behind(spark, sf_dir):
    t, path = _fresh(spark, "mt_atomic")
    ev = load(spark, sf_dir, "events").select("event_id", "value").limit(100)
    t.append(ev)
    assert not [f for f in os.listdir(path) if f.endswith(".inprogress")]
    assert [f for f in os.listdir(path) if f.startswith("manifest-v")] == [
        "manifest-v1.json"
    ]


def test_compaction_preserves_content_and_old_versions(spark, sf_dir):
    t, _ = _fresh(spark, "mt_compact")
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    for r in range(3):
        t.append(ev.filter(F.col("event_id") % 3 == r))
    rows_before = t.read().count()
    files_before = t.file_count()
    v1_count = t.read(1).count()
    cv = t.compact()
    assert t.file_count(cv) < files_before
    assert t.read(cv).count() == rows_before
    # time travel still works across the compaction boundary
    assert t.read(1).count() == v1_count
    # content identical, not just counts
    ids_new = {r.event_id for r in t.read(cv).select("event_id").collect()}
    ids_src = {r.event_id for r in ev.select("event_id").collect()}
    assert ids_new == ids_src


def test_named_append_is_idempotent(spark, sf_dir):
    t, _ = _fresh(spark, "mt_idempotent")
    ev = load(spark, sf_dir, "events").select("event_id", "value").limit(50)
    v = t.append(ev, name="batch-0")
    assert t.append(ev, name="batch-0") == v  # replay is a no-op
    assert t.versions() == [1]
    assert t.append(ev, name="batch-1") == 2  # a new name commits


def test_added_files_change_feed(spark, sf_dir):
    t, _ = _fresh(spark, "mt_added")
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    v1 = t.append(ev.filter(F.col("event_id") % 2 == 0))
    v2 = t.append(ev.filter(F.col("event_id") % 2 == 1))
    assert set(t.added_files(v1)) == set(t._manifest(v1)["files"])
    added = t.added_files(v2)
    assert set(added).isdisjoint(t._manifest(v1)["files"])
    n_odd = ev.filter(F.col("event_id") % 2 == 1).count()
    assert spark.read.parquet(*added).count() == n_odd


def test_manifest_random_histories(spark):
    """Property battery: ANY interleaving of appends and compactions
    preserves (a) latest-version content = union of all appended batches,
    (b) every historical version's row count frozen at commit time,
    (c) compaction never changes content.  Mirrors the hypothesis-style
    strategy of test_random_differential with a command-sequence domain
    (hypothesis itself drives Spark too slowly per example, so this uses
    seeded random programs — same coverage intent)."""
    import random

    rng = random.Random(7)
    base = spark.range(0, 400).selectExpr("id", "id % 7 AS k")
    for trial in range(4):
        t, _ = _fresh(spark, f"mt_prop_{trial}")
        expected_total = 0
        version_counts = {}
        n_ops = rng.randint(2, 5)
        for _ in range(n_ops):
            if t.versions() and rng.random() < 0.4:
                v = t.compact(n_files=rng.randint(1, 3))
            else:
                lo = rng.randint(0, 300)
                hi = rng.randint(lo + 1, 400)
                batch = base.filter((F.col("id") >= lo) & (F.col("id") < hi))
                expected_total += hi - lo
                v = t.append(batch, n_files=rng.randint(1, 3))
            version_counts[v] = expected_total
            # every version ever committed still reads at its frozen count
            for pv, cnt in version_counts.items():
                assert t.read(pv).count() == cnt, (trial, pv)
        assert t.read().count() == expected_total
