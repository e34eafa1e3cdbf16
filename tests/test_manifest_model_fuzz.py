"""Model-based random fuzz of the ManifestTable format (r14): drive random
APPEND / COMPACT / VACUUM / idempotent-replay sequences against both the
real directory-backed table and a trivial pure-Python model (a dict of
version → list-of-row-ids), then require every surviving version to read
back EXACTLY the model's rows and every expired version to raise.

The fixed tests in test_table_format.py pin known shapes (empty commits,
single-file compaction, vacuum horizons); this file samples the space of
HISTORIES between them — interleavings the implementation's bookkeeping
(parent chains, file liveness under vacuum, replayed commit names) has to
get right for every prefix, not just the handful of curated ones."""

from __future__ import annotations

import random
import shutil

import pytest
from pyspark.sql import functions as F

from bigdatawork_spark.sources.io_ops import _tmp
from bigdatawork_spark.sources.manifest_format import ManifestTable


def _ids(df) -> list[int]:
    return sorted(r["rid"] for r in df.collect())


@pytest.mark.parametrize("seed", [7, 23, 61, 89])
def test_manifest_random_histories_match_model(seed, spark):
    rng = random.Random(seed)
    path = _tmp(f"mt_fuzz_{seed}")
    shutil.rmtree(path, ignore_errors=True)
    t = ManifestTable(spark, path)

    model: dict[int, list[int]] = {}   # version -> row ids
    expired: set[int] = set()
    next_rid = 0
    named_batches: dict[str, tuple[int, list[int]]] = {}  # name -> (version, rids)

    def snapshot() -> list[int]:
        live = [v for v in model if v not in expired]
        return model[max(live)] if live else []

    n_ops = rng.randint(6, 14)
    for _ in range(n_ops):
        op = rng.choice(["append", "append", "append_named", "replay",
                         "compact", "vacuum"])
        if op in ("append", "append_named"):
            k = rng.randint(0, 5)  # 0 = empty commit
            rids = list(range(next_rid, next_rid + k))
            next_rid += k
            df = spark.createDataFrame(
                [(r, float(r)) for r in rids] or [], "rid long, v double"
            )
            name = f"batch-{len(named_batches)}" if op == "append_named" else None
            ver = t.append(df, n_files=rng.randint(1, 3), name=name)
            model[ver] = snapshot() + rids if ver not in model else model[ver]
            if name is not None:
                named_batches[name] = (ver, rids)
        elif op == "replay" and named_batches:
            # re-appending an already-committed name must be a NO-OP
            # returning the original version (exactly-once sink contract)
            name, (ver, rids) = rng.choice(sorted(named_batches.items()))
            df = spark.createDataFrame(
                [(r, float(r)) for r in rids] or [], "rid long, v double"
            )
            got = t.append(df, name=name)
            assert got == ver, f"replay of {name} created version {got} != {ver}"
        elif op == "compact" and model:
            ver = t.compact(n_files=rng.randint(1, 2))
            model[ver] = snapshot()
        elif op == "vacuum" and model:
            live = sorted(v for v in model if v not in expired)
            keep = rng.randint(1, len(live))
            t.vacuum(keep_last=keep)
            expired.update(live[:-keep])

    live = sorted(v for v in model if v not in expired)
    assert live, "fuzz should always end with at least one live version"
    assert t.versions() == live
    for v in live:
        assert _ids(t.read(v)) == sorted(model[v]), f"version {v} diverged"
    for v in sorted(expired):
        with pytest.raises(KeyError):
            t.read(v)
    # change-feed contract at the vacuum horizon: replaying added_files
    # of every surviving non-compact version over the horizon base must
    # reconstruct the latest snapshot (compact commits rewrite files but
    # leave the snapshot unchanged, so a CDC reader skips them)
    feed_files: list[str] = []
    for i, v in enumerate(live):
        if i > 0 and t._manifest(v)["action"] == "compact":
            continue
        feed_files.extend(t.added_files(v))
    if feed_files:
        rebuilt = _ids(spark.read.parquet(*feed_files))
        assert rebuilt == sorted(model[live[-1]]), "change feed diverged"
    assert _ids(t.read()) == sorted(model[live[-1]])
    shutil.rmtree(path, ignore_errors=True)
