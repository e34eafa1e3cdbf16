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


# seeds 65 and 111 were model-searched to exercise the UNRECOVERABLE-name
# re-append branch (and 111 the compact-seals-the-heal path) — the first
# four seeds alone never lose a name to the compaction+vacuum horizon
@pytest.mark.parametrize("seed", [11, 37, 73, 101, 65, 111])
def test_manifest_preledger_upgrade_histories_match_model(seed, spark):
    """ADVICE r14 follow-through, fuzz form: the fixed test pins ONE
    pre-ledger shape (strip → compact → replay); this samples random
    strip points and post-strip interleavings.  Model of the documented
    migration contract:

    - a pre-strip NAME is RECOVERABLE while some live manifest still
      references its data files — i.e. some live version v with
      named_ver <= v < first compact after it (compaction rewrites the
      file list, ending the reference chain);
    - a replay of a recoverable name is a NO-OP creating no version and
      returning a version in [named_ver, first_compact) — the exact
      original only when the named manifest itself survived vacuum
      (disclosed horizon-floor limit);
    - a replay of an UNRECOVERABLE name re-appends (disclosed migration
      limit) and from then on is ledger-protected like any new name;
    - the first post-strip commit of ANY action (append, compact, or a
      replay that re-appends) seals the heal into an authoritative
      ledger, after which vacuum can no longer change recoverability.
    """
    import json
    import os

    rng = random.Random(seed)
    path = _tmp(f"mt_fuzz_pre_{seed}")
    shutil.rmtree(path, ignore_errors=True)
    t = ManifestTable(spark, path)

    model: dict[int, list[int]] = {}
    expired: set[int] = set()
    next_rid = 0
    named_batches: dict[str, tuple[int, list[int]]] = {}
    compact_versions: list[int] = []
    stripped = False
    sealed = False  # a post-strip commit has frozen the healed ledger
    sealed_names: set[str] = set()  # names recoverable at seal time

    def snapshot() -> list[int]:
        live = [v for v in model if v not in expired]
        return model[max(live)] if live else []

    def recoverable_now() -> set[str]:
        live = sorted(v for v in model if v not in expired)
        out = set()
        for name, (ver, _rids) in named_batches.items():
            nxt = min((c for c in compact_versions if c > ver),
                      default=10 ** 9)
            if any(ver <= v < nxt for v in live):
                out.add(name)
        return out

    def protected(name: str) -> bool:
        # is a replay of this pre-strip name guaranteed a no-op?
        if not stripped:
            return True
        return name in sealed_names if sealed else name in recoverable_now()

    def seal(extra: str | None = None) -> None:
        # the commit ABOUT to happen freezes the heal (idempotent)
        nonlocal sealed, sealed_names
        if stripped and not sealed:
            sealed = True
            sealed_names = recoverable_now()
        if sealed and extra is not None:
            sealed_names.add(extra)

    strip_at = rng.randint(2, 7)
    n_ops = rng.randint(8, 16)
    for i in range(n_ops):
        if i == strip_at and model and not stripped:
            for f in os.listdir(path):
                if f.startswith("manifest-v"):
                    fp = os.path.join(path, f)
                    with open(fp) as fh:
                        m = json.load(fh)
                    m.pop("txn", None)
                    with open(fp, "w") as fh:
                        json.dump(m, fh)
            stripped = True
        op = rng.choice(["append", "append_named", "replay", "replay",
                         "compact", "vacuum"])
        if op in ("append", "append_named"):
            k = rng.randint(0, 5)
            rids = list(range(next_rid, next_rid + k))
            next_rid += k
            df = spark.createDataFrame(
                [(r, float(r)) for r in rids] or [], "rid long, v double"
            )
            name = (f"pre-batch-{len(named_batches)}"
                    if op == "append_named" else None)
            seal(extra=name)
            ver = t.append(df, n_files=rng.randint(1, 3), name=name)
            model[ver] = snapshot() + rids
            if name is not None:
                named_batches[name] = (ver, rids)
        elif op == "replay" and named_batches:
            name, (ver, rids) = rng.choice(sorted(named_batches.items()))
            df = spark.createDataFrame(
                [(r, float(r)) for r in rids] or [], "rid long, v double"
            )
            before = t.versions()
            was_protected = protected(name)
            if not was_protected:
                seal(extra=name)  # the re-append about to happen seals
            got = t.append(df, name=name)
            if was_protected:
                assert t.versions() == before, (
                    f"replay of protected {name} created a version")
                assert got >= ver and (got in before or got == ver), (
                    f"replay of {name} returned implausible {got}")
            else:
                # documented migration limit: unrecoverable name
                # re-appends; from here it is ledger-protected
                assert got == before[-1] + 1
                model[got] = snapshot() + rids
                named_batches[name] = (got, rids)
        elif op == "compact" and model:
            seal()
            ver = t.compact(n_files=rng.randint(1, 2))
            model[ver] = snapshot()
            compact_versions.append(ver)
        elif op == "vacuum" and model:
            live = sorted(v for v in model if v not in expired)
            keep = rng.randint(1, len(live))
            t.vacuum(keep_last=keep)
            expired.update(live[:-keep])

    live = sorted(v for v in model if v not in expired)
    assert t.versions() == live
    for v in live:
        assert _ids(t.read(v)) == sorted(model[v]), f"version {v} diverged"
    shutil.rmtree(path, ignore_errors=True)
