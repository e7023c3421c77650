"""Tags + zero-copy CLONE (sources/refs.py): immutable named versions
that pin vacuum retention, and hardlink clones whose lifecycles are
fully independent of the source table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources import refs
from hadoop_prototype_spark.sources import snapshots as sn


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def _table(spark, n=400, parts=4):
    return spark.range(n).repartitionByRange(parts, "id").selectExpr(
        "id AS k", "CAST(id * 10 AS BIGINT) AS v"
    )


def _merge_one(spark, path, k, v):
    upd = spark.createDataFrame([(k, v)], "k bigint, v bigint")
    return sn.merge_into(spark, path, upd, "k")


def test_tag_create_read_list_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    _merge_one(spark, path, 3, -3)

    ref = refs.create_tag(path, "release-a", version=1)
    assert ref["version"] == 1 and ref["n_rows"] == 400
    refs.create_tag(path, "release-b")  # defaults to current (v2)
    assert refs.tag_version(path, "release-b") == 2
    assert [r["name"] for r in refs.list_tags(path)] == ["release-a", "release-b"]

    # tagged read == versioned read, even after later writes
    _merge_one(spark, path, 5, -5)
    assert _rows(refs.read_table_tag(spark, path, "release-a")) == _rows(
        sn.read_table(spark, path, version=1)
    )

    # immutability: re-tagging a name raises; delete + recreate moves it
    with pytest.raises(FileExistsError):
        refs.create_tag(path, "release-a", version=3)
    refs.delete_tag(path, "release-a")
    refs.create_tag(path, "release-a", version=3)
    assert refs.tag_version(path, "release-a") == 3

    with pytest.raises(FileNotFoundError):
        refs.tag_version(path, "nope")
    with pytest.raises(FileNotFoundError):
        refs.delete_tag(path, "nope")
    with pytest.raises(ValueError):
        refs.create_tag(path, "bad/name")


def test_tag_of_missing_version_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    with pytest.raises(FileNotFoundError):
        refs.create_tag(path, "ghost", version=9)


def test_vacuum_keeps_tagged_version_readable(spark, tmp_path):
    """A tag is a retention pin: vacuum must keep the tagged version's
    log entry (rewritten as a full checkpoint when it was a delta) and
    its data files, while still reclaiming untagged dropped versions."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=200), path, "k")
    # build a delta chain long enough that the tag lands mid-chain
    for i in range(6):
        _merge_one(spark, path, 1000 + i, -i)
    tagged_v = 3  # a DELTA entry (not v1, not a checkpoint multiple)
    want = _rows(sn.read_table(spark, path, version=tagged_v))
    refs.create_tag(path, "pinned", version=tagged_v)

    r = sn.vacuum(path, keep_last=2, retention_seconds=0.0)
    assert r["log_entries_removed"] > 0
    # tagged version: entry retained AND readable (files kept)
    assert _rows(sn.read_table(spark, path, version=tagged_v)) == want
    assert _rows(refs.read_table_tag(spark, path, "pinned")) == want
    # untagged dropped versions are really gone
    with pytest.raises(FileNotFoundError):
        sn.read_table(spark, path, version=2)
    # current still fine; history folds cleanly over the gap
    assert sn.read_table(spark, path).count() == 206
    hist = sn.history(path)
    assert hist[0]["version"] == tagged_v
    assert hist[0]["n_rows"] == len(want)

    # dropping the tag releases the pin: the next vacuum reclaims it
    refs.delete_tag(path, "pinned")
    sn.vacuum(path, keep_last=2, retention_seconds=0.0)
    with pytest.raises(FileNotFoundError):
        sn.read_table(spark, path, version=tagged_v)


def test_vacuum_tag_pin_survives_restore(spark, tmp_path):
    """restore_table to a tagged version works after a vacuum that
    dropped everything untagged in between (the tag kept the target's
    files on disk — the exact scenario tags exist for)."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=100), path, "k")
    for i in range(5):
        _merge_one(spark, path, 2000 + i, i)
    want = _rows(sn.read_table(spark, path, version=2))
    refs.create_tag(path, "rollback-point", version=2)
    sn.vacuum(path, keep_last=1, retention_seconds=0.0)
    r = sn.restore_table(path, refs.tag_version(path, "rollback-point"))
    assert _rows(sn.read_table(spark, path, version=r["version"])) == want


def test_clone_is_zero_copy_and_independent(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sn.create_table(_table(spark), src, "k")
    _merge_one(spark, src, 7, -7)
    want = _rows(sn.read_table(spark, src))

    r = refs.clone_table(src, dst)
    assert r["version"] == 1 and r["rows_after"] == 400
    assert r["cloned_from"]["version"] == 2

    # zero-copy: every cloned data file shares its inode with the source
    entry = sn._read_entry(dst, 1)
    for fe in entry["files"]:
        s, d = os.path.join(src, fe["name"]), os.path.join(dst, fe["name"])
        assert os.stat(s).st_ino == os.stat(d).st_ino
    assert _rows(sn.read_table(spark, dst)) == want

    # independent lifecycles: divergent writes never cross over
    _merge_one(spark, src, 50, -50)
    _merge_one(spark, dst, 50, 5050)
    assert dict(_rows(sn.read_table(spark, src)))[50] == -50
    assert dict(_rows(sn.read_table(spark, dst)))[50] == 5050

    # vacuum the SOURCE hard: the clone still reads (hardlinks keep the
    # shared inodes alive even after the source unlinks its names)
    sn.vacuum(src, keep_last=1, retention_seconds=0.0)
    assert dict(_rows(sn.read_table(spark, dst)))[50] == 5050
    assert len(_rows(sn.read_table(spark, dst))) == 400


def test_clone_carries_deletion_vectors_and_schema(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sn.create_table(_table(spark, n=100), src, "k")
    sn.delete_from_mor(
        spark, src, spark.createDataFrame([(3,), (4,)], "k bigint"), "k"
    )
    sn.add_columns(spark, src, [("note", "string")])
    want = sorted(
        (r.k, r.v, r.note) for r in sn.read_table(spark, src).collect()
    )
    assert len(want) == 98

    refs.clone_table(src, dst)
    got = sorted((r.k, r.v, r.note) for r in sn.read_table(spark, dst).collect())
    assert got == want
    # and the clone's MoR state materializes away under its OWN lifecycle
    sn.optimize(spark, dst, purge_dv=True)
    got2 = sorted((r.k, r.v, r.note) for r in sn.read_table(spark, dst).collect())
    assert got2 == want


def test_clone_refuses_existing_table_and_missing_version(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sn.create_table(_table(spark, n=50), src, "k")
    refs.clone_table(src, dst)
    with pytest.raises(ValueError):
        refs.clone_table(src, dst)
    with pytest.raises(FileNotFoundError):
        refs.clone_table(src, str(tmp_path / "dst2"), version=9)


@pytest.mark.parametrize("seed", [0xBEEF11, 7, 424242])
def test_refs_constraints_adversarial_chain(spark, tmp_path, seed):
    """The delta-log adversarial chain extended with the round-11 verbs:
    random tag/untag (vacuum retention pins), zero-copy clones (read
    isolation from later source mutations), CHECK constraint set/drop,
    and violating appends (must be rejected exactly when the CURRENT
    version's map carries the constraint), interleaved with merge/
    delete_mor/optimize/restore/vacuum. Invariants: current state always
    equals the model; after every vacuum the retained set is exactly
    {tag-pinned} ∪ {suffix}, each version readable and exact, history
    consistent; tagged reads stay exact; clones never see source writes."""
    import random

    import pytest as _pytest

    from hadoop_prototype_spark.sources import snapshots as sn

    rng = random.Random(seed)
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=40, parts=2), path, "k")
    recorded = {1: dict(_rows(sn.read_table(spark, path)))}
    tags: dict[str, int] = {}
    clones: list[tuple[str, int]] = []

    def _df(pairs, schema="k bigint, v bigint"):
        return spark.createDataFrame(pairs, schema)

    for step in range(28):
        op = rng.choices(
            ["merge", "delete_mor", "optimize", "restore", "vacuum",
             "tag", "untag", "clone", "set_cons", "drop_cons", "bad_append"],
            weights=[5, 2, 1, 1, 3, 3, 1, 2, 2, 1, 3],
        )[0]
        latest = max(recorded)
        if op == "merge":
            pairs = [(rng.randrange(0, 120), rng.randrange(-999, 0))
                     for _ in range(rng.randint(1, 3))]
            pairs = list({k: (k, v) for k, v in pairs}.values())
            r = sn.merge_into(spark, path, _df(pairs), "k")
            state = dict(recorded[latest]); state.update(dict(pairs))
            recorded[r["version"]] = state
        elif op == "delete_mor":
            keys = sorted({rng.randrange(0, 120) for _ in range(rng.randint(1, 3))})
            r = sn.delete_from_mor(
                spark, path, _df([(k,) for k in keys], "k bigint"), "k"
            )
            state = dict(recorded[latest])
            for k in keys:
                state.pop(k, None)
            recorded[r["version"]] = state
        elif op == "optimize":
            r = sn.optimize(spark, path, purge_dv=rng.random() < 0.5)
            recorded[r["version"]] = dict(recorded[latest])
        elif op == "restore":
            target = rng.choice(sorted(recorded))
            r = sn.restore_table(path, target)
            recorded[r["version"]] = dict(recorded[target])
        elif op == "vacuum":
            keep = rng.randint(1, 4)
            sn.vacuum(path, keep_last=keep, retention_seconds=0)
            oldest = min(recorded)
            cutoff = max(oldest, latest - keep + 1)
            pinned = {v for v in tags.values() if v < cutoff}
            recorded = {
                v: s for v, s in recorded.items()
                if v >= cutoff or v in pinned
            }
            for v, s in recorded.items():
                assert dict(_rows(sn.read_table(spark, path, version=v))) == s, (
                    f"step {step}: retained v{v} wrong after vacuum"
                )
            hist = sn.history(path)
            assert [h["version"] for h in hist] == sorted(recorded)
            assert [h["n_rows"] for h in hist] == [
                len(recorded[v]) for v in sorted(recorded)
            ]
        elif op == "tag":
            name = f"t{step}"
            target = rng.choice(sorted(recorded))
            refs.create_tag(path, name, version=target)
            tags[name] = target
        elif op == "untag":
            if tags:
                name = rng.choice(sorted(tags))
                refs.delete_tag(path, name)
                del tags[name]
        elif op == "clone":
            target = rng.choice(sorted(recorded))
            dst = str(tmp_path / f"clone{step}")
            refs.clone_table(path, dst, version=target)
            assert dict(_rows(sn.read_table(spark, dst))) == recorded[target]
            clones.append((dst, target))
            if rng.random() < 0.5:  # diverge the clone; source must not move
                sn.merge_into(
                    spark, dst, _df([(77, -7777)]), "k"
                )
                assert dict(_rows(sn.read_table(spark, path))) == recorded[latest]
        elif op == "set_cons":
            if any(v < -5000 for v in recorded[latest].values()):
                # bad rows landed while unconstrained: the set-time table
                # scan must refuse, consuming no version
                with _pytest.raises(sn.ConstraintViolation):
                    sn.set_check_constraints(
                        spark, path, {"v_floor": "v >= -5000"}
                    )
                assert sn.current_version(path) == latest
            else:
                r = sn.set_check_constraints(
                    spark, path, {"v_floor": "v >= -5000"}
                )
                recorded[r["version"]] = dict(recorded[latest])
        elif op == "drop_cons":
            if "v_floor" in sn.get_check_constraints(path):
                r = sn.drop_check_constraint(path, "v_floor")
                recorded[r["version"]] = dict(recorded[latest])
        else:  # bad_append: rejected iff the CURRENT map carries v_floor
            pairs = [(9000 + step, -99999)]
            if "v_floor" in sn.get_check_constraints(path):
                with _pytest.raises(sn.ConstraintViolation):
                    sn.append_table(spark, path, _df(pairs), "k")
                assert sn.current_version(path) == latest
            else:
                r = sn.append_table(spark, path, _df(pairs), "k")
                state = dict(recorded[latest]); state.update(dict(pairs))
                recorded[r["version"]] = state
        cur = max(recorded)
        assert sn.current_version(path) == cur, f"step {step} ({op})"
        assert dict(_rows(sn.read_table(spark, path))) == recorded[cur], (
            f"step {step} ({op}): current diverged"
        )

    # every surviving tag reads exactly; every clone froze its target
    for name, v in tags.items():
        assert dict(_rows(refs.read_table_tag(spark, path, name))) == recorded[v]
    for dst, target in clones:
        got = dict(_rows(sn.read_table(spark, dst)))
        want = dict(recorded.get(target, {}))
        # diverged clones differ only at the injected key
        got.pop(77, None)
        if want:
            want.pop(77, None)
            assert got == want


def test_concurrent_identical_clones_converge(spark, tmp_path):
    """Two threads cloning the SAME source version into the SAME
    destination must converge: shared-inode EEXIST links are idempotent,
    exactly one v1 commit wins, the loser adopts it (never unlinking
    files the winner references), and the resulting table is intact."""
    from concurrent.futures import ThreadPoolExecutor

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sn.create_table(_table(spark, n=300, parts=6), src, "k")

    results, errors = [], []

    def go():
        try:
            results.append(refs.clone_table(src, dst))
        except Exception as e:  # noqa: BLE001 — collected for assertion
            errors.append(e)

    for trial in range(3):
        results.clear()
        errors.clear()
        import shutil

        shutil.rmtree(dst, ignore_errors=True)
        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(go), pool.submit(go)]:
                f.result()
        # the early current_version check may reject one thread with
        # ValueError; any thread that got past it must have succeeded
        assert results, (trial, errors)
        assert all(isinstance(e, ValueError) for e in errors), errors
        assert all(r["version"] == 1 for r in results)
        # and the clone is whole: every row readable, inodes shared
        assert sn.read_table(spark, dst).count() == 300
        for fe in sn._read_entry(dst, 1)["files"]:
            s, d = os.path.join(src, fe["name"]), os.path.join(dst, fe["name"])
            assert os.stat(s).st_ino == os.stat(d).st_ino


def test_datasource_reads_by_tag(spark, tmp_path):
    """spark.read.format('snapshot_table').option('tag', ...) resolves a
    named ref through the DataSource surface — and survives a vacuum
    that the tag pinned the version through."""
    from hadoop_prototype_spark.sources import snapshot_stream as ss

    ss.register(spark)
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=100), path, "k")
    for i in range(3):
        _merge_one(spark, path, 5000 + i, -i)
    refs.create_tag(path, "gold", version=2)
    want = _rows(sn.read_table(spark, path, version=2))

    got = spark.read.format("snapshot_table").option("tag", "gold").load(path)
    assert _rows(got) == want

    sn.vacuum(path, keep_last=1, retention_seconds=0.0)
    got2 = spark.read.format("snapshot_table").option("tag", "gold").load(path)
    assert _rows(got2) == want

    with pytest.raises(Exception, match="ONE of version, timestamp, tag"):
        spark.read.format("snapshot_table").option("tag", "gold").option(
            "version", "1"
        ).load(path).collect()


def test_clone_carries_check_constraints(spark, tmp_path):
    """Delta SHALLOW CLONE copies table metadata including CHECK
    constraints (ADVICE r11): a violating append to a fresh clone must
    be rejected exactly like on the source."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sn.create_table(_table(spark, n=50), src, "k")
    sn.set_check_constraints(spark, src, {"v_nonneg": "v >= 0"})

    refs.clone_table(src, dst)
    assert sn.get_check_constraints(dst) == {"v_nonneg": "v >= 0"}
    bad = spark.createDataFrame([(9999, -1)], "k bigint, v bigint")
    with pytest.raises(sn.ConstraintViolation):
        sn.append_table(spark, dst, bad, "k")
    assert sn.current_version(dst) == 1
    # the clone's constraints evolve independently of the source's
    sn.drop_check_constraint(dst, "v_nonneg")
    sn.append_table(spark, dst, bad, "k")
    assert sn.get_check_constraints(src) == {"v_nonneg": "v >= 0"}


def test_tag_lost_vacuum_race_fails_loud(spark, tmp_path, monkeypatch):
    """create_tag linked after a concurrent vacuum's _refs scan, against
    a version the vacuum is reclaiming: the post-link re-verify must
    remove the dangling tag and raise, never leave a tag that reads as
    FileNotFoundError later (ADVICE r11). The race window is simulated
    by reclaiming the version inside the link call."""
    import os as _os

    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=60), path, "k")
    for i in range(3):
        _merge_one(spark, path, 500 + i, -i)

    real_link = _os.link

    def vacuum_then_link(srcp, dstp, *a, **kw):
        if dstp.endswith("doomed.json"):
            # the concurrent vacuum scanned _refs BEFORE our link (so the
            # tag is not pinned) and reclaims the tagged version right as
            # the link lands
            sn.vacuum(path, keep_last=1, retention_seconds=0.0)
        real_link(srcp, dstp, *a, **kw)

    monkeypatch.setattr(_os, "link", vacuum_then_link)
    with pytest.raises(FileNotFoundError, match="race with a concurrent vacuum"):
        refs.create_tag(path, "doomed", version=2)
    monkeypatch.undo()
    assert refs.list_tags(path) == []  # no dangling tag left behind


def test_tag_vs_vacuum_thread_race_never_dangles(spark, tmp_path):
    """Real ThreadPool race (r11 verdict #4): create_tag(version=v) vs
    vacuum reclaiming v. Either the tag wins (pinned + readable) or
    create_tag fails loud — a tag that exists but cannot be read must
    never result."""
    from concurrent.futures import ThreadPoolExecutor

    for trial in range(4):
        path = str(tmp_path / f"t{trial}")
        sn.create_table(_table(spark, n=40, parts=2), path, "k")
        for i in range(4):
            _merge_one(spark, path, 900 + i, -i)
        want = _rows(sn.read_table(spark, path, version=2))

        outcome = {}

        def tag(p=path):
            try:
                refs.create_tag(p, "pin", version=2)
                outcome["tag"] = "ok"
            except FileNotFoundError:
                outcome["tag"] = "lost"

        def vac(p=path):
            sn.vacuum(p, keep_last=1, retention_seconds=0.0)

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(tag), pool.submit(vac)]:
                f.result()

        tags = [r["name"] for r in refs.list_tags(path)]
        if outcome["tag"] == "ok":
            assert tags == ["pin"]
            # the tag pins v2 through every LATER vacuum, even if the
            # racing one missed it
            sn.vacuum(path, keep_last=1, retention_seconds=0.0)
            assert _rows(refs.read_table_tag(spark, path, "pin")) == want
        else:
            assert tags == []  # lost loudly, nothing dangles


def test_clone_vs_source_vacuum_race_all_or_nothing(spark, tmp_path):
    """ThreadPool race (r11 verdict #4): clone an old version while a
    zero-retention vacuum reclaims it on the source. Either the clone
    wins (every file hardlinked before the unlink — the shared inodes
    keep it whole forever after) or it fails loud with a rolled-back
    destination; never a half-linked readable-looking table."""
    from concurrent.futures import ThreadPoolExecutor

    for trial in range(4):
        src = str(tmp_path / f"src{trial}")
        dst = str(tmp_path / f"dst{trial}")
        sn.create_table(_table(spark, n=200, parts=8), src, "k")
        for i in range(3):
            _merge_one(spark, src, 800 + i, -i)
        want = _rows(sn.read_table(spark, src, version=1))

        outcome = {}

        def clone():
            try:
                refs.clone_table(src, dst, version=1)
                outcome["clone"] = "ok"
            except (FileNotFoundError, OSError):
                outcome["clone"] = "lost"

        def vac():
            sn.vacuum(src, keep_last=1, retention_seconds=0.0)

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(clone), pool.submit(vac)]:
                f.result()

        if outcome["clone"] == "ok":
            # winner: the clone reads v1 exactly, forever (inodes shared),
            # even after ANOTHER source vacuum
            assert _rows(sn.read_table(spark, dst)) == want
            sn.vacuum(src, keep_last=1, retention_seconds=0.0)
            assert _rows(sn.read_table(spark, dst)) == want
        else:
            # loser: nothing committed at dst (no log, no readable table)
            assert sn.current_version(dst) == 0
        # the source's CURRENT version is never collateral damage
        assert len(_rows(sn.read_table(spark, src))) == 203
