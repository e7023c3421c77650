"""RENAME/DROP COLUMN via log-pinned column mapping
(sources/snapshots.rename_column / drop_column — the Delta
column-mapping contract): logical schemas are per-version log state,
physical (in-file) names are pinned forever, so both verbs are log-only
commits that rewrite ZERO data files and keep every old file readable —
across time travel, CDC, scd2, restore, clone, vacuum checkpoint
rewrites and the streaming source's pinned-schema projection."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.sources import refs
from hadoop_prototype_spark.sources import snapshots as sn


def _table(spark, n=400, parts=4):
    return spark.range(n).repartitionByRange(parts, "id").selectExpr(
        "id AS k", "CAST(id * 10 AS BIGINT) AS v"
    )


def _kv(df, k="k", v="v"):
    return sorted((r[k], r[v]) for r in df.collect())


def test_rename_is_log_only_and_reads_old_files(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark), path, "k")
    files_before = sorted(os.path.basename(f)
                          for f in glob.glob(path + "/*.parquet"))
    want = _kv(sn.read_table(spark, path))

    r = sn.rename_column(spark, path, "v", "amount")
    assert r["version"] == 2 and r["renamed"] == {"v": "amount"}
    # log-only: not one data file added or rewritten
    files_after = sorted(os.path.basename(f)
                         for f in glob.glob(path + "/*.parquet"))
    assert files_after == files_before

    got = sn.read_table(spark, path)
    assert got.columns == ["k", "amount"]
    assert _kv(got, "k", "amount") == want
    # time travel: the pre-rename version still reads the OLD schema
    old = sn.read_table(spark, path, version=1)
    assert old.columns == ["k", "v"]
    assert _kv(old) == want
    # the mapping pins the ORIGINAL physical name
    assert sn._read_entry(path, 2)["column_mapping"] == {"k": "k", "amount": "v"}


def test_rename_key_column_keeps_every_verb_working(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=300), path, "k")
    sn.rename_column(spark, path, "k", "doc_id")
    assert sn._read_entry(path, 2)["key_col"] == "doc_id"

    # merge keyed on the NEW logical name: prunes + rewrites + reads back
    upd = spark.createDataFrame([(5, -1), (999, -2)], "doc_id bigint, v bigint")
    r = sn.merge_into(spark, path, upd, "doc_id")
    assert 0 < r["files_rewritten"] < r["files_total"]  # pruning held
    cur = dict(_kv(sn.read_table(spark, path), "doc_id", "v"))
    assert cur[5] == -1 and cur[999] == -2 and len(cur) == 301

    # MoR delete across the rename: vectors store the stable physical key
    sn.delete_from_mor(
        spark, path, spark.createDataFrame([(5,), (7,)], "doc_id bigint"),
        "doc_id",
    )
    cur = dict(_kv(sn.read_table(spark, path), "doc_id", "v"))
    assert 5 not in cur and 7 not in cur and len(cur) == 299

    # range + IN-list pruned reads on the renamed key stay exact
    got = sorted(r.doc_id for r in
                 sn.read_table_pruned(spark, path, 10, 14).collect())
    assert got == [10, 11, 12, 13, 14]
    got = sorted(r.doc_id for r in
                 sn.read_table_pruned_in(spark, path, [3, 250]).collect())
    assert got == [3, 250]

    # a writer still keyed on the OLD name is told the new one
    with pytest.raises(ValueError, match="keyed on 'doc_id'"):
        sn.merge_into(spark, path, spark.createDataFrame(
            [(1, 1)], "k bigint, v bigint"), "k")


def test_drop_column_hides_now_time_travel_sees_readd_reads_null(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=100), path, "k")
    want = _kv(sn.read_table(spark, path))

    sn.drop_column(spark, path, "v")
    assert sn.read_table(spark, path).columns == ["k"]
    # time travel to pre-drop still reads the bytes
    assert _kv(sn.read_table(spark, path, version=1)) == want

    # re-adding the same logical name must NOT resurrect the dropped
    # bytes: the fresh physical name reads NULL from old files
    sn.add_columns(spark, path, [("v", "bigint")])
    got = sn.read_table(spark, path)
    assert got.columns == ["k", "v"]
    assert got.filter(F.col("v").isNotNull()).count() == 0
    # and a new write fills it for its own rows only: the rewritten
    # slice reads its fresh physical bytes, untouched files stay NULL
    sn.merge_into(
        spark, path,
        spark.createDataFrame([(3, 777)], "k bigint, v bigint"), "k",
    )
    vals = dict(_kv(sn.read_table(spark, path)))
    assert vals[3] == 777
    assert vals[99] is None  # a key in an untouched file


def test_drop_key_or_constrained_column_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=50), path, "k")
    sn.set_check_constraints(spark, path, {"v_pos": "v >= 0"})
    with pytest.raises(ValueError, match="table key"):
        sn.drop_column(spark, path, "k")
    with pytest.raises(ValueError, match="CHECK constraint"):
        sn.drop_column(spark, path, "v")
    with pytest.raises(ValueError, match="CHECK constraint"):
        sn.rename_column(spark, path, "v", "w")
    sn.drop_check_constraint(path, "v_pos")
    sn.rename_column(spark, path, "v", "w")  # now fine
    assert sn.read_table(spark, path).columns == ["k", "w"]
    with pytest.raises(KeyError):
        sn.drop_column(spark, path, "nope")
    with pytest.raises(ValueError, match="already exists"):
        sn.rename_column(spark, path, "w", "k")


def test_writes_after_rename_store_physical_names(spark, tmp_path):
    """Appends/merges on a mapped table write PHYSICAL names, so every
    file on disk is uniform and any later logical schema reads it."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=100), path, "k")
    sn.rename_column(spark, path, "v", "amount")
    sn.append_table(
        spark, path,
        spark.createDataFrame([(1000, 42)], "k bigint, amount bigint"), "k",
    )
    entry = sn._read_entry(path, sn.current_version(path))
    newest = [fe["name"] for fe in entry["files"] if fe["name"].startswith("v3-")]
    assert newest
    cols = pq.read_schema(os.path.join(path, newest[0])).names
    assert "v" in cols and "amount" not in cols  # physical name on disk
    vals = dict(_kv(sn.read_table(spark, path), "k", "amount"))
    assert vals[1000] == 42 and len(vals) == 101
    # constraints set AFTER the rename validate the logical frame of a
    # physical staging write
    sn.set_check_constraints(spark, path, {"amt": "amount >= 0"})
    with pytest.raises(sn.ConstraintViolation):
        sn.append_table(
            spark, path,
            spark.createDataFrame([(2000, -5)], "k bigint, amount bigint"), "k",
        )


def test_cdc_and_scd2_across_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=60, parts=2), path, "k")         # v1
    sn.merge_into(spark, path, spark.createDataFrame(
        [(3, -3)], "k bigint, v bigint"), "k")                        # v2
    sn.rename_column(spark, path, "v", "amount")                     # v3
    sn.merge_into(spark, path, spark.createDataFrame(
        [(3, -33), (70, 700)], "k bigint, amount bigint"), "k")      # v4
    sn.delete_from_mor(spark, path, spark.createDataFrame(
        [(10,)], "k bigint"), "k")                                   # v5

    # CDC spanning the rename reads everything under the FINAL schema
    ch = sn.table_changes(spark, path, 1, 5)
    by = {(r.k, r._change): r.amount for r in ch.collect()}
    assert by[(3, "update_preimage")] == 30  # v1 value, read via mapping
    assert by[(3, "update_postimage")] == -33
    assert by[(70, "insert")] == 700
    assert by[(10, "delete")] == 100

    # scd2 over the full (renamed) history reproduces every version
    hist = sn.scd2_history(spark, path)
    for v in range(1, 6):
        want = sorted(
            (r.k, r.amount)
            for r in sn.read_table(spark, path, version=v)
            .selectExpr("k", f"{'v' if v < 3 else 'amount'} AS amount")
            .collect()
        )
        got = sorted(
            (r.k, r.amount)
            for r in hist.filter(
                (F.col("valid_from") <= v)
                & ((F.col("valid_to").isNull()) | (F.col("valid_to") > v))
            ).collect()
        )
        assert got == want, f"scd2 diverges at v{v}"


def test_restore_clone_vacuum_carry_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=80, parts=2), path, "k")          # v1
    sn.rename_column(spark, path, "v", "amount")                      # v2
    for i in range(4):                                                # v3..v6
        sn.merge_into(spark, path, spark.createDataFrame(
            [(500 + i, i)], "k bigint, amount bigint"), "k")
    want_v4 = _kv(sn.read_table(spark, path, version=4), "k", "amount")

    # clone of a mapped table reads identically and stays mapped
    dst = str(tmp_path / "clone")
    refs.clone_table(path, dst, version=4)
    assert sn.read_table(spark, dst).columns == ["k", "amount"]
    assert _kv(sn.read_table(spark, dst), "k", "amount") == want_v4
    sn.merge_into(spark, dst, spark.createDataFrame(
        [(1, -1)], "k bigint, amount bigint"), "k")
    assert dict(_kv(sn.read_table(spark, dst), "k", "amount"))[1] == -1

    # restore to the PRE-rename version rolls schema + mapping back
    r = sn.restore_table(path, 1)
    back = sn.read_table(spark, path, version=r["version"])
    assert back.columns == ["k", "v"]

    # vacuum onto a mid-chain mapped delta entry: the rewritten cutoff
    # checkpoint must carry the mapping (reads stay correct)
    path2 = str(tmp_path / "t2")
    sn.create_table(_table(spark, n=40, parts=2), path2, "k")
    sn.rename_column(spark, path2, "v", "amount")
    for i in range(5):
        sn.merge_into(spark, path2, spark.createDataFrame(
            [(700 + i, i)], "k bigint, amount bigint"), "k")
    want = _kv(sn.read_table(spark, path2, version=5), "k", "amount")
    sn.vacuum(path2, keep_last=3, retention_seconds=0.0)
    assert sn.read_table(spark, path2, version=5).columns == ["k", "amount"]
    assert _kv(sn.read_table(spark, path2, version=5), "k", "amount") == want


def test_optimize_zorder_and_pruning_on_renamed_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    sn.create_table(
        spark.range(2000).repartitionByRange(8, "id").selectExpr(
            "id AS k", "CAST((id * 37) % 1000 AS BIGINT) AS v"
        ),
        path, "k",
    )
    sn.rename_column(spark, path, "v", "score")
    sn.optimize(spark, path, zorder_by=["k", "score"],
                target_file_rows=250, small_file_rows=10**9)
    entry = sn._read_entry(path, sn.current_version(path))
    # stats recorded under the PHYSICAL name (v), pruning asked with the
    # LOGICAL name (score) — the reader maps between them
    zfiles = [fe for fe in entry["files"] if fe.get("stats")]
    assert zfiles and all("v" in fe["stats"] for fe in zfiles)
    got = sorted(
        r.k for r in sn.read_table_pruned(
            spark, path, 0, 5, col="score"
        ).collect()
    )
    want = sorted(
        r.k for r in sn.read_table(spark, path)
        .filter(F.col("score") <= 5).collect()
    )
    assert got == want


def test_streaming_source_and_staged_sink_on_mapped_tables(spark, tmp_path):
    """The DataSource batch reader projects mapped files under the
    logical schema; the streaming reader pins mapping at start and reads
    post-rename appends; the staged-file SINK maps logical→physical at
    write time, so `.write.format("snapshot_table")` lands correct
    physical files on a renamed table."""
    from hadoop_prototype_spark.sources import snapshot_stream as ss

    ss.register(spark)
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=50, parts=2), path, "k")
    sn.delete_from_mor(spark, path, spark.createDataFrame(
        [(7,)], "k bigint"), "k")
    sn.rename_column(spark, path, "v", "amount")
    want = _kv(sn.read_table(spark, path), "k", "amount")

    got = spark.read.format("snapshot_table").load(path)
    assert got.columns == ["k", "amount"]
    assert _kv(got, "k", "amount") == want

    # streaming read pinned at the mapped schema: consume the backlog
    out = str(tmp_path / "out")
    q = (
        ss.stream_table(spark, path, skipChangeCommits=True)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out)
    assert sorted(streamed.columns) == ["amount", "k"]
    # backlog = v1's files as appends (skipChangeCommits drops the MoR
    # commit's rewrite semantics, not the files) — spot-check the rows
    assert dict(_kv(streamed, "k", "amount"))[3] == 30

    # staged-file sink on the MAPPED table: executors stage files under
    # the physical names, the commit records physical key stats, and the
    # logical read sees the appended row
    import pyarrow.parquet as pq

    spark.createDataFrame([(999, 9)], "k bigint, amount bigint").write.format(
        "snapshot_table"
    ).mode("append").save(path)
    assert sn.current_version(path) == 4
    entry = sn._read_entry(path, 4)
    newest = [fe["name"] for fe in entry["files"] if fe["name"].startswith("v4-")]
    assert newest
    cols = pq.read_schema(os.path.join(path, newest[0])).names
    assert "v" in cols and "amount" not in cols  # physical name on disk
    assert dict(_kv(sn.read_table(spark, path), "k", "amount"))[999] == 9


def test_merge_schema_widens_inside_the_commit(spark, tmp_path):
    """Delta mergeSchema-on-MERGE: update columns missing from the table
    widen the schema atomically with the merge; untouched files read
    NULL for them, the default mode still projects extras away, and the
    widened schema rides every later commit."""
    path = str(tmp_path / "t")
    sn.create_table(_table(spark, n=100), path, "k")
    upd = spark.createDataFrame(
        [(3, -3, "hot")], "k bigint, v bigint, tier string"
    )
    # default contract unchanged: extra columns are projected away
    sn.merge_into(spark, path, upd, "k")
    assert sn.read_table(spark, path).columns == ["k", "v"]
    r = sn.merge_into(spark, path, upd, "k", merge_schema=True)
    assert r["version"] == 3
    got = sn.read_table(spark, path)
    assert got.columns == ["k", "v", "tier"]
    rows = {r.k: (r.v, r.tier) for r in got.collect()}
    assert rows[3] == (-3, "hot")
    assert rows[99] == (990, None)  # untouched file: NULL, no rewrite
    # time travel: v1 still reads the narrow schema
    assert sn.read_table(spark, path, version=1).columns == ["k", "v"]
    # a later plain append must supply the widened schema
    sn.append_table(
        spark, path,
        spark.createDataFrame([(500, 1, None)], "k bigint, v bigint, tier string"),
        "k",
    )
    assert dict((r.k, r.tier) for r in sn.read_table(spark, path).collect())[3] == "hot"

    # on a MAPPED table the new column gets a fresh physical name
    path2 = str(tmp_path / "t2")
    sn.create_table(_table(spark, n=40), path2, "k")
    sn.rename_column(spark, path2, "v", "amount")
    sn.merge_into(
        spark, path2,
        spark.createDataFrame([(1, 11, 5.0)], "k bigint, amount bigint, score double"),
        "k", merge_schema=True,
    )
    m = sn._read_entry(path2, 3)["column_mapping"]
    assert m["amount"] == "v" and m["score"].startswith("col-")
    rows = {r.k: (r.amount, r.score) for r in sn.read_table(spark, path2).collect()}
    assert rows[1] == (11, 5.0) and rows[39] == (390, None)


@pytest.mark.parametrize("seed", [0xE0F12, 31337])
def test_schema_evolution_adversarial_chain(spark, tmp_path, seed):
    """Seeded random op chain interleaving RENAME/DROP/ADD/merge_schema
    with merge/delete_mor/optimize/restore/vacuum. The model records
    (columns, rows) per version; invariants after every step: the
    current read's columns AND values equal the model, and after every
    vacuum each retained version time-travels to exactly its recorded
    schema + rows (per-version logical schemas across arbitrary
    evolution/restore interleavings — the column-mapping contract)."""
    import random

    rng = random.Random(seed)
    path = str(tmp_path / "t")
    base = spark.range(30).selectExpr("id AS k", "CAST(id * 10 AS BIGINT) AS v")
    sn.create_table(base, path, "k")
    # model: version -> (value-col name list, {k: {col: val-or-None}})
    recorded = {1: (["v"], {k: {"v": k * 10} for k in range(30)})}
    fresh_i = 0

    def _fresh():
        nonlocal fresh_i
        fresh_i += 1
        return f"c{fresh_i}"

    def _mk_updates(cols, pairs):
        # pairs: {k: {col: val}} covering every col
        schema = "k bigint, " + ", ".join(f"{c} bigint" for c in cols)
        rows = [(k, *[vals[c] for c in cols]) for k, vals in pairs.items()]
        return spark.createDataFrame(rows, schema)

    def _check_current(step, op):
        cols, data = recorded[max(recorded)]
        got = sn.read_table(spark, path)
        assert got.columns == ["k"] + cols, f"step {step} ({op}): columns"
        grows = {r["k"]: {c: r[c] for c in cols} for r in got.collect()}
        assert grows == data, f"step {step} ({op}): values diverged"

    for step in range(22):
        cols, data = recorded[max(recorded)]
        op = rng.choices(
            ["merge", "merge_schema", "rename", "drop", "add",
             "delete_mor", "optimize", "restore", "vacuum"],
            weights=[5, 2, 3, 2, 2, 2, 1, 1, 2],
        )[0]
        if op == "drop" and len(cols) < 2:
            op = "add"
        if op == "merge":
            ks = sorted({rng.randrange(0, 60) for _ in range(rng.randint(1, 3))})
            pairs = {
                k: {c: rng.randrange(-999, 0) for c in cols} for k in ks
            }
            r = sn.merge_into(spark, path, _mk_updates(cols, pairs), "k")
            nd = dict(data); nd.update(pairs)
            recorded[r["version"]] = (list(cols), nd)
        elif op == "merge_schema":
            new = _fresh()
            ks = sorted({rng.randrange(0, 60) for _ in range(rng.randint(1, 2))})
            pairs = {
                k: {**{c: rng.randrange(-999, 0) for c in cols}, new: k}
                for k in ks
            }
            r = sn.merge_into(
                spark, path, _mk_updates(cols + [new], pairs), "k",
                merge_schema=True,
            )
            nd = {k: {**vals, new: None} for k, vals in data.items()}
            nd.update(pairs)
            recorded[r["version"]] = (cols + [new], nd)
        elif op == "rename":
            old = rng.choice(cols)
            new = _fresh()
            r = sn.rename_column(spark, path, old, new)
            ncols = [new if c == old else c for c in cols]
            nd = {
                k: {(new if c == old else c): v for c, v in vals.items()}
                for k, vals in data.items()
            }
            recorded[r["version"]] = (ncols, nd)
        elif op == "drop":
            victim = rng.choice(cols)
            r = sn.drop_column(spark, path, victim)
            ncols = [c for c in cols if c != victim]
            nd = {
                k: {c: v for c, v in vals.items() if c != victim}
                for k, vals in data.items()
            }
            recorded[r["version"]] = (ncols, nd)
        elif op == "add":
            new = _fresh()
            r = sn.add_columns(spark, path, [(new, "bigint")])
            nd = {k: {**vals, new: None} for k, vals in data.items()}
            recorded[r["version"]] = (cols + [new], nd)
        elif op == "delete_mor":
            ks = sorted({rng.randrange(0, 60) for _ in range(rng.randint(1, 3))})
            r = sn.delete_from_mor(
                spark, path,
                spark.createDataFrame([(k,) for k in ks], "k bigint"), "k",
            )
            nd = {k: v for k, v in data.items() if k not in ks}
            recorded[r["version"]] = (list(cols), nd)
        elif op == "optimize":
            r = sn.optimize(spark, path, purge_dv=rng.random() < 0.5)
            recorded[r["version"]] = (list(cols), dict(data))
        elif op == "restore":
            target = rng.choice(sorted(recorded))
            r = sn.restore_table(path, target)
            tc, td = recorded[target]
            recorded[r["version"]] = (list(tc), dict(td))
        else:  # vacuum
            keep = rng.randint(1, 4)
            sn.vacuum(path, keep_last=keep, retention_seconds=0)
            cutoff = max(1, max(recorded) - keep + 1)
            recorded = {v: s for v, s in recorded.items() if v >= cutoff}
            for v, (vcols, vdata) in recorded.items():
                got = sn.read_table(spark, path, version=v)
                assert got.columns == ["k"] + vcols, f"v{v} schema after vacuum"
                grows = {r["k"]: {c: r[c] for c in vcols} for r in got.collect()}
                assert grows == vdata, f"v{v} rows after vacuum"
            hist = sn.history(path)
            assert [h["version"] for h in hist] == sorted(recorded)
        assert sn.current_version(path) == max(recorded), f"step {step} ({op})"
        _check_current(step, op)

    # every retained version still time-travels to its own schema + rows
    for v, (vcols, vdata) in recorded.items():
        got = sn.read_table(spark, path, version=v)
        assert got.columns == ["k"] + vcols
        grows = {r["k"]: {c: r[c] for c in vcols} for r in got.collect()}
        assert grows == vdata
