"""Snapshot-table engine queries under the oracle gate.

The snapshot machinery (sources/snapshots.py) is the one engine family
the registry could not value-hash-check before: its verbs WRITE state.
These queries close that gap by building a THROWAWAY snapshot table
from a deterministic slice of the fixture inside the query, driving a
fixed verb chain (create → MERGE update → merge-on-read DELETE), and
returning a read whose expected contents DuckDB recomputes from the
base parquet alone — so the driver's hash gate certifies the whole
log/commit/DV path, not just read-only operators.

Chain (versions are deterministic):  v1 create the ``o_orderkey % 13 =
1`` slice of orders as (k, price, status) · v2 merge_into updating
``k % 3 = 0`` rows to price + 1000.0 (IEEE double add — identical in
DuckDB) · v3 delete_from_mor of ``k % 5 = 0`` keys (a deletion-vector
commit, zero files rewritten). Each query builds its own table under a
fresh mkdtemp (queries must be re-runnable concurrently; the driver's
container is ephemeral, so the few hundred KB are not reclaimed).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import snapshots as sn
from ..sources.tables import load_table
from .registry import register

_SLICE_MOD = 13
_UPD_MOD = 3
_DEL_MOD = 5
_UPD_DELTA = 1000.0


def _base_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % _SLICE_MOD == 1)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
    )


def _build_chain(spark: SparkSession, sf_dir: str) -> str:
    """create → merge-update → MoR-delete; returns the table path
    (version 3 current)."""
    base = _base_slice(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapq_"), "tbl")
    sn.create_table(base, path, "k")
    upd = base.filter(F.col("k") % _UPD_MOD == 0).withColumn(
        "price", F.col("price") + F.lit(_UPD_DELTA)
    )
    sn.merge_into(spark, path, upd, "k")
    sn.delete_from_mor(
        spark, path, base.filter(F.col("k") % _DEL_MOD == 0).select("k"), "k"
    )
    return path


_SUB_CTE = f"""sub AS (
        SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
        FROM orders WHERE o_orderkey % {_SLICE_MOD} = 1
    ),
    merged AS (
        SELECT k,
               CASE WHEN k % {_UPD_MOD} = 0 THEN price + {_UPD_DELTA}
                    ELSE price END AS price,
               status
        FROM sub
    )"""


@register(
    "z_snapshot_merge_delete_read",
    oracle=f"""WITH {_SUB_CTE}
    SELECT k, price, status FROM merged WHERE k % {_DEL_MOD} <> 0
    """,
    tags=("snapshot", "lakehouse"),
)
def z_snapshot_merge_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verb-chain read: current version after a CoW MERGE and a
    deletion-vector DELETE — certifies commit/log/DV-anti-join end to
    end against DuckDB's recomputation from the base parquet."""
    path = _build_chain(spark, sf_dir)
    return sn.read_table(spark, path).select("k", "price", "status")


@register(
    "z_snapshot_time_travel",
    oracle=f"""WITH {_SUB_CTE}
    SELECT k, price, status FROM merged
    """,
    tags=("snapshot", "lakehouse"),
)
def z_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel to v2 (post-merge, pre-delete): the deleted rows must
    come back, with the merged prices — certifies that old versions
    resolve to exact file lists + DV states, not current state."""
    path = _build_chain(spark, sf_dir)
    return sn.read_table(spark, path, version=2).select("k", "price", "status")


_CLONE_UPD_MOD = 7
_CLONE_DELTA = 500.0


@register(
    "z_snapshot_clone_diverge",
    oracle=f"""WITH {_SUB_CTE}
    SELECT k, price, 'src' AS side FROM merged WHERE k % {_DEL_MOD} <> 0
    UNION ALL
    SELECT k,
           CASE WHEN k % {_CLONE_UPD_MOD} = 1 THEN price - {_CLONE_DELTA}
                ELSE price END AS price,
           'clone' AS side
    FROM merged
    UNION ALL
    SELECT k, price, 'tag' AS side FROM merged
    """,
    tags=("snapshot", "lakehouse", "clone"),
)
def z_snapshot_clone_diverge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tags + zero-copy CLONE under the hash gate (sources/refs.py): tag
    v2 of the chain, hardlink-clone the table AT the tag, merge a second
    update into the CLONE only (k % 7 = 1 → price − 500.0, on top of the
    merged price), then vacuum the SOURCE to keep_last=1 — the tag must
    pin v2 through the vacuum. Returns the union of three reads, each
    labeled by ``side``: the source's current v3 (merge minus deletes),
    the diverged clone (all v2 rows, second update applied — the
    source's delete must NOT leak in), and the source AT the tag (v2
    exactly, readable only because the tag pinned it). DuckDB recomputes
    all three states from the base parquet alone."""
    from ..sources import refs

    path = _build_chain(spark, sf_dir)
    refs.create_tag(path, "pre-delete", version=2)
    clone = path + "_clone"
    refs.clone_table(path, clone, version=refs.tag_version(path, "pre-delete"))
    cur = sn.read_table(spark, clone)
    upd2 = cur.filter(F.col("k") % _CLONE_UPD_MOD == 1).withColumn(
        "price", F.col("price") - F.lit(_CLONE_DELTA)
    )
    sn.merge_into(spark, clone, upd2, "k")
    sn.vacuum(path, keep_last=1, retention_seconds=0.0)
    src_cur = sn.read_table(spark, path).select(
        "k", "price", F.lit("src").alias("side")
    )
    clone_cur = sn.read_table(spark, clone).select(
        "k", "price", F.lit("clone").alias("side")
    )
    tag_read = refs.read_table_tag(spark, path, "pre-delete").select(
        "k", "price", F.lit("tag").alias("side")
    )
    return src_cur.unionByName(clone_cur).unionByName(tag_read)


_CON_MOD = 11


@register(
    "z_snapshot_constraint_reject",
    oracle=f"""WITH {_SUB_CTE}
    SELECT 'chk_price_floor' AS constraint_name,
           CAST((SELECT count(*) FROM sub WHERE k % {_CON_MOD} = 0)
                AS BIGINT) AS n_violations,
           CAST((SELECT count(*) FROM merged WHERE k % {_DEL_MOD} <> 0)
                AS BIGINT) AS n_rows_after
    """,
    tags=("snapshot", "lakehouse", "constraints"),
)
def z_snapshot_constraint_reject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints under the hash gate: set ``price >= 0`` on the
    chain table (the set-time scan must pass — all fixture prices are
    positive), then attempt a MERGE that flips ``k % 11 = 0`` rows to
    negative prices. The merge must be REJECTED atomically: the returned
    row carries the validator's own per-constraint violation count
    (ConstraintViolation.violations — DuckDB independently recomputes it
    from the base parquet) and the table's row count after the rejection
    (proving nothing was committed: still the v3 merge-minus-deletes
    state)."""
    path = _build_chain(spark, sf_dir)
    sn.set_check_constraints(spark, path, {"chk_price_floor": "price >= 0.0"})
    bad = (
        _base_slice(spark, sf_dir)
        .filter(F.col("k") % _CON_MOD == 0)
        .withColumn("price", -F.col("price") - F.lit(1.0))
    )
    try:
        sn.merge_into(spark, path, bad, "k")
        raise AssertionError("violating merge must raise ConstraintViolation")
    except sn.ConstraintViolation as e:
        n_viol = int(e.violations["chk_price_floor"])
    n_after = sn.read_table(spark, path).count()
    return spark.createDataFrame(
        [("chk_price_floor", n_viol, n_after)],
        "constraint_name string, n_violations bigint, n_rows_after bigint",
    )


@register(
    "z_snapshot_cdc_deletes",
    oracle=f"""WITH {_SUB_CTE}
    SELECT k, price, status, 'delete' AS _change
    FROM merged WHERE k % {_DEL_MOD} = 0
    """,
    tags=("snapshot", "lakehouse", "cdc"),
)
def z_snapshot_cdc_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v2→v3 change feed of the chain: exactly the deletion-vector
    suppressed rows, classified 'delete', carrying their post-merge
    prices — certifies CDC's identity diff across a DV-only commit."""
    path = _build_chain(spark, sf_dir)
    return sn.table_changes(spark, path, 2, 3).select(
        "k", "price", "status", "_change"
    )


@register(
    "z_snapshot_scd2",
    oracle=f"""WITH {_SUB_CTE}
    SELECT k, price, status, CAST(1 AS BIGINT) AS valid_from,
           CAST(CASE WHEN k % {_UPD_MOD} = 0 THEN 2
                     WHEN k % {_DEL_MOD} = 0 THEN 3
                     ELSE NULL END AS BIGINT) AS valid_to
    FROM sub
    UNION ALL
    SELECT k, price + {_UPD_DELTA} AS price, status,
           CAST(2 AS BIGINT) AS valid_from,
           CAST(CASE WHEN k % {_DEL_MOD} = 0 THEN 3
                     ELSE NULL END AS BIGINT) AS valid_to
    FROM sub WHERE k % {_UPD_MOD} = 0
    """,
    tags=("snapshot", "lakehouse", "scd2"),
)
def z_snapshot_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension build under the hash gate (snapshots.scd2_history
    — previously pinned only by pytest equivalence tests): the chain's
    per-version transitions fold into (key, value-interval) rows with
    valid_from/valid_to version bounds. DuckDB recomputes every interval
    from the mod rules alone: all rows open at v1; the k%3=0 updates
    close that interval at v2 and open the +1000 one; the k%5=0
    deletion-vector deletes close the then-newest interval at v3 (a
    k%15=0 key exercises the chained update→delete case). Certifies the
    changed-file diff, the tag-count grouped transition, and the
    interval matching — value-exact."""
    path = _build_chain(spark, sf_dir)
    return sn.scd2_history(spark, path).select(
        "k", "price", "status", "valid_from", "valid_to"
    )


_EVO_UPD_MOD = 7


@register(
    "z_snapshot_rename_evolution",
    oracle=f"""WITH {_SUB_CTE}
    SELECT k,
           CASE WHEN k % {_EVO_UPD_MOD} = 2 THEN price * 2.0
                ELSE price END AS amount,
           CASE WHEN k % {_EVO_UPD_MOD} = 2 THEN 'R'
                ELSE NULL END AS status,
           'cur' AS side
    FROM merged WHERE k % {_DEL_MOD} <> 0
    UNION ALL
    SELECT k, price AS amount, status, 'v2' AS side FROM merged
    """,
    tags=("snapshot", "lakehouse", "evolution"),
)
def z_snapshot_rename_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME/DROP column mapping under the hash gate
    (sources/snapshots.rename_column/drop_column): extend the chain with
    v4 RENAME price→amount (log-only; the physical name stays pinned, so
    every old file keeps reading), v5 DROP status, v6 re-ADD status (a
    FRESH physical name — the dropped bytes must NOT resurrect: every
    row reads NULL), v7 a MERGE under the evolved schema doubling
    ``k % 7 = 2`` survivors' amounts and stamping their status 'R'.
    Returns the current read UNION a time-travel read of v2 under the
    OLD logical schema (price/original status, aliased) — DuckDB
    recomputes both states from the base parquet alone, so a mapping
    bug in any of read/write/time-travel value-hash-fails."""
    path = _build_chain(spark, sf_dir)
    sn.rename_column(spark, path, "price", "amount")     # v4
    sn.drop_column(spark, path, "status")                # v5
    sn.add_columns(spark, path, [("status", "string")])  # v6: NULL, fresh phys
    cur = sn.read_table(spark, path)
    upd = (
        cur.filter(F.col("k") % _EVO_UPD_MOD == 2)
        .withColumn("amount", F.col("amount") * F.lit(2.0))
        .withColumn("status", F.lit("R"))
    )
    sn.merge_into(spark, path, upd, "k")                 # v7
    cur_read = sn.read_table(spark, path).select(
        "k", "amount", "status", F.lit("cur").alias("side")
    )
    v2_read = sn.read_table(spark, path, version=2).select(
        "k",
        F.col("price").alias("amount"),
        "status",
        F.lit("v2").alias("side"),
    )
    return cur_read.unionByName(v2_read)


@register(
    "z_snapshot_partition_probe",
    oracle="""WITH sub AS (
        SELECT event_id, user_id, event_type, value,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id
        FROM events WHERE event_id % 7 = 3
    )
    SELECT event_id, user_id, event_type, value, day_id FROM sub
    WHERE day_id = (SELECT min(day_id) + 2 FROM sub)
    """,
    tags=("snapshot", "lakehouse", "partition"),
)
def z_snapshot_partition_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec writes under the hash gate: land a slice of events
    as a snapshot table PARTITIONED on the integer day id
    (create_table(partition_by=...) — files range-clustered on day, the
    day ranges recorded per file in the log), then answer a single-day
    probe through read_table_where, which file-skips from the manifest
    before any scan (the date-partitioned-events shape; the counted
    only-that-day's-files pin lives in test_partition_spec.py). The day
    id is epoch-microseconds integer division — identical arithmetic in
    DuckDB, which recomputes the probed day's rows from the base
    parquet."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 3)
        .selectExpr(
            "event_id", "user_id", "event_type", "value",
            "CAST(unix_micros(ts) DIV 86400000000 AS BIGINT) AS day_id",
        )
    )
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapp_"), "tbl")
    sn.create_table(ev, path, "event_id", partition_by=["day_id"],
                    partition_files=16)
    day = sn.read_table(spark, path).agg(F.min("day_id")).first()[0] + 2
    return sn.read_table_where(spark, path, {"day_id": int(day)}).select(
        "event_id", "user_id", "event_type", "value", "day_id"
    )


@register(
    "z_snapshot_bloom_lookup",
    oracle="""WITH t AS (
        SELECT doc_id, md5(text) AS digest FROM documents
        WHERE doc_id % 3 = 0
    )
    SELECT doc_id, digest FROM t
    WHERE digest IN (SELECT md5(text) FROM documents WHERE doc_id IN (42, 57))
    """,
    tags=("snapshot", "lakehouse", "bloom"),
)
def z_snapshot_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-index point lookup under the hash gate: land a documents
    slice as a snapshot table whose ``digest`` (md5 of the text —
    hash-distributed, min/max stats useless) is a DECLARED bloom column
    (create_table(bloom_filters=...) — the Delta bloomFilter.columns
    property as log metadata), then answer digest point lookups; the
    equality predicate pushes into the scan where parquet consults the
    row-group blooms. Exact containment semantics — duplicate texts
    surface every matching doc — recomputed by DuckDB's own md5()."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", F.md5(F.col("text")).alias("digest")
    )
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapb_"), "tbl")
    sn.create_table(t, path, "doc_id", bloom_filters={"digest": 100_000})
    wanted = [
        r.d
        for r in docs.filter(F.col("doc_id").isin(42, 57))
        .select(F.md5(F.col("text")).alias("d"))
        .collect()
    ]
    return sn.read_table(spark, path).filter(F.col("digest").isin(wanted))


_SQLV_UPD_MOD = 7


@register(
    "z_snapshot_sql_verbs",
    oracle=f"""WITH sub AS (
        SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
        FROM orders WHERE o_orderkey % {_SLICE_MOD} = 1
    ),
    merged AS (
        SELECT k,
               CASE WHEN k % {_UPD_MOD} = 0 THEN price + {_UPD_DELTA}
                    ELSE price END AS price
        FROM sub
    ),
    updated AS (
        SELECT k,
               CASE WHEN k % {_SQLV_UPD_MOD} = 2 THEN price * 2.0
                    ELSE price END AS price
        FROM merged
    )
    SELECT k, price AS amount, CAST(NULL AS VARCHAR) AS flag, 'cur' AS side
    FROM updated WHERE k % {_DEL_MOD} <> 0
    UNION ALL
    SELECT k, price AS amount, CAST(NULL AS VARCHAR) AS flag, 'v2' AS side
    FROM merged
    """,
    tags=("snapshot", "lakehouse", "sql"),
)
def z_snapshot_sql_verbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot verb chain driven through SQL TEXT ONLY
    (sources/snapshot_sql.snapshot_sql — round-12 verdict #2): CREATE
    TABLE … KEY … AS SELECT lands the slice (v1), MERGE INTO upserts the
    k%3=0 price bump via a sub-select source (v2), UPDATE doubles k%7=2
    survivors (v3), DELETE FROM drops k%5=0 merge-on-read (v4), ALTER
    TABLE RENAME price→amount (v5, log-only) and ADD COLUMN flag (v6,
    NULL everywhere), OPTIMIZE folds the small-file tail, VACUUM runs
    age-gated (drops nothing young), and the answer is ONE SQL statement
    unioning the current read with a VERSION AS OF 2 time travel — every
    verb routed to the same Python machinery the API chain certifies, so
    a divergence anywhere in the dispatcher value-hash-fails against
    DuckDB's recomputation from the base parquet."""
    from ..sources.snapshot_sql import snapshot_sql

    base = _base_slice(spark, sf_dir)
    view = "hps_sqlverbs_base"
    base.createOrReplaceTempView(view)
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapsql_"), "tbl")
    t = {"sqlverbs_t": path}
    run = lambda s: snapshot_sql(spark, s, tables=t)  # noqa: E731
    run(f"CREATE TABLE sqlverbs_t KEY k AS SELECT * FROM {view}")
    run(
        f"MERGE INTO sqlverbs_t USING (SELECT k, price + {_UPD_DELTA} AS "
        f"price, status FROM {view} WHERE k % {_UPD_MOD} = 0) s "
        "ON sqlverbs_t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    run(
        f"UPDATE sqlverbs_t SET price = price * 2.0 "
        f"WHERE k % {_SQLV_UPD_MOD} = 2"
    )
    run(f"DELETE FROM sqlverbs_t WHERE k % {_DEL_MOD} = 0")
    run("ALTER TABLE sqlverbs_t RENAME COLUMN price TO amount")
    run("ALTER TABLE sqlverbs_t ADD COLUMN flag string")
    run("OPTIMIZE sqlverbs_t")
    run("VACUUM sqlverbs_t RETAIN 8760 HOURS KEEP LAST 10")
    return run(
        "SELECT k, amount, flag, 'cur' AS side FROM sqlverbs_t "
        "UNION ALL "
        "SELECT k, price AS amount, CAST(NULL AS STRING) AS flag, "
        "'v2' AS side FROM sqlverbs_t VERSION AS OF 2"
    )


@register(
    "z_snapshot_sql_sync",
    oracle=f"""SELECT o_orderkey AS k, o_totalprice + 7.0 AS price,
           o_orderstatus AS status
    FROM orders
    WHERE o_orderkey % {_SLICE_MOD} = 1 AND o_orderkey % 4 <> 3
    """,
    tags=("snapshot", "lakehouse", "sql"),
)
def z_snapshot_sql_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sync MERGE under the hash gate (round-13 second batch):
    ``WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED BY SOURCE THEN
    DELETE`` — the source carries updated prices for the k%4≠3 half of
    the table's keys PLUS keys the table never had (%13=2 — must be
    DROPPED: no insert clause), and the table's k%4=3 rows are absent
    from the source (must be DELETED). With unconditional clauses the
    post-state is a pure function of (table, source), committed as ONE
    atomic overwrite; DuckDB recomputes it from the base parquet, so a
    wrong leg anywhere in the three-way classification value-hash-
    fails."""
    from ..sources.snapshot_sql import snapshot_sql

    base = _base_slice(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapsync_"), "tbl")
    sn.create_table(base, path, "k")
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderkey") % _SLICE_MOD).isin(1, 2)
            & ((F.col("o_orderkey") % 4) != 3)
        )
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") + F.lit(7.0)).alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    src.createOrReplaceTempView("hps_sync_src")
    snapshot_sql(
        spark,
        "MERGE INTO t USING hps_sync_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        tables={"t": path},
    )
    return sn.read_table(spark, path).select("k", "price", "status")


_TW_MOD = 4
_TW_BIG = 3_000_000_000


@register(
    "z_snapshot_type_widen",
    oracle=f"""WITH sub AS (
        SELECT o_orderkey AS k, CAST(o_orderkey % 100 AS INTEGER) AS qty,
               o_orderstatus AS status
        FROM orders WHERE o_orderkey % {_SLICE_MOD} = 1
    )
    SELECT k,
           CAST(CASE WHEN k % {_TW_MOD} = 1
                     THEN CAST(qty AS BIGINT) + {_TW_BIG}
                     ELSE qty END AS BIGINT) AS qty,
           status
    FROM sub WHERE k % {_DEL_MOD} <> 0
    """,
    tags=("snapshot", "lakehouse", "evolution"),
)
def z_snapshot_type_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER COLUMN TYPE widening under the hash gate
    (sources/snapshots.alter_column_type — round-12 verdict #3): land the
    slice with an INT qty column, widen qty→bigint as a log-only commit,
    MERGE values that need all 64 bits into k%4=1 rows (the rewritten
    files store int64 while untouched files keep int32 pages — the read
    promotes both to one uniform bigint column), then MoR-delete k%5=0.
    DuckDB recomputes the widened values and the BIGINT result type from
    the base parquet, so a wrong promotion (or a silent re-narrow
    anywhere in read/merge/DV) fails the typed value hash."""
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % _SLICE_MOD == 1)
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderkey") % 100).cast("int").alias("qty"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapw_"), "tbl")
    sn.create_table(base, path, "k")                       # v1: qty INT
    sn.alter_column_type(spark, path, "qty", "bigint")     # v2: log-only
    upd = (
        sn.read_table(spark, path)
        .filter(F.col("k") % _TW_MOD == 1)
        .withColumn("qty", F.col("qty") + F.lit(_TW_BIG))
    )
    sn.merge_into(spark, path, upd, "k")                   # v3: needs 64 bits
    sn.delete_from_mor(
        spark, path, base.filter(F.col("k") % _DEL_MOD == 0).select("k"), "k"
    )                                                      # v4
    return sn.read_table(spark, path).select("k", "qty", "status")


@register(
    "z_snapshot_partition_range",
    oracle="""WITH sub AS (
        SELECT event_id, user_id, event_type, value,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id
        FROM events WHERE event_id % 7 = 3
    ),
    bounds AS (SELECT min(day_id) AS d0 FROM sub)
    SELECT event_id, user_id, event_type, value, day_id FROM sub, bounds
    WHERE day_id BETWEEN d0 + 2 AND d0 + 4
    """,
    tags=("snapshot", "lakehouse", "partition"),
)
def z_snapshot_partition_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-RANGE probe under the hash gate (round-12 verdict #6):
    the same day-partitioned events table as z_snapshot_partition_probe,
    answered for a 3-day WINDOW through read_table_where's (lo, hi)
    predicate — files skip by manifest-range OVERLAP instead of
    containment (the week-slice shape; the counted files-opened pin
    lives in test_partition_spec.py), and the residual BETWEEN keeps the
    row set exact. DuckDB recomputes the window from the base parquet."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 3)
        .selectExpr(
            "event_id", "user_id", "event_type", "value",
            "CAST(unix_micros(ts) DIV 86400000000 AS BIGINT) AS day_id",
        )
    )
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapr_"), "tbl")
    sn.create_table(ev, path, "event_id", partition_by=["day_id"],
                    partition_files=16)
    d0 = sn.read_table(spark, path).agg(F.min("day_id")).first()[0]
    return sn.read_table_where(
        spark, path, {"day_id": (int(d0) + 2, int(d0) + 4)}
    ).select("event_id", "user_id", "event_type", "value", "day_id")


_MSE_MOD = 9


@register(
    "z_snapshot_merge_evolve",
    oracle=f"""WITH {_SUB_CTE}
    SELECT k, price, status,
           CASE WHEN k % {_MSE_MOD} = 4 THEN 'X' ELSE NULL END AS flag
    FROM merged WHERE k % {_DEL_MOD} <> 0
    """,
    tags=("snapshot", "lakehouse", "evolution"),
)
def z_snapshot_merge_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with automatic schema evolution (merge_into's
    ``merge_schema=True`` — Delta's mergeSchema-on-MERGE): one commit
    both widens the table with the update frame's new ``flag`` column
    and applies the upsert. Rows the merge touched carry 'X'; every
    other row — whether its file was rewritten (carried rows of
    affected files) or untouched (reads under the widened log schema) —
    is NULL. DuckDB recomputes the widened state from the base parquet."""
    path = _build_chain(spark, sf_dir)
    cur = sn.read_table(spark, path)
    upd = cur.filter(F.col("k") % _MSE_MOD == 4).withColumn("flag", F.lit("X"))
    sn.merge_into(spark, path, upd, "k", merge_schema=True)
    return sn.read_table(spark, path).select("k", "price", "status", "flag")


_MC_DELTA = 50.0
_MC_DEL_MOD = 7
_MC_INS_MOD = 4


@register(
    "z_snapshot_sql_merge_cond",
    oracle=f"""WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS price,
               o_orderstatus AS status
        FROM orders WHERE o_orderkey % {_SLICE_MOD} = 1
    ),
    src AS (
        SELECT o_orderkey AS k, o_totalprice + {_MC_DELTA} AS price,
               o_orderstatus AS status
        FROM orders WHERE o_orderkey % {_SLICE_MOD} IN (1, 2)
    ),
    matched AS (
        SELECT b.k,
               CASE WHEN s.status = 'O' THEN b.price + s.price
                    ELSE b.price END AS price,
               b.status,
               CASE WHEN s.status = 'O' THEN 'u'
                    WHEN b.k % {_MC_DEL_MOD} = 3 THEN 'd'
                    ELSE 'k' END AS act
        FROM base b JOIN src s ON b.k = s.k
    )
    SELECT k, price, status FROM matched WHERE act <> 'd'
    UNION ALL
    SELECT s.k, s.price * 2.0 AS price, CAST(NULL AS VARCHAR) AS status
    FROM src s
    WHERE s.k NOT IN (SELECT k FROM base) AND s.k % {_MC_INS_MOD} = 2
    """,
    tags=("snapshot", "lakehouse", "sql"),
)
def z_snapshot_sql_merge_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional MERGE clauses under the hash gate (round-13 verdict
    #2): ``WHEN MATCHED AND s.status = 'O' THEN UPDATE SET price =
    t.price + s.price`` (column-level assignment mixing both aliases),
    ``WHEN MATCHED AND t.k % 7 = 3 THEN DELETE`` (fires only where the
    FIRST clause did not — first-match ordering is part of what the
    hash certifies), and ``WHEN NOT MATCHED AND s.k % 4 = 2 THEN INSERT
    (k, price) VALUES (s.k, s.price * 2.0)`` (column-list insert,
    unlisted columns NULL; non-qualifying source rows dropped). All
    three legs land in ONE merge commit (updates+inserts upserted,
    delete keys riding the same commit's delete_keys). DuckDB recomputes
    the post-state from the base parquet, so a wrong leg, a wrong clause
    order, or a torn commit value-hash-fails."""
    from ..sources.snapshot_sql import snapshot_sql

    base = _base_slice(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapmc_"), "tbl")
    sn.create_table(base, path, "k")                            # v1
    src = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % _SLICE_MOD).isin(1, 2))
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") + F.lit(_MC_DELTA)).alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    src.createOrReplaceTempView("hps_mc_src")
    snapshot_sql(
        spark,
        "MERGE INTO t USING hps_mc_src s ON t.k = s.k "
        "WHEN MATCHED AND s.status = 'O' THEN "
        "UPDATE SET price = t.price + s.price "
        f"WHEN MATCHED AND t.k % {_MC_DEL_MOD} = 3 THEN DELETE "
        f"WHEN NOT MATCHED AND s.k % {_MC_INS_MOD} = 2 THEN "
        "INSERT (k, price) VALUES (s.k, s.price * 2.0)",
        tables={"t": path},
    )                                                           # v2: ONE commit
    return sn.read_table(spark, path).select("k", "price", "status")


@register(
    "z_snapshot_partition_transform",
    oracle="""WITH sub AS (
        SELECT event_id, user_id, event_type, value,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id
        FROM events WHERE event_id % 11 = 4
    )
    SELECT event_id, user_id, event_type, value, day_id FROM sub
    WHERE day_id = (SELECT min(day_id) + 2 FROM sub)
    """,
    tags=("snapshot", "lakehouse", "partition"),
)
def z_snapshot_partition_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition TRANSFORMS under the hash gate (round-13 verdict #3):
    land an events slice as a snapshot table partitioned by
    ``days(ts)`` over the RAW timestamp column — no materialized day
    column — so every write clusters on the day id and the log records
    the TRANSFORMED per-file range (derived from the source column's
    footer stats through the driver-side transform twin). The probe
    then file-skips by transform name ({'days(ts)': d} through
    read_table_where) and the residual day filter evaluates the same
    expression in-scan. DuckDB recomputes the probed day's rows from
    the base parquet with epoch-microseconds division (identical to the
    datediff day id for these positive timestamps), so a wrong
    transform on either side — write clustering, recorded range, probe
    fold, or residual — value-hash-fails. Counted file-skip pins per
    transform live in tests/test_partition_transforms.py."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 11 == 4)
        .select("event_id", "user_id", "event_type", "value", "ts")
    )
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snappt_"), "tbl")
    sn.create_table(ev, path, "event_id", partition_by=["days(ts)"],
                    partition_files=16)
    day_expr = "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
    day = (
        sn.read_table(spark, path)
        .agg(F.min(F.expr(day_expr)))
        .first()[0]
        + 2
    )
    return sn.read_table_where(spark, path, {"days(ts)": int(day)}).selectExpr(
        "event_id", "user_id", "event_type", "value",
        f"CAST({day_expr} AS BIGINT) AS day_id",
    )


@register(
    "z_snapshot_sql_merge_on",
    oracle=f"""WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS price,
               o_orderstatus AS status
        FROM orders WHERE o_orderkey % {_SLICE_MOD} = 1
    ),
    cls AS (
        SELECT k, price, status,
               CASE WHEN k % 2 = 0 AND k % 4 <> 0 THEN 'm'
                    WHEN k % 3 = 0 THEN 'u2'
                    WHEN k % 3 = 1 THEN 'd'
                    ELSE 'k' END AS act
        FROM base
    )
    SELECT k,
           CASE act WHEN 'm' THEN price + 1.0
                    WHEN 'u2' THEN price * 2.0
                    ELSE price END AS price,
           status
    FROM cls WHERE act <> 'd'
    """,
    tags=("snapshot", "lakehouse", "sql"),
)
def z_snapshot_sql_merge_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual ON conjuncts + BY SOURCE actions under the hash gate
    (round-14 second batch): ``ON t.k = s.k AND t.status = s.status`` —
    the source carries the k%2=0 half of the table's keys but corrupts
    status on k%4=0 rows, so those PAIRS fail the residual and the
    target rows fall through to the BY SOURCE clauses (the Delta ON
    semantics: matched = the FULL condition holds). Matched rows (k%2=0,
    k%4≠0) take the column-level update; not-matched-by-source rows
    split first-match between a BY SOURCE UPDATE (k%3=0, doubling) and
    a BY SOURCE DELETE (k%3=1); the rest stay. One commit. DuckDB
    recomputes the whole classification from the base parquet."""
    from ..sources.snapshot_sql import snapshot_sql

    base = _base_slice(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="hps_snapmon_"), "tbl")
    sn.create_table(base, path, "k")                            # v1
    src = base.filter(F.col("k") % 2 == 0).withColumn(
        "status",
        F.when(F.col("k") % 4 == 0, F.lit("X")).otherwise(F.col("status")),
    )
    src.createOrReplaceTempView("hps_mon_src")
    snapshot_sql(
        spark,
        "MERGE INTO t USING hps_mon_src s ON t.k = s.k AND t.status = s.status "
        "WHEN MATCHED THEN UPDATE SET price = t.price + 1.0 "
        "WHEN NOT MATCHED BY SOURCE AND t.k % 3 = 0 THEN "
        "UPDATE SET price = t.price * 2.0 "
        "WHEN NOT MATCHED BY SOURCE AND t.k % 3 = 1 THEN DELETE",
        tables={"t": path},
    )                                                           # v2
    return sn.read_table(spark, path).select("k", "price", "status")
