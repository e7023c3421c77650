"""Exactly-once streaming sinks via foreachBatch (engine extension).

Structured Streaming's file/noop sinks are exactly-once out of the box
(checkpoint + idempotent commit protocol — pinned by
test_streaming_checkpoint_resume_processes_only_new_data). Arbitrary
external sinks (JDBC here) get the same guarantee from the standard
foreachBatch recipe: the checkpoint gives at-least-once BATCH replay with
a stable ``batch_id``, so a sink that is IDEMPOTENT PER batch_id is
exactly-once end-to-end.

This sink records batch_id in a ledger table and skips batches it has
already committed — the replay-after-crash path a 100 TB ingest pipeline
actually exercises (executor loss mid-epoch replays the whole epoch).
Ledger check and data write happen on the driver per micro-batch; the
data write itself is the parallel `write.jdbc` path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def jdbc_exactly_once_sink(
    stream: DataFrame,
    url: str,
    table: str,
    checkpoint_dir: str,
    ledger_table: str | None = None,
    properties: dict | None = None,
    trigger_available_now: bool = True,
):
    """Start a writeStream whose micro-batches append to a JDBC table
    exactly once. Returns the StreamingQuery.

    Replayed batches (same batch_id after a crash/restart) are detected in
    the ledger and skipped, making the append idempotent. The ledger insert
    lands after the data write: a crash between the two replays the batch
    and re-appends — to keep the window closed, production deployments put
    the ledger insert and the data load in one transaction on the target DB
    (Derby here cannot span Spark's multi-connection jdbc write), or write
    batch_id as a data column and dedup on read.
    """
    props = dict(properties or {})
    ledger = ledger_table or f"{table}_EPOCHS"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        reader = spark.read.format("jdbc").option("url", url).option("dbtable", ledger)
        for k, v in props.items():
            reader = reader.option(k, v)
        try:
            seen = reader.load().filter(f"BATCH_ID = {int(batch_id)}").count() > 0
        except Exception:
            seen = False  # ledger table does not exist yet: first batch
        if seen:
            return
        batch_df.write.jdbc(url, table, mode="append", properties=props)
        spark.createDataFrame([(int(batch_id),)], "BATCH_ID bigint").write.jdbc(
            url, ledger, mode="append", properties=props
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hll_register_sink(
    stream: DataFrame,
    value_col: str,
    state_path: str,
    trigger_available_now: bool = True,
):
    """Maintain a persistent HLL distinct sketch over a stream: every
    micro-batch's registers merge (cell-wise max) into a ≤256-row parquet
    state table.

    This is the streaming payoff of a MERGEABLE sketch: distinct counting
    over an unbounded stream in constant state, with NO per-key streaming
    state store at all — the engine's state is the checkpoint (which files
    were consumed) and the sketch itself is an idempotent-by-construction
    merge target: register max is commutative, associative, AND idempotent,
    so an at-least-once batch replay cannot change the result. Contrast
    streaming_dedup, whose state grows with the key space.

    Returns the StreamingQuery; read the estimate any time with
    ``hll_estimate(spark.read.parquet(state_path))``.

    NOT every mergeable sketch gets this for free: count-min merges by
    cell-wise ADDITION, which is commutative/associative but not
    idempotent — a replayed batch would double-count, so a streamed CMS
    needs the batch-id ledger recipe (jdbc_exactly_once_sink above), not
    the bare merge.
    """
    import os

    from ..operators.sketch import hll_sketch_values

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        _legacy = f"{state_path}.legacy-dir"
        if not os.path.exists(state_path) and os.path.exists(_legacy):
            # crash mid-migration (below): restore the renamed-aside legacy
            # directory before reading — no window loses state
            os.rename(_legacy, state_path)
        fresh = hll_sketch_values(batch_df, value_col)
        if os.path.exists(state_path):
            prev = spark.read.parquet(state_path)
            merged = (
                prev.unionByName(fresh)
                .groupBy("bucket")
                .agg(F.max("max_rho").alias("max_rho"))
            )
        else:
            merged = fresh
        # tiny (≤256 rows): materialize driver-side, then write-new-and-
        # atomically-swap. A Spark mode("overwrite") deletes the directory
        # before committing the new files, so a crash in that window would
        # lose all register state for batches the checkpoint already marked
        # consumed (they never replay). A single parquet FILE swapped in
        # with os.replace is atomic on POSIX: readers and a crash see
        # either the old state or the new, never neither. state_path must
        # be on a POSIX filesystem (local/NFS); for object stores use a
        # versioned-object sink instead — os.replace has no S3 analogue.
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = merged.collect()
        tbl = pa.table(
            {
                "bucket": pa.array([r.bucket for r in rows], pa.int64()),
                "max_rho": pa.array([r.max_rho for r in rows], pa.int32()),
            }
        )
        tmp = f"{state_path}.tmp-{batch_id}"
        pq.write_table(tbl, tmp)
        if os.path.isdir(state_path):
            # one-time migration from the legacy Spark-directory state
            # layout (pre-atomic-swap versions): rename the directory ASIDE
            # (restored at batch start if we crash before the swap lands),
            # swap the file in, then drop the aside copy — no crash point
            # loses state
            os.rename(state_path, _legacy)
        os.replace(tmp, state_path)
        if os.path.isdir(_legacy):
            shutil.rmtree(_legacy)

    writer = stream.writeStream.foreachBatch(merge_batch).outputMode("append")
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
