"""Persisted RAG postings index (operators/retrieval.py +
snapshots.read_table_pruned_in): indexed serving must equal the direct
path bitwise, probes must file-skip from the log's bucket ranges, and
incremental appends must fold new documents in exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.operators import retrieval
from hadoop_prototype_spark.sources import snapshots as sn


def _docs(spark, n=30, words=40):
    # deterministic multi-token docs with shared vocabulary across docs
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"array_join(transform(sequence(1, {words}), "
        "j -> concat('w', CAST((id * j * 7919) % 97 AS STRING))), ' ') AS text",
    )


def _topk_rows(df):
    return sorted(
        (r.qid, r.rank, r.doc_id, r.chunk_id, r.cosine) for r in df.collect()
    )


def test_indexed_equals_direct_bitwise(spark, tmp_path):
    docs = _docs(spark)
    direct = _topk_rows(retrieval.rag_retrieve_topk(docs, k=4, n_queries=3))
    idx = str(tmp_path / "idx")
    r = retrieval.build_rag_index(spark, docs, idx)
    assert r["version"] == 1
    indexed = _topk_rows(
        retrieval.rag_query_indexed(spark, idx, docs, k=4, n_queries=3)
    )
    assert indexed == direct  # bitwise: same dots, norms, division, ties


def test_probe_file_skips_from_bucket_ranges(spark, tmp_path):
    """A single-bucket probe must open only the index files whose
    recorded [min, max] bucket range covers it — counted via the actual
    files the pruned scan touches (input_file_name), against the
    table's full file list."""
    docs = _docs(spark, n=60)
    idx = str(tmp_path / "idx")
    retrieval.build_rag_index(spark, docs, idx, n_files=8)
    entry = sn._read_entry(idx, 1)
    total_files = len(entry["files"])
    assert total_files == 8
    probe = sn.read_table_pruned_in(spark, idx, [0])  # one bucket
    touched = {
        r.f
        for r in probe.select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("f")
        )
        .distinct()
        .collect()
    }
    assert 0 < len(touched) < total_files
    # correctness of the skip: same rows as the unpruned filter
    want = sorted(
        (r.doc_id, r.chunk_id, r.w)
        for r in sn.read_table(spark, idx).filter(F.col("bucket") == 0).collect()
    )
    got = sorted((r.doc_id, r.chunk_id, r.w) for r in probe.collect())
    assert got == want


def test_append_rag_index_incremental(spark, tmp_path):
    """Index 20 docs, append 10 more as a blind versioned append: the
    probe over the updated index equals a from-scratch index over all
    30 docs; the old index version still serves the old corpus
    (reproducible retrieval via time travel); replays skip via txn."""
    all_docs = _docs(spark, n=30)
    first = all_docs.filter(F.col("doc_id") < 20)
    rest = all_docs.filter(F.col("doc_id") >= 20)

    idx = str(tmp_path / "idx")
    retrieval.build_rag_index(spark, first, idx)
    v1 = _topk_rows(retrieval.rag_query_indexed(spark, idx, first, k=4, n_queries=3))

    r = retrieval.append_rag_index(
        spark, rest, idx, txn={"app": "ragidx", "batch": 1}
    )
    assert r["version"] == 2

    # updated index == from-scratch index over the full corpus
    idx_full = str(tmp_path / "idx_full")
    retrieval.build_rag_index(spark, all_docs, idx_full)
    got = _topk_rows(retrieval.rag_query_indexed(spark, idx, all_docs, k=4, n_queries=3))
    want = _topk_rows(
        retrieval.rag_query_indexed(spark, idx_full, all_docs, k=4, n_queries=3)
    )
    assert got == want
    # and equals the direct path over the full corpus
    assert got == _topk_rows(retrieval.rag_retrieve_topk(all_docs, k=4, n_queries=3))

    # pinned version: the pre-append snapshot still answers the old corpus
    old = _topk_rows(
        retrieval.rag_query_indexed(spark, idx, first, k=4, n_queries=3, version=1)
    )
    assert old == v1

    # replayed append: txn marker skips, no new version
    r2 = retrieval.append_rag_index(
        spark, rest, idx, txn={"app": "ragidx", "batch": 1}
    )
    assert r2["version"] == 2 and r2.get("skipped_as_duplicate_txn")


def test_pruned_in_edge_cases(spark, tmp_path):
    t = str(tmp_path / "t")
    sn.create_table(
        spark.range(100).repartitionByRange(4, "id").selectExpr(
            "id AS k", "id * 2 AS v"
        ),
        t, "k",
    )
    # empty value list: empty frame, schema intact
    assert sn.read_table_pruned_in(spark, t, []).count() == 0
    # values outside every file range: empty
    assert sn.read_table_pruned_in(spark, t, [5000, 6000]).count() == 0
    # exact membership semantics (values between rows don't match)
    got = sorted(r.k for r in sn.read_table_pruned_in(spark, t, [3, 97, 98]).collect())
    assert got == [3, 97, 98]


def test_index_meta_persisted_and_validated(spark, tmp_path):
    """The index's embedding parameters are a persisted layout contract
    (ADVICE r11): a probe hashed mod a different dim hits valid files
    but scores garbage, so the build records (dim, salt, chunk, stride)
    and a mismatching explicit probe/append fails loud instead."""
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    retrieval.build_rag_index(spark, docs, idx, dim=16)
    meta = retrieval.read_rag_index_meta(idx)
    assert meta == {"dim": 16, "salt": retrieval.RAG_SALT,
                    "chunk": 32, "stride": 32}

    # probe with NO dim uses the recorded one (bitwise == explicit 16)
    got = _topk_rows(retrieval.rag_query_indexed(spark, idx, docs, k=3, n_queries=2))
    want = _topk_rows(retrieval.rag_retrieve_topk(docs, k=3, n_queries=2, dim=16))
    assert got == want

    # explicit mismatching dim on the probe: refused
    with pytest.raises(ValueError, match="built with dim=16"):
        retrieval.rag_query_indexed(spark, idx, docs, dim=32)
    # mismatching append: refused before any postings land
    with pytest.raises(ValueError, match="refusing to write"):
        retrieval.append_rag_index(spark, docs, idx, dim=32)
    assert sn.current_version(idx) == 1


def test_upsert_first_batch_race_converges(spark, tmp_path):
    """Two concurrent first-batch writers both see an empty index; the
    create loser must converge to an append (ADVICE r11), and the final
    index holds BOTH batches' postings exactly once."""
    from concurrent.futures import ThreadPoolExecutor

    docs = _docs(spark, n=20)
    a = docs.filter(F.col("doc_id") < 10)
    b = docs.filter(F.col("doc_id") >= 10)
    idx = str(tmp_path / "idx")

    errors = []

    def go(batch_df, bid):
        try:
            retrieval.upsert_rag_index_batch(
                spark, batch_df, idx, txn={"app": "race", "batch": bid}
            )
        except Exception as e:  # noqa: BLE001 — collected for assertion
            errors.append(e)

    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [pool.submit(go, a, 0), pool.submit(go, b, 1)]:
            f.result()
    assert not errors, errors

    # both batches landed exactly once: probe equals a fresh full index
    idx_full = str(tmp_path / "idx_full")
    retrieval.build_rag_index(spark, docs, idx_full)
    got = _topk_rows(retrieval.rag_query_indexed(spark, idx, docs, k=4, n_queries=3))
    want = _topk_rows(
        retrieval.rag_query_indexed(spark, idx_full, docs, k=4, n_queries=3)
    )
    assert got == want
    # and replays of either batch skip via their txn markers
    r = retrieval.upsert_rag_index_batch(
        spark, a, idx, txn={"app": "race", "batch": 0}
    )
    assert r.get("skipped_as_duplicate_txn")
