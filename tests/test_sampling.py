"""Sampling operator semantics (operators/sampling.py).

Parity vs the DuckDB oracles is pinned by test_correctness_parity; these
pin the properties that make the samplers usable in a pipeline:
layout-invariance, exact per-group k, rate monotonicity, and split
stability under appends.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_prototype_spark.operators import sampling
from hadoop_prototype_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_hash_rate_sample_is_layout_invariant(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    base = {r.doc_id for r in sampling.hash_rate_sample(docs).select("doc_id").collect()}
    shuffled = {
        r.doc_id
        for r in sampling.hash_rate_sample(docs.repartition(7)).select("doc_id").collect()
    }
    assert base == shuffled
    assert 0 < len(base) < docs.count()


def test_hash_rate_sample_rate_zero_and_full(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    none_kept = sampling.hash_rate_sample(
        docs, rates={la: 0.0 for la in langs}, default_rate=0.0
    )
    assert none_kept.count() == 0
    all_kept = sampling.hash_rate_sample(
        docs, rates={la: 100.0 for la in langs}, default_rate=100.0
    )
    assert all_kept.count() == docs.count()


def test_hash_rate_sample_is_monotone_in_rate(spark, sf_dir):
    """Raising a stratum's rate only ADDS documents (nested samples) — the
    property that lets a pipeline re-balance without resampling history."""
    docs = _docs(spark, sf_dir)
    low = {r.doc_id for r in sampling.hash_rate_sample(docs, rates={"en": 20.0}).collect()}
    high = {r.doc_id for r in sampling.hash_rate_sample(docs, rates={"en": 60.0}).collect()}
    assert low <= high


def test_per_group_fixed_k_exact_counts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    k = 5
    out = sampling.per_group_fixed_k(docs, k=k)
    sizes = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    group_sizes = {
        r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {g: min(k, n) for g, n in group_sizes.items()}
    # rank is 1..k dense within each group
    ranks = out.groupBy("source").agg(F.max("sample_rank").alias("mx"), F.count("*").alias("n"))
    assert all(r.mx == r.n for r in ranks.collect())


def test_per_group_fixed_k_matches_unfiltered_rank(spark, sf_dir):
    """The cutoff prefilter must be invisible: same rows as ranking the
    whole group (margin high enough that no group loses survivors)."""
    docs = _docs(spark, sf_dir)
    fast = sampling.per_group_fixed_k(docs, k=3, margin=8)
    wide = sampling.per_group_fixed_k(docs, k=3, margin=10**6)
    assert {tuple(r) for r in fast.select("source", "doc_id").collect()} == {
        tuple(r) for r in wide.select("source", "doc_id").collect()
    }


def test_train_eval_split_covers_and_is_stable_under_append(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = sampling.train_eval_split(docs).select("doc_id", "split")
    assert out.count() == docs.count()
    assignment = {r.doc_id: r.split for r in out.collect()}
    assert set(assignment.values()) <= {"train", "valid", "test"}
    # appending more rows must not move existing assignments
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = {r.doc_id: r.split for r in sampling.train_eval_split(half).collect()}
    assert all(assignment[d] == s for d, s in sub.items())


def test_hash_rate_sample_plan_has_no_corpus_shuffle(spark, sf_dir):
    """100 TB shape: the corpus side is filter-only — broadcast join, no
    Exchange over the documents scan."""
    docs = _docs(spark, sf_dir)
    plan = sampling.hash_rate_sample(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    # the only exchange allowed is the broadcast of the tiny rates table
    import re

    shuffles = re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", plan)
    assert not shuffles, plan


def test_pack_sequences_is_contiguous_and_layout_invariant(spark, sf_dir):
    """Offsets tile the concatenated stream with no gaps/overlaps, agree
    across input partitionings, and pack ids derive from the offsets."""
    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators.packing import pack_sequences

    docs = _docs(spark, sf_dir)
    out = pack_sequences(docs, capacity=128).orderBy("doc_id").collect()
    expected_start = 0
    for r in out:
        assert r.start_offset == expected_start
        assert r.first_pack == r.start_offset // 128
        assert r.last_pack == (r.start_offset + max(r.n_tokens, 1) - 1) // 128
        expected_start += r.n_tokens
    again = pack_sequences(docs.repartition(13), capacity=128).orderBy("doc_id").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_mixture_plan_feasible_and_binding(spark, sf_dir):
    """Plan invariants: every keep_rate ∈ (0,1]; the binding source keeps
    exactly 1.0; expected tokens realize the target proportions (ratios of
    expected_tokens equal ratios of target shares)."""
    from hadoop_prototype_spark.operators.sampling import mixture_plan
    from hadoop_prototype_spark.sources.tables import load_table

    rows = mixture_plan(load_table(spark, sf_dir, "documents")).collect()
    assert rows
    assert all(0 < r.keep_rate <= 1.0 + 1e-12 for r in rows)
    assert any(abs(r.keep_rate - 1.0) < 1e-9 for r in rows), "binding source keeps all"
    base = rows[0]
    for r in rows[1:]:
        assert abs(
            r.expected_tokens / base.expected_tokens
            - r.target_share / base.target_share
        ) < 1e-9


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    """Docs sharing the target subset's vocabulary must score strictly
    higher than docs with off-target vocabulary, and the bucket-weight
    construction must be deterministic across two runs."""
    from hadoop_prototype_spark.operators.sampling import dsir_importance

    rows = (
        [(i, "the quick brown fox jumps", "en") for i in range(10)]
        + [(100, "the quick brown fox jumps", "xx")]   # target-like, not in target
        + [(101, "zzz qqq vvv kkk www", "xx")]         # off-target vocab
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.importance for r in dsir_importance(docs).collect()}
    assert out[100] > out[101]
    # target members themselves score like doc 100 (same text)
    assert out[0] == out[100]
    out2 = {r.doc_id: r.importance for r in dsir_importance(docs).collect()}
    assert out == out2


def test_leakage_free_split_keeps_clusters_together(spark, sf_dir):
    """No near-dup pair may straddle a split boundary; docs outside any
    cluster keep train_eval_split's per-doc assignment exactly."""
    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators import dedup, sampling
    from hadoop_prototype_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    cc = dedup.connected_components(pairs)
    out = sampling.leakage_free_split(docs, cc).select("doc_id", "split")

    # every LSH pair is on the same side
    s_a = out.withColumnRenamed("doc_id", "a").withColumnRenamed("split", "sa")
    s_b = out.withColumnRenamed("doc_id", "b").withColumnRenamed("split", "sb")
    straddlers = pairs.join(s_a, "a").join(s_b, "b").filter("sa != sb").count()
    assert straddlers == 0
    assert pairs.count() > 0  # the assertion above actually tested something

    # singletons (no cluster) match the plain per-doc split
    clustered = cc.select(F.col("node").alias("doc_id"))
    plain = sampling.train_eval_split(docs).select("doc_id", "split")
    diff = (
        out.join(clustered, "doc_id", "left_anti")
        .withColumnRenamed("split", "s1")
        .join(plain, "doc_id")
        .filter("s1 != split")
        .count()
    )
    assert diff == 0


# --- quality-ranked token-budget selection ------------------------------------


def test_budget_select_scale_path_matches_exact(spark, sf_dir):
    """The histogram-boundary plan must be BIT-identical to the window
    cumsum definition — the whole point of the two-path design."""
    docs = _docs(spark, sf_dir)
    exact = sorted(map(tuple, sampling.budget_select_exact(docs, 600).collect()))
    scale = sorted(map(tuple, sampling.budget_select(docs, 600).collect()))
    assert exact == scale and len(exact) > 0


def test_budget_select_meets_budget_greedily(spark, sf_dir):
    """Every selected source's token total reaches the budget (it has
    enough tokens at every SF) and removing each source's crossing doc
    would drop it below — i.e., the selection is the minimal greedy
    prefix, not 'roughly budget-sized'."""
    docs = _docs(spark, sf_dir)
    rows = sampling.budget_select(docs, 600).collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    assert per_src, "selection must be non-empty"
    for source, sel in per_src.items():
        total = sum(r.n_tokens for r in sel)
        assert total >= 600, (source, total)
        # the lowest-ranked selected doc is the crossing doc
        crossing = min(sel, key=lambda r: (r.quality, -r.doc_id))
        assert total - crossing.n_tokens < 600, (source, total, crossing.n_tokens)


def test_budget_select_edge_budgets(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    assert sampling.budget_select(docs, 0).count() == 0
    all_docs = docs.count()
    assert sampling.budget_select(docs, 10**12).count() == all_docs
    assert sampling.budget_select_exact(docs, 10**12).count() == all_docs


def test_budget_select_dict_budgets_drop_absent_sources(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = sampling.budget_select(docs, {"src0": 300, "src1": 10**12}).collect()
    srcs = {r.source for r in rows}
    assert srcs == {"src0", "src1"}
    src1_all = docs.filter("source = 'src1'").count()
    assert sum(1 for r in rows if r.source == "src1") == src1_all
    assert sum(r.n_tokens for r in rows if r.source == "src0") >= 300
    # exact path agrees on dict budgets too
    exact = sorted(
        map(tuple, sampling.budget_select_exact(docs, {"src0": 300, "src1": 10**12}).collect())
    )
    assert exact == sorted(map(tuple, rows))


def test_budget_select_stale_stats_fail_loudly(spark, sf_dir):
    """Round-9 advice: stats that don't cover a budgeted source must raise,
    not silently select the whole source (dict) or drop it (int). Stale
    stats are simulated by building them on a source-filtered corpus."""
    import pytest

    from hadoop_prototype_spark.operators.corpusstats import collect_corpus_stats

    docs = _docs(spark, sf_dir)
    partial_stats = collect_corpus_stats(docs.filter("source <> 'src1'"))
    # dict budget naming the missing source: driver-side ValueError
    with pytest.raises(ValueError, match="src1.*no cells"):
        sampling.budget_select(
            docs, {"src0": 300, "src1": 10}, stats=partial_stats
        )
    # uniform budget: the missing source surfaces at execution time
    with pytest.raises(Exception, match="src1.*no cells"):
        sampling.budget_select(docs, 300, stats=partial_stats).collect()
    # and intact stats on the same corpus still work (guard is inert)
    full = collect_corpus_stats(docs)
    got = sorted(map(tuple, sampling.budget_select(docs, 300, stats=full).collect()))
    assert got == sorted(map(tuple, sampling.budget_select_exact(docs, 300).collect()))


def test_budget_select_with_stats_never_scans_for_histogram(spark, sf_dir):
    """With a precomputed CorpusStats the boundary walk is driver-side
    arithmetic on the stats cells: building the frame launches ZERO jobs
    (the stats scan is gone; execution is deferred like any DataFrame)."""
    from hadoop_prototype_spark.operators.corpusstats import collect_corpus_stats

    docs = _docs(spark, sf_dir)
    stats = collect_corpus_stats(docs)
    tracker = spark.sparkContext.statusTracker()
    spark.sparkContext.setJobGroup("budget_stats_build", "stats provided")
    df = sampling.budget_select(docs, 600, stats=stats)
    n_build = len(tracker.getJobIdsForGroup("budget_stats_build"))
    spark.sparkContext.setJobGroup("default", "reset")
    assert n_build == 0, f"plan build with stats must launch no jobs, got {n_build}"
    # and the result is still the exact selection
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, sampling.budget_select_exact(docs, 600).collect())
    )


def test_budget_select_window_sees_only_boundary_bins(spark, sf_dir):
    """The scale contract: the ranking Window's input is each source's
    single boundary bin, a ≤1/bins quality slice — not the corpus. Pinned
    by counting boundary-bin docs directly."""
    from hadoop_prototype_spark.operators.corpusstats import collect_corpus_stats
    from hadoop_prototype_spark.operators.sampling import _budget_boundaries

    docs = _docs(spark, sf_dir)
    stats = collect_corpus_stats(docs)
    bounds = _budget_boundaries(stats, 600)
    by_cell = {(s, q): nd for s, q, nd, _ in stats.cells}
    boundary_docs = sum(by_cell.get((s, b), 0) for s, (b, _) in bounds.items())
    total_docs = stats.n_docs
    assert boundary_docs < total_docs * 0.5, (boundary_docs, total_docs)


def test_budget_select_tie_heavy_corpus(spark):
    """Stress the boundary logic with massive quality ties: many docs
    share IDENTICAL text (same quality, same tokens, one histogram bin),
    so the boundary bin is crossed mid-tie and only the doc_id tiebreak
    orders the fill. Exact and scale paths must still agree exactly."""
    rows = []
    for i in range(60):
        rows.append((i, "the quick brown fox jumps", "s1"))  # 5 tokens each
    for i in range(60, 70):
        rows.append((i, "a much much much longer document with many many words here", "s1"))
    for i in range(100, 140):
        rows.append((i, "identical twin text body", "s2"))  # 4 tokens each
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    budgets = {"s1": 23, "s2": 17}  # cross mid-tie in both sources
    exact = sorted(map(tuple, sampling.budget_select_exact(df, budgets).collect()))
    scale = sorted(map(tuple, sampling.budget_select(df, budgets).collect()))
    assert exact == scale and len(exact) > 0
    # s2 is ONE 40-doc tie group of 4-token docs: budget 17 fills with the
    # 5 LOWEST doc_ids (doc_id is the tiebreak), 16 tokens prior < 17 at
    # the 5th, 20 ≥ 17 at the 6th
    s2_ids = sorted(d for d, s, _, _ in exact if s == "s2")
    assert s2_ids == [100, 101, 102, 103, 104]
    # within s1, any partially-selected tie group took its lowest doc_ids
    s1_sel = {d for d, s, _, _ in exact if s == "s1"}
    by_text = {}
    for r in df.filter("source = 's1'").collect():
        by_text.setdefault(r.text, []).append(r.doc_id)
    for _text, ids in by_text.items():
        chosen = sorted(d for d in ids if d in s1_sel)
        assert chosen == sorted(ids)[: len(chosen)], (_text, chosen, ids)


def test_budget_boundaries_match_bruteforce_greedy_property():
    """Pure-driver property test (no Spark): for random stats cells and
    budgets, _budget_boundaries' (boundary_bin, remainder) must agree with
    a brute-force greedy walk over the bins — every doc above the
    boundary selected, remainder spent inside it, nothing below."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hadoop_prototype_spark.operators.corpusstats import CorpusStats
    from hadoop_prototype_spark.operators.sampling import _budget_boundaries

    cells_st = st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=200, deadline=None)
    @given(cells=cells_st, budget=st.integers(min_value=0, max_value=3000))
    def check(cells, budget):
        # collapse duplicate (source, qbin) cells the way the stats
        # aggregate would
        agg: dict = {}
        for s, q, nd, nt in cells:
            d, t = agg.get((s, q), (0, 0))
            agg[(s, q)] = (d + nd, t + nt)
        stats = CorpusStats(
            bins=16,
            cells=tuple(
                sorted((s, q, d, t) for (s, q), (d, t) in agg.items())
            ),
        )
        bounds = _budget_boundaries(stats, budget)
        per_src: dict = {}
        for s, q, _d, t in stats.cells:
            per_src.setdefault(s, {})[q] = per_src.setdefault(s, {}).get(q, 0) + t
        for s, (boundary, remainder) in bounds.items():
            toks = per_src.get(s, {})
            total = sum(toks.values())
            if boundary == -1:
                # uncrossed: the whole source fits inside the budget
                assert total < budget, (s, total, budget)
            else:
                above = sum(t for q, t in toks.items() if q > boundary)
                at = toks.get(boundary, 0)
                # the boundary bin is the FIRST (descending) whose
                # inclusion reaches the budget: every passed bin kept the
                # running sum under budget (above < budget unless the walk
                # stopped immediately, i.e. budget == 0 == above), and the
                # stop condition guarantees inclusion reaches it
                assert above < budget or (above == 0 and budget == 0), (
                    s, above, budget,
                )
                assert budget <= above + at, (s, above, at, budget)
                assert remainder == budget - above
                assert 0 <= remainder <= at

    check()


def test_fim_transform_reconstructs_and_is_deterministic(spark, sf_dir):
    """For every transformed doc, prefix+middle+suffix words equal the
    original word sequence (the cuts lose nothing); pass-through docs are
    byte-identical; the transform is layout-invariant."""
    from hadoop_prototype_spark.operators.training import (
        FIM_MIDDLE,
        FIM_PREFIX,
        FIM_SUFFIX,
        fim_transform,
    )

    docs = _docs(spark, sf_dir)
    orig = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    out = {r.doc_id: (r.fim_applied, r.text_out) for r in fim_transform(docs).collect()}
    n_applied = sum(1 for a, _ in out.values() if a)
    assert 0.3 < n_applied / len(out) < 0.7  # ~50% hash-selected
    for d, (applied, text) in out.items():
        if not applied:
            assert text == orig[d]
            continue
        assert text.startswith(FIM_PREFIX)
        rest = text[len(FIM_PREFIX):]
        prefix, rest = rest.split(FIM_SUFFIX, 1)
        suffix, middle = rest.split(FIM_MIDDLE, 1)
        reassembled = (prefix.split() + middle.split() + suffix.split())
        assert reassembled == orig[d].split(), d
    again = {
        r.doc_id: (r.fim_applied, r.text_out)
        for r in fim_transform(docs.repartition(13)).collect()
    }
    assert again == out


def test_padding_report_accounts_every_doc(spark, sf_dir):
    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators.packing import padding_report

    docs = _docs(spark, sf_dir)
    rows = padding_report(docs).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", r"\s+")))
    ).first()[0]
    assert sum(r.sum_tokens for r in rows) == total_tokens
    for r in rows:
        assert 0 <= r.waste_frac < 1
        assert r.padded_tokens == r.n_docs * r.max_tokens >= r.sum_tokens
        # bucket invariant: every doc in the bucket is within its span
        assert r.max_tokens // 64 == r.bucket
