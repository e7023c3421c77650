"""Physical-plan assertions: the scale contract, checked, not assumed.

Each test pins a property of the executed plan that matters at 100 TB —
predicate pushdown into the parquet scan, column pruning, broadcast of
dimension tables, map-side partial aggregation, shuffling hashes instead
of payloads, range partitioning for total-order sorts, TakeOrderedAndProject
for top-K. A change that silently regresses one of these (e.g. a filter
that stops pushing down, a join that starts shuffling a small dim) fails
here long before it shows up as a 100× slowdown on a cluster.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import hadoop_prototype_spark.plans  # noqa: F401  (populates REGISTRY)
from hadoop_prototype_spark.plans.registry import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def q(spark, name: str):
    return REGISTRY[name].spark_fn(spark, SF_DIR)


def test_q1_pushes_shipdate_filter_and_prunes_columns(spark):
    p = plan_str(q(spark, "q1_pricing_summary"))
    assert "LessThanOrEqual(l_shipdate" in p, "shipdate predicate must reach the scan"
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "l_comment" not in m.group(1), "unused columns must be pruned from the scan"


def test_join_inner_revenue_broadcasts_dims_single_agg_shuffle(spark):
    p = plan_str(q(spark, "join_inner_revenue"), mode="simple")
    assert "BroadcastHashJoin" in p
    # nation/region must never shuffle: their only exchanges are broadcasts
    assert p.count("BroadcastExchange") >= 2
    # exactly two hash exchanges: the order-grain pre-aggregation (the
    # combiner pushed below the join — measured faster at sf0.1 and the
    # only viable shape when orders outgrows the broadcast threshold) and
    # the final 25-group aggregation
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", p)
    assert sorted(exchanges) == ["l_orderkey", "r_name"], exchanges
    # the pre-agg must run BELOW the join: partial_sum over the raw
    # discount expression appears under the lineitem scan side
    assert "partial_sum" in p


def test_wordcount_has_mapside_partial_aggregation(spark):
    p = plan_str(q(spark, "ex_wordcount"))
    assert "partial_count" in p, "combiner (map-side partial agg) must run before the shuffle"


def test_dedup_exact_shuffles_hashes_not_documents(spark):
    p = plan_str(q(spark, "dedup_exact"), mode="simple")
    m = re.search(r"hashpartitioning\(([^)]*)\)", p)
    assert m is not None
    assert "content_hash" in m.group(1)
    assert "text" not in m.group(1), "the shuffle key is the 32-char hash, not the document"


def test_topk_uses_take_ordered_not_global_sort(spark):
    p = plan_str(q(spark, "topk_customers"))
    assert "TakeOrderedAndProject" in p, "orderBy().limit() must compile to TakeOrderedAndProject"


def test_sort_total_order_is_range_partitioned(spark):
    p = plan_str(q(spark, "sort_total_order"), mode="simple")
    # the bucket expression IS the TotalOrderPartitioner (sampled boundary
    # literals); rows shuffle once on the bucket id for the rank window
    assert "hashpartitioning(_bucket" in p
    assert "Window [row_number()" in p
    # the per-partition rank window must not force everything to one partition:
    # only the <=32-row offset aggregate may be SinglePartition
    big_single = re.findall(r"Exchange SinglePartition", p)
    assert len(big_single) <= 1


def test_orderby_writes_range_partitioned_sorted_output(spark):
    from hadoop_prototype_spark.operators.sort import total_order_sort
    from hadoop_prototype_spark.sources.tables import load_table

    df = total_order_sort(load_table(spark, SF_DIR, "orders"), "o_orderkey")
    p = plan_str(df, mode="simple")
    assert "rangepartitioning(o_orderkey" in p
    assert "Sort [o_orderkey" in p


def test_lsh_ann_never_builds_cross_product(spark):
    p = plan_str(q(spark, "ann_lsh"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p, "candidates must come from the bucket equi-join"


def test_minhash_lsh_single_signature_aggregation(spark):
    """inline(array(...)) band explosion: the expensive signature aggregate
    must appear once, not once per band (4x the work)."""
    p = plan_str(q(spark, "dedup_minhash_lsh"))
    # each HashAggregate pair (partial+final) computing min(mh_0...) appears
    # once per side of the self-join; with ReuseExchange it collapses further
    assert p.count("partial_min") <= 2 * 16, "signature aggregation duplicated per band"


def test_broadcast_small_dim_in_override_join(spark):
    p = plan_str(q(spark, "join_override"))
    assert "CartesianProduct" not in p


def test_whole_stage_codegen_covers_q1(spark):
    p = plan_str(q(spark, "q1_pricing_summary"), mode="codegen")
    assert "WholeStageCodegen" in p, "q1 must run inside whole-stage codegen"


def test_range_join_is_equi_join_not_nested_loop(spark):
    p = plan_str(q(spark, "z_join_range_bands"), mode="simple")
    assert "BroadcastNestedLoopJoin" not in p, "bucketized rewrite must yield an equi-join"
    assert "CartesianProduct" not in p


def test_cobucketed_join_is_shuffle_free(spark):
    """CompositeInputFormat parity: two tables bucketed+sorted on the join
    key join with NO exchange on either side — the write-time layout
    replaces the per-join shuffle."""
    from hadoop_prototype_spark.sources.bucketed import cobucketed_join, write_bucketed
    from hadoop_prototype_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").withColumnRenamed("c_custkey", "o_custkey")
    write_bucketed(orders, "t_orders_b", "o_custkey", num_buckets=4)
    write_bucketed(cust, "t_cust_b", "o_custkey", num_buckets=4)
    joined = cobucketed_join(spark, "t_orders_b", "t_cust_b", "o_custkey")
    p = plan_str(joined, mode="simple")
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, "co-bucketed join must not shuffle either side"
    # and it computes the right thing
    expected = orders.join(cust, "o_custkey").count()
    assert joined.count() == expected


def test_partitioned_write_prunes_scan(spark, tmp_path_factory):
    """MultipleOutputs/partitioned layout: a filter on the partition column
    must prune to matching directories (PartitionFilters), not scan-and-drop
    — at 100 TB this is reading one partition instead of the table."""
    from hadoop_prototype_spark.sources.tables import load_table

    out = str(tmp_path_factory.mktemp("events_parted"))
    events = load_table(spark, SF_DIR, "events")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    one_type = events.select("event_type").first().event_type
    df = spark.read.parquet(out).filter(F.col("event_type") == one_type)
    p = plan_str(df)
    assert "PartitionFilters" in p and "event_type" in p.split("PartitionFilters", 1)[1].split("\n")[0]
    # only the matching partition's files are read
    n_files = df.select(F.input_file_name()).distinct().count()
    import glob
    all_files = len(glob.glob(f"{out}/*/*.parquet"))
    matching = len(glob.glob(f"{out}/event_type={one_type}/*.parquet"))
    assert n_files <= matching < all_files


def test_ntile_spend_has_no_single_partition_window(spark):
    """The quartile derives from global_rank (range-partitioned buckets) —
    never a bare ntile()/row_number() global window, which executes the
    whole dataset in ONE partition (the 100 TB scale-killer)."""
    p = plan_str(q(spark, "quartile_spend"), mode="simple")
    assert "ntile(" not in p
    # global_rank's shape: one hash exchange on the sampled bucket id
    assert "hashpartitioning(_bucket" in p


def test_grep_rank_is_range_partitioned_not_global_window(spark):
    p = plan_str(q(spark, "grep"), mode="simple")
    assert "ntile(" not in p
    assert "hashpartitioning(_bucket" in p


def test_bloom_map_point_lookup_prunes_row_groups(spark, tmp_path_factory):
    """BloomMapFile parity (IO/BloomMapFile.java): key-sorted parquet written
    with a column bloom filter must (a) actually carry a bloom filter per row
    group, (b) exclude every row group for an absent key — the skip-the-seek
    behavior — while never excluding a present key's own group, and (c) push
    the equality predicate into the scan."""
    import glob as _glob

    from hadoop_prototype_spark.sources.bloom import (
        bloom_map_get,
        bloom_prune_stats,
        write_bloom_map,
    )

    out = str(tmp_path_factory.mktemp("bloommap") / "t")
    df = spark.range(100_000).select(
        F.md5(F.col("id").cast("string")).alias("k"), F.col("id").alias("v")
    )
    # hash keys: min/max stats are useless even sorted → pruning must come
    # from the bloom filter, the exact case BloomMapFile exists for
    write_bloom_map(df.coalesce(1), out, "k", row_group_bytes=64 * 1024)

    f = _glob.glob(f"{out}/part-*.parquet")[0]
    present = spark.read.parquet(f).select("k").first().k
    total, with_bloom, excl_missing = bloom_prune_stats(
        spark, f, "k", "certainly-absent-key"
    )
    assert total > 4, "need several row groups for pruning to mean anything"
    assert with_bloom == total, "every row group must carry a bloom filter"
    assert excl_missing == total, "absent key must be excluded everywhere"
    _, _, excl_present = bloom_prune_stats(spark, f, "k", present)
    assert excl_present < total, "a present key must survive its own group"

    lookup = bloom_map_get(spark, out, "k", present)
    assert [r.k for r in lookup.collect()] == [present]
    p = plan_str(lookup)
    assert "PushedFilters" in p and "EqualTo(k" in p, "lookup must push to scan"

    # absent-key lookup: correct-and-empty through the same pruned path
    assert bloom_map_get(spark, out, "k", "certainly-absent-key").count() == 0


def test_value_aggregator_string_minmax_stays_hash_aggregated(spark):
    """String min/max buffers are not hash-aggregable, and a naive
    min(string) in the agg list silently degrades the WHOLE aggregation to
    SortAggregate — a full sort of the fact table at 100 TB. The descriptor
    compiler must keep every full-input aggregate hash-based (string
    min/max go through a distinct-pair pre-aggregation instead); only the
    tiny distinct set may sort-aggregate."""
    df = q(spark, "aggregate_framework")
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "partial_sum" in line or "partial_count" in line:
            assert "SortAggregate" not in line, f"full-input agg sorted: {line[:120]}"
    assert "HashAggregate" in plan


def test_no_new_plan_smells_in_any_registered_query(spark):
    """Sweep EVERY registered query's executed plan for scale smells —
    cartesian products, nested-loop joins, sort-based aggregation, and
    single-partition exchanges feeding windows. Each occurrence must be on
    the allowlist below (all verified tiny-input or by-design and documented
    in SCALE.md); anything new fails here before it fails at 100 TB."""
    ALLOWED = {
        # tiny distinct-pair set only; partial aggs pinned hash-based above
        ("aggregate_framework", "SortAggregate"),
        # min/max over STRING columns cannot use the fixed-width hash-agg
        # buffer, so Spark plans SortAggregate — but the aggregate is
        # GLOBAL (zero grouping keys): nothing is actually sorted, partial
        # aggregation still combines map-side, one row crosses the wire
        ("z_profile_documents", "SortAggregate"),
        # brute-force baseline: deliberate broadcast of the bounded query set
        ("ann_bruteforce", "BroadcastNestedLoopJoin"),
        # global_rank offsets: no-partition window over ~num_partitions rows
        ("grep", "SinglePartitionNearWindow"),
        ("keyfield_sort", "SinglePartitionNearWindow"),
        ("sort_total_order", "SinglePartitionNearWindow"),
        ("quartile_spend", "SinglePartitionNearWindow"),
        ("z_training_order", "SinglePartitionNearWindow"),
        # weighted global running total: bucket-offsets window over ~32 rows
        ("z_pack_sequences", "SinglePartitionNearWindow"),
        # 1-row broadcast of the global count
        ("quartile_spend", "BroadcastNestedLoopJoin"),
        # 1-row estimate × 1-row exact-count crossJoin (both scalar aggs)
        ("z_sketch_hll_distinct", "BroadcastNestedLoopJoin"),
        ("z_sketch_hll_shingles", "BroadcastNestedLoopJoin"),
        # 1-row broadcast of the global doc count into the score projection;
        # the same 1-row exchange makes the SinglePartition+Window substring
        # pair fire even though the ranking window is partitioned by doc_id
        ("z_text_tfidf_top_terms", "BroadcastNestedLoopJoin"),
        ("z_text_tfidf_top_terms", "SinglePartitionNearWindow"),
        # 1-row broadcast of the 128 KB bloom word array (fixed size by
        # construction — the whole point of the operator)
        ("z_join_bloom_pruned", "BroadcastNestedLoopJoin"),
        # inherits ann_bruteforce's deliberate bounded-query-set broadcast,
        # plus the 1-row metric crossJoin; the 1-row count exchanges trip
        # the SinglePartition+Window substring pair (ranking windows are
        # partitioned by qid)
        ("z_ann_lsh_recall", "BroadcastNestedLoopJoin"),
        ("z_ann_lsh_recall", "SinglePartitionNearWindow"),
        # 1-row metric crossJoin (two scalar counts)
        ("z_dedup_lsh_recall", "BroadcastNestedLoopJoin"),
        # precision twin: same 1-row metric crossJoin
        ("z_dedup_lsh_precision", "BroadcastNestedLoopJoin"),
        # 1-row broadcast of the global feasible-T scalar onto ≤20 sources
        ("docs_mixture_plan", "BroadcastNestedLoopJoin"),
        # same scalar-broadcast class: the Σ√tokens total and feasible-T
        # scalars onto the |sources|-row share table (metadata-sized)
        ("z_sample_mixture_temperature", "BroadcastNestedLoopJoin"),
        # same scalar broadcast inside the executed plan's rate derivation
        ("z_sample_mixture_executed", "BroadcastNestedLoopJoin"),
        # 1-row broadcast of the per-round dangling-mass scalar (folded
        # in-plan so each pagerank round is one job, not collect+compute)
        ("z_graph_pagerank", "BroadcastNestedLoopJoin"),
        # 1-row broadcast of the two token-total scalars onto the B-row
        # bucket-weight table (metadata-sized on both sides)
        ("z_sample_dsir_importance", "BroadcastNestedLoopJoin"),
        # the selector composes the scorer, inheriting the same scalar
        # broadcast
        ("z_sample_dsir_selected", "BroadcastNestedLoopJoin"),
        # Q22's 1-row average-balance scalar broadcast onto customer
        ("z_tpch_q22", "BroadcastNestedLoopJoin"),
        # the lag window runs over the YEARS-bounded aggregate (≤ |years|
        # rows by construction) — the single partition is the point
        ("z_sales_yoy_growth", "SinglePartitionNearWindow"),
    }
    SMELLS = ["CartesianProduct", "BroadcastNestedLoopJoin", "SortAggregate"]
    found = set()

    # plan building is py4j-wait-bound (and some builds run probe jobs);
    # sweep the ~190 queries through a thread pool like the parity suite
    def plan_of(item):
        name, q = item
        return (
            name,
            q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString(),
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, p in pool.map(plan_of, sorted(REGISTRY.items())):
            for s in SMELLS:
                if s in p:
                    found.add((name, s))
            if "Window" in p and "SinglePartition" in p:
                found.add((name, "SinglePartitionNearWindow"))
    assert found <= ALLOWED, f"new plan smells: {sorted(found - ALLOWED)}"


def test_ivf_ann_assignment_is_mapside_codegen(spark):
    """IVF's 100 TB contract: centroid assignment is a literal-codebook
    projection — no join, no aggregate, no shuffle touches the corpus until
    the tiny probe broadcast; ranking is the only hash exchange."""
    p = plan_str(q(spark, "z_ann_ivf"), mode="simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortAggregate" not in p
    assert "BroadcastHashJoin" in p, "probe must reach candidates via broadcast equi-join"
    # one hash exchange only: the rank window on qid (plus broadcast exchanges)
    assert p.count("Exchange hashpartitioning") == 1, p


def test_decontamination_broadcasts_eval_side_only(spark):
    """The corpus (train) side must reach the contamination join without a
    hash exchange: the eval shingle set is the broadcast build side. At
    100 TB the eval set stays MB-sized while the corpus never shuffles
    for the join itself (only the per-doc count aggregation shuffles)."""
    p = plan_str(q(spark, "decontaminate_report"), mode="simple")
    assert "BroadcastHashJoin" in p, "eval shingles must broadcast"
    # a (doc_id, shingle)-keyed exchange is the word_shingles distinct()
    # dedup shuffle over RAW shingle strings. Exactly one is allowed — the
    # tiny eval side. A second one would mean the full train shingle stream
    # pays a dedup shuffle (its duplicates are absorbed by the post-join
    # countDistinct instead). The post-join distinct-aggregate exchanges key
    # on the hashed `sh`/gid columns, not the shingle string.
    dedup_exchanges = re.findall(
        r"Exchange hashpartitioning\([^)]*shingle#\d+", p
    )
    assert len(dedup_exchanges) <= 1, dedup_exchanges


def test_dynamic_partition_pruning_fires_on_partitioned_scan(spark, tmp_path_factory):
    """A fact table partitioned on the join key must be pruned at RUNTIME
    by the dim-side filter (dynamic partition pruning): the scan carries a
    dynamicpruning subquery and reads only the matching partitions — at
    100 TB this is the difference between scanning 3 partitions and 3000."""
    base = str(tmp_path_factory.mktemp("dpp") / "fact")
    spark.range(20_000).selectExpr(
        "id", "CAST(id % 20 AS STRING) AS part_key"
    ).write.partitionBy("part_key").mode("overwrite").parquet(base)
    fact = spark.read.parquet(base)
    dim = spark.range(20).selectExpr(
        "CAST(id AS STRING) AS part_key", "id AS dim_payload"
    ).filter("id < 3")
    joined = fact.join(dim, "part_key")
    p = plan_str(joined)
    assert "dynamicpruning" in p.lower(), "DPP subquery must reach the fact scan"
    assert joined.count() == 3000


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew-join handling must engage on a pathologically hot
    key: the executed sort-merge join is marked skew=true and the hot
    partition is split instead of landing on one task — the safety net
    salting complements (operators/partition.salt_keys is the manual
    form)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 500k rows on ONE key + uniform tail. The payload must be (a)
        # consumed by the aggregate — column pruning would otherwise drop
        # it — and (b) incompressible (md5 per row), so the hot partition's
        # SHUFFLE BYTES are genuinely skewed, not compressed away.
        left = spark.range(500_000).selectExpr(
            "CAST(0 AS LONG) AS k", "md5(CAST(id AS STRING)) AS pad"
        ).union(
            spark.range(5_000).selectExpr(
                "id + 1 AS k", "md5(CAST(-id AS STRING)) AS pad"
            )
        )
        right = spark.range(5_001).selectExpr("id AS k", "id * 2 AS payload")
        joined = left.join(right, "k")
        # execute and inspect the SAME query execution: AQE finalizes the
        # plan only for the DataFrame actually run
        agg_df = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("pad")).alias("b")
        )
        row = agg_df.collect()[0]
        assert (row.n, row.b) == (505_000, 505_000 * 32)
        final = agg_df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, "AQE must mark the hot partition skewed"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q6_pushes_every_predicate_to_scan(spark):
    """Q6's value is entirely in the scan: all four predicates must reach
    PushedFilters and the plan must contain no join and no hash exchange
    beyond the 1-row final aggregate."""
    p = plan_str(q(spark, "z_q6_forecast_revenue"))
    pushed = p.split("PushedFilters:", 1)[1].split("\n")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} predicate must push to the parquet scan"
    assert "Join" not in p


def test_tpch_plan_shapes(spark):
    """The z_tpch family's designed physical shapes: Q6 is a pure pushed-
    down scan-aggregate (no join); Q14/Q17's part-side joins broadcast
    (F.broadcast hints, not stats-dependent); Q3/Q10's top-k is
    TakeOrderedAndProject, never a global sort of the aggregate."""
    p6 = plan_str(q(spark, "z_tpch_q6"))
    assert "Join" not in p6
    assert "GreaterThanOrEqual(l_shipdate" in p6, "date range must reach the scan"
    assert "LessThan(l_quantity" in p6

    for name in ("z_tpch_q14", "z_tpch_q17", "z_tpch_q7", "z_tpch_q8"):
        p = plan_str(q(spark, name), mode="simple")
        assert "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, name

    for name in ("z_tpch_q3", "z_tpch_q10", "z_tpch_q18"):
        p = plan_str(q(spark, name), mode="simple")
        assert "TakeOrderedAndProject" in p, name

    # Q18's HAVING must run on the lineitem aggregate BELOW the joins:
    # exactly one Filter over the sum, no second lineitem pass.
    p18 = plan_str(q(spark, "z_tpch_q18"), mode="simple")
    assert p18.count("Scan parquet") <= 3, "each table scans once"

    # Q19: one broadcast part join, the three-band OR stays a residual
    # filter (no union-of-three-scans rewrite, no cartesian product).
    p19 = plan_str(q(spark, "z_tpch_q19"), mode="simple")
    assert "BroadcastHashJoin" in p19
    assert "CartesianProduct" not in p19 and "Union" not in p19


def test_round6_pipeline_operator_plan_shapes(spark):
    """The late round-6 operators' designed physical shapes: BM25 reads
    the corpus ONCE (checkpointed tf feeds both consumers); tokenize and
    prototypes are two-pass by design (aggregate + score-back) and never
    more; prototypes' score-back join is a broadcast."""
    df = q(spark, "z_search_bm25")
    df.write.format("noop").mode("overwrite").save()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") == 0, "post-checkpoint plan re-reads the corpus"

    for name, max_scans in (("z_text_tokenize_ids", 2), ("z_embedding_prototypes", 2)):
        p = plan_str(q(spark, name), mode="simple")
        assert p.count("Scan parquet") <= max_scans, name
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, name

    # quality_tiers (round 8): the checkpointed scored frame feeds both the
    # histogram and the assignment probe — post-materialization, the plan
    # contains no corpus scan at all (one read total, like BM25).
    df = q(spark, "z_text_quality_tiers")
    df.write.format("noop").mode("overwrite").save()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") == 0, "tiers must not re-read the corpus"
    assert "BroadcastHashJoin" in plan_str(q(spark, "z_embedding_prototypes"), mode="simple")
