"""End-to-end corpus preparation: every training-data operator chained
through the JobControl DAG, the way a real pretraining-data run composes
them: quality filter → near-dup clustering → canonical election →
stratified sample → train/valid/test split → eval-overlap decontamination
→ sequence packing.

Pins that the operators COMPOSE (schemas line up, determinism survives
chaining) and that the DAG runner materializes stage handoffs."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_prototype_spark.operators import decontam, dedup, packing, sampling, textstats
from hadoop_prototype_spark.plans.jobcontrol import ControlledJob, JobControl, State
from hadoop_prototype_spark.sources.tables import load_table


def test_corpus_prep_dag(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    def j_quality(spark, deps):
        q = textstats.quality_scores(docs).select("doc_id", "quality")
        return docs.join(q, "doc_id").filter(F.col("quality") > 0.3)

    def j_clusters(spark, deps):
        return dedup.connected_components(dedup.minhash_lsh_pairs(docs))

    def j_canonical(spark, deps):
        kept, cc = deps["quality"], deps["clusters"]
        keepers = dedup.canonical_docs(docs, cc).select(
            F.col("keeper_id").alias("doc_id")
        )
        clustered = cc.select(F.col("node").alias("doc_id"))
        # drop clustered non-keepers; singletons pass through
        return kept.join(clustered, "doc_id", "left_anti").unionByName(
            kept.join(keepers, "doc_id", "left_semi")
        )

    def j_sample(spark, deps):
        return sampling.hash_rate_sample(deps["canonical"])

    def j_split(spark, deps):
        return sampling.train_eval_split(deps["sample"])

    def j_decontam(spark, deps):
        # train split minus eval 8-gram overlap (decontam recomputes the
        # same md5-bucket split over the sampled doc set; k=8 targets long
        # verbatim overlaps, the published-recipe regime)
        return decontam.decontaminate(deps["sample"], k=8)

    def j_pack(spark, deps):
        return packing.pack_sequences(deps["decontam"], capacity=256)

    jc = JobControl(
        [
            ControlledJob("quality", j_quality),
            ControlledJob("clusters", j_clusters),
            ControlledJob("canonical", j_canonical, depends_on=["quality", "clusters"]),
            ControlledJob("sample", j_sample, depends_on=["canonical"]),
            ControlledJob("split", j_split, depends_on=["sample"]),
            ControlledJob("decontam", j_decontam, depends_on=["sample"]),
            ControlledJob("pack", j_pack, depends_on=["decontam"]),
        ]
    )
    states = jc.run(spark)
    assert all(s == State.SUCCESS for s in states.values()), states

    rows = jc.results["pack"].orderBy("doc_id").collect()
    assert rows, "pipeline must keep a non-empty training set"
    # packing invariant holds on the pipeline output, not just raw docs
    expected = 0
    for r in rows:
        assert r.start_offset == expected
        expected += r.n_tokens
    # deterministic end to end: a second full DAG run yields identical packs
    jc2 = JobControl(
        [
            ControlledJob("quality", j_quality),
            ControlledJob("clusters", j_clusters),
            ControlledJob("canonical", j_canonical, depends_on=["quality", "clusters"]),
            ControlledJob("sample", j_sample, depends_on=["canonical"]),
            ControlledJob("split", j_split, depends_on=["sample"]),
            ControlledJob("decontam", j_decontam, depends_on=["sample"]),
            ControlledJob("pack", j_pack, depends_on=["decontam"]),
        ]
    )
    jc2.run(spark)
    assert [tuple(r) for r in jc2.results["pack"].orderBy("doc_id").collect()] == [
        tuple(r) for r in rows
    ]
