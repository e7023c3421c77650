

def test_cluster_balanced_sample_exact_counts_and_determinism(spark, sf_dir):
    """Every cluster contributes exactly min(k, |cluster|) vectors; the
    subset is identical across reruns and repartitionings; precomputed
    centroids give the same subset as the in-call fit."""
    from hadoop_prototype_spark.operators.kmeans import assign_clusters, kmeans_fit
    from hadoop_prototype_spark.operators.similarity import cluster_balanced_sample
    from hadoop_prototype_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = cluster_balanced_sample(emb, k_clusters=4, per_cluster=5)
    rows = [(r.vec_id, r.cluster, r.sample_rank) for r in out.collect()]

    centroids, _ = kmeans_fit(emb, k=4)
    sizes = {
        r.cluster: r.n
        for r in assign_clusters(emb, centroids, 64)
        .groupBy("cluster")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got_sizes = {}
    for _v, c, _r in rows:
        got_sizes[c] = got_sizes.get(c, 0) + 1
    assert got_sizes == {c: min(5, n) for c, n in sizes.items() if n > 0}

    again = cluster_balanced_sample(emb.repartition(7), k_clusters=4, per_cluster=5)
    assert sorted((r.vec_id, r.cluster) for r in again.collect()) == sorted(
        (v, c) for v, c, _ in rows
    )
    pre = cluster_balanced_sample(emb, centroids=centroids, per_cluster=5)
    assert sorted((r.vec_id, r.cluster) for r in pre.collect()) == sorted(
        (v, c) for v, c, _ in rows
    )
