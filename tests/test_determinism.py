"""Run-to-run determinism: the registry contract (plans/registry.py)
promises bit-identical results across executions, partitionings, and AQE
decisions — the property the driver's value-hash gate and any production
rerun depend on. Oracle parity checks one execution against DuckDB; this
suite executes the HIGH-RISK queries twice in the same session and
demands exactly identical multisets of rows.

High-risk = plans with an order-sensitivity hazard someone has to have
explicitly defused: collect_list/array assembly, windows over sampled or
salted partitionings, hash-bucket sampling, float folds, iterative
driver feedback (codebooks, histogram cutoffs, boundary samples).
"""

from __future__ import annotations

import math

import pytest

import hadoop_prototype_spark.plans  # noqa: F401  (populates REGISTRY)
from hadoop_prototype_spark.plans.registry import REGISTRY

RISKY = [
    "z_text_tokenize_ids",      # collect_list reassembly
    "z_inverted_index",         # salted two-phase top-k + collect_list
    "z_search_bm25",            # fixed-point sums + checkpointed tf
    "z_embedding_prototypes",   # fixed-point prototype + rank window
    "z_pack_sequences",         # sampled-boundary running totals
    "z_sample_stratified",      # hash-bucket sampling
    "z_split_train_eval",       # hash split
    "sort_total_order",         # sampled range boundaries → global rank
    "text_quality_filter",      # histogram cutoff collected driver-side
    "dedup_minhash_lsh",        # signature aggregation
    "z_text_tfidf_top_terms",   # float-ratio ranking
    "z_ann_ivf",                # driver codebook + pruned search
    "docs_mixture_plan",        # token-count agg + broadcast targets
    "z_sample_mixture_temperature",  # fixed-point share denominator
    "z_events_winsorize",       # driver-literal quantile cutoffs
    "z_text_quality_tiers",     # histogram cum windows + broadcast bins
]


def _key(row):
    out = []
    for v in row:
        if isinstance(v, float) and math.isnan(v):
            out.append(("nan",))
        elif isinstance(v, list):
            out.append(tuple(v))
        else:
            out.append(v)
    return tuple(out)


@pytest.mark.parametrize("name", RISKY)
def test_query_is_run_to_run_deterministic(spark, sf_dir, name):
    q = REGISTRY[name]
    a = sorted(map(_key, q.spark_fn(spark, sf_dir).collect()))
    b = sorted(map(_key, q.spark_fn(spark, sf_dir).collect()))
    assert a == b, f"{name}: two executions differ"


def test_risky_list_names_exist():
    assert not [n for n in RISKY if n not in REGISTRY]
