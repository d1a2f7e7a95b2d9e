"""Run tools/plan_lint.py's checks live over the families that have
historically shipped scale regressions (text tokenization, dedup
explodes, ANN joins, SQL aggregate hosting) — the decontaminate lesson
as a standing gate.  The full-catalog run records PLANLINT_r{N}.json."""

import pytest

FAMILIES = [
    "decontaminate",
    "ngram_jaccard_pairs",
    "dup_span_flags",
    "simhash",
    "simhash_hamming_pairs",
    "minhash_signature",
    "lsh_candidate_pairs",
    "lang_id",
    "quality_score",
    "repetition_ratio",
    "chunk_documents",
    "token_count_bpe",
    "pipeline_e2e",
    "dedup_keep_best",
    "lsh_topk",
    "ivf_trained_topk",
    "ivf_multiprobe_topk",
    "count_min_freq",
    "sql_agg_bare_two_phase",
    "sql_agg_having_two_phase",
    "tfidf_topterms",
    "bm25_topk",
]


@pytest.mark.parametrize("name", FAMILIES)
def test_plan_lint_clean(spark, sf_dir, name):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.plan_lint import WHITELIST, lint_plan

    from arrow_udf_spark.queries import QUERIES

    plan = (
        QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    flags = [f for f in lint_plan(plan) if (name, f) not in WHITELIST]
    assert not flags, f"{name}: {flags}"
