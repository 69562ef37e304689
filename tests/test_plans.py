"""Physical-plan regression tests: lock in the plan properties the
engine is designed around (SCALING.md) so a refactor that silently
de-optimizes a query fails loudly.

- No row-at-a-time Python (`BatchEvalPython`) anywhere in the catalog;
  Python appears only as Arrow-batched nodes in the deliberate escape
  hatches (multimodal mapInPandas).
- Parquet filters reach the scan (`PushedFilters`), and expression
  pipelines run inside WholeStageCodegen.
- Small dimension sides broadcast instead of shuffling.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from voter_gateway_spark.queries import QUERIES


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


# Iterative operators run real jobs while BUILDING the frame
# (checkpointed rounds); exercising them here would re-run whole
# pipelines, so plan-shape checks cover the single-plan queries.
_ITERATIVE = {
    "dedup_cluster_components",
    "dedup_incremental_components",
    "dedup_corpus_pruned",
    "fuzzy_claiming_documents",
    "embed_ivf_topk",
}


@pytest.mark.parametrize(
    "name", [n for n in QUERIES if n not in _ITERATIVE]
)
def test_no_row_python_in_catalog(spark, sf_dir, name):
    plan = _plan(QUERIES[name](spark, sf_dir), "simple")
    assert "BatchEvalPython" not in plan, f"{name} fell off the Arrow path"


def test_q1_pushdown_and_codegen(spark, sf_dir):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    # the shipdate predicate must reach the parquet scan, not sit in a
    # post-scan Filter only
    assert "LessThanOrEqual(l_shipdate" in plan
    # vectorized columnar scan (AQE hides WholeStageCodegen spans until
    # execution, so assert the batched read instead)
    assert "Batched: true" in plan


def test_q1_schema_pruning(spark, sf_dir):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # q1 aggregates 7 measure columns + 2 keys + the filter column; the
    # scan must not read the join/id columns it never touches
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_suppkey" not in read_schema


def test_q3_broadcasts_customer_dim(spark, sf_dir):
    plan = _plan(QUERIES["q3_top_revenue_orders"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan


def test_match_cascade_is_one_plan_with_pruned_scans(spark, sf_dir):
    plan = _plan(QUERIES["match_cascade_orders_customers"](spark, sf_dir))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, "expected parquet scans"
    # rule-side scans of orders must prune to the join columns: none of
    # them needs o_totalprice
    assert all("o_totalprice" not in l or "struct<o_orderkey" not in l
               for l in read_schemas)


def test_embed_near_dup_is_blocked_not_cartesian(spark, sf_dir):
    # default near_dup_pairs must candidate-generate via a band-key
    # EQUI-join; an all-pairs regression shows up as CartesianProduct /
    # BroadcastNestedLoopJoin in the plan
    plan = _plan(QUERIES["embed_near_dup"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan, "near_dup_pairs fell back to all-pairs"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_attribution_join_is_time_bucket_banded(spark, sf_dir):
    # the batch attribution join must key on (user, time bucket) with
    # the range as a residual condition — a user-only equi-join fans
    # out |views_u| x |purchases_u| per user (the 1000x events decade
    # measured that form as did-not-finish vs 9.7s banded)
    plan = _plan(QUERIES["events_view_purchase_attribution"](spark, sf_dir), "simple")
    assert "_b#" in plan, "attribution lost its time-bucket band key"


def test_semantic_dedup_is_cell_blocked_not_cartesian(spark, sf_dir):
    # SemDeDup's pair stage must be a same-cell EQUI-join (pair work
    # O(N²/cells)); an all-pairs regression shows up as
    # CartesianProduct or an extra BroadcastNestedLoopJoin. Exactly ONE
    # BNLJ is expected and deliberate: _nearest_cells' one-row centroid
    # broadcast (|vecs| x 1 rows, not a pair blowup).
    plan = _plan(QUERIES["embed_semantic_dedup"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan, "semantic_dedup fell back to all-pairs"
    # the cells subtree appears twice (self-join aliases), so exactly
    # two one-row centroid broadcasts are expected — but never a third
    # (that would be the pair stage itself going nested-loop)
    assert plan.count("BroadcastNestedLoopJoin") <= 2, (
        "pair stage fell off the same-cell equi-join"
    )
    assert any(
        f"{j} [_cell" in plan
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    ), "no equi-join keyed on _cell in the pair stage"


def test_near_dup_exact_flag_still_available(spark, sf_dir):
    from voter_gateway_spark.operators import similarity
    from voter_gateway_spark.queries import _t

    emb = _t(spark, sf_dir, "embeddings").limit(50)
    exact = similarity.near_dup_pairs(emb, threshold=0.35, exact=True)
    plan = _plan(exact, "simple")
    assert "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def test_merge_upsert_single_wide_shuffle(spark, sf_dir):
    # the merge plan should not shuffle the target more than once per
    # branch: count exchanges as a coarse regression bound
    plan = _plan(QUERIES["merge_upsert_customers"](spark, sf_dir), "simple")
    assert plan.count("Exchange") <= 12, plan.count("Exchange")


def test_asof_is_single_key_shuffle_no_range_join(spark, sf_dir):
    # the union-marker as-of plan must contain NO join of any kind for
    # the range condition — one window over the key shuffle
    plan = _plan(QUERIES["asof_order_revenue_events"](spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_interval_join_catalog_query_is_equi_join(spark, sf_dir):
    plan = _plan(QUERIES["interval_join_events_windows"](spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sample_filter_reaches_scan(spark, sf_dir):
    # hash_mod_sample is a pure filter — nothing between it and the scan
    plan = _plan(QUERIES["sample_customers_deterministic"](spark, sf_dir))
    assert "Exchange" not in plan  # no shuffle at all


def test_q10_broadcasts_dims(spark, sf_dir):
    plan = _plan(QUERIES["q10_returned_items"](spark, sf_dir), "simple")
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation


def test_contamination_is_blocked_equi_join(spark, sf_dir):
    plan = _plan(QUERIES["corpus_contamination"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_attribution_joins_on_user_key_not_nested_loop(spark, sf_dir):
    # the time-range condition must ride the user_id equi-join as a
    # post-join filter, not degrade the join to a nested loop
    plan = _plan(QUERIES["events_view_purchase_attribution"](spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quota_cap_uses_window_group_limit(spark, sf_dir):
    # partial top-k below the exchange: shuffle carries O(groups x cap)
    plan = _plan(QUERIES["sample_source_quota"](spark, sf_dir), "simple")
    assert "WindowGroupLimit" in plan


def test_tfidf_single_document_scan(spark, sf_dir):
    # tf and df both derive from one materialized per-(doc,term)
    # aggregate; without the shared checkpoint Catalyst re-runs the
    # explode per branch (two full text scans at 100 TB)
    plan = _plan(QUERIES["text_tfidf_top_terms"](spark, sf_dir), "simple")
    assert plan.count("Scan parquet") == 1
    assert "WindowGroupLimit" in plan  # partial per-doc top-k


def test_bigram_logprob_shares_scan_and_broadcasts_counts(spark, sf_dir):
    # token + bigram arrays materialize ONCE (shared lazy checkpoint —
    # the plan scans the checkpointed RDD, never re-reads parquet per
    # branch), and the unigram count table is itself checkpointed so
    # the cp/cc/total branches don't re-run the token explode+count.
    # Exactly TWO explodes remain visible: scoring bigrams and train
    # bigram counts (the unigram explode runs once INSIDE the uni
    # checkpoint's boundary — its three consumers scan the RDD). The
    # vocabulary-bounded unigram tables (both orders) must broadcast.
    plan = _plan(QUERIES["text_bigram_logprob"](spark, sf_dir), "simple")
    assert plan.count("Generate explode") == 2, plan
    assert plan.count("BroadcastHashJoin") >= 2  # cp + cc unigram joins
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_training_shuffle_no_global_sort(spark, sf_dir):
    # (shard, pos) comes from two-phase numbering: a range exchange on
    # (shard, hash) + per-(shard, partition) windows. Never a global
    # sort, and never a window partitioned by shard ALONE — that is the
    # single-task-per-shard reducer (1/n_shards of ALL rows through one
    # task at 100 TB).
    import re

    plan = _plan(QUERIES["docs_training_shuffle"](spark, sf_dir), "simple")
    assert "SinglePartition" not in plan
    # the range exchange sits above the materialized checkpoint (the
    # counts collect runs at build time), so the visible plan starts at
    # Scan ExistingRDD; what must hold here is that the numbering window
    # is keyed by (shard, _pid) — never by shard alone (that is the
    # single-task-per-shard reducer: 1/n_shards of ALL rows in one task)
    assert not re.search(r"hashpartitioning\(shard#\d+, \d+\)", plan)
    assert re.search(r"windowspecdefinition\(shard#\d+, _pid#\d+", plan)


def test_span_contamination_is_blocked_equi_join(spark, sf_dir):
    plan = _plan(QUERIES["contamination_span_pairs"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_apply_is_one_join(spark, sf_dir):
    # latest-change fold + apply must be ONE outer join, not a pass
    # per operation type; the per-key top-1 ranks partially
    plan = _plan(QUERIES["cdc_apply_orders"](spark, sf_dir), "simple")
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    assert "WindowGroupLimit" in plan


def test_knn_vote_broadcasts_labels(spark, sf_dir):
    # no forced hint (an O(corpus) frame must not be hint-broadcast at
    # 100 TB) — but at sf0.01 statistics, the planner should still pick
    # a broadcast join on its own
    plan = _plan(QUERIES["embed_knn_label"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan


def test_ivf_cell_assignment_is_shuffle_free(spark, sf_dir):
    # the 100x stress found the old per-pass |vecs|x|cells| window
    # shuffle (r4 fix: in-row array_sort over a one-row broadcast of
    # centroid structs); the ONLY real Window allowed in an ivf_topk
    # plan is the final per-query top-k — Lloyd assignment and probe
    # selection must contribute none
    plan = _plan(QUERIES["embed_ivf_lloyd_topk"](spark, sf_dir), "simple")
    plain_windows = plan.count("Window") - plan.count("WindowGroupLimit")
    assert plain_windows == 1, plan


def test_substring_scrub_is_pair_free(spark, sf_dir):
    # the span scrub's whole design claim is NO pair enumeration:
    # positional index + groupBy(hash) first-occurrence map + per-doc
    # window + scan-stage rewrite — never a doc x doc join shape
    plan = _plan(QUERIES["dedup_substring_scrub"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan, "scrub must stay JVM-side"


def test_frequent_ngrams_lowers_to_take_ordered(spark, sf_dir):
    # top-k must be TakeOrderedAndProject (streams partial top-k per
    # partition), not a global Sort + Limit materialization
    plan = _plan(QUERIES["text_frequent_ngrams"](spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan, "top-k fell back to global sort"


def test_curation_audit_counts_plan_shape(spark, sf_dir):
    # the audit is ONE union-of-aggregates plan; each stage count is a
    # one-row partial aggregate, and nothing in the chain goes
    # cartesian or Python-side
    plan = _plan(QUERIES["pipeline_curation_audit"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Union") >= 1


def test_dsir_importance_broadcasts_bucket_scores(spark, sf_dir):
    # the position stream materializes once (lazy checkpoint) and the
    # bucket-count dictionary is B-bounded, so the score table joins
    # back by BROADCAST; the only corpus-sized exchange is the final
    # per-doc hash aggregate. One explode (the bigram positions); the
    # totals crossJoin is a broadcast of one row, never a cartesian of
    # two distributed sides.
    plan = _plan(QUERIES["text_dsir_importance"](spark, sf_dir), "simple")
    assert plan.count("Generate explode") <= 1, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_token_budget_no_per_source_window(spark, sf_dir):
    # the per-source cumulative sum must come from the two-phase global
    # prefix sum (range exchange + per-(_pid) window), never a window
    # partitioned by source alone (one task per source: a source
    # holding half the corpus funnels through one task) and never a
    # SinglePartition global window; the dims join is broadcast.
    import re

    plan = _plan(QUERIES["sample_token_budget"](spark, sf_dir), "simple")
    assert "SinglePartition" not in plan
    assert not re.search(r"windowspecdefinition\(source#\d+,", plan), plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_encoding_anomaly_is_scan_stage(spark, sf_dir):
    # three regexp_count exprs in one projection: no exchange, no
    # Python, no join — the whole detector runs inside the scan stage.
    plan = _plan(QUERIES["text_encoding_anomaly"](spark, sf_dir), "simple")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_source_overlap_no_document_self_join(spark, sf_dir):
    # the exact-duplicate side must pair-count via per-(fingerprint,
    # source) aggregates (count products), never an all-pairs self-join
    # of documents on the fingerprint: no CartesianProduct and no
    # BroadcastNestedLoopJoin anywhere; the near side runs the ngram
    # generator with prefix_filter forced ON (lossless; prunes ~12% at
    # t=0.12 — the hot-shingle protection at this threshold is mostly
    # the generator's exact-group collapse).
    plan = _plan(QUERIES["corpus_source_overlap"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_quality_by_source_single_corpus_pass(spark, sf_dir):
    # per-doc scoring is scan-stage; the global mean/stddev is a 1-row
    # aggregate joined back broadcast (BroadcastNestedLoopJoin on a
    # single-row side is the cross-join lowering Spark picks — fine);
    # the corpus must NOT be window-scanned or re-shuffled twice: only
    # the per-source hash aggregate exchanges corpus-derived rows.
    plan = _plan(QUERIES["text_quality_by_source"](spark, sf_dir), "simple")
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_bpe_round_is_jvm_native(spark, sf_dir):
    # one merge round = explode + hash aggregate on the vocabulary
    # table plus the greedy fold — all Catalyst exprs, no Python; the
    # word-frequency cap lowers to TakeOrdered (no full sort).
    from voter_gateway_spark.operators import bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    syms = bpe._to_symbols(bpe.word_frequencies(docs, max_words=100))
    plan = syms._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    counts = bpe._pair_counts(bpe._apply_merge(syms, "e", "r"))
    plan2 = counts._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2
    assert "CartesianProduct" not in plan2


def test_trigram_logprob_plan_shape(spark, sf_dir):
    # r9 ask #4: <= 3 visible explodes (scoring trigrams + train
    # trigram counts; the unigram AND bigram count explodes run inside
    # their own lazy-checkpoint boundaries, so their three/two
    # consumers scan the RDD instead of re-exploding), the two unigram
    # probe joins broadcast, and there is no cartesian anywhere. The
    # bigram/trigram count joins are left to AQE (broadcast at test
    # scale, keyed shuffle beyond the ceiling).
    plan = _plan(QUERIES["text_trigram_logprob"](spark, sf_dir), "simple")
    n_explodes = plan.count("Generate explode")
    assert 2 <= n_explodes <= 3, plan
    assert plan.count("BroadcastHashJoin") >= 2  # cp2 + cc unigram joins
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bpe_encode_plan_one_explode_fold_chain(spark, sf_dir):
    # r9 ask #3: encoding is ONE explode + a chain of Catalyst
    # aggregate folds, all scan-stage — no joins (the 8 merge rules are
    # baked in as literals after the bounded 8-row collect), no Python,
    # and NO shuffle before the final per-doc aggregate (exactly one
    # Exchange: the doc_id hash partitioning).
    plan = _plan(QUERIES["text_bpe_encode"](spark, sf_dir), "simple")
    assert plan.count("Generate explode") == 1, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan


def test_gopher_rules_zero_shuffle(spark, sf_dir):
    # r9 ask #5: the whole 7-rule composite is one scan-stage
    # projection — no exchange, no join, no Python, no window.
    plan = _plan(QUERIES["text_gopher_rules"](spark, sf_dir), "simple")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
