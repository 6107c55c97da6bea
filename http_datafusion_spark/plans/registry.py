"""Query registry — the operator-inventory correctness corpus.

Every implemented operator from SURVEY.md §2 gets a named QuerySpec:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string
that DuckDB runs on the same parquet tables. The driver compares the
two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- temporal outputs are rendered as strings (Spark timestamps are
  session-TZ, DuckDB's are naive — strings sidestep the gap);
- floating aggregates are rounded so partial-aggregation order
  differences between engines can't flip the hash;
- every LIMIT/top-k query carries a total order (unique tiebreak).

Perf-claim convention (r6 verdict, What's wrong #3): a docstring citing
"measured X -> Y" MUST either quote driver-bench medians (BENCH_r*.json)
or name its measurement context (isolated same-session A/B, sf, idle or
contended box). Isolated runs lack full-suite JVM warmup and have twice
now disagreed with the driver regime — unlabeled numbers mislead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # DuckDB-idiomatic SQL for the bench PROXY only (tools/bench_proxy.py).
    # The correctness gate always runs `oracle` (portable ANSI). Set this
    # when the ANSI formulation is pathological for DuckDB's planner —
    # being fair to the baseline keeps the recorded speedups honest.
    # Must be result-equivalent to `oracle` (asserted in tests).
    bench_oracle: str | None = None


REGISTRY: dict[str, QuerySpec] = {}

# Registration order is the order the driver's correctness gate walks
# (empirically it checks the first ~50 entries), so it is an explicit
# artifact, not an accident of module import order. The head of the
# list is composed to cover every SURVEY §2.2-2.8 operator row plus
# every operator whose implementation changed this round; queries
# already driver-verified in a previous round and unchanged since sit
# in the tail (they stay covered by the local sf0.001+sf0.01 parity
# sweep, tests/test_oracle_parity.py).
# Round-16 rotation (per the r15 verdict's task 2, the named r16 head):
#   "FIRST any row whose code or oracle changes during r15 after this
#   window freezes, then r16 additions (throttled), then the 24-row
#   named r6-class overflow in lexicographic order, then the balance
#   of the r6 class lands back in r16's fill." Composed mechanically by
#   tools/evidence_age.py --plan with that head.
#   Window composition (exactly 50):
#   (a) 14 changed-code rows (every r16 semantic code change, nothing
#       else changed):
#       - dedup_embedding_cosine, dedup_semantic_threshold_calibration,
#         dedup_semantic_clusters, dedup_lexical_semantic_ari: the IVF
#         verification-tier rewrite (r15 verdict task 1) — candidates
#         are scored by the fold-exact numpy tile kernel over
#         (bucket, sub-block, sub-block) applyInPandas tasks instead of
#         pair-hydration joins + the interpreted JVM fold. ORACLES
#         UNTOUCHED; output bit-identical (same candidate set, same
#         left-fold, same rounding); 363.5 -> 25.6 s cold at sf1 for
#         dedup_embedding_cosine (BASELINE r16). The r15-verdict
#         hypothesis (sample-trained scale-adaptive quantizer) was
#         investigated and measured-refuted: all true pairs of this
#         corpus live at cosine 0.40-0.51 (the noise floor), so any
#         sub-cluster K breaks the 0.9 recall gate (K=sqrt(N) seeded
#         0.76, Lloyd-trained 0.88) — see embedding_pairs_ivf's
#         docstring and the BASELINE r16 study table.
#       - ts_autocorrelation (ALSO in the named r6 overflow — one slot
#         covers both roles), events_crosscorrelation,
#         rag_chunk_retrieval_eval, sim_srp_lsh_recall: the 5x
#         scan-class triage (r15 verdict task 3) — bounded shared
#         frames pinned; 5x -> 0-2 fact scans per plan.
#       - events_ks_two_sample: the fact-scale sample frame moved to a
#         lineage-recoverable persist (pin(fact_scale=True), r15
#         ADVICE).
#       - corpus_language_skew_audit, embedding_centroid_shift,
#         orders_theil_sen_trend, quality_drift_psi,
#         table_stats_profile: the five crispest 4x-scan-class fixes
#         (bounded cell/series/1-row tables pinned; 4x -> one fact pass
#         each; table_stats_profile measured zero exchange reuse before
#         fixing, per the kneser-ney lesson) — the rest of the 4x class
#         carries dispositions in BASELINE r16, per the verdict's
#         record-don't-blanket-fix rule.
#       NOT window-triggering (mechanical, value-preserving, verified
#       scan-audit-histogram-identical): the r16 pin() refactor that
#       replaced every raw localCheckpoint site (87 at refactor time;
#       the inventory test derives the live count) (the r15 verdict's
#       own task-5 done-criterion is "no plan change") and the
#       DISK_ONLY storage level on the largest CC/LPA round pins (a
#       storage knob, not a plan/value change; its consumers
#       dedup_semantic_clusters + dedup_lexical_semantic_ari sit in
#       this window as live representatives of the changed loop).
#   (b) r16 ADDITIONS: none — zero additions this round so the r6
#       evidence class drains completely (the r15 verdict's task-2
#       "the r6 class empties" done-criterion).
#   (c) the 23 remaining rows of the named 24-row r6 overflow,
#       lexicographic (incremental_agg_merge .. ts_cusum_changepoints;
#       ts_autocorrelation already satisfied in (a)). After this
#       window the r6 class is EMPTY.
#   (d) 13 rows of r7-class fill, lexicographic
#       (attribution_models_compare .. events_path_3gram;
#       events_crosscorrelation already satisfied in (a)).
#   R17 HEAD (named now, per rotation discipline): FIRST any row whose
#   code or oracle changes during r16 after this window freezes, then
#   r17 additions (throttle can relax — the oldest class is r7 and
#   shrinking), then the 23-row r7-class overflow in lexicographic
#   order:
#   ngram_pmi_bigrams, orders_duplicate_invoice_detect,
#   orders_littles_law_check, orders_market_basket, orders_price_index,
#   orders_seasonality_decompose, part_price_dispersion, parts_abc_xyz,
#   privacy_ldiversity_audit, quality_model_score, revenue_bridge_pvm,
#   sim_ivf_nprobe_sweep, sim_mmr_rerank, stream_quality_gate,
#   supplier_concentration_hhi, text_bigram_logprob, text_burstiness,
#   text_heaps_law_fit, text_heldout_perplexity, text_stopword_induction,
#   text_tfidf_topterm, text_unigram_logprob, weighted_median_price
#   — then r8-class fill.
#   (tools/evidence_age.py --plan reproduces this window verbatim.)
# test_driver_contract.py asserts 40 <= len(PRIORITY) <= 50 — window
# occupancy is load-bearing.
PRIORITY: tuple[str, ...] = (
    # ---- (a) changed-code rows ----
    "dedup_embedding_cosine",
    "dedup_semantic_threshold_calibration",
    "dedup_semantic_clusters",
    "dedup_lexical_semantic_ari",
    "ts_autocorrelation",
    "events_crosscorrelation",
    "rag_chunk_retrieval_eval",
    "sim_srp_lsh_recall",
    "events_ks_two_sample",
    "corpus_language_skew_audit",
    "embedding_centroid_shift",
    "orders_theil_sen_trend",
    "quality_drift_psi",
    "table_stats_profile",
    # ---- (b) r16 additions: none ----
    # ---- (c) the named r6-class overflow (lexicographic) ----
    "incremental_agg_merge",
    "join_size_preflight",
    "multimodal_blob_dedup",
    "multimodal_resize_audit",
    "order_fulfillment_latency",
    "orders_backlog_timeseries",
    "orders_benford_audit",
    "orders_gini_coefficient",
    "orders_pareto_analysis",
    "orders_rfm_segmentation",
    "orders_seasonal_backtest",
    "privacy_pseudonymize_release",
    "quality_model_gradient",
    "snapshot_versioned_read",
    "stratified_fixed_n_sample",
    "stream_debounce",
    "stream_snapshot_append",
    "stream_temporal_join",
    "table_snapshot_diff",
    "text_inverted_index_roundtrip",
    "tokenize_bpe_apply",
    "train_split_temporal",
    "ts_cusum_changepoints",
    # ---- (d) r7-class fill (lexicographic) ----
    "attribution_models_compare",
    "attribution_window_sweep",
    "customer_order_regularity",
    "decontaminate_threshold_sweep",
    "dedup_candidate_budget",
    "dedup_cross_source_matrix",
    "deletion_propagate",
    "discount_elasticity",
    "events_arrival_dispersion",
    "events_concurrency_histogram",
    "events_dau_wau",
    "events_error_budget_burn",
    "events_path_3gram",
)

def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench_oracle: str | None = None,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a Spark query + its DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, doc=doc, tags=tags, bench_oracle=bench_oracle
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry."""
    import http_datafusion_spark.operators.asof  # noqa: F401
    import http_datafusion_spark.operators.components  # noqa: F401
    import http_datafusion_spark.operators.curation  # noqa: F401
    import http_datafusion_spark.operators.dedup  # noqa: F401
    import http_datafusion_spark.operators.multimodal  # noqa: F401
    import http_datafusion_spark.operators.pipeline  # noqa: F401
    import http_datafusion_spark.operators.privacy  # noqa: F401
    import http_datafusion_spark.operators.range_join  # noqa: F401
    import http_datafusion_spark.operators.similarity  # noqa: F401
    import http_datafusion_spark.operators.stats  # noqa: F401
    import http_datafusion_spark.operators.text  # noqa: F401
    import http_datafusion_spark.operators.timeseries  # noqa: F401
    import http_datafusion_spark.plans.aggregates  # noqa: F401
    import http_datafusion_spark.plans.events  # noqa: F401
    import http_datafusion_spark.plans.extra  # noqa: F401
    import http_datafusion_spark.plans.relational  # noqa: F401
    import http_datafusion_spark.plans.reshape  # noqa: F401
    import http_datafusion_spark.plans.scalar_funcs  # noqa: F401
    import http_datafusion_spark.plans.subqueries  # noqa: F401
    import http_datafusion_spark.plans.tpch_more  # noqa: F401
    import http_datafusion_spark.plans.tpch_tail  # noqa: F401
    import http_datafusion_spark.plans.windows  # noqa: F401
    import http_datafusion_spark.sources.ingest_queries  # noqa: F401
    import http_datafusion_spark.streaming.queries  # noqa: F401

    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
