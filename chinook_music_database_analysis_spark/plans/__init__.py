"""Query registry.

Importing this package populates ``QUERIES`` (name -> callable
``(spark, sf_dir) -> DataFrame``) and ``ORACLES`` (name -> ANSI SQL for
the DuckDB correctness oracle).  ``__spark_entry__.py`` re-exports both.
"""

from .registry import ORACLES, QUERIES, register

from . import parity  # noqa: E402,F401  (registration side effects)
from . import extensions  # noqa: E402,F401
from . import curation_queries  # noqa: E402,F401
from . import scale_queries  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window rotation.
#
# The correctness driver oracle-checks the FIRST 50 entries of ``QUERIES``
# in iteration order.  Each round we rotate the window so that (a) every
# registry entry eventually gets a driver CORRECTNESS row, and (b) any
# query whose implementation was MUTATED this round is re-verified even if
# it was green before.  Every entry keeps its oracle; only dict iteration
# order changes.
#
# Round 10 window (50/50): (0) the EIGHT never-driver-checked r9
# registrations (the PCA family, the BPE closers) — the only gap
# between the local and driver pictures per the r9 verdict; (1) the
# five queries MUTATED in r10 (BPE empty-token guard: tx_bpe_merges /
# tx_bpe_encode; mrl_topk memoized corpus count: sim_mrl_topk; router
# route-recorder: sim_range_search / sim_lsh_topk — plans unchanged
# but the code path was touched, so re-verify); (2) the r3-stale
# cohort (streaming + multimodal — last driver green seven rounds
# ago); (3) 30 of the 36 r5-stale queries.  The 6 r5 leftovers
# (pipe_training_set, sim_sq8_topk, tx_gopher_quality, tx_keyphrases,
# tx_repetition, tx_tfidf) plus the r6 cohort lead the r11 window.
# ---------------------------------------------------------------------------
_WINDOW_FIRST = [
    # (0) never driver-checked r9 additions (8)
    "sim_pca_spectrum",
    "sim_pca_outliers",
    "sim_dim_corr",
    "sim_pca_drift",
    "sim_pca_incremental",
    "sim_label_drift",
    "tx_bpe_source_tokens",
    "cur_bpe_length_buckets",
    # (1) mutated in r10 (5)
    "tx_bpe_merges",
    "tx_bpe_encode",
    "sim_mrl_topk",
    "sim_range_search",
    "sim_lsh_topk",
    # (2) r3-stale streaming + multimodal cohort (7)
    "ev_dedup_first",
    "ev_sessionized",
    "ev_sliding_1h_30m",
    "ev_tumbling_1h",
    "mm_frame_sample",
    "mm_media_features",
    "mm_resize",
    # (3) r5-stale cohort, 30 of 36 (rest lead r11)
    "cur_cluster_sample",
    "cur_contamination_report",
    "cur_decontam",
    "cur_mix",
    "cur_pack",
    "cur_pii_redact",
    "cur_sample",
    "cur_split",
    "cur_stats_approx",
    "cur_stats_rollup",
    "cur_stratified_eval",
    "cur_temperature_mix",
    "cur_winsorize",
    "dd_canonical",
    "dd_cross_simhash",
    "dd_fuzzy_dictionary",
    "dd_incremental",
    "dd_semantic",
    "ev_anomaly_hours",
    "ev_asof_error_before_click",
    "ev_enriched_segments",
    "ev_gapfill_hourly",
    "ev_hll_week_rollup",
    "ev_json_extract",
    "ev_json_variant",
    "ev_range_clicks_after_error",
    "ev_retention_cohorts",
    "ev_session_funnel_windows",
    "ev_unpivot_user_types",
    "ev_user_funnel",
]


def _rotate_window(first: list[str]) -> None:
    # Unknown names are skipped at runtime; tests/test_plans.py asserts
    # the list matches the registry exactly so drift can't ship.
    first = [n for n in first if n in QUERIES]
    ordered = {n: QUERIES[n] for n in first}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate_window(_WINDOW_FIRST)

# r10 NOTE: 50/50 slots.  r11 should lead with anything r11 mutates,
# then the 6 r5-stale leftovers this window could not fit
# (pipe_training_set, sim_sq8_topk, tx_gopher_quality, tx_keyphrases,
# tx_repetition, tx_tfidf), then the r6 cohort (dd_exact,
# dd_minhash_pairs, dd_ngram_jaccard, dd_simhash, dq_order_expectations,
# ev_pivot_user_types, pipe_clean_corpus, tx_fingerprint, tx_langid,
# tx_stats), then the r7 store family (cur_boilerplate, cur_chunk,
# dd_containment_scale, dd_dup_clusters, dd_minhash_estimate,
# dq_documents_expectations, ...), and fill with the oldest r8 greens.
# After r10 lands, every registry entry should be driver-green at
# least once and nothing older than r5.

__all__ = ["QUERIES", "ORACLES", "register"]
