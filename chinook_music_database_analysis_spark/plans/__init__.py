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
# Round 9 window: (0) the never-checked r9 registration
# (tx_bpe_encode) and the two r9-rewritten weak-fix builders
# (dd_embedding_cosine — occupancy-capped window, oracle mirrored;
# sim_range_search — stats-first dense router); (1) the four IVF
# consumers mutated by the n_probe 4->5 raise; (2) the ENTIRE SURVEY
# §2.12 parity cohort (q01..q20 + s01..s15 — 43 queries), due back
# per the r8 eviction note: they are byte-frozen and union-green but
# their most recent driver row was r7 or earlier, and §2 rows should
# never be two rounds stale.  That fills the 50 exactly; the r8 NOTE's
# other due-backs (sim_lsh_topk, the tumbling/sliding/session trio,
# the mm plumbing trio, the r7 store family, the r6 first-timers)
# are multiply-green and rotate back in r10.
# ---------------------------------------------------------------------------
_WINDOW_FIRST = [
    # never driver-checked r9 addition + r9-rewritten weak fixes (3)
    "tx_bpe_encode",
    "dd_embedding_cosine",
    "sim_range_search",
    # mutated by the r9 IVF_N_PROBE 4 -> 5 raise (4)
    "sim_ivf_topk",
    "sim_ivf_stride_topk",
    "sim_ivfpq_topk",
    "sim_filtered_ivf_topk",
    # SURVEY §2.12 parity cohort, due back from the r8 eviction (43)
    "q01_dupes",
    "q01_nulls",
    "q02_top_parts_nation0",
    "q03_demographics",
    "q03b_segment_geo",
    "q04_rev_by_geo",
    "q04b_topk_nations",
    "q04c_rollup_geo",
    "q04d_cube_geo",
    "q04e_grouping_sets",
    "q05_top5_cust_per_nation",
    "q06_top_part_per_cust",
    "q07_purchase_trends",
    "q08_churn_rate",
    "q09_type_pct_nation0",
    "q09b_top_brands_top_types",
    "q10_multi_type_cust",
    "q10b_approx_distinct",
    "q11_type_rank_nation0",
    "q12_inactive_3mo",
    "q13_no_big_order",
    "q13b_not_in_null_aware",
    "q14_rolling_90d_spend",
    "q15_spend_distribution",
    "q16_order_value_frames",
    "q17_top_spender_maxby",
    "q18_price_profile_arrays",
    "q20_stats_profile",
    "s01_brand_promo",
    "s02_intl_types",
    "s03_old_vs_new",
    "s04_affinity_brands",
    "s04_affinity_types",
    "s04_affinity_types_scaled",
    "s05_regional_churn",
    "s06_risk_profile",
    "s07_clv_segments",
    "s10_add_column",
    "s11_geo_behavior",
    "s12_retention_setops",
    "s13_zorder_locality",
    "s14_brand_pagerank",
    "s15_skew_salted",
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

# r9 NOTE: 50/50 slots.  r10 should lead with anything r10 mutates
# plus the never-driver-checked r9 registrations that did not fit
# (tx_bpe_source_tokens — pytest- and sweep-green, sharing its CTE
# machinery with the window's tx_bpe_encode; sim_pca_spectrum,
# sim_pca_outliers, sim_dim_corr, sim_pca_drift, sim_pca_incremental,
# cur_bpe_length_buckets and sim_label_drift — pytest-parity-green at
# sf0.001 AND gate-checked at sf0.01 by hand this round; sim_mrl_topk
# — mutated r9 by the
# sqrt-scaled shortlist, byte-stable at driver scales but owed a
# driver row), then the multiply-green
# due-backs the parity cohort displaced:
# sim_lsh_topk, ev_tumbling_1h, ev_sliding_1h_30m, ev_sessionized,
# tx_gopher_quality, the mm_media/resize/frame plumbing trio,
# ev_dedup_first, the r7-mutated store family (tx_bm25_topk,
# dd_containment_scale, dd_minhash_estimate, cur_boilerplate,
# pipe_layout_rebuild, dd_dup_clusters), the r6 first-timers
# (cur_chunk, dq_documents_expectations, ev_cdc_latest_state,
# ev_watermark_audit, pipe_filter_funnel), and then the oldest
# remaining r2-r5 greens (tx_tfidf, cur_pack/mix family, ev_json_*,
# dd_cross_simhash, sim_sq8_topk, ...).

__all__ = ["QUERIES", "ORACLES", "register"]
