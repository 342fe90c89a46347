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
# Round 4 window: the four late-r3 registrations that only ever had the
# local oracle gate (union coverage -> 103/103), the ANN compression
# ladder that is rewired to the persisted PQ index this round, the two
# cold-path queries whose shared-relation reuse changed, any new r4
# registrations, then second-confirmation fills for entries green exactly
# once (in r3).  Evicted: entries driver-green in two-plus rounds with
# byte-identical builders (q01-q12 parity anchors, mm_*, ev_* streaming
# analogs verified r1+r3, sim_bruteforce/lsh).
# ---------------------------------------------------------------------------
_WINDOW_FIRST = [
    # never driver-checked: late-r3 registrations (4)
    "dd_dup_ngrams",
    "dd_semantic",
    "tx_surprisal",
    "dd_fuzzy_dictionary",
    # mutated in r4 (persisted-PQ-index wiring / shared-relation reuse) —
    # keep the whole sim_* ladder + shared _ivf_cents consumers in-window (7)
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "sim_ivf_topk",
    "sim_ivf_stride_topk",
    "sim_sq8_topk",
    "cur_boilerplate",
    "dd_canonical",
    "s04_affinity_types_scaled",
    # new in round 4 — never driver-checked
    "pipe_layout_rebuild",
    "dd_cross_simhash",
    "tx_keyphrases",
    "cur_contamination_report",
    "ev_session_funnel_windows",
    "tx_gopher_quality",
    "cur_cluster_sample",
    # green exactly once (r3) — second confirmation (rest of the 50)
    "cur_sample",
    "cur_split",
    "cur_pii_redact",
    "cur_decontam",
    "cur_winsorize",
    "cur_mix",
    "cur_pack",
    "cur_stats_rollup",
    "cur_stats_approx",
    "cur_temperature_mix",
    "cur_stratified_eval",
    "ev_json_extract",
    "ev_asof_error_before_click",
    "ev_range_clicks_after_error",
    "ev_enriched_segments",
    "ev_user_funnel",
    "ev_retention_cohorts",
    "ev_gapfill_hourly",
    "ev_unpivot_user_types",
    "ev_hll_week_rollup",
    "ev_anomaly_hours",
    "ev_json_variant",
    "tx_tfidf",
    "tx_repetition",
    "dd_incremental",
    "dd_minhash_estimate",
    "dd_embedding_cosine",
    "pipe_training_set",
    "s13_zorder_locality",
    "sim_range_search",
    "s14_brand_pagerank",
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

# r4 NOTE: the rotation list is at 50/50 slots.  Evicted to make room
# for the late-r4 registrations (tx_gopher_quality, cur_cluster_sample):
# q13b_not_in_null_aware, q20_stats_profile (green r3, builders
# byte-unchanged — their second confirmation moves to r5's window).
# Registered after the r4 cutoff with the local oracle gate only
# (rotate into r5's window): pipe_filter_funnel, ev_cdc_latest_state,
# sim_knn_graph, dq_documents_expectations, ev_watermark_audit,
# dd_containment.

__all__ = ["QUERIES", "ORACLES", "register"]
