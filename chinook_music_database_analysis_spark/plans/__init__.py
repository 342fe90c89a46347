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
    # (0) ev_heavy_keys first: its r11 pass-4 oracle mutation (the
    # NULL-key clause) is the one registry entry whose CURRENT oracle
    # text has never been driver-checked (r11 verdict task 1).
    "ev_heavy_keys",
    # (1) mutated earlier in r12: s14's oracle node CTE is now src
    # UNION dst; s10 is code-touched via sources/versioned.py.
    "s14_brand_pagerank",
    "s10_add_column",
    # (2) the r12 FUZZ-GATE fix set (scripts/fuzzgate.py): every entry
    # below had its oracle text and/or operator code changed this
    # round while aligning NULL / tie / edge-value semantics between
    # engines (see PERF.md "r12 adversarial-corpus gate").  Mutated
    # queries lead the window by standing policy.
    # -- oracle-text mutations (events/SCD2/JSON family):
    "ev_scd2_user_state",
    "ev_scd2_snapshot",
    "ev_scd2_incremental",
    "ev_scd2_pit_lookup",
    "ev_state_durations",
    "ev_asof_error_before_click",
    "ev_bloom_prune",
    "ev_unpivot_user_types",
    "ev_json_extract",
    "ev_json_variant",
    # -- oracle and/or plan mutations (curation/text/parity):
    "cur_temperature_mix",
    "cur_stats_approx",
    "cur_winsorize",
    "cur_contamination_report",
    "cur_decontam",
    "cur_boilerplate",
    "cur_leakage_safe_split",
    "tx_length_quantiles",
    "tx_gopher_quality",
    "tx_fingerprint",
    "tx_keyphrases",
    "q16_order_value_frames",
    "s04_affinity_types_scaled",
    "mm_media_features",
    "mm_resize",
    # -- shingle null-guard (operators/text.py) consumers:
    "dd_minhash_pairs",
    "dd_minhash_estimate",
    "dd_ngram_jaccard",
    "dd_containment",
    "dd_containment_scale",
    "dd_canonical",
    "dd_incremental",
    "dd_dup_clusters",
    "dd_dup_ngrams",
    "dd_semantic",
    "dd_cdc_chunks",
    "dd_cdc_incremental",
    "dd_simhash_pairs",
    # -- zero-norm try_divide (operators/similarity.py) consumers:
    "sim_bruteforce_topk",
    "sim_outlier_audit",
    "dd_embedding_cosine",
    "sim_knn_graph",
    "sim_filtered_topk",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "sim_mrl_topk",
    "cur_cluster_sample",
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

# r13 NOTE: all 50 slots are occupied by the r12 mutation set — the
# fuzz-gate fixes displaced BOTH stale cohorts.  Recomputed from
# CORRECTNESS_r{1..11}.json at r12 close (rows+schema+hash all true,
# no err; max round per name — rerun that scan rather than trusting
# this list after r12's file lands): outside this window the stale
# cohorts are EXACTLY
#   r8 (17): cur_corpus_health, cur_curriculum_sample,
#     cur_diverse_sample, cur_domain_cap, cur_epoch_batches,
#     cur_length_buckets, cur_line_dedup, cur_soft_quality_sample,
#     mm_phash, mm_phash_clusters, mm_phash_pairs, pipe_corpus_diff,
#     pipe_rag_index, tx_cms_tokens, tx_hybrid_batch, tx_hybrid_rrf,
#     tx_surprisal
#   r9 (40): the parity cohort q01..q20 + s01..s07, s11, s13, s15 and
#     sim_ivf_topk / sim_ivf_stride_topk / sim_filtered_ivf_topk
#   r10 (24), r11 (38): everything else.
# r13 should lead with anything r13 mutates, then the r8 17, then as
# much of the r9 40 as fits.

__all__ = ["QUERIES", "ORACLES", "register"]
