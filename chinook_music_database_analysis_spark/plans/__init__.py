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
    # (0) MUTATED in r11 (11): route pinning (sim_lsh_topk /
    # sim_range_search now force route='pruned'), the shared
    # candidate/verify scaffolding refactor (dd_ngram_jaccard /
    # dd_containment / dd_containment_scale), and the pca_power_model
    # method-dispatch (all six _pca consumers — the fold path is
    # bit-identical at d=64 by test, but the code path was touched,
    # so the driver re-verifies)
    "sim_lsh_topk",
    "sim_range_search",
    "dd_ngram_jaccard",
    "dd_containment",
    "dd_containment_scale",
    "sim_pca_spectrum",
    "sim_pca_outliers",
    "sim_pca_drift",
    "sim_pca_incremental",
    "sim_dim_corr",
    "sim_label_drift",
    # (1) the six r5-stale leftovers the r10 window could not fit
    "pipe_training_set",
    "sim_sq8_topk",
    "tx_gopher_quality",
    "tx_keyphrases",
    "tx_repetition",
    "tx_tfidf",
    # (2) r6 cohort (9; dd_ngram_jaccard already above)
    "dd_exact",
    "dd_minhash_pairs",
    "dd_simhash",
    "dq_order_expectations",
    "ev_pivot_user_types",
    "pipe_clean_corpus",
    "tx_fingerprint",
    "tx_langid",
    "tx_stats",
    # (3) r7 cohort (10; dd_containment_scale already above)
    "cur_boilerplate",
    "cur_chunk",
    "dd_dup_clusters",
    "dd_minhash_estimate",
    "dq_documents_expectations",
    "ev_cdc_latest_state",
    "ev_watermark_audit",
    "pipe_filter_funnel",
    "pipe_layout_rebuild",
    "tx_bm25_topk",
    # (0b) mutated by the r11 review-fix batch (4): staged PII
    # counting (cur_pii_redact, both engines), qrel bag dedupe
    # (tx_bm25_batch, both engines), and the _stopword_hits
    # column-parameter fix (tx_quality_classifier /
    # tx_lang_confusion; their window-resident siblings tx_stats /
    # tx_langid / cur_soft_quality_sample cover the same helper)
    "cur_pii_redact",
    "tx_bm25_batch",
    "tx_quality_classifier",
    "tx_lang_confusion",
    # (4) oldest r8 greens, 10 of 44 (the other 34 lead r12)
    # plan-changed in r11 parity review (s12 exceptAll->subtract,
    # q13b not_in_anti helper-column rename) — outputs hash-identical
    # in the local sf0.001 parity run, re-verified by the driver here
    "s12_retention_setops",
    "q13b_not_in_null_aware",
    # semantics-changed (ASOF tie dedup, both engines) + plan-changed
    # (window top-1 -> max_by combine) in the r11 extensions review
    "ev_scd2_pit_lookup",
    "sim_ivf_append",
    # mutated in the r11 scale/curation review: plan-changed
    # (tx_bpe_merges reuses the cached dictionary,
    # cur_temperature_mix's n_in is now the memoized scalar) and
    # oracle-text-changed (the three HLL oracles grew the NULL-key
    # filter mirroring the r10 Spark-side fix) — ev_heavy_keys' oracle
    # NULL clause is the same class but slotless; it leads r12 with
    # the displaced cur_* r8 cohort
    "tx_bpe_merges",
    "cur_temperature_mix",
    "ev_hll_users",
    "tx_hll_vocab",
    "ev_hll_overlap",
    # plan-changed in r11 (mates anti-join unhinted — output
    # set-identical, strategy now AQE-chosen)
    "pipe_contrastive_negatives",
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

# r11 NOTE: 50/50 slots.  After r11 lands, the stalest cohort is the
# 34 r8 greens this window could not fit (dd_cdc_chunks,
# dd_cdc_incremental, dd_dup_ngrams, ev_bloom_prune, ev_heavy_keys,
# ev_hll_overlap, ev_hll_users, ev_scd2_*, ev_state_durations,
# mm_phash*, pipe_contrastive_negatives, pipe_corpus_diff,
# pipe_rag_index, sim_bruteforce_topk, sim_filtered_topk,
# sim_ivf_append, sim_knn_graph, sim_outlier_audit, sim_pq_topk,
# tx_cms_tokens, tx_hll_vocab, tx_hybrid_*, tx_length_quantiles,
# tx_surprisal...).
# r12 should lead with anything r12 mutates, then those 30, and fill
# with the r9 parity cohort (q01..s15 — the driver re-ran all of it
# in r9, so it ages next).  Recompute exact last-green rounds by
# scanning CORRECTNESS_r*.json (script in the r11 transcript /
# memory) rather than trusting this comment.

__all__ = ["QUERIES", "ORACLES", "register"]
