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
# Round 8 window (late-session state): (0) ALL sixteen never-checked
# r8 registrations — the ten late-session additions (count-min,
# matryoshka, epoch batches, BPE merges, bloom prune, leakage-safe
# split, CDC chunks + incremental ingest, IVF append audit, embedding
# outlier audit) ahead of the six first-session ones (md5-HLL audits,
# corpus diff, contrastive negatives, histogram quantiles); (1) the
# twenty-two r7 first-timers for their second green; (2) every
# builder MUTATED in r8 — the capped knn graph, the hashed-shuffle
# dup-ngram stats, the loud-refusal containment router, and the IVF
# family touched by the n_probe 3->4 raise; (3) whatever multiply-
# green r3/r5 re-checks still fit in the 50 (the evicted cohort is
# named below and is due back in r9).
# ---------------------------------------------------------------------------
_WINDOW_FIRST = [
    # never driver-checked r8 additions (18)
    "tx_cms_tokens",
    "sim_mrl_topk",
    "cur_epoch_batches",
    "tx_bpe_merges",
    "ev_bloom_prune",
    "cur_leakage_safe_split",
    "dd_cdc_chunks",
    "dd_cdc_incremental",
    "sim_ivf_append",
    "sim_outlier_audit",
    "cur_soft_quality_sample",
    "cur_length_buckets",
    "ev_hll_users",
    "tx_hll_vocab",
    "pipe_corpus_diff",
    "pipe_contrastive_negatives",
    "tx_length_quantiles",
    "ev_hll_overlap",
    # r7 first-timers, second green (22)
    "cur_domain_cap",
    "tx_quality_classifier",
    "ev_scd2_user_state",
    "ev_scd2_pit_lookup",
    "cur_line_dedup",
    "ev_heavy_keys",
    "cur_curriculum_sample",
    "cur_corpus_health",
    "cur_diverse_sample",
    "mm_phash_clusters",
    "sim_filtered_topk",
    "ev_scd2_incremental",
    "ev_scd2_snapshot",
    "ev_state_durations",
    "sim_filtered_ivf_topk",
    "tx_lang_confusion",
    "tx_hybrid_rrf",
    "tx_hybrid_batch",
    "tx_bm25_batch",
    "pipe_rag_index",
    "mm_phash",
    "mm_phash_pairs",
    # r8-mutated builders not already above (7)
    "sim_knn_graph",
    "dd_dup_ngrams",
    "dd_containment",
    "sim_ivf_topk",
    "sim_ivf_stride_topk",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    # displaced multiply-green r3/r5 entries (7) — q01_dupes,
    # sim_lsh_topk, ev_tumbling_1h, tx_gopher_quality, the mm_*
    # plumbing trio, and ev_dedup_first rotate out this round to make
    # room for the late-r8 additions; each is multiply-green and
    # byte-unchanged, due back next rotation.
    "sim_bruteforce_topk",
    "tx_surprisal",
    "dd_simhash_pairs",
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

# r8 NOTE: 50/50 slots.  r9 should lead with anything r9 mutates,
# then the cohort evicted by the late-r8 additions (q01_dupes,
# sim_lsh_topk, ev_tumbling_1h, ev_sliding_1h_30m, ev_sessionized,
# tx_gopher_quality, the mm_media/resize/frame plumbing trio,
# ev_dedup_first), then the r7-mutated store family (tx_bm25_topk,
# dd_containment_scale, dd_minhash_estimate, cur_boilerplate,
# s14_brand_pagerank, pipe_layout_rebuild, dd_dup_clusters), the r6
# first-timers (cur_chunk, dq_documents_expectations,
# ev_cdc_latest_state, ev_watermark_audit, pipe_filter_funnel,
# s15_skew_salted), and the s01-s10 scale suite (last green r7).

__all__ = ["QUERIES", "ORACLES", "register"]
