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
# in iteration order.  Rounds 1-2 verified the 50 parity/extension entries
# that happened to register first; the 33 below (curation, temporal,
# similarity, multimodal, streaming-batch, tfidf, incremental-dedup
# families) had no driver row yet.  Rotate them to the front so round 3
# verifies them, followed by the core reference-parity anchors (q01-q11)
# for continuity; the remainder — driver-green in rounds 1 AND 2 and
# unchanged since — absorb the eviction.  Every entry keeps its oracle;
# only dict iteration order changes.
# ---------------------------------------------------------------------------
_WINDOW_FIRST = [
    # never driver-checked (22)
    "cur_sample",
    "cur_split",
    "cur_pii_redact",
    "cur_boilerplate",
    "cur_decontam",
    "cur_winsorize",
    "cur_mix",
    "cur_pack",
    "cur_stats_rollup",
    "cur_stats_approx",
    "ev_json_extract",
    "ev_asof_error_before_click",
    "ev_range_clicks_after_error",
    "ev_enriched_segments",
    "ev_user_funnel",
    "ev_retention_cohorts",
    "sim_sq8_topk",
    "tx_tfidf",
    "dd_canonical",
    "dd_incremental",
    "dd_minhash_estimate",
    "pipe_training_set",
    # driver-checked in r1 but evicted from the r2 window (11)
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "sim_lsh_topk",
    "dd_embedding_cosine",
    "mm_media_features",
    "mm_resize",
    "mm_frame_sample",
    "ev_tumbling_1h",
    "ev_sliding_1h_30m",
    "ev_sessionized",
    "ev_dedup_first",
    # new in round 3 — never driver-checked (7)
    "sim_ivf_stride_topk",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "q13b_not_in_null_aware",
    "q20_stats_profile",
    "ev_gapfill_hourly",
    "ev_unpivot_user_types",
    # new in round 3, later batches — never driver-checked (9)
    "ev_hll_week_rollup",
    "ev_anomaly_hours",
    "cur_temperature_mix",
    "cur_stratified_eval",
    "s13_zorder_locality",
    "sim_range_search",
    "ev_json_variant",
    "tx_repetition",
    "s14_brand_pagerank",
]


def _rotate_window(first: list[str]) -> None:
    missing = [n for n in first if n not in QUERIES]
    assert not missing, f"rotation names drifted from registry: {missing}"
    ordered = {n: QUERIES[n] for n in first}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate_window(_WINDOW_FIRST)

# r4 NOTE: the rotation list is at 49/50 slots.  Queries registered
# after this rotation (late-r3: dd_dup_ngrams, dd_semantic,
# tx_surprisal) have the local oracle gate only; next round, swap them
# into _WINDOW_FIRST in place of entries that will then be driver-green
# two-plus rounds running.

__all__ = ["QUERIES", "ORACLES", "register"]
