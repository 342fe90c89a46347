"""Empirical scaling probe: run the corpus-sensitive query families at
sf0.1 and at a generated 10x corpus, and report measured time ratios.

The 100 TB claims in PERF.md are plan-shape arguments; this script is
the measurement backing them.  It synthesizes a seeded corpus with the
same vocabulary/length/cluster structure as the driver's documents +
embeddings tables (plus ~5% injected near-duplicates so the dedup path
does real work), then cold-times each query at both scales in the SAME
session (fresh memo caches per sf_dir — `_cached` keys include sf_dir).

Expected exponents (time ~ N^e): ~1 for the hash/shuffle families
(minhash, simhash, boilerplate, stats), ~1.5 for IVF (N*sqrt(N)
assign), with LSH pair candidates ~linear by the log2(N) plane scaling.
A measured e >= 2 anywhere is a regression against the scale design.

Usage:  python scripts/scalecheck.py [--factor 10]
Writes the generated corpus under .scratch/ (gitignored) and prints a
table; exits nonzero if any family's exponent exceeds the bound below.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"

#: families timed, with the exponent bound each must stay under
#: (measured-time ratio <= factor**bound * slack).
QUERIES = {
    "tx_stats": 1.3,
    "dd_exact": 1.3,
    "dd_minhash_pairs": 1.3,
    "dd_ngram_jaccard": 1.5,
    "dd_simhash_pairs": 1.3,
    "dd_dup_clusters": 1.5,
    # r9: occupancy-capped per-bucket window (the knn_graph pattern,
    # oracle-mirrored) — candidates <= N x PAIR_WINDOW x tables
    # whatever the occupancy distribution, so the 10x hot corpus no
    # longer pays the 22.9x bucket self-join; linear + the
    # sort-within-bucket log factor
    "dd_embedding_cosine": 1.3,
    # r9: guarded by the range_search stats router — on the clustered
    # 10x corpus the probe answers with the exact broadcast scan
    # (linear); benign corpora keep the pruned bucket probe
    "sim_lsh_topk": 1.3,
    "sim_ivf_topk": 1.7,
    "sim_ivf_stride_topk": 1.7,
    "sim_pq_topk": 1.5,
    "sim_ivfpq_topk": 1.7,
    "sim_bruteforce_topk": 1.3,
    "cur_boilerplate": 1.3,
    "cur_decontam": 1.3,
    "pipe_clean_corpus": 1.3,
    # later-r2 families
    "tx_tfidf": 1.3,
    "cur_pack": 1.3,
    "cur_mix": 1.3,
    "dd_incremental": 1.3,
    "sim_sq8_topk": 1.3,
    "pipe_training_set": 1.3,
    # r3 batch 2 — both are narrow-filter + one tiny/stratum shuffle
    "cur_temperature_mix": 1.3,
    "cur_stratified_eval": 1.3,
    # r9: stats-first router — pruned LSH probe on benign corpora,
    # broadcast dense scan (exact, |q| x N, zero shuffles) once the
    # query buckets run hot; either path is linear for a fixed query
    # set, and the clustered 10x corpus takes the dense one
    "sim_range_search": 1.3,
    # token/bigram explode + doc-keyed aggregates — linear
    "tx_repetition": 1.3,
    # r3 batch 5
    # shingle df hash-agg + doc hash-agg over the cached shingle
    # relation — linear, no pair joins
    "dd_dup_ngrams": 1.3,
    # tfidf plan shape (explode -> tf -> vocab -> join -> doc agg)
    "tx_surprisal": 1.3,
    # assignment N*sqrt(N) + within-cell pairs ~N^1.5 total
    "dd_semantic": 1.7,
    # r4: blocked fuzzy join — quadratic WITHIN a block, so the
    # exponent tracks block geometry: the generated dictionary scales
    # both name-vocabulary dimensions by ~sqrt(factor), giving ~factor
    # more distinct names split over ~sqrt(factor) more blocks of
    # ~sqrt(factor) more names each -> pairs ~factor^1.5.
    "dd_fuzzy_dictionary": 1.7,
    # late r4: narrow single-scan rule chain — linear
    "tx_gopher_quality": 1.3,
    # k-means training + N x sqrt(N) assignment like the IVF family
    "cur_cluster_sample": 1.7,
    # r8: occupancy-capped window pairing — per-bucket candidates are
    # occupancy x KNN_WINDOW (never occupancy^2), so total candidate
    # rows are <= N x window x tables whatever the occupancy
    # distribution; sort-within-bucket adds the log factor
    "sim_knn_graph": 1.2,
    # r6: containment.  NOTE the 2.0 bounds are honest, not lax: this
    # generator reuses the sf0.1 vocabulary verbatim, so per-shingle df
    # grows ~factor and the TRUE >=0.5-containment pair count itself
    # grows ~factor^2 — output density, not plan shape, is quadratic
    # here.  On df-bounded natural corpora both run linear (sum(df^2)
    # ~ df_max * |shingles| for the exact join; cap * k * N for the
    # capped probe — the absolute candidate bound is asserted below).
    "dd_containment": 2.0,
    "dd_containment_scale": 2.0,
    # r6: query-bag-filtered explode + tiny aggregates — linear
    "tx_bm25_topk": 1.3,
    # r6: pure narrow map (sequence/explode/slice) — linear
    "cur_chunk": 1.3,
    # r7: per-order pair enumeration (bounded lines/order) + BSP
    # supersteps on the tiny brand graph — linear in lineitem
    "s14_brand_pagerank": 1.3,
    # r7: batch retrieval from the postings store — linear in the
    # union of the batch's postings
    "tx_bm25_batch": 1.3,
    # r7: chunk + chunk-hash dedup + doc agg — linear, no pair joins
    "pipe_rag_index": 1.3,
    # r7: two bounded top-k lists + union-all/hash-agg fusion — the
    # dense half (exact cosine scan) dominates, linear
    "tx_hybrid_rrf": 1.3,
    # r7: the batched form — one postings scan + one embedding scan
    "tx_hybrid_batch": 1.3,
    # r7: perceptual-hash banding — same bucket-bounded self-join
    # shape as dd_simhash_pairs
    "mm_phash_pairs": 1.3,
    # r7: salted fact-dim join + decomposable (count/sum/max) aggs —
    # linear in events; the salt only moves physical placement
    "s15_skew_salted": 1.3,
    # r7 batch 2 — all linear by construction:
    # pure narrow map (fixed-point scorer)
    "tx_quality_classifier": 1.3,
    # WindowGroupLimit rank filter: shuffle rows bounded at
    # cap x domains x partitions, scan linear
    "cur_domain_cap": 1.3,
    # segment-df hash agg + broadcast dictionary + doc-keyed rebuild
    "cur_line_dedup": 1.3,
    # single user_id-keyed shuffle for both window passes
    "ev_scd2_user_state": 1.3,
    # scd2 build + as-of union window — two bounded shuffles
    "ev_scd2_pit_lookup": 1.3,
    # Misra-Gries sketch pass (no shuffle) + candidate-pruned exact
    # count (shuffle bounded at capacity x partitions) — linear scans
    "ev_heavy_keys": 1.3,
    # classifier + tiered keep fused into one zero-shuffle codegen stage
    "cur_curriculum_sample": 1.3,
    # fused signal scan + hash window + source agg — linear shuffles
    "cur_corpus_health": 1.3,
    # stored IVF assignment (N*sqrt(N) build like the IVF family) +
    # linear id join + per-cell WindowGroupLimit quota
    "cur_diverse_sample": 1.7,
    # phash-banded pair graph + pointer-jumping components — same
    # bucket-bounded shape as dd_dup_clusters
    "mm_phash_clusters": 1.5,
    # pre-filter semi-join + |q| x |allowed| exact scoring — linear
    "sim_filtered_topk": 1.3,
    # three-batch incremental fold: per-batch cost ~ affected users'
    # skeletons + slice — linear in events
    "ev_scd2_incremental": 1.3,
    # interval filter over the single-shuffle history build — linear
    "ev_scd2_snapshot": 1.3,
    # small agg over the history build — linear
    "ev_state_durations": 1.3,
    # stored inverted file + allowed semi-join + probed-cell scoring —
    # IVF-family shape
    "sim_filtered_ivf_topk": 1.7,
    # one scan + |langs|^2-row aggregate — linear
    "tx_lang_confusion": 1.3,
    # r8: md5-HLL — narrow hash map + (group x 256)-bounded register
    # shuffle; the exact-count audit column dominates the time (one
    # distinct shuffle), still linear
    "ev_hll_users": 1.3,
    "tx_hll_vocab": 1.3,
    # r8: narrow (key, source, md5) spines + one full-outer join on
    # doc_id + tiny rollup — linear, text never shuffles
    "pipe_corpus_diff": 1.3,
    # r8: |q|-broadcast fan-out pruned by Partial WindowGroupLimit
    # before the per-anchor shuffle — same cost class as bruteforce
    "pipe_contrastive_negatives": 1.3,
    # r8: register algebra — two filtered sketch passes + a 256-row
    # register merge; exact INTERSECT audit dominates, linear
    "ev_hll_overlap": 1.3,
    # r8: corpus collapses to a bounded histogram in the first
    # map-side-combined agg; everything downstream is domain-sized
    "tx_length_quantiles": 1.3,
    # r8: count-min — depth-fanned narrow map + FIXED 4x1024-row
    # register shuffle + broadcast probe lookup; the exact top-N audit
    # (one token-keyed shuffle) dominates, linear
    "tx_cms_tokens": 1.3,
    # r8: matryoshka two-stage — coarse |q| x N scan over the 32-dim
    # prefix + broadcast-shortlist rerank (|q| x 100 full vectors);
    # linear like bruteforce at half the flops
    "sim_mrl_topk": 1.3,
    # r8: epoch shuffle — one bucket-keyed corpus shuffle (4096
    # uniform window groups) + broadcast 4096-row offsets; linear,
    # no global sort pipeline
    "cur_epoch_batches": 1.3,
    # r8: BPE pair counts — token-count corpus shuffle, then pair
    # enumeration over the DISTINCT-word dictionary only; linear in
    # the corpus, dictionary-sized downstream
    "tx_bpe_merges": 1.3,
    # r9: full greedy training loop — same one corpus shuffle, then
    # R dictionary-sized argmax+fold rounds (1-row collects)
    "tx_bpe_encode": 1.3,
    # r9: corpus re-tokenization = token explode + broadcast-
    # dictionary join + |sources| rollup; linear in the corpus
    "tx_bpe_source_tokens": 1.3,
    # r9: distributed PCA — one Arrow-vectorized moment pass with
    # O(d^2) per-batch state (never O(N) shuffle), driver eigensolve
    # on the collected 64x64; the outlier projection is a zero-
    # Exchange narrow map + TakeOrderedAndProject (plan-asserted)
    "sim_pca_spectrum": 1.3,
    "sim_pca_outliers": 1.3,
    # zero marginal corpus work (same memoized moment pass; the pair
    # enumeration is driver math on the 64x64)
    "sim_dim_corr": 1.3,
    # two linear moment passes (full is shared/memoized; the base
    # slice's filter is pushed to the scan), one literal row out
    "sim_pca_drift": 1.3,
    # three-batch streaming fold of the mergeable moment sketch —
    # same linear scan split across micro-batches, log-sized re-model
    "sim_pca_incremental": 1.3,
    # BPE-token bucket rollup: one token explode past the broadcast
    # dictionary, doc-keyed agg, <= log2(max_len) buckets
    "cur_bpe_length_buckets": 1.3,
    # per-label centroid drift: two linear grouped-agg passes
    # (|labels| x d state, map-side combined) + broadcast label join
    "sim_label_drift": 1.3,
    # r8: bloom pruning — fixed 256-word build (map-side OR-combined)
    # inlined as a literal filter on the fact scan; linear, the probe
    # adds zero exchanges
    "ev_bloom_prune": 1.3,
    # r8: group-integral split — broadcast cluster join + narrow coin
    # + 3-group agg.  r9: WARM_FIRST (the dd_dup_clusters relation it
    # joins is store-served steady state, paid once per corpus
    # version), so the bound is the broadcast-join + rollup it
    # actually is instead of the inherited LSH-build allowance
    "cur_leakage_safe_split": 1.3,
    # r8: CDC chunking — posexplode + one doc-keyed exchange shared by
    # the running chunk id and the chunk aggregate, then chunk-sized
    # (~1/16 of tokens) relations; linear
    "dd_cdc_chunks": 1.3,
    # r8: two CDC chunk passes + a join of two ~1/16-sized hash
    # relations; linear
    "dd_cdc_incremental": 1.3,
    # r8: k-means on the base subset + one broadcast-centroid argmax
    # over the corpus — the IVF family's N*sqrt(N) shape
    "sim_ivf_append": 1.7,
    # r8: stored inverted file + broadcast centroid re-join + cell
    # stats + TakeOrdered — IVF-family build cost on fresh corpora
    "sim_outlier_audit": 1.7,
    # r8: one zero-shuffle codegen stage (classifier + integer coin)
    "cur_soft_quality_sample": 1.3,
    # r8: narrow map + <= log2(max_len)-bucket aggregate
    "cur_length_buckets": 1.3,
}
#: Store-backed queries (persisted-index relations): run once UNTIMED
#: at each scale before the timed run, so both sides measure the same
#: steady state (store-served).  Without this the base side is served
#: by a store warmed in earlier sessions while the fresh 10x corpus
#: cold-computes, and the ratio compares a cache hit against a build —
#: meaningless as a scaling exponent.  The BUILD cost's scaling is
#: already covered by the non-store families sharing the same plan
#: shapes (pair enumeration ~ lineitem scan, BSP supersteps ~ graph).
WARM_FIRST = {
    "s14_brand_pagerank",
    "cur_boilerplate",
    "mm_phash_clusters",
    # r8: the three-batch fold is store-served (paid once per corpus
    # version); time the steady state on both sides
    "ev_scd2_incremental",
    # r8: the stale pre-append centroid relation is store-served
    "sim_ivf_append",
    # r9: the dup-cluster relation the split coins on is store-served
    # (see the tightened 1.3 bound above)
    "cur_leakage_safe_split",
}

#: fixed per-query scheduling overhead subtracted before the exponent
#: check (local-mode job setup dominates sub-second runs).
OVERHEAD_SEC = 0.25
SLACK = 2.0


def generate(out_dir: str, factor: int, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    import duckdb

    vocab = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) FROM '{BASE}/documents.parquet'"
        ).fetchall()
    ]
    n_docs = 5000 * factor
    lengths = rng.integers(10, 101, size=n_docs)
    texts = [
        " ".join(rng.choice(vocab, size=ln).tolist()) for ln in lengths
    ]
    # ~5% near-duplicates: copy an earlier doc and mutate one token.
    n_dup = n_docs // 20
    for i in rng.choice(np.arange(n_docs // 2, n_docs), size=n_dup, replace=False):
        src = int(rng.integers(0, n_docs // 2))
        toks = texts[src].split()
        toks[int(rng.integers(0, len(toks)))] = str(rng.choice(vocab))
        texts[i] = " ".join(toks)
    langs = rng.choice(["en", "de", "es", "fr", "zh"], size=n_docs)
    sources = [f"src_{i}" for i in rng.integers(0, 20, size=n_docs)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs.tolist()),
                "source": pa.array(sources),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )
    # part-name dictionary for the fuzzy join: "adjective noun" names
    # like the driver's, with BOTH vocab dimensions scaled ~sqrt(factor)
    # so the distinct-name dictionary grows ~factor while head-token
    # blocks grow ~sqrt(factor) — the within-block pair growth the
    # dd_fuzzy_dictionary exponent bound measures.
    import math

    dim = max(8, int(round(8 * math.sqrt(factor))))
    adjs = [f"adj{i:03d}" for i in range(dim)]
    nouns = [f"noun{i:03d}" for i in range(dim)]
    n_parts = 20000 * factor
    p_names = [
        f"{adjs[int(a)]} {nouns[int(b)]}"
        for a, b in zip(
            rng.integers(0, dim, size=n_parts), rng.integers(0, dim, size=n_parts)
        )
    ]
    brands = [
        f"Brand#{a}{b}" for a, b in zip(
            rng.integers(1, 6, size=n_parts), rng.integers(1, 6, size=n_parts)
        )
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_parts), pa.int64()),
                "p_name": pa.array(p_names),
                "p_brand": pa.array(brands),
            }
        ),
        f"{out_dir}/part.parquet",
    )

    # facts for the s14/s15 families: lineitem (orders of ~4 lines over
    # the part dictionary), and a Zipf-ish events table (s15's hot-key
    # collapse happens in the query itself via user_id % mod).
    n_li = 600_000 * factor
    orderkeys = np.repeat(np.arange(n_li // 4, dtype=np.int64), 4)[:n_li]
    linenum = np.tile(np.arange(1, 5, dtype=np.int32), n_li // 4 + 1)[:n_li]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(orderkeys, pa.int64()),
                "l_linenumber": pa.array(linenum, pa.int32()),
                "l_partkey": pa.array(
                    rng.integers(0, n_parts, size=n_li), pa.int64()
                ),
            }
        ),
        f"{out_dir}/lineitem.parquet",
    )
    n_ev = 100_000 * factor
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": pa.array(
                    ts0 + rng.integers(0, 30 * 86_400_000_000, size=n_ev),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(
                    rng.integers(0, 1500 * factor, size=n_ev), pa.int64()
                ),
                "event_type": pa.array(
                    rng.choice(
                        ["click", "view", "error", "purchase"], size=n_ev
                    ).tolist()
                ),
                "value": pa.array(
                    np.round(rng.uniform(0, 100, size=n_ev), 2), pa.float64()
                ),
                "props": pa.array(["{}"] * n_ev),
            }
        ),
        f"{out_dir}/events.parquet",
    )

    # customer dimension for the bloom-prune probe: key domain matches
    # the events user_id draw, nations cycle 0..24 like the testdata.
    n_cust = 1500 * factor
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_nationkey": pa.array(
                    (np.arange(n_cust) % 25).astype(np.int64), pa.int64()
                ),
            }
        ),
        f"{out_dir}/customer.parquet",
    )

    n_vec = 2000 * factor
    centers = rng.normal(size=(10, 64))
    labels = rng.integers(0, 10, size=n_vec)
    vecs = centers[labels] + 0.3 * rng.normal(size=(n_vec, 64))
    # a few exact-ish duplicates for the near-dup query
    for i in rng.choice(np.arange(n_vec // 2, n_vec), size=n_vec // 50, replace=False):
        vecs[i] = vecs[int(rng.integers(0, n_vec // 2))] + 1e-4
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vec), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels.astype(np.int32), pa.int32()),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated query names: probe just these (skips the "
        "recall/containment audits); for iterating on one family",
    )
    args = ap.parse_args()

    out_dir = os.path.join(REPO, ".scratch", f"scale{args.factor}")
    os.makedirs(out_dir, exist_ok=True)
    if not all(
        os.path.exists(f"{out_dir}/{t}.parquet")
        for t in ("embeddings", "documents", "part", "lineitem", "events", "customer")
    ):
        print(f"# generating {args.factor}x corpus under {out_dir}", file=sys.stderr)
        generate(out_dir, args.factor)

    from chinook_music_database_analysis_spark.plans import QUERIES as REG
    from chinook_music_database_analysis_spark.sources import get_spark

    spark = get_spark("scalecheck")
    spark.sparkContext.setLogLevel("ERROR")

    only = {n for n in args.only.split(",") if n}
    failures = []
    print(f"{'query':26s} {'base_s':>8} {'scaled_s':>9} {'ratio':>7} {'bound':>7}")
    for name, bound in QUERIES.items():
        if only and name not in only:
            continue
        if name in WARM_FIRST:
            REG[name](spark, BASE).count()
            REG[name](spark, out_dir).count()
        t0 = time.perf_counter()
        REG[name](spark, BASE).count()
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        try:
            REG[name](spark, out_dir).count()
        except ValueError as ex:
            # r8: dd_containment REFUSES on hot-shingle corpora instead
            # of silently serving the capped path — and this generator's
            # vocab-reusing 10x corpus IS hot by construction.  The
            # refusal is the guard demonstrably working (the base side
            # must still run the exact path — an exception there fails
            # the probe), so report it and move on.
            if name == "dd_containment" and "dd_containment_scale" in str(ex):
                print(
                    f"{name:26s} {base:8.2f} {'refused':>9} "
                    "(hot-shingle guard fired at 10x — designed outcome; "
                    "dd_containment_scale covers this regime)"
                )
                continue
            raise
        scaled = time.perf_counter() - t0
        eff_base = max(base - OVERHEAD_SEC, 0.05)
        eff_scaled = max(scaled - OVERHEAD_SEC, 0.05)
        ratio = eff_scaled / eff_base
        limit = (args.factor ** bound) * SLACK
        ok = ratio <= limit
        if not ok:
            failures.append((name, ratio, limit))
        print(
            f"{name:26s} {base:8.2f} {scaled:9.2f} {ratio:7.1f} "
            f"{limit:7.1f} {'ok' if ok else 'FAIL'}"
        )
    if only:
        if failures:
            print("SCALE REGRESSIONS:", failures, file=sys.stderr)
            return 1
        print("# probed families within scaling bounds", file=sys.stderr)
        return 0

    # --- IVF recall: k-means centroids must not lose to the stride
    # baseline on the clustered corpus (the corpus k-means exists for;
    # centers drawn from 10 Gaussian clusters above).  Ground truth =
    # exact brute-force top-5.
    def topk_sets(name: str) -> dict[int, set[int]]:
        rows = REG[name](spark, out_dir).select("query_id", "neighbor_id").collect()
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    exact = topk_sets("sim_bruteforce_topk")

    def recall(name: str) -> float:
        approx = topk_sets(name)
        per_q = [
            len(approx.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
        ]
        return sum(per_q) / len(per_q)

    r_kmeans, r_stride = recall("sim_ivf_topk"), recall("sim_ivf_stride_topk")
    print(f"ivf recall@5 (clustered {args.factor}x corpus): "
          f"kmeans={r_kmeans:.3f} stride={r_stride:.3f}")
    if r_kmeans < r_stride:
        failures.append(("ivf_kmeans_recall", r_kmeans, r_stride))

    # PQ ladder: residual encoding (IVF-PQ) must beat plain PQ on the
    # clustered corpus — absolute-position codebooks collapse cluster
    # members to one reconstruction; residual codebooks keep the
    # within-cluster detail.
    r_pq, r_ivfpq = recall("sim_pq_topk"), recall("sim_ivfpq_topk")
    print(f"pq recall@5 (clustered {args.factor}x corpus): "
          f"pq={r_pq:.3f} ivfpq={r_ivfpq:.3f}")
    if r_ivfpq < r_pq:
        failures.append(("ivfpq_residual_recall", r_ivfpq, r_pq))
    # Absolute floors at the registered parameters (PQ_RERANK=400
    # raised them from 0.48/0.66 — see similarity.PQ_RERANK).
    if r_pq < 0.6:
        failures.append(("pq_recall_floor", r_pq, 0.6))
    if r_ivfpq < 0.6:
        failures.append(("ivfpq_recall_floor", r_ivfpq, 0.6))

    # Matryoshka floor: the half-width prefix + sqrt-scaled shortlist
    # (max(100, 2*ceil(sqrt(N))) — r9: a FIXED 100 diluted to 0.76 on
    # this 20k corpus; 284 measures 0.92) must hold recall on the
    # clustered corpus too (0.92/0.96 on the flat sf0.001/sf0.01).
    r_mrl = recall("sim_mrl_topk")
    print(f"mrl recall@5 (clustered {args.factor}x corpus): {r_mrl:.3f}")
    if r_mrl < 0.8:
        failures.append(("mrl_recall_floor", r_mrl, 0.8))

    # --- containment candidate bound (r5 advice): the df-capped
    # probe's distinct candidate pairs can never exceed the documented
    # probes x cap membership bound, and the measured count is LOGGED
    # at both scales so an adversarial df distribution surfaces here
    # before production.
    from chinook_music_database_analysis_spark.operators.dedup import (
        PROBE_K,
        containment_probe_candidates,
        probe_df_cap,
    )
    from chinook_music_database_analysis_spark.plans.curation_queries import (
        _doc_count,
    )
    from chinook_music_database_analysis_spark.plans.extensions import _shingles

    for tag, d in (("base", BASE), (f"{args.factor}x", out_dir)):
        n_docs = _doc_count(spark, d)
        cap = probe_df_cap(n_docs)
        n_cand = containment_probe_candidates(
            _shingles(spark, d), max_df=cap
        ).count()
        bound_pairs = n_docs * PROBE_K * cap
        # NOTE: 0 at 10x is expected on THIS generator — its 31-word
        # vocabulary admits only ~30k distinct 3-grams, so at 50k docs
        # every shingle's df exceeds the cap (the total-hot-corpus
        # regime); candidates then come entirely from the LSH bands,
        # which is also why the exact-containment router (below)
        # switches to the capped path at this scale.
        print(
            f"containment probe candidates ({tag}): {n_cand} "
            f"(cap={cap}, bound={bound_pairs})"
        )
        if n_cand > bound_pairs:
            failures.append((f"containment_cand_bound_{tag}", n_cand, bound_pairs))

    # --- exact-containment join-row bound (r6 advice / r7 guard, r8
    # semantics): the inverted self-join expands to EXACTLY
    # sum(df*(df-1)/2) rows; the registered dd_containment runs the
    # exact path only while that stays within HOT_JOIN_FACTOR x the
    # shingle rows, else REFUSES LOUDLY (directing callers to
    # dd_containment_scale — its exact oracle must never silently
    # serve capped results).  Base (the driver corpus shape) must stay
    # on the exact path; the vocab-reusing 10x corpus is EXPECTED to
    # trip the guard (per-shingle df grows ~factor), which is the
    # guard demonstrably working — both decisions are logged.
    from chinook_music_database_analysis_spark.operators.dedup import (
        HOT_JOIN_FACTOR,
    )
    from chinook_music_database_analysis_spark.plans.extensions import (
        _containment_join_stats,
    )

    for tag, d in (("base", BASE), (f"{args.factor}x", out_dir)):
        n_rows, join_rows = _containment_join_stats(spark, d)
        routed = join_rows > HOT_JOIN_FACTOR * n_rows
        print(
            f"containment exact join rows ({tag}): {join_rows} "
            f"(shingle rows {n_rows}, bound {HOT_JOIN_FACTOR}x) -> "
            f"{'guard REFUSES (use dd_containment_scale)' if routed else 'exact path'}"
        )
        if tag == "base" and routed:
            failures.append(
                ("containment_router_base", join_rows, HOT_JOIN_FACTOR * n_rows)
            )

    # --- PCA dimension probe (r10 verdict item): the registered
    # fixtures are d=64, but 100 TB embedding corpora run d=1-4k; the
    # moment pass is O(d^2) per Arrow batch and the driver eigensolve
    # O(d^2 * iters).  Prove the machinery holds at d=512: every
    # partial carries exactly d + d^2 state (the O(#batches * d^2)
    # driver-collect bound), the exact-fold power iteration matches
    # numpy's dense eigensolver on the SAME quantized covariance, and
    # the projection map stays a zero-Exchange narrow plan.  Timings
    # for d=64 vs d=512 at equal N are printed so the d^2 growth is
    # measured, with a bound of (512/64)^2 x SLACK on the ratio.
    pca_failures = pca_dim_probe(spark, out_dir)
    failures.extend(pca_failures)

    # --- streaming scale probe (r10): the three benched streaming
    # paths drained over the base vs the generated {factor}x events
    # table.  All state is watermark- or key-bounded, so wall time
    # must scale ~linearly in the input (bound factor^1.3 x slack,
    # same as the batch hash/shuffle families).
    failures.extend(streaming_scale_probe(spark, out_dir, args.factor))

    if failures:
        print("SCALE REGRESSIONS:", failures, file=sys.stderr)
        return 1
    print("# all families within scaling bounds", file=sys.stderr)
    return 0


def pca_dim_probe(spark, out_dir: str, dims=(64, 512, 2048), n_vec: int = 8000) -> list:
    """High-dimension PCA probe: generate an anisotropic Gaussian
    corpus at each d (top axis variance 16x the bulk, second 6x — a
    clean spectral gap, so 80 power iterations converge far past the
    1e-6 quantization grid), run the full distributed pipeline
    (mapInPandas moment partials -> driver power-iteration model ->
    projection scores), and check state bounds, numpy agreement, plan
    shape and the d^2 time ratio between consecutive dims.

    r11: d=2048 added (LLM embedding dims run 1-4k).  Above
    PCA_FOLD_MAX_DIM the model auto-routes to the BLAS eigensolve
    (same algorithm/grid; the exact-fold contract only matters at
    oracle dims), so this probe ALSO verifies that routing: d<=512
    exercises the fold path, d=2048 the numpy path.  Collect volume
    (#partials x (d + d^2) doubles) and the moment-pass vs eigensolve
    split are reported per dim, per the r10 verdict ask."""
    import math

    from chinook_music_database_analysis_spark.operators.similarity import (
        PCA_FOLD_MAX_DIM,
        embedding_moment_partials,
        pca_power_model,
        pca_project_scores,
    )

    failures: list = []
    rng = np.random.default_rng(11)
    times: dict[int, float] = {}
    for d in dims:
        path = f"{out_dir}/embeddings_d{d}.parquet"
        if not os.path.exists(path):
            X = rng.normal(size=(n_vec, d))
            X[:, 0] *= 4.0   # lam1 ~ 16
            X[:, 1] *= 2.5   # lam2 ~ 6.25, gap >> quantization
            pq.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(range(n_vec), pa.int64()),
                        "embedding": pa.array(
                            [v.astype(np.float32).tolist() for v in X],
                            pa.list_(pa.float32()),
                        ),
                        "label": pa.array(
                            (np.arange(n_vec) % 4).astype(np.int32), pa.int32()
                        ),
                    }
                ),
                path,
            )
        emb = spark.read.parquet(path)
        t0 = time.perf_counter()
        rows = embedding_moment_partials(emb, dim=d).collect()
        t_moments = time.perf_counter() - t0
        t0 = time.perf_counter()
        model = pca_power_model(
            [(r["n"], r["s"], r["ss"]) for r in rows], dim=d
        )
        t_eig = time.perf_counter() - t0
        times[d] = t_moments + t_eig
        collect_mb = len(rows) * (d + d * d) * 8 / 1e6
        print(
            f"pca d={d}: {len(rows)} partials, collect {collect_mb:.1f} MB, "
            f"moments {t_moments:.2f}s, eigensolve {t_eig:.2f}s "
            f"({'fold' if d <= PCA_FOLD_MAX_DIM else 'numpy'} path)"
        )
        # state bound: each partial is exactly d + d^2 doubles, and the
        # batch total covers the corpus exactly once (reported through
        # the failures channel like every other check — a bare assert
        # would abort the sweep without the SCALE REGRESSIONS table)
        if not all(len(r["s"]) == d and len(r["ss"]) == d * d for r in rows):
            failures.append((f"pca_d{d}_partial_shape", 1, 0))
        n_total = sum(r["n"] for r in rows)
        if n_total != n_vec:
            failures.append((f"pca_d{d}_partial_rows", n_total, n_vec))
        # batch independence AT THIS d: an 8-partition run produces
        # >= 8 partials whose combine must land on the identical
        # quantized model (the grid absorbs partial-sum association) —
        # the d=64 fixture test proves the mechanism, this proves it
        # where the per-batch state is 64x larger
        multi = embedding_moment_partials(emb.repartition(8), dim=d).collect()
        # repartition(8) round-robins n_vec rows into 8 non-empty
        # partitions -> 8 partials; fewer means the multi-way combine
        # this guard exists for quietly collapsed (e.g. Arrow batching
        # merged partitions), so flag it rather than pass a weaker test
        if len(multi) < 8:
            failures.append((f"pca_d{d}_multibatch_count", len(multi), 8))
        m2 = pca_power_model([(r["n"], r["s"], r["ss"]) for r in multi], dim=d)
        if m2["m_q"] != model["m_q"] or [c[0] for c in m2["comps"]] != [
            c[0] for c in model["comps"]
        ]:
            failures.append((f"pca_d{d}_batch_independence", 1, 0))
        # numpy agreement on the SAME quantized covariance the engine
        # folded (the reference is eigh on model's m_q — this isolates
        # the power iteration + deflation from float fold order)
        M = np.array(model["m_q"], dtype=np.float64).reshape(d, d)
        evals = np.linalg.eigvalsh(M)
        lam_np = sorted(evals)[::-1][:2]
        for i, (lam, _v) in enumerate(model["comps"]):
            rel = abs(lam - lam_np[i]) / abs(lam_np[i])
            print(
                f"pca d={d} comp{i + 1}: power={lam:.9f} "
                f"numpy={lam_np[i]:.9f} rel_err={rel:.2e} "
                f"({times[d]:.2f}s, {len(rows)} partials)"
            )
            if rel > 1e-9:
                failures.append((f"pca_d{d}_eig{i + 1}", lam, lam_np[i]))
        # trace identity: sum of quantized diagonal == folded trace
        tr = sum(M[i, i] for i in range(d))
        if not math.isclose(tr, model["trace_q"], rel_tol=1e-12):
            failures.append((f"pca_d{d}_trace", tr, model["trace_q"]))
        # projection stays a zero-Exchange narrow map at any d
        plan = (
            pca_project_scores(emb, model, dim=d)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "Exchange" in plan:
            failures.append((f"pca_d{d}_projection_exchange", 1, 0))
    for d0, d1 in zip(dims, dims[1:]):
        ratio = max(times[d1], 1e-9) / max(times[d0], 1e-9)
        bound = ((d1 / d0) ** 2) * SLACK
        print(
            f"pca moment+eigensolve d={d0}->{d1}: {times[d0]:.2f}s -> "
            f"{times[d1]:.2f}s ratio {ratio:.1f} (bound {bound:.0f})"
        )
        if ratio > bound:
            failures.append((f"pca_dim_ratio_{d0}_{d1}", ratio, bound))
    return failures




def streaming_scale_probe(spark, out_dir: str, factor: int) -> list:
    """Drain the three benched streaming paths (stateful running
    totals, watermark dedup, dual-watermark interval join) over the
    base and the generated {factor}x events tables and bound the
    wall-time ratio at factor^1.3 x SLACK.

    Why linear is the right bound: the stateful path's state is one
    row per user (and users scale with the corpus, but each row is
    O(1) work); dedup's state is watermark-bounded; the interval
    join's per-key state holds exactly watermark + band of rows, so
    its join output — the only superlinear temptation — is bounded by
    input x (band occupancy), which this generator holds constant by
    scaling users WITH events (hot keys would show up here as a
    blown ratio).  Each side is drained twice and the min taken
    (micro-batch scheduling noise is the dominant variance at these
    sizes; the FIRST base drain also absorbs the Python-worker /
    checkpoint cold start the bench methodology documents)."""
    from chinook_music_database_analysis_spark.streaming.events import (
        dedup_within_watermark_stream,
        interval_join_stream,
        read_events_stream,
    )
    from chinook_music_database_analysis_spark.streaming.stateful import (
        user_running_totals_bucketed_stream,
        user_running_totals_stream,
    )

    paths = {
        "stream_stateful": (user_running_totals_stream, "update"),
        # r12: the vectorized hash-bucketed twin — state rows are FIXED
        # (= bucket count) however the corpus grows, so its drain cost
        # must scale with ROWS, not keys; a blown ratio here would mean
        # the per-bucket pandas merge degenerated (e.g. the key arrays
        # stopped amortizing).
        "stream_stateful_bkt": (user_running_totals_bucketed_stream, "update"),
        "stream_dedup": (dedup_within_watermark_stream, "append"),
        "stream_interval_join": (interval_join_stream, "append"),
    }
    failures: list = []
    bound = (factor ** 1.3) * SLACK
    for name, (builder, mode) in paths.items():
        times = {}
        for tag, d in (("base", BASE), ("scaled", out_dir)):
            best = None
            for _rep in range(2):
                t0 = time.perf_counter()
                q = (
                    builder(read_events_stream(spark, d))
                    .writeStream.format("noop")
                    .outputMode(mode)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                sec = time.perf_counter() - t0
                if best is None or sec < best:
                    best = sec
            times[tag] = best
        eff_base = max(times["base"] - OVERHEAD_SEC, 0.05)
        eff_scaled = max(times["scaled"] - OVERHEAD_SEC, 0.05)
        ratio = eff_scaled / eff_base
        ok = ratio <= bound
        if not ok:
            failures.append((name, ratio, bound))
        print(
            f"{name:26s} {times['base']:8.2f} {times['scaled']:9.2f} "
            f"{ratio:7.1f} {bound:7.1f} {'ok' if ok else 'FAIL'}"
        )
    return failures


if __name__ == "__main__":
    sys.exit(main())
