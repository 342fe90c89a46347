"""End-to-end training-data prep pipeline over ``documents``.

Composes the corpus operators the way a real pretraining pipeline
chains them — dedup, then quality filter, then language tagging — but
FUSED into a single projection + one shuffle, because at 100 TB the
naive composition (run each operator, join the outputs on doc_id)
re-scans and re-tokenizes the corpus once per stage:

* one scan computes the content hash, tokens, quality metrics, and
  per-language scores in a single whole-stage-codegen projection;
* one hash shuffle (window by content hash) picks the exact-dedup
  representative — the only data movement in the whole pipeline, with
  per-group state bounded by the duplicate count;
* the quality/language columns then filter and tag with zero further
  movement.

Same operator semantics as operators.text / operators.dedup (the
DuckDB oracle reproduces every value bit-for-bit); only the plan shape
is pipeline-fused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import LANG_STOPWORDS, _stopword_hits, lang_pred_expr, tokens_expr

#: default gates: keep docs with at least MIN_TOKENS whitespace tokens
#: and a composite quality score of at least MIN_QUALITY (roughly the
#: top half of the driver corpus — the usual "drop the junk tail"
#: pre-filter ratio).
MIN_TOKENS = 20
MIN_QUALITY = 0.3


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
) -> DataFrame:
    """Exact-dedup -> quality-filter -> language-tag, single-pass.

    Output: one row per kept document — (doc_id, pred_lang, n_tokens,
    quality_score) — where "kept" means: the minimum doc_id of its
    exact-content group, with ``n_tokens >= min_tokens`` and
    ``quality_score >= min_quality``.
    """
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    base = docs.select(
        "doc_id",
        F.md5(norm).alias("content_hash"),
        tokens_expr().alias("toks"),
    )
    n_tokens = F.size("toks")
    scores = {
        lang: _stopword_hits(F.col("toks"), words)
        for lang, words in LANG_STOPWORDS.items()
    }
    quality = F.round(
        F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0))
        * (
            F.lit(0.5)
            + scores["en"].cast("double") / n_tokens.cast("double")
        ),
        4,
    )
    scored = base.select(
        "doc_id",
        "content_hash",
        n_tokens.alias("n_tokens"),
        quality.alias("quality_score"),
        *[expr.alias(f"c_{lang}") for lang, expr in scores.items()],
    )
    pred = lang_pred_expr({lang: F.col(f"c_{lang}") for lang in LANG_STOPWORDS})
    w = Window.partitionBy("content_hash")
    return (
        scored.withColumn("rep_doc_id", F.min("doc_id").over(w))
        .filter(
            (F.col("doc_id") == F.col("rep_doc_id"))
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("quality_score") >= min_quality)
        )
        .select("doc_id", pred.alias("pred_lang"), "n_tokens", "quality_score")
    )
