"""Data-quality remediation operators (SURVEY.md §2.10 D1/D2).

The reference *detects* duplicates and nulls (q01) and the docx
prescribes remediation: drop duplicate PKs, fill numeric nulls with 0
and categorical nulls with 'Unknown' (docx ¶2).  These operators apply
that remediation Spark-natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def drop_duplicate_keys(df: DataFrame, key: str) -> DataFrame:
    """Keep one row per key (D1 remediation).

    ``dropDuplicates`` keeps an arbitrary row per key; for reproducible
    pipelines we keep the row with the smallest tuple of remaining
    column values via a deterministic min-by aggregation when exact
    reproducibility matters — here the reference semantics only require
    *a* representative, so the native operator is used (it's the
    cheapest: partial dedup map-side, one shuffle on the key).
    """
    return df.dropDuplicates([key])


def fill_missing(df: DataFrame, numeric_default: float = 0, string_default: str = "Unknown") -> DataFrame:
    """Fill nulls per the reference's remediation policy (D2):
    numerics -> 0, strings -> 'Unknown'."""
    numeric_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    out = df
    if numeric_cols:
        out = out.na.fill(numeric_default, subset=numeric_cols)
    if string_cols:
        out = out.na.fill(string_default, subset=string_cols)
    return out


def null_report(df: DataFrame) -> DataFrame:
    """Per-column null counts — the generalized q01_nulls probe.
    Single pass, one row out."""
    return df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
            for c in df.columns
        ]
    )
