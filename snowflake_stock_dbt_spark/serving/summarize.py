"""Result summarization — the reference's insights text + LLM demo stub.

build_summary_text mirrors app/streamlit_app.py:206-216 (average price/volume
sentence from the filtered frame); summarize_rows_with_llm mirrors the demo
stub at :219-222 and is the pandas_udf seam where a real model call would go
(per-partition batching keeps API calls off the driver and amortizes client
setup per executor — the standard shape for model-backed enrichment at
scale).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dec_avg


def build_summary_text(df: DataFrame, price_col: str = "price", volume_col: str = "volume") -> str:
    """Deterministic KPI sentence (reference build_summary_text)."""
    row = df.agg(
        F.count("*").alias("n"),
        dec_avg(F.col(price_col).cast("double")).alias("avg_price"),
        dec_avg(F.col(volume_col).cast("double")).alias("avg_volume"),
    ).first()
    if not row or not row["n"]:
        return "No rows match the current filters."
    return (
        f"{row['n']} rows; average {price_col} "
        f"{row['avg_price']:.2f}, average {volume_col} {row['avg_volume']:.0f}."
    )


def summarize_rows_with_llm(
    df: DataFrame,
    text_col: str,
    model_fn: Callable[[list[str]], list[str]] | None = None,
    batch_col: str = "summary",
) -> DataFrame:
    """Model-backed per-row summarization seam (mapInPandas, Arrow batches).

    ``model_fn`` takes a batch of texts and returns a batch of summaries.
    Default is the reference's demo behavior — a deterministic truncation
    "summary" standing in for a real LLM call (app/streamlit_app.py:219-222
    returns canned text; a production deployment injects its client here).
    """

    def demo_model(texts: list[str]) -> list[str]:
        return [
            f"[demo summary] {t[:80]}..." if t and len(t) > 80 else f"[demo summary] {t}"
            for t in texts
        ]

    fn = model_fn or demo_model
    # Copy, don't StructType.add on df.schema: pyspark caches the schema
    # object, and add() mutates in place — the input frame would then claim
    # a column it doesn't have and mapInPandas fails resolving it.
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [*df.schema.fields, T.StructField(batch_col, T.StringType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[batch_col] = fn(pdf[text_col].fillna("").tolist())
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)
