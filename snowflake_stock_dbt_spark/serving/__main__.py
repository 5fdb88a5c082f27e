"""Runnable serving shell — the reference dashboard workflow as a CLI.

``python -m snowflake_stock_dbt_spark.serving`` replays the reference app's
end-to-end loop (app/streamlit_app.py:292-489) without a browser:

1. optional scraper refresh rebuilding the raw landing files and dropping
   cached results (reference run_scraper_and_rebuild :225-245 + the
   cache-clear on success :307-312),
2. dataset resolution with warehouse→offline auto-fallback (reference
   get_dataset :275-284 — Snowflake→CSV there, parquet-warehouse→landing-CSV
   here),
3. filter options → apply_filters → stakeholder insights (total-volume KPI,
   top-5 by volume, liquidity shocks :406-443) → summary text (:206-216).

The engine functions live in serving/filters.py, serving/cache.py and
serving/summarize.py; this module only wires widget-equivalent CLI flags to
them, so it stays as thin as the reference UI layer.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import bucketize_market_cap
from ..models import run_dag, stock_dag
from ..sources.csv_bronze import read_raw_csv
from ..sources.scraper import (
    collect_most_actives,
    fetch_page_http,
    synthetic_feed,
    validate_output,
    write_outputs,
)
from .cache import ResultCache
from .filters import apply_filters, distinct_options, insights, liquidity_shocks
from .summarize import build_summary_text

#: Filter columns surfaced as CLI flags (reference selectboxes :354-369).
FILTER_COLUMNS = ("category", "location", "market_cap_category")

_CACHE = ResultCache()


def refresh_raw_files(data_dir: str, use_http: bool = False) -> str:
    """Scrape → validate → write raw_data.{csv,json}; invalidate all cached
    results (the refresh-button contract)."""
    fetch = fetch_page_http if use_http else synthetic_feed()
    rows = collect_most_actives(fetch_fn=fetch)
    validate_output(rows)
    Path(data_dir).mkdir(parents=True, exist_ok=True)
    csv_path = str(Path(data_dir) / "raw_data.csv")
    write_outputs(rows, csv_path, str(Path(data_dir) / "raw_data.json"))
    _CACHE.invalidate()
    return csv_path


def _star_join(fct: DataFrame, dim: DataFrame) -> DataFrame:
    """fct ⋈ broadcast(dim) plus the app-side market-cap bucket column
    (reference app/streamlit_app.py:82-87). dim's duplicate ``symbol`` is
    dropped — the fact side keeps it."""
    return (
        fct.join(F.broadcast(dim.drop("symbol")), "entity_sk")
        .withColumn("market_cap_category", bucketize_market_cap("market_cap"))
    )


def build_star_dataset(spark: SparkSession, csv_path: str) -> DataFrame:
    """Landing CSV → bronze → silver star schema → serving star join."""
    bronze = read_raw_csv(spark, csv_path)
    built = run_dag(spark, stock_dag(), {"most_actives_raw": bronze}, run_tests=False)
    return _star_join(built["fct_observations"], built["dim_entity"])


def resolve_dataset(
    spark: SparkSession, mode: str, warehouse_dir: str | None, data_dir: str
) -> tuple[DataFrame, str]:
    """Mode select with auto-fallback (reference get_dataset :275-284).

    ``warehouse`` reads pre-built fct/dim parquet; ``offline`` rebuilds from
    the landing CSV (generating it first if absent); ``auto`` tries the
    warehouse and falls back offline with a warning.
    """

    def from_warehouse() -> DataFrame:
        fct = spark.read.parquet(f"{warehouse_dir}/fct_observations")
        dim = spark.read.parquet(f"{warehouse_dir}/dim_entity")
        return _star_join(fct, dim)

    def from_offline() -> DataFrame:
        csv_path = str(Path(data_dir) / "raw_data.csv")
        if not Path(csv_path).exists():
            refresh_raw_files(data_dir)
        return build_star_dataset(spark, csv_path)

    if mode == "warehouse":
        return _CACHE.get(("warehouse", warehouse_dir), from_warehouse), "warehouse"
    if mode == "offline":
        return _CACHE.get(("offline", data_dir), from_offline), "offline"
    # auto
    if warehouse_dir:
        try:
            df = _CACHE.get(("warehouse", warehouse_dir), from_warehouse)
            df.take(1)  # probe now so fallback happens here, not mid-report
            return df, "warehouse"
        except Exception as exc:
            _CACHE.invalidate(("warehouse", warehouse_dir))
            print(
                f"[serving] warehouse unavailable ({exc.__class__.__name__}); "
                "falling back to offline snapshot",
                file=sys.stderr,
            )
    return _CACHE.get(("offline", data_dir), from_offline), "offline"


def _show(df: DataFrame, n: int = 20) -> str:
    return df._jdf.showString(n, 0, False)  # noqa: SLF001 — CLI rendering only


def run_report(
    dataset: DataFrame,
    equality_filters: dict[str, str],
    metric: str,
    min_threshold: float,
    limit: int | None,
    out=None,
    llm_summary: bool = False,
    export_csv: str | None = None,
) -> DataFrame:
    """Filters → results → insights → summary, printed as text panels."""
    out = out if out is not None else sys.stdout
    print("== Filter options ==", file=out)
    for col in FILTER_COLUMNS:
        print(f"  {col}: All, {', '.join(map(str, distinct_options(dataset, col)))}", file=out)

    results = apply_filters(
        dataset,
        equality_filters=equality_filters,
        metric=metric,
        min_threshold=min_threshold,
        sort_by=metric,
        tiebreaker="symbol",
        limit=limit,
    ).persist()

    print(f"\n== Query results (metric={metric}, limit={limit}) ==", file=out)
    print(_show(results, limit or 20), file=out)

    # Insights fall back to the whole dataset when the filter matches nothing
    # (reference insight_source :407).
    insight_source = results if results.take(1) else dataset
    total, top5 = insights(insight_source)
    shocks = liquidity_shocks(insight_source)
    shock_rows = shocks.select("symbol", "entity_name", "volume", "volume_z_score")
    print("== Stakeholder insights ==", file=out)
    print(f"  Total market volume: {total.first()['total_volume']:,.0f}", file=out)
    print("  Top 5 by volume:", file=out)
    print(_show(top5.select("symbol", "entity_name", "volume"), 5), file=out)
    print(f"  Liquidity shocks (z>2): {shock_rows.count()}", file=out)
    print(_show(shock_rows, 10), file=out)

    print("== Summary ==", file=out)
    print("  " + build_summary_text(results), file=out)

    if llm_summary:
        # Reference Section 6 (LLM summary demo, app/streamlit_app.py:472-489):
        # the mapInPandas seam with the deterministic demo model.
        from .summarize import summarize_rows_with_llm

        summarized = summarize_rows_with_llm(
            results.withColumn(
                "row_text",
                F.concat_ws(
                    " ", *[F.col(c).cast("string") for c in ("symbol", "entity_name")]
                ),
            ),
            text_col="row_text",
        )
        print("== LLM summaries (demo model) ==", file=out)
        for r in summarized.select("symbol", "summary").collect()[:5]:
            print(f"  {r['symbol']}: {r['summary']}", file=out)

    if export_csv:
        # Reference: CSV download from the results table (:446-449).
        results.coalesce(1).write.mode("overwrite").option("header", True).csv(
            export_csv
        )
        print(f"[serving] results exported to {export_csv}", file=out)
    results.unpersist()
    return results


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m snowflake_stock_dbt_spark.serving",
        description="Market activity dashboard workflow (reference app parity), as text.",
    )
    p.add_argument("--mode", choices=["auto", "offline", "warehouse"], default="auto")
    p.add_argument("--data-dir", default=os.environ.get("SPARK_GRAFT_DATA_DIR", "./landing"))
    p.add_argument("--warehouse-dir", default=None, help="parquet warehouse with fct_observations/ and dim_entity/")
    p.add_argument("--refresh", action="store_true", help="re-run the scraper and rebuild raw files first")
    p.add_argument("--http", action="store_true", help="refresh over real HTTP instead of the offline feed")
    for col in FILTER_COLUMNS:
        p.add_argument(f"--{col.replace('_', '-')}", default="All")
    p.add_argument("--metric", choices=["market_cap", "volume", "price"], default="market_cap")
    p.add_argument("--min-threshold", type=float, default=0.0)
    p.add_argument("--limit", default="20", help="row limit or 'All'")
    p.add_argument("--llm-summary", action="store_true", help="per-row demo-model summaries (Section 6)")
    p.add_argument("--export-csv", default=None, help="write the result table as CSV to this path")
    args = p.parse_args(argv)
    limit = None if str(args.limit) == "All" else int(args.limit)

    if spark is None:
        from ..session import get_spark

        spark = get_spark("serving-shell")

    if args.refresh:
        csv_path = refresh_raw_files(args.data_dir, use_http=args.http)
        print(f"[serving] raw files rebuilt at {csv_path}; caches cleared", file=sys.stderr)

    dataset, active_mode = resolve_dataset(spark, args.mode, args.warehouse_dir, args.data_dir)
    print(f"[serving] active mode: {active_mode}", file=sys.stderr)

    run_report(
        dataset,
        equality_filters={col: getattr(args, col) for col in FILTER_COLUMNS},
        metric=args.metric,
        min_threshold=args.min_threshold,
        limit=limit,
        llm_summary=args.llm_summary,
        export_csv=args.export_csv,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
