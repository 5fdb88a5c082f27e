"""End-to-end drive of the serving shell CLI (reference app workflow):
scraper refresh → landing files → star schema → filters → insights →
summary, plus the warehouse→offline auto-fallback and cache invalidation."""

from __future__ import annotations

import io

from snowflake_stock_dbt_spark.operators.upsert import merge_upsert_write
from snowflake_stock_dbt_spark.serving.__main__ import (
    _CACHE,
    build_star_dataset,
    main,
    refresh_raw_files,
    resolve_dataset,
    run_report,
)


def test_serving_cli_full_loop_offline(spark, tmp_path, capsys):
    """`python -m snowflake_stock_dbt_spark.serving` semantics end-to-end:
    refresh rebuilds raw files, offline mode builds the star dataset, and
    the report prints options, results, KPIs and a summary."""
    data_dir = str(tmp_path / "landing")
    rc = main(
        [
            "--mode", "offline",
            "--data-dir", data_dir,
            "--refresh",
            "--category", "EQUITY",
            "--metric", "volume",
            "--limit", "10",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "== Filter options ==" in out
    assert "EQUITY" in out
    assert "== Stakeholder insights ==" in out
    assert "Total market volume:" in out
    assert "== Summary ==" in out
    assert "average volume" in out
    assert (tmp_path / "landing" / "raw_data.csv").exists()
    assert (tmp_path / "landing" / "raw_data.json").exists()


def test_serving_llm_summary_and_csv_export(spark, tmp_path, capsys):
    data_dir = str(tmp_path / "landing")
    csv_out = str(tmp_path / "export")
    rc = main(
        [
            "--mode", "offline",
            "--data-dir", data_dir,
            "--refresh",
            "--metric", "volume",
            "--limit", "5",
            "--llm-summary",
            "--export-csv", csv_out,
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "== LLM summaries (demo model) ==" in out
    assert "[demo summary]" in out
    exported = spark.read.option("header", True).csv(csv_out)
    assert exported.count() == 5
    assert "symbol" in exported.columns


def test_serving_auto_mode_falls_back_offline(spark, tmp_path):
    """auto + unreadable warehouse → offline dataset (reference
    get_dataset :275-284)."""
    _CACHE.invalidate()
    data_dir = str(tmp_path / "landing")
    refresh_raw_files(data_dir)
    df, mode = resolve_dataset(
        spark, "auto", str(tmp_path / "nonexistent_wh"), data_dir
    )
    assert mode == "offline"
    assert df.count() == 100
    assert "market_cap_category" in df.columns


def test_serving_warehouse_mode_reads_written_tables(spark, tmp_path):
    """Warehouse mode reads fct/dim written by the upsert writer and yields
    the same star dataset as the offline rebuild."""
    _CACHE.invalidate()
    data_dir = str(tmp_path / "landing")
    csv_path = refresh_raw_files(data_dir)
    star_offline = build_star_dataset(spark, csv_path)

    from pyspark.sql import functions as F

    from snowflake_stock_dbt_spark.models import run_dag, stock_dag
    from snowflake_stock_dbt_spark.sources.csv_bronze import read_raw_csv

    bronze = read_raw_csv(spark, csv_path)
    built = run_dag(spark, stock_dag(), {"most_actives_raw": bronze}, run_tests=False)
    wh = str(tmp_path / "wh")
    merge_upsert_write(spark, f"{wh}/fct_observations", built["fct_observations"], "observation_sk")
    merge_upsert_write(spark, f"{wh}/dim_entity", built["dim_entity"], "entity_sk")

    df, mode = resolve_dataset(spark, "auto", wh, data_dir)
    assert mode == "warehouse"
    assert df.count() == star_offline.count() == 100
    a = {r["symbol"] for r in df.select("symbol").collect()}
    b = {r["symbol"] for r in star_offline.select("symbol").collect()}
    assert a == b
    _CACHE.invalidate()


def test_serving_refresh_invalidates_cache(spark, tmp_path):
    _CACHE.invalidate()
    data_dir = str(tmp_path / "landing")
    refresh_raw_files(data_dir)
    resolve_dataset(spark, "offline", None, data_dir)
    assert len(_CACHE) == 1
    refresh_raw_files(data_dir)  # the refresh-button contract: drop results
    assert len(_CACHE) == 0


def test_run_report_empty_filter_falls_back_to_dataset(spark, tmp_path):
    """A filter matching nothing still reports insights from the full
    dataset (reference insight_source :407)."""
    _CACHE.invalidate()
    data_dir = str(tmp_path / "landing")
    csv_path = refresh_raw_files(data_dir)
    dataset = build_star_dataset(spark, csv_path)
    buf = io.StringIO()
    run_report(
        dataset,
        equality_filters={"category": "NO_SUCH_CATEGORY"},
        metric="volume",
        min_threshold=0.0,
        limit=5,
        out=buf,
    )
    text = buf.getvalue()
    assert "Total market volume:" in text
    assert "No rows match" in text


# --- chart layer (reference app/streamlit_app.py:451-471) ------------------


def test_chart_spec_bar_and_line(spark):
    from snowflake_stock_dbt_spark.serving.charts import CHART_TYPES, chart_spec

    df = spark.createDataFrame(
        [
            ("AAA", 10.0, "Alpha", "Tech", "US"),
            ("BBB", 20.0, "Beta", "Energy", "DE"),
        ],
        "symbol string, market_cap double, entity_name string, "
        "category string, location string",
    )
    bar = chart_spec(df, "market_cap", "Bar")
    assert bar.title == "Top results by market_cap (Bar)"
    assert bar.x == "symbol" and bar.y == "market_cap" and not bar.markers
    assert bar.hover == ["entity_name", "category", "location"]
    assert {d["symbol"]: d["market_cap"] for d in bar.data} == {
        "AAA": 10.0,
        "BBB": 20.0,
    }
    line = chart_spec(df, "market_cap", "Line")
    assert line.markers and line.chart_type == "Line"
    assert set(CHART_TYPES) == {"Bar", "Line"}
    d = bar.to_dict()
    assert d["chart_type"] == "Bar" and len(d["data"]) == 2


def test_chart_spec_guards(spark):
    import pytest as _pytest

    from snowflake_stock_dbt_spark.serving.charts import chart_spec

    df = spark.createDataFrame([("A", 1.0)], "symbol string, v double")
    with _pytest.raises(ValueError, match="chart_type"):
        chart_spec(df, "v", "Pie", hover=[])
    with _pytest.raises(ValueError, match="missing"):
        chart_spec(df, "nope", "Bar", hover=[])
    big = spark.range(30).selectExpr("CAST(id AS STRING) AS symbol", "CAST(id AS DOUBLE) AS v")
    with _pytest.raises(ValueError, match="max_points"):
        chart_spec(big, "v", "Bar", hover=[], max_points=10)


def test_render_svg_bar_and_line(spark):
    """The renderer half of the reference's chart block: well-formed SVG,
    one mark per data row, value-proportional geometry, hover columns as
    native <title> tooltips, deterministic output."""
    import xml.etree.ElementTree as ET

    from snowflake_stock_dbt_spark.serving.charts import chart_spec, render_svg

    df = spark.createDataFrame(
        [
            ("AAA", 10.0, "Alpha", "Tech", "US"),
            ("BBB", 40.0, "Beta", "Energy", "DE"),
            ("CCC", 20.0, "Gamma", "Tech", "FR"),
        ],
        "symbol string, market_cap double, entity_name string, "
        "category string, location string",
    )
    bar = chart_spec(df.orderBy("symbol"), "market_cap", "Bar")
    svg = render_svg(bar)
    assert svg == render_svg(bar)  # deterministic
    root = ET.fromstring(svg)  # well-formed XML
    ns = "{http://www.w3.org/2000/svg}"
    rects = root.findall(f"{ns}rect")
    assert len(rects) == 3
    heights = {
        t.text.split(";")[0].split("=")[1].strip(): float(r.get("height"))
        for r in rects
        for t in r.findall(f"{ns}title")
    }
    # 40.0 bar is twice the 20.0 bar and four times the 10.0 bar
    assert abs(heights["BBB"] / heights["CCC"] - 2.0) < 0.05
    assert abs(heights["BBB"] / heights["AAA"] - 4.0) < 0.05
    # hover columns surface in tooltips
    assert "entity_name=Beta" in svg and "category=Energy" in svg

    line = chart_spec(df.orderBy("symbol"), "market_cap", "Line")
    lsvg = render_svg(line)
    lroot = ET.fromstring(lsvg)
    assert len(lroot.findall(f"{ns}polyline")) == 1
    assert len(lroot.findall(f"{ns}circle")) == 3  # markers=True
