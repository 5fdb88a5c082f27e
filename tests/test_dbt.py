"""dbt-verbatim door: Jinja resolution, DAG order, schema.yml tests.

The models themselves are value-proven against DuckDB oracles
(q128–q131, plans/dbt_models.py); these tests pin the resolver's refusal
surface, the DAG mechanics, and the properties the oracle hash can't
express (e.g. WHICH rows the injected faults hit)."""

from __future__ import annotations

import pytest

from snowflake_stock_dbt_spark.dbt import (
    DbtError,
    model_refs,
    render_model,
    run_schema_tests,
)
from snowflake_stock_dbt_spark.plans.dbt_models import (
    REFERENCE_DBT_DIR,
    dbt_available,
    run_dbt_project,
)

pytestmark = pytest.mark.skipif(
    not dbt_available(), reason="reference dbt_project tree absent"
)


def test_render_resolves_ref_and_source():
    sql = "select * from {{ source('raw', 'tbl') }} join {{ ref('m1') }}"
    out = render_model(sql, {("raw", "tbl"): "raw_tbl"}, {"m1"})
    assert out == "select * from raw_tbl join m1"


def test_render_refuses_unknown_source_ref_and_other_jinja():
    with pytest.raises(DbtError, match="unregistered source"):
        render_model("{{ source('a', 'b') }}", {}, set())
    with pytest.raises(DbtError, match="unknown model"):
        render_model("{{ ref('nope') }}", {}, {"other"})
    with pytest.raises(DbtError, match="unsupported Jinja"):
        render_model(
            "select {{ config(materialized='table') }}", {}, set()
        )
    with pytest.raises(DbtError, match="unsupported Jinja"):
        render_model("{% for x in y %}", {}, set())


def test_model_refs_parse():
    assert model_refs("a {{ ref('x') }} b {{ ref('y') }}") == ["x", "y"]


def test_dag_materializes_in_dependency_order(spark, oracle_sf_dir):
    models = run_dbt_project(spark, oracle_sf_dir)
    assert set(models) == {
        "stg_most_actives",
        "dim_entity",
        "fct_observations",
    }
    # dim/fct read stg's OUTPUT: every fct entity_sk exists in stg, and
    # dim is exactly one row per distinct stg entity_sk.
    stg = models["stg_most_actives"]
    assert (
        models["dim_entity"].count()
        == stg.select("entity_sk").distinct().count()
    )


def test_schema_tests_hit_exactly_the_injected_faults(spark, oracle_sf_dir):
    """The feed injects unparseable timestamps (custkey %101) and missing
    entity names (%89); every other declared test must pass. Pinning
    WHICH tests fail proves the suite measures the data, not a stub."""
    import os

    models = run_dbt_project(spark, oracle_sf_dir)
    rows = run_schema_tests(
        os.path.join(REFERENCE_DBT_DIR, "models", "schema.yml"), models
    )
    by = {(m, c, t): f for m, c, t, f in rows}
    assert len(rows) == 14
    # injected faults surface, with identical counts across models
    assert by[("stg_most_actives", "scraped_at", "not_null")] > 0
    assert by[("dim_entity", "entity_name", "not_null")] > 0
    assert (
        by[("fct_observations", "observation_date", "not_null")]
        == by[("stg_most_actives", "scraped_at", "not_null")]
    )
    # everything else is clean — keys unique, FKs closed
    for key, f in by.items():
        if key not in {
            ("stg_most_actives", "scraped_at", "not_null"),
            ("dim_entity", "entity_name", "not_null"),
            ("fct_observations", "observation_date", "not_null"),
        }:
            assert f == 0, key
