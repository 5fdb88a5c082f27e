"""Chart layer of the serving app — declarative specs, engine-side data.

The reference renders its filtered result as a plotly bar/line chart
(reference app/streamlit_app.py:451-471: ``px.bar``/``px.line`` with
``x="symbol"``, ``y=metric_name``, hover columns entity_name/category/
location, titled "Top results by {metric} (Bar|Line)"). The engine-side
equivalent is a **chart spec**: the same declarative contract (type, x,
y, hover columns, title) plus the bounded data series pulled from the
DataFrame — any front end (plotly, vega, a terminal sparkline) can render
it, and the engine stays UI-free.

Scale: the spec collects only the already-limited serving result (the
reference chart draws apply_filters' limited frame — ≤200 rows by the UI
limit choices, serving/filters.py:RESULT_LIMITS). ``max_points`` is a
hard guard so a caller can never accidentally collect an unbounded frame
onto the driver for plotting.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

#: The chart types the reference offers (app/streamlit_app.py:453).
CHART_TYPES = ("Bar", "Line")

#: Hover columns of the reference chart (app/streamlit_app.py:459,466).
DEFAULT_HOVER = ["entity_name", "category", "location"]

#: Ceiling on driver-side chart points; the UI's largest limit is 200.
MAX_POINTS_DEFAULT = 1_000


@dataclass
class ChartSpec:
    """Renderer-agnostic chart description + its materialized series."""

    chart_type: str
    x: str
    y: str
    title: str
    hover: list[str] = field(default_factory=list)
    markers: bool = False
    data: list[dict] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "chart_type": self.chart_type,
            "x": self.x,
            "y": self.y,
            "title": self.title,
            "hover": list(self.hover),
            "markers": self.markers,
            "data": self.data,
        }


def chart_spec(
    results: DataFrame,
    metric: str,
    chart_type: str = "Bar",
    x: str = "symbol",
    hover: list[str] | None = None,
    max_points: int = MAX_POINTS_DEFAULT,
) -> ChartSpec:
    """Build the reference's visualization block as a spec.

    Mirrors app/streamlit_app.py:452-471: Bar or Line over the filtered
    result, x=symbol, y=metric, hover columns, title
    "Top results by {metric} ({type})"; Line charts carry markers=True
    exactly as ``px.line(..., markers=True)`` does.
    """
    if chart_type not in CHART_TYPES:
        raise ValueError(f"chart_type must be one of {CHART_TYPES}")
    hover = DEFAULT_HOVER if hover is None else hover
    cols = [x, metric, *[h for h in hover if h not in (x, metric)]]
    missing = [c for c in cols if c not in results.columns]
    if missing:
        raise ValueError(f"chart columns missing from result: {missing}")
    rows = results.select(*cols).limit(max_points + 1).collect()
    if len(rows) > max_points:
        raise ValueError(
            f"chart source exceeds max_points={max_points}; charts draw the "
            "limited serving result, not an unbounded frame"
        )
    return ChartSpec(
        chart_type=chart_type,
        x=x,
        y=metric,
        title=f"Top results by {metric} ({chart_type})",
        hover=list(hover),
        markers=chart_type == "Line",
        data=[r.asDict() for r in rows],
    )
