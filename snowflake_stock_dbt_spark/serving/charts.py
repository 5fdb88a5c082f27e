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


# ---------------------------------------------------------------------------
# Renderer: specs -> standalone SVG. Dependency-free (the reference ships
# a plotly UI; the engine's renderer must not drag a plotting stack into
# the cluster environment), deterministic (same spec -> byte-identical
# SVG), with the hover columns materialized as native SVG <title>
# tooltips — so the reference's chart block is fully reproducible from
# an engine result with no front end at all.
# ---------------------------------------------------------------------------

_W, _H = 640, 360
_ML, _MR, _MT, _MB = 60, 16, 36, 64


def _esc(s: object) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _fmt(v: float) -> str:
    return f"{v:.2f}".rstrip("0").rstrip(".")


def render_svg(spec: ChartSpec) -> str:
    """Render a ChartSpec as a standalone SVG document string.

    Bar: one rect per row in data order (the serving result is already
    sorted), y scaled from 0 (bars are magnitudes, matching plotly
    express's default baseline) to the data max. Line: polyline through
    the points, optional circle markers (``markers`` mirrors
    ``px.line(..., markers=True)``). Every mark carries a <title> child
    listing the hover columns — SVG-native tooltips.
    """
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    vals = [float(d[spec.y]) for d in spec.data if d[spec.y] is not None]
    hi = max(vals, default=1.0)
    lo = min(0.0, min(vals, default=0.0))
    span = (hi - lo) or 1.0
    n = max(len(spec.data), 1)

    def sy(v: float) -> float:
        return _MT + ph * (1 - (v - lo) / span)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{_H}" viewBox="0 0 {_W} {_H}">',
        f'<title>{_esc(spec.title)}</title>',
        f'<text x="{_W // 2}" y="20" text-anchor="middle" '
        f'font-size="14" font-family="sans-serif">{_esc(spec.title)}</text>',
        # axes + y extremes
        f'<line x1="{_ML}" y1="{_MT}" x2="{_ML}" y2="{_MT + ph}" '
        'stroke="black"/>',
        f'<line x1="{_ML}" y1="{_MT + ph}" x2="{_ML + pw}" '
        f'y2="{_MT + ph}" stroke="black"/>',
        f'<text x="{_ML - 6}" y="{sy(hi):.1f}" text-anchor="end" '
        f'font-size="10" font-family="sans-serif">{_fmt(hi)}</text>',
        f'<text x="{_ML - 6}" y="{_MT + ph:.1f}" text-anchor="end" '
        f'font-size="10" font-family="sans-serif">{_fmt(lo)}</text>',
    ]

    def tooltip(d: dict) -> str:
        lines = [f"{spec.x}={d.get(spec.x)}", f"{spec.y}={d.get(spec.y)}"]
        lines += [f"{h}={d.get(h)}" for h in spec.hover]
        return f"<title>{_esc('; '.join(lines))}</title>"

    if spec.chart_type == "Bar":
        bw = pw / n
        for i, d in enumerate(spec.data):
            v = d[spec.y]
            if v is None:
                continue
            y_top, y_bot = sorted((sy(0.0), sy(float(v))))
            parts.append(
                f'<rect x="{_ML + i * bw + bw * 0.1:.1f}" y="{y_top:.1f}" '
                f'width="{bw * 0.8:.1f}" '
                f'height="{max(y_bot - y_top, 0.5):.1f}" '
                f'fill="steelblue">{tooltip(d)}</rect>'
            )
    else:
        pts = [
            ((_ML + (i + 0.5) * pw / n), sy(float(d[spec.y])))
            for i, d in enumerate(spec.data)
            if d[spec.y] is not None
        ]
        if pts:
            path = " ".join(f"{x:.1f},{y:.1f}" for x, y in pts)
            parts.append(
                f'<polyline points="{path}" fill="none" '
                'stroke="steelblue" stroke-width="2"/>'
            )
        if spec.markers:
            for (x, y), d in zip(
                pts, [d for d in spec.data if d[spec.y] is not None]
            ):
                parts.append(
                    f'<circle cx="{x:.1f}" cy="{y:.1f}" r="3" '
                    f'fill="steelblue">{tooltip(d)}</circle>'
                )

    # x labels: thin to at most ~16 so they stay legible at any n
    step = max(1, n // 16)
    for i, d in enumerate(spec.data):
        if i % step:
            continue
        cx = _ML + (i + 0.5) * pw / n
        parts.append(
            f'<text x="{cx:.1f}" y="{_MT + ph + 14}" text-anchor="middle" '
            f'font-size="9" font-family="sans-serif">{_esc(d.get(spec.x))}'
            "</text>"
        )
    parts.append("</svg>")
    return "\n".join(parts)
