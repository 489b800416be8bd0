"""Dependency-free SVG renderers for the visualization task.

The reference's ``--task visualization`` emits rendered images
(``visualizations/ranking_visualization.py:21-270``: masked score
heatmap, seaborn clustermap = dendrogram + reordered heatmap, label
barplots, silhouette sweep).  This sandbox has no matplotlib/seaborn,
so ``plans/visualization.py`` exports the underlying *data* as TSV —
and this module closes the remaining artifact gap by rendering the
same figures as standalone ``.svg`` files built from strings: no
third-party renderer, viewable in any browser, diffable in git.

Design follows the data-viz procedure (form first, color by job,
validated palette, thin marks, recessive chrome):

- scores are non-negative magnitude -> ONE-hue sequential blue ramp
  (steps 100-700); if a heuristic ever emits negative scores the map
  switches to a diverging blue<->red ramp with a neutral-gray midpoint
  at 0 (polarity job), never a rainbow;
- the barplot's two identities (feature in / not in the reference
  model) take categorical slots 1-2 (#2a78d6 blue / #eb6834 orange,
  validator: adjacent CVD dE 24.7, normal 33.6, both PASS) with a
  legend — identity is never color-alone;
- text wears ink tokens (primary #0b0b0b / secondary #52514e / muted
  #898781), never the series color; grid #e1e0d9 and axis #c3c2b7
  stay recessive; surface #fcfcfb;
- every mark carries a native ``<title>`` so browsers show per-mark
  tooltips; large barplots cap at MAX_BARS rendered rows with a
  visible "top N of M - full data in the TSV" note (no silent caps).
"""
from __future__ import annotations

from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

__all__ = [
    "heatmap_svg", "clustermap_svg", "silhouette_svg", "barplot_svg",
    "leaf_order",
]

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
AXIS = "#c3c2b7"
SERIES1 = "#2a78d6"   # categorical slot 1 (blue)
SERIES2 = "#eb6834"   # categorical slot 2 (orange)
FONT = 'system-ui, -apple-system, "Segoe UI", sans-serif'

# sequential blue, steps 100 -> 700 (light -> dark)
_SEQ = [
    "#cde2fb", "#b7d3f6", "#9ec5f4", "#86b6ef", "#6da7ec", "#5598e7",
    "#3987e5", "#2a78d6", "#256abf", "#1c5cab", "#184f95", "#104281",
    "#0d366b",
]
_DIV_MID = "#f0efec"  # neutral gray midpoint of the diverging pair
_DIV_NEG = "#104281"  # blue pole (negative arm)
_DIV_POS = "#d03b3b"  # red pole (positive arm)
MAX_BARS = 100


def _hex_to_rgb(h: str) -> tuple[int, int, int]:
    return int(h[1:3], 16), int(h[3:5], 16), int(h[5:7], 16)


def _lerp_hex(a: str, b: str, t: float) -> str:
    ra, ga, ba = _hex_to_rgb(a)
    rb, gb, bb = _hex_to_rgb(b)
    return "#%02x%02x%02x" % (
        round(ra + (rb - ra) * t),
        round(ga + (gb - ga) * t),
        round(ba + (bb - ba) * t),
    )


def seq_color(t: float) -> str:
    """Piecewise-linear interpolation through the sequential ramp,
    t in [0, 1] (0 = lightest step, 1 = darkest)."""
    t = min(1.0, max(0.0, float(t)))
    pos = t * (len(_SEQ) - 1)
    i = min(int(pos), len(_SEQ) - 2)
    return _lerp_hex(_SEQ[i], _SEQ[i + 1], pos - i)


def div_color(t: float) -> str:
    """Diverging blue <-> gray <-> red; t in [-1, 1], 0 = neutral."""
    t = min(1.0, max(-1.0, float(t)))
    if t < 0:
        return _lerp_hex(_DIV_MID, _DIV_NEG, -t)
    return _lerp_hex(_DIV_MID, _DIV_POS, t)


class _Svg:
    """String-building SVG canvas with the shared chrome."""

    def __init__(self, width: float, height: float) -> None:
        self.w, self.h = width, height
        self.parts: list[str] = []

    def add(self, s: str) -> None:
        self.parts.append(s)

    def text(self, x: float, y: float, s: str, *, size: float = 11,
             fill: str = INK2, anchor: str = "start",
             rotate: float | None = None, weight: str = "normal") -> None:
        tr = (f' transform="rotate({rotate} {x:.1f} {y:.1f})"'
              if rotate else "")
        self.add(
            f'<text x="{x:.1f}" y="{y:.1f}" font-size="{size}"'
            f' fill="{fill}" text-anchor="{anchor}"'
            f' font-weight="{weight}"{tr}>{escape(s)}</text>'
        )

    def rect(self, x: float, y: float, w: float, h: float, fill: str,
             *, title: str | None = None, rx: float = 0) -> None:
        t = f"<title>{escape(title)}</title>" if title else ""
        end = f">{t}</rect>" if t else "/>"
        rxa = f' rx="{rx}"' if rx else ""
        self.add(f'<rect x="{x:.2f}" y="{y:.2f}" width="{w:.2f}"'
                 f' height="{h:.2f}" fill="{fill}"{rxa}{end}')

    def line(self, x1: float, y1: float, x2: float, y2: float,
             stroke: str = GRID, width: float = 1) -> None:
        self.add(f'<line x1="{x1:.2f}" y1="{y1:.2f}" x2="{x2:.2f}"'
                 f' y2="{y2:.2f}" stroke="{stroke}"'
                 f' stroke-width="{width}"/>')

    def path(self, d: str, *, stroke: str = INK, width: float = 2,
             fill: str = "none", title: str | None = None) -> None:
        t = f"<title>{escape(title)}</title>" if title else ""
        end = f">{t}</path>" if t else "/>"
        self.add(f'<path d="{d}" stroke="{stroke}"'
                 f' stroke-width="{width}" fill="{fill}"'
                 f' stroke-linecap="round" stroke-linejoin="round"{end}')

    def circle(self, cx: float, cy: float, r: float, fill: str,
               *, title: str | None = None) -> None:
        t = f"<title>{escape(title)}</title>" if title else ""
        end = f">{t}</circle>" if t else "/>"
        self.add(f'<circle cx="{cx:.2f}" cy="{cy:.2f}" r="{r}"'
                 f' fill="{fill}"{end}')

    def write(self, path: str) -> None:
        body = "\n".join(self.parts)
        with open(path, "w", encoding="utf-8") as f:
            f.write(
                f'<svg xmlns="http://www.w3.org/2000/svg"'
                f' width="{self.w:.0f}" height="{self.h:.0f}"'
                f' viewBox="0 0 {self.w:.0f} {self.h:.0f}"'
                f' font-family=\'{FONT}\'>\n'
                f'<rect width="100%" height="100%" fill="{SURFACE}"/>\n'
                f"{body}\n</svg>\n"
            )


def _score_colormap(vmin: float, vmax: float):
    """(color_fn, legend_stops, legend_bounds): sequential when all
    values >= 0, diverging around 0 otherwise; legend_bounds are the
    values at the gradient's ends (the symmetric +/-amp pair in the
    diverging case)."""
    if vmin >= 0:
        span = (vmax - vmin) or 1.0

        def fn(v: float) -> str:
            return seq_color((v - vmin) / span)

        stops = [(t, seq_color(t)) for t in np.linspace(0, 1, 9)]
        return fn, stops, (vmin, vmax)
    amp = max(abs(vmin), abs(vmax)) or 1.0

    def fn(v: float) -> str:
        return div_color(v / amp)

    stops = [((t + 1) / 2, div_color(t)) for t in np.linspace(-1, 1, 9)]
    # the gradient spans the symmetric [-amp, amp] range; labeling it
    # with vmin/vmax would misstate the value->color mapping whenever
    # |vmin| != |vmax|
    return fn, stops, (-amp, amp)


def _colorbar(svg: _Svg, x: float, y: float, h: float, stops,
              vmin: float, vmax: float) -> None:
    gid = f"cb{int(x)}_{int(y)}"
    grad = "".join(
        f'<stop offset="{t * 100:.0f}%" stop-color="{c}"/>'
        for t, c in stops
    )
    # gradient bottom = vmin, top = vmax
    svg.add(f'<defs><linearGradient id="{gid}" x1="0" y1="1" x2="0"'
            f' y2="0">{grad}</linearGradient></defs>')
    svg.add(f'<rect x="{x:.1f}" y="{y:.1f}" width="12" height="{h:.1f}"'
            f' fill="url(#{gid})" stroke="{AXIS}" stroke-width="0.5"/>')
    svg.text(x + 16, y + 9, f"{vmax:.3g}", size=10, fill=MUTED)
    svg.text(x + 16, y + h, f"{vmin:.3g}", size=10, fill=MUTED)


def _cell_geometry(n: int) -> tuple[float, float]:
    """(cell px, label px) adapted to matrix size."""
    cell = max(5.0, min(26.0, 680.0 / max(n, 1)))
    label = 10.0 if cell >= 12 else (8.0 if cell >= 7 else 0.0)
    return cell, label


def heatmap_svg(pivot: pd.DataFrame, path: str,
                title: str = "Pairwise score heatmap") -> str:
    """Lower-triangle masked mean-score heatmap (the reference's
    ``np.tril`` mask, ranking_visualization.py:123-135), sequential
    blue; per-cell browser tooltips; colorbar legend."""
    vals = pivot.values.astype(float)
    n = vals.shape[0]
    tril = np.tril_indices(n)
    shown = vals[tril]
    vmin = float(shown.min()) if shown.size else 0.0
    vmax = float(shown.max()) if shown.size else 1.0
    fn, stops, (cb_lo, cb_hi) = _score_colormap(vmin, vmax)

    cell, lab = _cell_geometry(n)
    left = 150.0 if lab else 40.0
    top = 40.0
    w = left + n * cell + 90
    h = top + n * cell + (120 if lab else 30)
    svg = _Svg(w, h)
    svg.text(12, 22, title, size=14, fill=INK, weight="600")
    rows = [str(r) for r in pivot.index]
    cols = [str(c) for c in pivot.columns]
    for i in range(n):
        for j in range(i + 1):
            v = vals[i, j]
            svg.rect(left + j * cell, top + i * cell, cell - 0.5,
                     cell - 0.5, fn(v),
                     title=f"{rows[i]} x {cols[j]}: {v:.4f}")
    if lab:
        step = max(1, int(np.ceil(12.0 / cell)))  # keep labels >= 12px apart
        for i in range(0, n, step):
            svg.text(left - 6, top + i * cell + cell / 2 + lab / 2 - 1,
                     rows[i][:24], size=lab, fill=MUTED, anchor="end")
            svg.text(left + i * cell + cell / 2,
                     top + n * cell + 8, cols[i][:24], size=lab,
                     fill=MUTED, anchor="end", rotate=-60)
    _colorbar(svg, left + n * cell + 24, top, min(n * cell, 220.0),
              stops, cb_lo, cb_hi)
    svg.write(path)
    return path


def leaf_order(z: np.ndarray, n: int) -> list[int]:
    """Left-to-right leaf order of a scipy-format linkage matrix
    (same traversal scipy's ``dendrogram`` uses: for each merge, the
    ``z[i,0]`` subtree plots left of ``z[i,1]``)."""
    if n <= 1 or z.shape[0] == 0:
        return list(range(n))
    order: list[int] = []
    stack = [2 * n - 2]
    while stack:
        node = stack.pop()
        if node < n:
            order.append(node)
        else:
            a, b = int(z[node - n, 0]), int(z[node - n, 1])
            stack.append(b)   # popped after a -> a traversed first
            stack.append(a)
    return order


def clustermap_svg(pivot: pd.DataFrame, z: np.ndarray, path: str,
                   title: str = "Clustered score heatmap") -> str:
    """Row dendrogram + heatmap with rows AND columns reordered by the
    linkage's leaf order (the reference's ``sns.clustermap``,
    ranking_visualization.py:55)."""
    vals = pivot.values.astype(float)
    n = vals.shape[0]
    if n == 0:
        svg = _Svg(360, 80)
        svg.text(12, 22, title, size=14, fill=INK, weight="600")
        svg.text(12, 52, "no features to cluster", size=11, fill=MUTED)
        svg.write(path)
        return path
    order = leaf_order(z, n)
    vals = vals[np.ix_(order, order)]
    rows = [str(pivot.index[i]) for i in order]

    vmin, vmax = float(vals.min()), float(vals.max())
    fn, stops, _bounds = _score_colormap(vmin, vmax)
    cell, lab = _cell_geometry(n)
    dend_w = 120.0
    left = dend_w + (150.0 if lab else 12.0)
    top = 40.0
    svg = _Svg(left + n * cell + 90, top + n * cell + (120 if lab else 30))
    svg.text(12, 22, title, size=14, fill=INK, weight="600")

    # heatmap (full square: the clustermap shows the reordered matrix)
    for i in range(n):
        for j in range(n):
            v = vals[i, j]
            svg.rect(left + j * cell, top + i * cell, cell - 0.5,
                     cell - 0.5, fn(v),
                     title=f"{rows[i]} x {rows[j]}: {v:.4f}")
        if lab:
            step = max(1, int(np.ceil(12.0 / cell)))
            if i % step == 0:
                svg.text(left - 6, top + i * cell + cell / 2 + lab / 2 - 1,
                         rows[i][:24], size=lab, fill=MUTED, anchor="end")

    # row dendrogram, drawn in the left gutter; link height scales x
    if n >= 2 and z.shape[0] == n - 1:
        pos_y = {leaf: top + rank * cell + cell / 2
                 for rank, leaf in enumerate(order)}
        hmax = float(z[:, 2].max()) or 1.0
        pos_x = {leaf: float(dend_w) for leaf in range(n)}
        for k in range(n - 1):
            a, b, hgt = int(z[k, 0]), int(z[k, 1]), float(z[k, 2])
            x = dend_w * (1.0 - hgt / hmax)
            ya, yb = pos_y[a], pos_y[b]
            svg.path(
                f"M {pos_x[a]:.1f} {ya:.1f} H {x:.1f} V {yb:.1f}"
                f" H {pos_x[b]:.1f}",
                stroke=AXIS, width=1.5,
                title=f"merge height {hgt:.4f}",
            )
            pos_y[n + k] = (ya + yb) / 2
            pos_x[n + k] = x
    svg.write(path)
    return path


def _panel_axes(svg: _Svg, x0: float, y0: float, w: float, h: float,
                xmin: float, xmax: float, ymin: float, ymax: float,
                xlab: str, ylab: str) -> None:
    """Recessive grid + axis + muted tick labels for one panel."""
    for i in range(5):
        gy = y0 + h * i / 4
        svg.line(x0, gy, x0 + w, gy)
        yv = ymax - (ymax - ymin) * i / 4
        svg.text(x0 - 6, gy + 3.5, f"{yv:.3g}", size=10, fill=MUTED,
                 anchor="end")
    for i in range(5):
        gx = x0 + w * i / 4
        xv = xmin + (xmax - xmin) * i / 4
        svg.text(gx, y0 + h + 14, f"{xv:.3g}", size=10, fill=MUTED,
                 anchor="middle")
    svg.line(x0, y0 + h, x0 + w, y0 + h, stroke=AXIS, width=1)
    svg.text(x0 + w / 2, y0 + h + 28, xlab, size=11, fill=INK2,
             anchor="middle")
    svg.text(x0 - 44, y0 - 8, ylab, size=11, fill=INK2)


def _line_panel(svg: _Svg, xs: np.ndarray, ys: np.ndarray, x0: float,
                y0: float, w: float, h: float, color: str,
                tip) -> None:
    xmin, xmax = float(xs.min()), float(xs.max())
    ymin, ymax = float(ys.min()), float(ys.max())
    if xmax <= xmin:
        xmax = xmin + 1
    if ymax <= ymin:
        ymax = ymin + 1
    px = x0 + (xs - xmin) / (xmax - xmin) * w
    py = y0 + h - (ys - ymin) / (ymax - ymin) * h
    d = "M " + " L ".join(f"{x:.1f} {y:.1f}" for x, y in zip(px, py))
    svg.path(d, stroke=color, width=2)
    # invisible wide hit circles carry the per-point tooltips
    for i in range(len(xs)):
        svg.circle(px[i], py[i], 6, "transparent", title=tip(i))


def silhouette_svg(profile: pd.DataFrame, path: str) -> str:
    """Silhouette sweep as two stacked panels over a shared threshold
    axis — silhouette (slot-1) and cluster count (slot-2) are
    different scales, so they get separate panels, never a dual
    axis."""
    w, panel_h, x0 = 560.0, 150.0, 70.0
    svg = _Svg(x0 + w + 30, 2 * (panel_h + 80) + 20)
    svg.text(12, 22, "Silhouette sweep over flat-clustering thresholds",
             size=14, fill=INK, weight="600")
    if len(profile) == 0:
        svg.text(x0, 80, "no thresholds produced 2 < k < max clusters",
                 size=12, fill=MUTED)
        svg.write(path)
        return path
    xs = profile["threshold"].to_numpy(dtype=float)
    for row, (col, color) in enumerate([
        ("Silhouette", SERIES1),
        ("numClusters", SERIES2),
    ]):
        ys = profile[col].to_numpy(dtype=float)
        y0 = 50.0 + row * (panel_h + 80)
        _panel_axes(svg, x0, y0, w, panel_h, float(xs.min()),
                    float(xs.max()), float(ys.min()), float(ys.max()),
                    "threshold", col)
        _line_panel(svg, xs, ys, x0, y0, w, panel_h, color,
                    lambda i, c=col, y=ys: (
                        f"threshold {xs[i]:.4f}: {c} {y[i]:.4f}"))
        sil = profile["Silhouette"].to_numpy(dtype=float)
        # LAST argmax: hierarchical_cluster_data keeps the last max
        # (`>=` at visualization.py), so the marked dot must agree
        # with the TopClustering.tsv it accompanies
        best = int(np.flatnonzero(sil == sil.max())[-1])
        svg.circle(x0 + (xs[best] - xs.min()) /
                   ((xs.max() - xs.min()) or 1) * w,
                   y0 + panel_h - (ys[best] - ys.min()) /
                   ((ys.max() - ys.min()) or 1) * panel_h,
                   4, color, title=f"best threshold {xs[best]:.4f}")
    svg.write(path)
    return path


def barplot_svg(ranks: pd.DataFrame, path: str, label: str = "",
                title: str | None = None) -> str:
    """Horizontal label-ranking barplot (reference
    ranking_visualization.py:177-210).  Identity: in/not-in reference
    model -> categorical slots 1/2 with a legend; bars get a 4px
    rounded data-end anchored to the zero baseline, a 2px gap, and
    value labels in secondary ink.  Renders at most MAX_BARS rows with
    a visible truncation note (the TSV carries the full data)."""
    total = len(ranks)
    shown = ranks.iloc[:MAX_BARS]
    n = len(shown)
    has_flag = ("InReferenceModel" in shown.columns
                and bool(shown["InReferenceModel"].any()))
    row_h, bar_w, left, top = 16.0, 420.0, 210.0, 54.0
    svg = _Svg(left + bar_w + 90, top + n * row_h + 40)
    svg.text(12, 22, title or f"Top features vs label '{label}'",
             size=14, fill=INK, weight="600")
    if has_flag:
        svg.circle(left, 38, 4, SERIES1)
        svg.text(left + 9, 42, "feature", size=10, fill=INK2)
        svg.circle(left + 70, 38, 4, SERIES2)
        svg.text(left + 79, 42, "in reference model", size=10, fill=INK2)
    # value scale spans [min(0, vmin), max(0, vmax)] with the baseline
    # at 0, so negative scores render as leftward bars instead of
    # silently clamping to zero width
    vmax = float(shown["Value"].max()) if n else 1.0
    vmin = float(shown["Value"].min()) if n else 0.0
    lo, hi = min(0.0, vmin), max(0.0, vmax)
    span = (hi - lo) or 1.0
    base_x = left + (0.0 - lo) / span * bar_w
    for i in range(n):
        r = shown.iloc[i]
        v = float(r["Value"])
        bw = abs(v) / span * bar_w
        sgn = 1.0 if v >= 0 else -1.0
        y = top + i * row_h
        color = (SERIES2 if has_flag and bool(r["InReferenceModel"])
                 else SERIES1)
        name = str(r["Feature"])
        svg.text(left - 6, y + row_h - 5, name[:34], size=10,
                 fill=INK2, anchor="end")
        # square at the zero baseline, 4px-rounded at the data end
        # (mirrored for negative values)
        hh = row_h - 2  # the 2px surface gap between bars
        rxr = min(4.0, bw / 2)
        sweep = 1 if sgn > 0 else 0
        svg.path(
            f"M {base_x:.1f} {y:.1f} h {sgn * (bw - rxr):.2f}"
            f" a {rxr} {rxr} 0 0 {sweep} {sgn * rxr} {rxr}"
            f" v {hh - 2 * rxr:.2f}"
            f" a {rxr} {rxr} 0 0 {sweep} {-sgn * rxr} {rxr}"
            f" h {-sgn * (bw - rxr):.2f} z",
            stroke="none", fill=color, title=f"{name}: {v:.4f}",
        )
        if n <= 60:
            lx = base_x + sgn * bw + 5 * sgn
            svg.text(lx, y + row_h - 5, f"{v:.3f}", size=9,
                     fill=INK2, anchor="start" if sgn > 0 else "end")
    svg.line(base_x, top, base_x, top + n * row_h, stroke=AXIS, width=1)
    if total > n:
        svg.text(left, top + n * row_h + 24,
                 f"top {n} of {total} shown - full data in the TSV",
                 size=10, fill=MUTED)
    svg.write(path)
    return path
