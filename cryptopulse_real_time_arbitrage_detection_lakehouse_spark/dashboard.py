"""Dashboard render twin: the reference's Streamlit view as an engine verb.

The reference renders a live dashboard (``src/dashboard/app.py:30-109``):
per symbol a KPI card (latest close + delta vs the previous candle,
``st.metric``) and a candle chart over the gold table. This module is the
ENGINE-side twin — it computes exactly that payload with the registered
queries and emits a self-contained HTML report (or the raw JSON payload)
instead of running a render loop:

- KPIs come from the shared materialized gold candle table (the same
  deterministic OHLC the oracle checks);
- the chart series is `candle_minmax_downsample` (X219) — the lossless
  high/low decimation a time-series dashboard runs before rendering, so
  the payload is 2 points per 30-minute bucket per symbol no matter how
  many ticks exist. A 100 TB tick archive renders from the same
  bounded collect.

The HTML is dependency-free (inline SVG + a few lines of vanilla JS for
the hover tooltip): one small-multiple panel per symbol, each a SINGLE
entity (the symbol's high/low range band), so identity never rides on
color. Palette values are the validated reference instance from the
dataviz method (series blue #2a78d6 light / #3987e5 dark on surfaces
#fcfcfb / #1a1a19); dark mode is selected via ``prefers-color-scheme``
with the dark-stepped hue, not an automatic flip. A per-panel table view
ships in a <details> for non-visual reading.
"""

from __future__ import annotations

import html
import json

from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dashboard_payload(
    spark: SparkSession, sf_dir: str, symbol: str | None = None
) -> dict:
    """Compute the dashboard's data: per-symbol KPI + downsampled series.

    Driver-side collects are BOUNDED: |symbols| KPI rows and 2 points
    per (symbol, 30-min bucket) series rows — the decimation guarantees
    the payload size is independent of tick volume.
    """
    from .plans import get
    from .plans.medallion import _gold_table

    gold = _gold_table(spark, sf_dir).select("symbol", "window_start", "close")
    if symbol is not None:
        gold = gold.filter(F.col("symbol") == symbol)
    w = W.partitionBy("symbol").orderBy(F.col("window_start").desc())
    last2 = (
        gold.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    )
    kpis: dict[str, dict] = {}
    for r in sorted(last2, key=lambda r: (r.symbol, r.rn)):
        k = kpis.setdefault(r.symbol, {})
        if r.rn == 1:
            k["close"] = float(r.close)
            k["window_start"] = r.window_start
        else:
            k["prev_close"] = float(r.close)
    for k in kpis.values():
        k["delta"] = (
            k["close"] - k["prev_close"] if "prev_close" in k else 0.0
        )

    series = get("candle_minmax_downsample").fn(spark, sf_dir)
    if symbol is not None:
        series = series.filter(F.col("symbol") == symbol)
    rows = series.collect()
    by_symbol: dict[str, list] = {}
    for r in rows:
        by_symbol.setdefault(r.symbol, []).append(
            {
                "bucket_start": r.bucket_start,
                "kind": r.kind,
                "window_start": r.window_start,
                "price": float(r.price),
            }
        )
    for pts in by_symbol.values():
        pts.sort(key=lambda p: (p["bucket_start"], p["kind"]))
    return {
        "sf_dir": sf_dir,
        "kpis": kpis,
        "series": by_symbol,
    }


_CSS = """
:root { color-scheme: light dark;
  --surface: #fcfcfb; --text: #191919; --text-2: #6b6a63;
  --series: #2a78d6; --grid: #e4e3dd; }
@media (prefers-color-scheme: dark) {
  :root { --surface: #1a1a19; --text: #ffffff; --text-2: #c3c2b7;
          --series: #3987e5; --grid: #3a3934; } }
body { background: var(--surface); color: var(--text);
  font: 14px/1.45 system-ui, sans-serif; margin: 24px; }
h1 { font-size: 18px; font-weight: 600; }
.panel { display: inline-block; vertical-align: top;
  margin: 0 24px 24px 0; }
.kpi-label { color: var(--text-2); font-size: 12px; }
.kpi-value { font-size: 28px; font-weight: 650;
  font-variant-numeric: tabular-nums; }
.kpi-delta { font-size: 13px; color: var(--text-2);
  font-variant-numeric: tabular-nums; }
svg text { fill: var(--text-2); font-size: 11px; }
svg .axis { stroke: var(--grid); stroke-width: 1; }
svg .band { fill: var(--series); fill-opacity: 0.18; }
svg .line { stroke: var(--series); stroke-width: 2; fill: none; }
svg .dot { fill: var(--series); }
.tip { position: fixed; pointer-events: none; background: var(--surface);
  color: var(--text); border: 1px solid var(--grid); border-radius: 4px;
  padding: 4px 8px; font-size: 12px; display: none;
  font-variant-numeric: tabular-nums; }
details { margin-top: 4px; } summary { color: var(--text-2);
  font-size: 12px; cursor: pointer; }
table { border-collapse: collapse; font-size: 12px;
  font-variant-numeric: tabular-nums; }
td, th { padding: 2px 8px; text-align: right;
  border-bottom: 1px solid var(--grid); }
th:first-child, td:first-child { text-align: left; }
"""

_JS = """
document.querySelectorAll('svg[data-pts]').forEach(function (svg) {
  var pts = JSON.parse(svg.dataset.pts);
  var tip = document.getElementById('tip');
  svg.addEventListener('mousemove', function (ev) {
    var r = svg.getBoundingClientRect();
    var x = ev.clientX - r.left, best = null, bd = 1e9;
    pts.forEach(function (p) {
      var d = Math.abs(p.x - x);
      if (d < bd) { bd = d; best = p; }
    });
    if (!best) return;
    tip.style.display = 'block';
    tip.style.left = (ev.clientX + 12) + 'px';
    tip.style.top = (ev.clientY + 12) + 'px';
    tip.textContent = best.t + '  high ' + best.hi + '  low ' + best.lo;
  });
  svg.addEventListener('mouseleave', function () {
    tip.style.display = 'none';
  });
});
"""


def render_html(payload: dict) -> str:
    """Self-contained HTML report from `dashboard_payload` output."""
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<title>gold candles</title><style>",
        _CSS,
        "</style></head><body>",
        f"<h1>Gold candles — {html.escape(payload['sf_dir'])}</h1>",
        "<div id='tip' class='tip'></div>",
    ]
    W_, H, PAD = 420, 160, 34
    for sym in sorted(payload["series"]):
        pts = payload["series"][sym]
        buckets: dict[str, dict] = {}
        for p in pts:
            b = buckets.setdefault(p["bucket_start"], {"t": p["bucket_start"]})
            b["hi" if p["kind"] == "high" else "lo"] = p["price"]
        bs = [
            b for _, b in sorted(buckets.items())
            if "hi" in b and "lo" in b
        ]
        kpi = payload["kpis"].get(sym, {})
        delta = kpi.get("delta", 0.0)
        arrow = "▲" if delta >= 0 else "▼"
        parts.append("<div class='panel'>")
        parts.append(
            f"<div class='kpi-label'>{html.escape(sym)} latest close</div>"
            f"<div class='kpi-value'>{kpi.get('close', float('nan')):,.2f}"
            f"</div><div class='kpi-delta'>{arrow} {delta:+,.2f} vs "
            "previous candle</div>"
        )
        if bs:
            lo = min(b["lo"] for b in bs)
            hi = max(b["hi"] for b in bs)
            span = (hi - lo) or 1.0
            n = len(bs)

            def sx(i: int) -> float:
                return PAD + (W_ - 2 * PAD) * (i / max(1, n - 1))

            def sy(v: float) -> float:
                return H - PAD / 2 - (H - PAD) * ((v - lo) / span)

            hi_pts = [(sx(i), sy(b["hi"])) for i, b in enumerate(bs)]
            lo_pts = [(sx(i), sy(b["lo"])) for i, b in enumerate(bs)]
            band = " ".join(
                f"{x:.1f},{y:.1f}" for x, y in hi_pts + lo_pts[::-1]
            )
            hi_line = " ".join(f"{x:.1f},{y:.1f}" for x, y in hi_pts)
            lo_line = " ".join(f"{x:.1f},{y:.1f}" for x, y in lo_pts)
            hover = json.dumps(
                [
                    {
                        "x": round(sx(i), 1),
                        "t": b["t"],
                        "hi": f"{b['hi']:,.2f}",
                        "lo": f"{b['lo']:,.2f}",
                    }
                    for i, b in enumerate(bs)
                ]
            )
            parts.append(
                f"<svg width='{W_}' height='{H}' data-pts='"
                + html.escape(hover, quote=True)
                + "' role='img' aria-label='"
                + html.escape(f"{sym} 30-minute high/low range")
                + "'>"
                f"<line class='axis' x1='{PAD}' y1='{H - PAD / 2}' "
                f"x2='{W_ - PAD}' y2='{H - PAD / 2}'/>"
                f"<polygon class='band' points='{band}'/>"
                f"<polyline class='line' points='{hi_line}'/>"
                f"<polyline class='line' points='{lo_line}'/>"
                f"<text x='{W_ - PAD + 4}' y='{hi_pts[-1][1] + 4:.1f}'>high</text>"
                f"<text x='{W_ - PAD + 4}' y='{lo_pts[-1][1] + 4:.1f}'>low</text>"
                f"<text x='{PAD}' y='{sy(hi) - 6:.1f}'>{hi:,.2f}</text>"
                f"<text x='{PAD}' y='{H - 2:.1f}'>{html.escape(bs[0]['t'])}"
                "</text>"
                "</svg>"
            )
            parts.append(
                "<details><summary>data table</summary><table>"
                "<tr><th>bucket</th><th>high</th><th>low</th></tr>"
                + "".join(
                    f"<tr><td>{html.escape(b['t'])}</td>"
                    f"<td>{b['hi']:,.2f}</td><td>{b['lo']:,.2f}</td></tr>"
                    for b in bs
                )
                + "</table></details>"
            )
        parts.append("</div>")
    parts.append("<script>")
    parts.append(_JS)
    parts.append("</script></body></html>")
    return "".join(parts)
