/* Per-stage timing display (reference html/js/plot_timing.js + stash):
 * /stash/timing rows = last 20 CPIs of per-stage wall times; one line per
 * stage, categorical slots in fixed order, legend above the plot. */
"use strict";

(function () {
  const { Plot, lineLayer, SERIES_COLORS } = window.viz;
  const { apiBase, getJSON, pollOnTimestamp, installCaptureToggle } =
    window.radar;

  const plot = new Plot("data", {
    xLabel: "Time (s ago)",
    yLabel: "Stage time (ms)",
    margin: { l: 64, r: 76, b: 46, t: 26 },
  });

  async function redraw() {
    const d = await getJSON(apiBase() + "/stash/timing");
    if (!d || !d.timestamp || !d.timestamp.length) return;
    const now = Math.max(...d.timestamp);
    const age = d.timestamp.map((t) => -(now - t) / 1000);
    const colors = SERIES_COLORS();
    const stageNames = Object.keys(d)
      .filter((k) => k !== "timestamp" && k !== "nCpi"
                  && !k.startsWith("uptime"));
    const series = stageNames.map((name, i) => ({
      name,
      color: colors[i % colors.length],
      x: age,
      y: d[name],
    }));
    let ymax = 1;
    for (const s of series)
      for (const v of s.y) if (v > ymax) ymax = v;
    plot.setRanges([Math.min(...age, -1), 0], [0, ymax * 1.08]);
    plot.clearLayers();
    plot.addLayer(lineLayer(series));
    plot.draw();
  }

  pollOnTimestamp(redraw, 500);
  installCaptureToggle(document.getElementById("status"));
})();
