/* Detection-history pages (reference html/js/plot_detection.js).
 *
 * window.DET_MODE selects the projection of /stash/detection:
 *   "delay"         — detections in bistatic range over time
 *   "doppler"       — detections in Doppler over time
 *   "delay-doppler" — range vs Doppler, age-faded
 */
"use strict";

(function () {
  const { Plot, scatterLayer, cssVar } = window.viz;
  const { apiBase, getJSON, pollOnTimestamp, installCaptureToggle } =
    window.radar;

  const mode = window.DET_MODE || "delay";
  const axisTitle = {
    delay: "Bistatic range (km)",
    doppler: "Bistatic Doppler (Hz)",
  };
  const opts = mode === "delay-doppler"
    ? { xLabel: axisTitle.delay, yLabel: axisTitle.doppler }
    : { xLabel: "Time (s ago)", yLabel: axisTitle[mode] };
  const plot = new Plot("data", opts);

  async function redraw() {
    const d = await getJSON(apiBase() + "/stash/detection");
    if (!d || !d.timestamp || !d.timestamp.length) return;
    const now = Math.max(...d.timestamp);
    const age = d.timestamp.map((t) => (now - t) / 1000);
    let pts, xr, yr;
    if (mode === "delay-doppler") {
      pts = d.delay.map((x, i) => ({
        x, y: d.doppler[i], tip: `${age[i].toFixed(1)} s ago`,
      }));
      xr = extent(d.delay); yr = extent(d.doppler);
    } else {
      const vals = mode === "delay" ? d.delay : d.doppler;
      pts = vals.map((v, i) => ({ x: -age[i], y: v }));
      xr = [-300, 0]; yr = extent(vals);
    }
    plot.setRanges(pad(xr), pad(yr));
    plot.clearLayers();
    plot.addLayer(scatterLayer(pts, {
      color: cssVar("--series-1", "#3987e5"),
      size: 5,
      name: "detection",
    }));
    plot.draw();
  }

  function extent(a) {
    if (!a.length) return [0, 1];
    return [Math.min(...a), Math.max(...a)];
  }
  function pad([lo, hi]) {
    const m = (hi - lo || 1) * 0.05;
    return [lo - m, hi + m];
  }

  pollOnTimestamp(redraw, 1000);
  installCaptureToggle(document.getElementById("status"));
})();
