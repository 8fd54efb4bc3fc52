/* Reference-channel spectrum waterfall (reference html/js/plot_spectrum.js):
 * /stash/iqdata rows = last 20 CPIs of the decimated dB spectrum. */
"use strict";

(function () {
  const { Plot, heatmapLayer } = window.viz;
  const { apiBase, getJSON, pollOnTimestamp, installCaptureToggle } =
    window.radar;

  const plot = new Plot("data", {
    xLabel: "Frequency (MHz)",
    yLabel: "Age (CPIs)",
  });

  async function redraw() {
    const d = await getJSON(apiBase() + "/stash/iqdata");
    if (!d || !d.spectrum || !d.spectrum.length) return;
    /* frequency is stored per CPI row; use the latest row's axis */
    const freqRow = Array.isArray(d.frequency[0])
      ? d.frequency[d.frequency.length - 1] : d.frequency;
    const freqMHz = freqRow.map((f) => f / 1000);  /* kHz -> MHz */
    const rows = d.spectrum;
    const y = rows.map((_, i) => i - rows.length + 1);  /* oldest negative */
    let zmin = Infinity, zmax = -Infinity;
    for (const row of rows)
      for (const v of row) {
        if (v < zmin) zmin = v;
        if (v > zmax) zmax = v;
      }
    plot.setRanges(
      [freqMHz[0], freqMHz[freqMHz.length - 1]],
      [y[0], y[y.length - 1]]);
    plot.clearLayers();
    plot.addLayer(heatmapLayer(rows, freqMHz, y,
                               { zmin, zmax, zLabel: "dB" }));
    plot.draw();
  }

  pollOnTimestamp(redraw);
  installCaptureToggle(document.getElementById("status"));
})();
