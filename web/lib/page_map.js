/* Delay-Doppler map page (also serves maxhold via window.MAP_URL).
 *
 * Equivalent of reference html/js/plot_map.js: viridis heatmap of the map
 * product, latest detections as an identity scatter overlay, optional ADS-B
 * truth overlay (open markers + flight labels) when truth.adsb is enabled
 * in the served config.
 */
"use strict";

(function () {
  const { Plot, heatmapLayer, scatterLayer, cssVar } = window.viz;
  const { apiBase, getJSON, pollOnTimestamp, installCaptureToggle } =
    window.radar;

  const mapPath = window.MAP_URL || "/api/map";
  const plot = new Plot("data", {
    xLabel: "Bistatic range (km)",
    yLabel: "Bistatic Doppler (Hz)",
  });

  let detection = { delay: [], doppler: [], snr: [] };
  let adsb = [];
  let adsbUrl = null;

  /* truth overlay setup (reference plot_map.js config/adsb2dd handshake) */
  (async () => {
    try {
      const cfg = await getJSON(apiBase() + "/api/config");
      if (cfg.truth && cfg.truth.adsb && cfg.truth.adsb.enabled === true) {
        const link = await getJSON(apiBase() + "/api/adsb2dd");
        adsbUrl = link.url;
      }
    } catch (e) { /* no truth */ }
  })();

  async function redraw() {
    const data = await getJSON(apiBase() + mapPath);
    if (!data || !data.data) return;
    try {
      detection = await getJSON(apiBase() + "/api/detection");
    } catch (e) { detection = { delay: [], doppler: [], snr: [] }; }
    if (adsbUrl) {
      try {
        const truth = await getJSON(adsbUrl);
        adsb = Object.values(truth)
          .filter((a) => "doppler" in a)
          .map((a) => ({ x: a.delay, y: a.doppler, label: a.flight }));
      } catch (e) { adsb = []; }
    }

    plot.setRanges(
      [data.delay[0], data.delay[data.delay.length - 1]],
      [data.doppler[0], data.doppler[data.doppler.length - 1]]);
    plot.clearLayers();
    plot.addLayer(heatmapLayer(data.data, data.delay, data.doppler, {
      zmin: 0,
      zmax: Math.max(13, data.maxPower),
      zLabel: "SNR (dB)",
    }));
    const dets = (detection.delay || []).map((d, i) => ({
      x: d,
      y: detection.doppler[i],
      tip: detection.snr ? `snr ${(+detection.snr[i]).toFixed(1)} dB` : "",
    }));
    plot.addLayer(scatterLayer(dets, {
      color: cssVar("--series-8", "#e66767"),
      name: "detection",
    }));
    if (adsb.length) {
      plot.addLayer(scatterLayer(adsb, {
        color: cssVar("--text-primary", "#ffffff"),
        name: "ADS-B truth",
        open: true,
      }));
    }
    plot.draw();
  }

  pollOnTimestamp(redraw);
  installCaptureToggle(document.getElementById("status"));
})();
