/* Renderer-execution tests for the hand-rolled canvas console
 * (web/lib/plot.js + page modules) — shared between the node smoke
 * (tests/web/renderer_smoke.mjs, run in CI where node exists) and the
 * in-browser harness (web/test/renderer_test.html).
 *
 * Drives the REAL code paths against REAL product documents
 * (tests/web/fixtures/, regenerated from a live app run by
 * tools/gen_web_fixtures.py): draw, hover probe, wheel zoom, drag pan,
 * double-click reset, and each page module end-to-end through its
 * poll-triggered redraw.
 *
 * Environment interface (provided by the harness):
 *   env.kind            'node' | 'browser'
 *   env.fixtures        parsed product docs keyed by fixture name
 *   env.resetHosts()    empty the #data / #status host elements
 *   env.loadPage(file, presets)  (re-)evaluate a web/lib page script
 *   env.dispatch(el, type, props)  deliver a synthetic input event
 *   env.flushIntervals()  run every captured setInterval callback once
 *   env.ops(canvas)     recorded 2d-context ops (node stub) or null
 */
"use strict";

(function () {
  const HOST_W = 800, HOST_H = 500;

  function assert(cond, msg) {
    if (!cond) throw new Error(msg || "assertion failed");
  }
  function close(a, b, tol, msg) {
    assert(Math.abs(a - b) <= tol, `${msg}: ${a} !~ ${b} (tol ${tol})`);
  }

  /* Pixel position of data coords under Plot's default margins, for
   * synthesizing mouse events without reaching into page-module state. */
  function toPix(xr, yr, x, y, margin) {
    const m = margin || { l: 64, r: 76, b: 46, t: 10 };
    const px = m.l + (x - xr[0]) / (xr[1] - xr[0]) * (HOST_W - m.l - m.r);
    const py = HOST_H - m.b -
      (y - yr[0]) / (yr[1] - yr[0]) * (HOST_H - m.t - m.b);
    return [px, py];
  }

  function canvasOf(hostId) {
    const host = document.getElementById(hostId);
    for (const el of host.childNodes || host.children || []) {
      if ((el.tagName || "").toLowerCase() === "canvas") return el;
    }
    /* browser: querySelector path */
    return host.querySelector ? host.querySelector("canvas") : null;
  }
  function tipOf(hostId) {
    const host = document.getElementById(hostId);
    for (const el of host.childNodes || host.children || []) {
      if ((el.className || "").indexOf("viz-tooltip") >= 0) return el;
    }
    return host.querySelector ? host.querySelector(".viz-tooltip") : null;
  }

  function assertDrawn(env, canvas, what) {
    assert(canvas, `${what}: no canvas`);
    if (env.kind === "node") {
      const ops = env.ops(canvas);
      assert(ops.some((o) => o[0] === "drawImage" || o[0] === "fill" ||
                             o[0] === "stroke" || o[0] === "fillRect"),
             `${what}: nothing drawn (${ops.length} ops)`);
    } else {
      const ctx = canvas.getContext("2d");
      let hit = false;
      for (const [fx, fy] of [[0.5, 0.5], [0.3, 0.4], [0.7, 0.6]]) {
        const d = ctx.getImageData(Math.round(canvas.width * fx),
                                   Math.round(canvas.height * fy), 1, 1).data;
        if (d[3] > 0) { hit = true; break; }
      }
      assert(hit, `${what}: plot-interior pixels all transparent`);
    }
  }

  const tests = [];
  function test(name, fn) { tests.push({ name, fn }); }

  /* ---- library-level -------------------------------------------------- */

  test("viridis endpoints and monotone interpolation", async () => {
    const { viridis } = window.viz;
    const lo = viridis(0), hi = viridis(1);
    assert(lo[0] === 68 && lo[1] === 1 && lo[2] === 84, "viridis(0)");
    assert(hi[0] === 253 && hi[1] === 231 && hi[2] === 37, "viridis(1)");
    const mid = viridis(0.5);
    assert(mid.every((c) => c >= 0 && c <= 255), "mid in range");
    assert(viridis(-5)[0] === 68 && viridis(5)[0] === 253, "clamped");
  });

  test("niceTicks covers the range with round steps", async () => {
    const { niceTicks } = window.viz;
    const t = niceTicks(0, 10, 6);
    assert(t[0] === 0 && t[t.length - 1] === 10, "endpoints: " + t);
    for (let i = 1; i < t.length; i++) assert(t[i] > t[i - 1], "ascending");
    const t2 = niceTicks(-203.7, 203.7, 6);
    assert(t2.includes(0), "zero tick present");
    assert(niceTicks(5, 5).length === 1, "degenerate range");
  });

  test("Plot pixel<->data transforms round-trip and clip", async () => {
    env.resetHosts();
    const p = new window.viz.Plot("data", { xLabel: "x", yLabel: "y" });
    p.setRanges([0, 100], [-200, 200]);
    for (const v of [0, 37.5, 100]) close(p.ix(p.sx(v)), v, 1e-9, "x rt");
    for (const v of [-200, 13, 200]) close(p.iy(p.sy(v)), v, 1e-9, "y rt");
    assert(p.inPlot(p.sx(50), p.sy(0)), "centre in plot");
    assert(!p.inPlot(2, 2), "corner outside");
  });

  test("wheel zoom about cursor, drag pan, double-click reset", async () => {
    env.resetHosts();
    const p = new window.viz.Plot("data", {});
    p.setRanges([0, 100], [-200, 200]);
    p.draw();
    const canvas = canvasOf("data");
    const [cx, cy] = [p.sx(25), p.sy(0)];
    env.dispatch(canvas, "wheel", { clientX: cx, clientY: cy, deltaY: -120 });
    assert(p.zoomed, "zoomed flag set");
    const span = p.xRange[1] - p.xRange[0];
    close(span, 100 * Math.exp(-0.18), 1e-6, "zoom-in span");
    close(p.ix(cx), 25, 1e-6, "cursor-anchored zoom");
    /* horizontal-only scroll must not zoom */
    const before = [...p.xRange];
    env.dispatch(canvas, "wheel", { clientX: cx, clientY: cy, deltaY: 0 });
    close(p.xRange[0], before[0], 1e-12, "deltaY=0 ignored");
    /* drag pan: 40 px right moves the view left in data space */
    const x0 = p.xRange[0];
    env.dispatch(canvas, "mousedown", { clientX: cx, clientY: cy });
    env.dispatch(canvas, "mousemove", { clientX: cx + 40, clientY: cy });
    assert(p.xRange[0] < x0, `pan moved view: ${p.xRange[0]} < ${x0}`);
    env.dispatch(window, "mouseup", {});
    /* data refresh while zoomed must not reset the view */
    p.setRanges([0, 100], [-200, 200]);
    assert(p.zoomed && p.xRange[1] - p.xRange[0] < 100,
           "zoom persists across setRanges");
    env.dispatch(canvas, "dblclick", {});
    assert(!p.zoomed, "reset clears zoom");
    close(p.xRange[0], 0, 1e-12, "home x restored");
    close(p.xRange[1], 100, 1e-12, "home x hi restored");
  });

  test("heatmap layer draws and probes the fixture map", async () => {
    env.resetHosts();
    const m = env.fixtures.map;
    const p = new window.viz.Plot("data", {});
    p.setRanges([m.delay[0], m.delay[m.delay.length - 1]],
                [m.doppler[0], m.doppler[m.doppler.length - 1]]);
    const layer = window.viz.heatmapLayer(m.data, m.delay, m.doppler,
                                          { zmin: 0, zmax: m.maxPower });
    p.addLayer(layer);
    p.draw();
    assertDrawn(env, canvasOf("data"), "heatmap");
    /* probe at the map's peak cell must report its dB value */
    let bi = 0, bj = 0, bv = -Infinity;
    for (let i = 0; i < m.data.length; i++)
      for (let j = 0; j < m.data[i].length; j++)
        if (m.data[i][j] > bv) { bv = m.data[i][j]; bi = i; bj = j; }
    const text = layer.probe(p.sx(m.delay[bj]), p.sy(m.doppler[bi]), p);
    assert(text && text.indexOf(bv.toFixed(2)) >= 0,
           `probe text "${text}" lacks ${bv.toFixed(2)}`);
  });

  /* ---- page modules end-to-end ---------------------------------------- */

  test("map page: fetch -> heatmap + detection overlay -> hover tooltip",
       async () => {
    env.resetHosts();
    await env.loadPage("page_map.js", {});
    await env.flushIntervals();
    const canvas = canvasOf("data");
    assertDrawn(env, canvas, "map page");
    /* hover on the first detection -> identity tooltip with SNR */
    const m = env.fixtures.map, d = env.fixtures.detection;
    const xr = [m.delay[0], m.delay[m.delay.length - 1]];
    const yr = [m.doppler[0], m.doppler[m.doppler.length - 1]];
    const [px, py] = toPix(xr, yr, d.delay[0], d.doppler[0]);
    env.dispatch(canvas, "mousemove", { clientX: px, clientY: py });
    const tip = tipOf("data");
    assert(tip && tip.style.display === "block", "tooltip visible");
    const tiptext = tip.textContent || "";
    assert(tiptext.indexOf("snr") >= 0, `tooltip "${tiptext}" lacks snr`);
    assert(tiptext.indexOf("detection") >= 0, "tooltip names the layer");
    /* hover far from any detection but inside the map: heatmap tooltip */
    const [hx, hy] = toPix(xr, yr, (xr[0] + xr[1]) / 2, yr[0] * 0.9);
    env.dispatch(canvas, "mousemove", { clientX: hx, clientY: hy });
    assert((tip.textContent || "").indexOf("dB") >= 0, "heatmap tooltip");
    /* leave: tooltip hides */
    env.dispatch(canvas, "mouseleave", {});
    assert(tip.style.display === "none", "tooltip hidden on leave");
  });

  test("timing page: per-stage line series with legend", async () => {
    env.resetHosts();
    await env.loadPage("page_timing.js", {});
    await env.flushIntervals();
    const canvas = canvasOf("data");
    assertDrawn(env, canvas, "timing page");
    if (env.kind === "node") {
      const texts = env.ops(canvas).filter((o) => o[0] === "fillText")
        .map((o) => o[1]);
      for (const key of ["ambiguity_processing", "cpi", "latency"])
        assert(texts.includes(key), `legend lacks ${key}`);
      assert(!texts.includes("timestamp") && !texts.includes("uptime_s"),
             "meta keys filtered from legend");
      assert(texts.includes("Stage time (ms)"), "y label drawn");
    }
  });

  test("spectrum page: waterfall heatmap from stash rows", async () => {
    env.resetHosts();
    await env.loadPage("page_spectrum.js", {});
    await env.flushIntervals();
    assertDrawn(env, canvasOf("data"), "spectrum page");
  });

  test("detection page (delay-doppler): age-tipped scatter", async () => {
    env.resetHosts();
    await env.loadPage("page_detection.js", { DET_MODE: "delay-doppler" });
    await env.flushIntervals();
    const canvas = canvasOf("data");
    assertDrawn(env, canvas, "detection page");
    const s = env.fixtures.stash_detection;
    const xr = [Math.min.apply(null, s.delay),
                Math.max.apply(null, s.delay)];
    const yr = [Math.min.apply(null, s.doppler),
                Math.max.apply(null, s.doppler)];
    const pad = ([lo, hi]) => {
      const m = (hi - lo || 1) * 0.05;
      return [lo - m, hi + m];
    };
    const [px, py] = toPix(pad(xr), pad(yr), s.delay[0], s.doppler[0]);
    env.dispatch(canvas, "mousemove", { clientX: px, clientY: py });
    const tip = tipOf("data");
    assert(tip && tip.style.display === "block", "tooltip visible");
    assert((tip.textContent || "").indexOf("s ago") >= 0,
           `age tip: "${tip.textContent}"`);
  });

  /* ---- runner --------------------------------------------------------- */

  let env = null;
  window.runRendererTests = async function (theEnv) {
    env = theEnv;
    const results = [];
    for (const t of tests) {
      try {
        await t.fn();
        results.push({ name: t.name, ok: true });
      } catch (e) {
        results.push({ name: t.name, ok: false,
                       detail: String(e && e.message || e) });
      }
    }
    window.__RESULTS__ = results;
    return results;
  };
})();
