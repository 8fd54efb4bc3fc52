/* Minimal dependency-free canvas plotting library for the radar console.
 *
 * Replaces the reference frontend's vendored Plotly (html/lib/plotly-*.js)
 * with a purpose-built renderer for the four forms the console needs:
 * heatmap (sequential magnitude, viridis), scatter overlay (identity),
 * multi-series lines, and a time waterfall. Hover tooltips on every form.
 *
 * Interaction parity with the Plotly frontend (html/js/plot_map.js:56-110
 * gets these as Plotly defaults): wheel zoom about the cursor, drag pan,
 * double-click reset, with axes rescaling to the view. The view persists
 * across the 10 Hz data refresh (setRanges only moves the home view while
 * zoomed) so an operator can stay zoomed on a target.
 */
"use strict";

/* Viridis: perceptually-uniform light->dark sequential colormap
 * (anchor values from the public matplotlib colormap definition). */
const VIRIDIS = [
  [68, 1, 84], [71, 44, 122], [59, 81, 139], [44, 113, 142],
  [33, 144, 141], [39, 173, 129], [92, 200, 99], [170, 220, 50],
  [253, 231, 37],
];

function viridis(t) {
  t = Math.min(1, Math.max(0, t));
  const s = t * (VIRIDIS.length - 1);
  const i = Math.min(VIRIDIS.length - 2, Math.floor(s));
  const f = s - i;
  const a = VIRIDIS[i], b = VIRIDIS[i + 1];
  return [
    Math.round(a[0] + f * (b[0] - a[0])),
    Math.round(a[1] + f * (b[1] - a[1])),
    Math.round(a[2] + f * (b[2] - a[2])),
  ];
}

function cssVar(name, fallback) {
  const v = getComputedStyle(document.documentElement)
    .getPropertyValue(name).trim();
  return v || fallback;
}

const SERIES_COLORS = () => [1, 2, 3, 4, 5, 6, 7, 8].map(
  (i) => cssVar(`--series-${i}`, "#3987e5"));

function niceTicks(lo, hi, n = 6) {
  if (!(isFinite(lo) && isFinite(hi)) || lo === hi) return [lo];
  const span = hi - lo;
  const step0 = span / Math.max(1, n);
  const mag = Math.pow(10, Math.floor(Math.log10(step0)));
  let step = mag;
  for (const m of [1, 2, 2.5, 5, 10]) {
    if (step0 <= m * mag) { step = m * mag; break; }
  }
  const ticks = [];
  for (let v = Math.ceil(lo / step) * step; v <= hi + 1e-9 * span; v += step)
    ticks.push(Math.abs(v) < 1e-12 ? 0 : v);
  return ticks;
}

function fmtTick(v) {
  if (Math.abs(v) >= 1e5 || (v !== 0 && Math.abs(v) < 1e-3))
    return v.toExponential(1);
  return +v.toFixed(3) + "";
}

class Plot {
  /* opts: {xLabel, yLabel, margin} */
  constructor(host, opts = {}) {
    this.host = typeof host === "string" ? document.getElementById(host) : host;
    this.opts = opts;
    this.canvas = document.createElement("canvas");
    this.canvas.className = "plot";
    this.host.appendChild(this.canvas);
    this.tip = document.createElement("div");
    this.tip.className = "viz-tooltip";
    this.host.appendChild(this.tip);
    this.margin = opts.margin || { l: 64, r: 76, b: 46, t: 10 };
    this.layers = [];   // draw + hover probes
    this.xRange = [0, 1];
    this.yRange = [0, 1];
    this.homeX = [0, 1];
    this.homeY = [0, 1];
    this.zoomed = false;
    this._drag = null;
    this._bindEvents();
    new ResizeObserver(() => this.draw()).observe(this.host);
  }

  _bindEvents() {
    this.canvas.addEventListener("mousemove", (e) => {
      const r = this.canvas.getBoundingClientRect();
      const px = e.clientX - r.left, py = e.clientY - r.top;
      if (this._drag) {
        const d = this._drag;
        const dx = this.ix(px) - this.ix(d.px);
        const dy = this.iy(py) - this.iy(d.py);
        this.xRange = [d.xr[0] - dx, d.xr[1] - dx];
        this.yRange = [d.yr[0] - dy, d.yr[1] - dy];
        this.zoomed = true;
        this.tip.style.display = "none";
        this.draw();
        return;
      }
      let text = null;
      for (let i = this.layers.length - 1; i >= 0 && !text; i--) {
        const probe = this.layers[i].probe;
        if (probe) text = probe(px, py, this);
      }
      if (text) {
        this.tip.textContent = text;
        this.tip.style.display = "block";
        const tw = this.tip.offsetWidth;
        this.tip.style.left =
          Math.min(px + 14, r.width - tw - 4) + "px";
        this.tip.style.top = (py + 14) + "px";
      } else {
        this.tip.style.display = "none";
      }
    });
    this.canvas.addEventListener("mouseleave", () => {
      this.tip.style.display = "none";
      this._drag = null;
      this.canvas.style.cursor = "";
    });
    /* wheel: zoom both axes about the cursor (Plotly-parity scroll zoom) */
    this.canvas.addEventListener("wheel", (e) => {
      const r = this.canvas.getBoundingClientRect();
      const px = e.clientX - r.left, py = e.clientY - r.top;
      if (!this.inPlot(px, py)) return;
      /* horizontal-only trackpad scroll must not latch zoomed=true */
      if (e.deltaY === 0) return;
      e.preventDefault();
      const f = Math.exp(Math.sign(e.deltaY) * 0.18);
      this._zoomAbout(this.ix(px), this.iy(py), f);
    }, { passive: false });
    /* drag: pan */
    this.canvas.addEventListener("mousedown", (e) => {
      const r = this.canvas.getBoundingClientRect();
      const px = e.clientX - r.left, py = e.clientY - r.top;
      if (!this.inPlot(px, py)) return;
      this._drag = { px, py, xr: [...this.xRange], yr: [...this.yRange] };
      this.canvas.style.cursor = "grabbing";
    });
    window.addEventListener("mouseup", () => {
      this._drag = null;
      this.canvas.style.cursor = "";
    });
    /* double-click: reset to the data (home) view */
    this.canvas.addEventListener("dblclick", () => this.resetView());
  }

  _zoomAbout(cx, cy, f) {
    const span = (this.xRange[1] - this.xRange[0]) * f;
    const homeSpan = Math.abs(this.homeX[1] - this.homeX[0]) || 1;
    /* clamp: 500x in, 10x out relative to the data view */
    if (span < homeSpan / 500 || span > homeSpan * 10) return;
    this.xRange = [cx - (cx - this.xRange[0]) * f,
                   cx + (this.xRange[1] - cx) * f];
    this.yRange = [cy - (cy - this.yRange[0]) * f,
                   cy + (this.yRange[1] - cy) * f];
    this.zoomed = true;
    this.draw();
  }

  resetView() {
    this.zoomed = false;
    this.xRange = [...this.homeX];
    this.yRange = [...this.homeY];
    this.draw();
  }

  size() {
    const r = this.host.getBoundingClientRect();
    return [Math.max(80, r.width), Math.max(60, r.height)];
  }

  /* data coords -> pixel coords */
  sx(x) {
    const [w] = this.size();
    const { l, r } = this.margin;
    const [lo, hi] = this.xRange;
    return l + (x - lo) / (hi - lo || 1) * (w - l - r);
  }
  sy(y) {
    const [, h] = this.size();
    const { t, b } = this.margin;
    const [lo, hi] = this.yRange;
    return h - b - (y - lo) / (hi - lo || 1) * (h - t - b);
  }
  ix(px) {
    const [w] = this.size();
    const { l, r } = this.margin;
    const [lo, hi] = this.xRange;
    return lo + (px - l) / (w - l - r || 1) * (hi - lo);
  }
  iy(py) {
    const [, h] = this.size();
    const { t, b } = this.margin;
    const [lo, hi] = this.yRange;
    return lo + (h - b - py) / (h - t - b || 1) * (hi - lo);
  }
  inPlot(px, py) {
    const [w, h] = this.size();
    const { l, r, t, b } = this.margin;
    return px >= l && px <= w - r && py >= t && py <= h - b;
  }

  setRanges(xr, yr) {
    /* data (home) view; a user zoom/pan persists across data refreshes */
    this.homeX = [...xr];
    this.homeY = [...yr];
    if (!this.zoomed) { this.xRange = [...xr]; this.yRange = [...yr]; }
  }

  clearLayers() { this.layers = []; }
  addLayer(layer) { this.layers.push(layer); }

  draw() {
    const [w, h] = this.size();
    const dpr = window.devicePixelRatio || 1;
    this.canvas.width = Math.round(w * dpr);
    this.canvas.height = Math.round(h * dpr);
    const ctx = this.canvas.getContext("2d");
    ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
    ctx.clearRect(0, 0, w, h);
    this._axes(ctx, w, h);
    ctx.save();
    const { l, r, t, b } = this.margin;
    ctx.beginPath();
    ctx.rect(l, t, w - l - r, h - t - b);
    ctx.clip();
    for (const layer of this.layers) layer.draw(ctx, this);
    ctx.restore();
    for (const layer of this.layers)
      if (layer.drawOutside) layer.drawOutside(ctx, this);
  }

  _axes(ctx, w, h) {
    const { l, r, t, b } = this.margin;
    const border = cssVar("--border", "#3a3a38");
    const tmut = cssVar("--text-muted", "#8a897f");
    const tsec = cssVar("--text-secondary", "#c3c2b7");
    ctx.strokeStyle = border;
    ctx.lineWidth = 1;
    ctx.strokeRect(l, t, w - l - r, h - t - b);
    ctx.font = "11px system-ui, sans-serif";
    ctx.fillStyle = tmut;
    /* recessive grid + tick labels */
    for (const tx of niceTicks(this.xRange[0], this.xRange[1], 7)) {
      const px = this.sx(tx);
      if (px < l - 0.5 || px > w - r + 0.5) continue;
      ctx.globalAlpha = 0.35;
      ctx.beginPath(); ctx.moveTo(px, t); ctx.lineTo(px, h - b); ctx.stroke();
      ctx.globalAlpha = 1;
      ctx.textAlign = "center"; ctx.textBaseline = "top";
      ctx.fillText(fmtTick(tx), px, h - b + 5);
    }
    for (const ty of niceTicks(this.yRange[0], this.yRange[1], 6)) {
      const py = this.sy(ty);
      if (py < t - 0.5 || py > h - b + 0.5) continue;
      ctx.globalAlpha = 0.35;
      ctx.beginPath(); ctx.moveTo(l, py); ctx.lineTo(w - r, py); ctx.stroke();
      ctx.globalAlpha = 1;
      ctx.textAlign = "right"; ctx.textBaseline = "middle";
      ctx.fillText(fmtTick(ty), l - 6, py);
    }
    ctx.fillStyle = tsec;
    ctx.font = "13px system-ui, sans-serif";
    if (this.opts.xLabel) {
      ctx.textAlign = "center"; ctx.textBaseline = "bottom";
      ctx.fillText(this.opts.xLabel, l + (w - l - r) / 2, h - 4);
    }
    if (this.opts.yLabel) {
      ctx.save();
      ctx.translate(12, t + (h - t - b) / 2);
      ctx.rotate(-Math.PI / 2);
      ctx.textAlign = "center"; ctx.textBaseline = "top";
      ctx.fillText(this.opts.yLabel, 0, 0);
      ctx.restore();
    }
  }
}

/* ---- layers ---------------------------------------------------------- */

/* Heatmap: z[row][col], x per col, y per row; draws an offscreen bitmap
 * then scales it into the plot area. Adds a colorbar in the right margin. */
function heatmapLayer(z, x, y, { zmin, zmax, zLabel = "dB" } = {}) {
  const nr = z.length, nc = nr ? z[0].length : 0;
  if (!nr || !nc) return { draw() {} };
  const off = document.createElement("canvas");
  off.width = nc; off.height = nr;
  const octx = off.getContext("2d");
  const img = octx.createImageData(nc, nr);
  const span = (zmax - zmin) || 1;
  for (let i = 0; i < nr; i++) {
    for (let j = 0; j < nc; j++) {
      const [R, G, B] = viridis((z[i][j] - zmin) / span);
      const k = 4 * (i * nc + j);
      img.data[k] = R; img.data[k + 1] = G; img.data[k + 2] = B;
      img.data[k + 3] = 255;
    }
  }
  octx.putImageData(img, 0, 0);
  const xlo = x[0], xhi = x[x.length - 1];
  const ylo = y[0], yhi = y[y.length - 1];
  return {
    draw(ctx, p) {
      ctx.imageSmoothingEnabled = false;
      const x0 = p.sx(xlo), x1 = p.sx(xhi);
      const y0 = p.sy(yhi), y1 = p.sy(ylo);   /* y axis flips */
      /* pad by half a cell so centers align with axis values */
      const cw = (x1 - x0) / Math.max(1, nc - 1);
      const ch = (y1 - y0) / Math.max(1, nr - 1);
      ctx.drawImage(off, x0 - cw / 2, y0 - ch / 2,
                    (x1 - x0) + cw, (y1 - y0) + ch);
    },
    drawOutside(ctx, p) {
      /* colorbar in right margin */
      const [w, h] = p.size();
      const { t, b } = p.margin;
      const cbX = w - p.margin.r + 14, cbW = 12;
      const cbH = h - t - b;
      for (let i = 0; i < cbH; i++) {
        const [R, G, B] = viridis(1 - i / cbH);
        ctx.fillStyle = `rgb(${R},${G},${B})`;
        ctx.fillRect(cbX, t + i, cbW, 1.5);
      }
      ctx.strokeStyle = cssVar("--border", "#3a3a38");
      ctx.strokeRect(cbX, t, cbW, cbH);
      ctx.fillStyle = cssVar("--text-muted", "#8a897f");
      ctx.font = "10px system-ui, sans-serif";
      ctx.textAlign = "left"; ctx.textBaseline = "middle";
      ctx.fillText(fmtTick(zmax), cbX + cbW + 4, t + 4);
      ctx.fillText(fmtTick(zmin), cbX + cbW + 4, t + cbH - 4);
      ctx.save();
      ctx.translate(cbX + cbW + 8, t + cbH / 2);
      ctx.rotate(-Math.PI / 2);
      ctx.textAlign = "center"; ctx.textBaseline = "top";
      ctx.fillText(zLabel, 0, 0);
      ctx.restore();
    },
    probe(px, py, p) {
      if (!p.inPlot(px, py)) return null;
      const xv = p.ix(px), yv = p.iy(py);
      /* nearest cell */
      let j = 0, best = Infinity;
      for (let k = 0; k < nc; k++) {
        const d = Math.abs(x[k] - xv);
        if (d < best) { best = d; j = k; }
      }
      let i = 0; best = Infinity;
      for (let k = 0; k < nr; k++) {
        const d = Math.abs(y[k] - yv);
        if (d < best) { best = d; i = k; }
      }
      return `x ${fmtTick(x[j])}  y ${fmtTick(y[i])}\n` +
             `${zLabel} ${(+z[i][j]).toFixed(2)}`;
    },
  };
}

/* Scatter: points [{x, y, label?}], one identity color per layer.
 * 2px surface ring so overlapping marks stay separable. */
function scatterLayer(pts, { color, size = 7, name = "", open = false } = {}) {
  return {
    draw(ctx, p) {
      const ring = cssVar("--surface-1", "#1a1a19");
      for (const pt of pts) {
        const px = p.sx(pt.x), py = p.sy(pt.y);
        ctx.beginPath();
        ctx.arc(px, py, size, 0, 2 * Math.PI);
        if (open) {
          ctx.strokeStyle = color; ctx.lineWidth = 2.5; ctx.stroke();
        } else {
          ctx.fillStyle = color; ctx.fill();
          ctx.strokeStyle = ring; ctx.lineWidth = 2; ctx.stroke();
        }
        if (pt.label) {
          ctx.fillStyle = cssVar("--text-secondary", "#c3c2b7");
          ctx.font = "11px system-ui, sans-serif";
          ctx.textAlign = "left"; ctx.textBaseline = "bottom";
          ctx.fillText(pt.label, px + size + 3, py - size - 1);
        }
      }
    },
    probe(px, py, p) {
      for (const pt of pts) {
        const dx = p.sx(pt.x) - px, dy = p.sy(pt.y) - py;
        if (dx * dx + dy * dy <= (size + 4) ** 2) {
          const extra = pt.tip ? `\n${pt.tip}` : "";
          return `${name ? name + "\n" : ""}x ${fmtTick(pt.x)}  ` +
                 `y ${fmtTick(pt.y)}${extra}`;
        }
      }
      return null;
    },
  };
}

/* Line series: series = [{name, color, x:[], y:[]}]; legend + crosshair. */
function lineLayer(series) {
  return {
    draw(ctx, p) {
      for (const s of series) {
        if (!s.x.length) continue;
        ctx.strokeStyle = s.color;
        ctx.lineWidth = 2;
        ctx.beginPath();
        for (let i = 0; i < s.x.length; i++) {
          const px = p.sx(s.x[i]), py = p.sy(s.y[i]);
          if (i === 0) ctx.moveTo(px, py); else ctx.lineTo(px, py);
        }
        ctx.stroke();
      }
    },
    drawOutside(ctx, p) {
      /* horizontal legend above the plot, plus direct end labels (<=4) */
      const { l, t } = p.margin;
      ctx.font = "12px system-ui, sans-serif";
      let x = l;
      for (const s of series) {
        ctx.fillStyle = s.color;
        ctx.fillRect(x, Math.max(2, t - 9), 14, 3);
        ctx.fillStyle = cssVar("--text-secondary", "#c3c2b7");
        ctx.textAlign = "left"; ctx.textBaseline = "middle";
        ctx.fillText(s.name, x + 18, Math.max(3, t - 7));
        x += 28 + ctx.measureText(s.name).width;
      }
    },
    probe(px, py, p) {
      if (!p.inPlot(px, py)) return null;
      const xv = p.ix(px);
      let out = `x ${fmtTick(xv)}`;
      let any = false;
      for (const s of series) {
        if (!s.x.length) continue;
        let best = 0, bd = Infinity;
        for (let i = 0; i < s.x.length; i++) {
          const d = Math.abs(s.x[i] - xv);
          if (d < bd) { bd = d; best = i; }
        }
        const pyv = p.sy(s.y[best]);
        if (Math.abs(pyv - py) < 30) {
          out += `\n${s.name}: ${fmtTick(s.y[best])}`;
          any = true;
        }
      }
      return any ? out : null;
    },
  };
}

window.viz = {
  Plot, heatmapLayer, scatterLayer, lineLayer, viridis,
  SERIES_COLORS, cssVar, niceTicks,
};
