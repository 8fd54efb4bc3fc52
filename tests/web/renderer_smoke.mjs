/* Node harness for the renderer-execution tests (zero npm dependencies).
 *
 * Builds a minimal recording DOM/canvas stub, loads the REAL console
 * sources (web/lib/plot.js, radar.js, page modules) plus the real product
 * fixtures (tests/web/fixtures/), and runs the shared test body
 * (renderer_tests.js). Exits non-zero on any failure — run in CI:
 *
 *     node tests/web/renderer_smoke.mjs
 *
 * The same test body runs in a real browser via web/test/renderer_test.html
 * (pixel-readback assertions there; recorded-op assertions here).
 */
import { readFileSync } from "node:fs";
import { dirname, join } from "node:path";
import { fileURLToPath } from "node:url";
import vm from "node:vm";

const HERE = dirname(fileURLToPath(import.meta.url));
const WEB = join(HERE, "..", "..", "web", "lib");

/* ---- DOM stub ---------------------------------------------------------- */

const HOST_RECT = { left: 0, top: 0, width: 800, height: 500 };

class Element {
  constructor(tag) {
    this.tagName = (tag || "div").toUpperCase();
    this.style = {};
    this.childNodes = [];
    this.className = "";
    this.id = "";
    this.textContent = "";
    this.innerHTML = "";
    this.offsetWidth = 40;
    this.__handlers = {};
  }
  appendChild(el) { this.childNodes.push(el); el.parentNode = this; }
  addEventListener(type, fn) {
    (this.__handlers[type] = this.__handlers[type] || []).push(fn);
  }
  removeEventListener() {}
  getBoundingClientRect() { return { ...HOST_RECT }; }
}

class RecordingCtx {
  constructor(canvas) {
    this.canvas = canvas;
    this.__ops = canvas.__ops;
    const record = (name) => (...args) => {
      this.__ops.push([name, ...args.map(
        (a) => (a instanceof Element ? "<canvas>" : a))]);
    };
    for (const m of ["setTransform", "clearRect", "strokeRect", "fillRect",
                     "beginPath", "moveTo", "lineTo", "stroke", "fill",
                     "rect", "clip", "save", "restore", "translate",
                     "rotate", "arc", "drawImage", "putImageData"]) {
      this[m] = record(m);
    }
    this.fillText = (text, x, y) => this.__ops.push(["fillText", text, x, y]);
    this.measureText = (s) => ({ width: String(s).length * 6.5 });
    this.createImageData = (w, h) =>
      ({ width: w, height: h, data: new Uint8ClampedArray(w * h * 4) });
    this.getImageData = (x, y, w, h) =>
      ({ width: w, height: h, data: new Uint8ClampedArray(w * h * 4) });
  }
}

class Canvas extends Element {
  constructor() {
    super("canvas");
    this.width = 0;
    this.height = 0;
    this.__ops = [];
    this.__ctx = new RecordingCtx(this);
  }
  getContext() { return this.__ctx; }
}

const byId = new Map();
const documentStub = {
  documentElement: new Element("html"),
  createElement: (tag) =>
    tag === "canvas" ? new Canvas() : new Element(tag),
  getElementById: (id) => byId.get(id) || null,
  addEventListener() {},
};

const intervals = [];
const windowHandlers = {};

const fixturesDir = join(HERE, "fixtures");
const fixtureText = {};
for (const name of ["map", "detection", "stash_detection", "stash_iqdata",
                    "stash_timing", "config"]) {
  fixtureText[name] = readFileSync(join(fixturesDir, `${name}.json`), "utf8");
}
const fixtures = Object.fromEntries(
  Object.entries(fixtureText).map(([k, v]) => [k, JSON.parse(v)]));

const ROUTES = {
  "/api/map": () => fixtureText.map,
  "/api/detection": () => fixtureText.detection,
  "/api/config": () => fixtureText.config,
  "/api/timestamp": () => String(fixtures.map.timestamp),
  "/api/adsb2dd": () => JSON.stringify({ url: "" }),
  "/stash/detection": () => fixtureText.stash_detection,
  "/stash/iqdata": () => fixtureText.stash_iqdata,
  "/stash/timing": () => fixtureText.stash_timing,
  "/capture": () => "false",
  "/capture/toggle": () => "toggled",
};

function fetchStub(url) {
  const path = String(url).replace(/^(https?:)?\/\/[^/]+/, "");
  const route = ROUTES[path];
  if (!route) {
    return Promise.resolve({ ok: false, status: 404,
                             text: async () => "" });
  }
  return Promise.resolve({ ok: true, status: 200,
                           text: async () => route() });
}

/* window === globalThis, matching browsers */
Object.assign(globalThis, {
  window: globalThis,
  document: documentStub,
  getComputedStyle: () => ({ getPropertyValue: () => "" }),
  ResizeObserver: class { observe() {} disconnect() {} },
  devicePixelRatio: 1,
  location: { hostname: "localhost" },
  fetch: fetchStub,
  setInterval: (fn) => { intervals.push(fn); return intervals.length; },
  clearInterval: () => {},
  addEventListener: (type, fn) => {
    (windowHandlers[type] = windowHandlers[type] || []).push(fn);
  },
});

/* ---- env for the shared test body -------------------------------------- */

function load(file) {
  vm.runInThisContext(readFileSync(join(WEB, file), "utf8"),
                      { filename: file });
}

const env = {
  kind: "node",
  fixtures,
  resetHosts() {
    for (const id of ["data", "status"]) {
      const el = new Element("div");
      el.id = id;
      byId.set(id, el);
    }
    intervals.length = 0;
  },
  async loadPage(file, presets) {
    delete globalThis.DET_MODE;
    delete globalThis.MAP_URL;
    Object.assign(globalThis, presets || {});
    load(file);
    /* let the page's async config handshake settle */
    await new Promise((r) => setTimeout(r, 0));
  },
  dispatch(el, type, props) {
    const ev = { preventDefault() {}, ...props };
    const handlers = el === globalThis
      ? windowHandlers[type] || []
      : el.__handlers[type] || [];
    for (const fn of handlers) fn(ev);
  },
  async flushIntervals() {
    for (const fn of [...intervals]) await fn();
    /* page redraws await fetches internally; settle microtasks */
    await new Promise((r) => setTimeout(r, 0));
  },
  ops(canvas) { return canvas.__ops; },
};

/* ---- run ---------------------------------------------------------------- */

env.resetHosts();
load("plot.js");
load("radar.js");
vm.runInThisContext(readFileSync(join(HERE, "renderer_tests.js"), "utf8"),
                    { filename: "renderer_tests.js" });

const results = await globalThis.runRendererTests(env);
let failed = 0;
for (const r of results) {
  // eslint-disable-next-line no-console
  console.log(`${r.ok ? "ok  " : "FAIL"} ${r.name}` +
              (r.ok ? "" : ` — ${r.detail}`));
  if (!r.ok) failed++;
}
console.log(`${results.length - failed}/${results.length} renderer tests passed`);
process.exit(failed ? 1 : 0);
