/* Shared console logic: API routing, change-driven polling, capture toggle.
 *
 * Mirrors the reference frontend contract (html/js/common.js + plot_map.js
 * polling loop + control.js spacebar handler): poll /api/timestamp at 10 Hz
 * and refetch products only when it changes; private/localhost hosts talk to
 * the API on port 3000, public hosts go through the reverse proxy on the
 * same origin.
 */
"use strict";

function isPrivateHost(host) {
  if (host === "localhost" || host === "") return true;
  const m = host.match(/^(\d+)\.(\d+)\.(\d+)\.(\d+)$/);
  if (!m) return false;
  const [a, b] = [+m[1], +m[2]];
  return a === 127 || a === 10 || (a === 192 && b === 168) ||
         (a === 172 && b >= 16 && b <= 31);
}

function apiBase() {
  const host = window.location.hostname || "localhost";
  return isPrivateHost(host)
    ? `//${host}:3000`
    : `//${host}`;
}

async function getJSON(url) {
  const resp = await fetch(url, { cache: "no-store" });
  if (!resp.ok) throw new Error(`${url}: ${resp.status}`);
  const text = await resp.text();
  if (!text) throw new Error(`${url}: empty`);
  return JSON.parse(text);
}

async function getText(url) {
  const resp = await fetch(url, { cache: "no-store" });
  if (!resp.ok) throw new Error(`${url}: ${resp.status}`);
  return resp.text();
}

/* Poll /api/timestamp every `intervalMs`; invoke onChange(ts) only when it
 * moves. onChange may be async; overlapping updates are skipped. */
function pollOnTimestamp(onChange, intervalMs = 100) {
  let last = null;
  let busy = false;
  return setInterval(async () => {
    if (busy) return;
    busy = true;
    try {
      const ts = await getText(apiBase() + "/api/timestamp");
      if (ts && ts !== last) {
        last = ts;
        await onChange(ts);
      }
    } catch (e) { /* radar not up yet */ }
    busy = false;
  }, intervalMs);
}

/* Spacebar toggles IQ recording (reference html/control.js). */
function installCaptureToggle(statusEl) {
  async function refresh() {
    if (!statusEl) return;
    try {
      const on = await getJSON(apiBase() + "/capture");
      statusEl.innerHTML = on
        ? '<span class="rec">&#9679; RECORDING</span> (space to stop)'
        : "space toggles IQ recording";
    } catch (e) { /* ignore */ }
  }
  document.addEventListener("keypress", async (e) => {
    if (e.which === 32 || e.key === " ") {
      try {
        await getText(apiBase() + "/capture/toggle");
      } catch (err) { console.log("capture toggle failed", err); }
      refresh();
    }
  });
  refresh();
}

window.radar = {
  apiBase, getJSON, getText, pollOnTimestamp, installCaptureToggle,
  isPrivateHost,
};
