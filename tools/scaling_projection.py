"""Calibrated multi-chip scaling projection (SCALING_r04).

The virtual-CPU sweeps of r2/r3 measured host oversubscription, not the
design (their own notes disclaimed them). Real multi-chip hardware is not
reachable from this host, so this tool builds the best available proxy: a
per-mesh-shape step-time model whose every term is either MEASURED or a
stated public-hardware assumption — replacing noise with a calibrated,
auditable projection (VERDICT r3 "next" #3).

Model, per (cpi=C, pulse=P) mesh of N = C·P chips, one CPI per rank per
step (B = C):

    t_step(C, P) = t_rank(P) + t_comm(C, P) + t_fix
    eff(C, P)    = t1 / (P · t_step)        # throughput / (N · single-chip)

- ``t_rank(P)``: MEASURED on the real chip (``--measure``): the fused
  pipeline compiled at the per-rank pulse-shard geometry (n_samples/P —
  the pulse axis splits the correlation/FFT work; Doppler/delay output
  dims unchanged), timed data-resident with the queued-execution protocol
  of tools/probe_stage_compute.py so the tunnel round trip is excluded.
  Proxy caveat: the true sharded per-rank program pads segments for halos
  (slightly MORE work than n/P), so this proxy is mildly optimistic
  per-rank; the halo padding fraction ((nb-1)/(n/P)) is reported so the
  reader can bound it.
- ``t_comm``: the per-rank collective bytes of the ANALYTIC model in
  docs/comm_model.md — the same closed forms that
  tests/test_collective_bytes.py pins against the compiled HLO on the
  virtual mesh, cross-checked here against COMMSTATS_r03.json — divided
  by the stated ICI bandwidth, plus a per-collective latency charge.
- ``t_fix``: per-program launch overhead on a direct-attached host
  (assumption; the ~24 ms tunnel RTT of THIS dev host is deliberately
  excluded — it is a transport artifact, PROBE_STAGE_r03).

Assumptions (also embedded in the artifact):
  ICI_BW   = 4.5e10 B/s  per-direction per-link v5e ICI (public v5e specs
             quote 1600 Gbps aggregate interconnect per chip across 4
             links; one link direction ≈ 50 GB/s — 45 used, conservative,
             and collectives are charged as if riding ONE link).
  ICI_LAT  = 5e-6 s      per collective (conservative hop latency).
  T_FIX    = 2e-4 s      per-step launch overhead, direct-attach.

Usage:
  python tools/scaling_projection.py --measure          # on the TPU
  python tools/scaling_projection.py                    # model-only
Writes SCALING_r04.json (or --out).
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

ICI_BW = 4.5e10
ICI_LAT = 5e-6
T_FIX = 2e-4

# Sensitivity corners (VERDICT r4 weak #5: point estimates on one guess
# carry no band). Pessimistic = ICI bandwidth halved AND latency 10x;
# optimistic = bandwidth doubled, latency nominal.
CORNERS = {
    "nominal": (1.0, 1.0),
    "pessimistic_bw/2_lat_x10": (0.5, 10.0),
    "optimistic_bw_x2": (2.0, 1.0),
}

# 2-host DCN assumptions (conservative public-hardware figures): one
# 100 Gbps NIC per host effective for collectives, 50 us per collective.
DCN_BW = 1.25e10
DCN_LAT = 5e-5

# Mesh cells to project: (cpi, pulse). N = c*p up to 8 (one v5e host's
# slice); the shapes match MULTICHIP/dryrun coverage.
CELLS = [(1, 1), (2, 1), (1, 2), (2, 2), (4, 1), (1, 4), (4, 2), (2, 4),
         (8, 1), (1, 8)]

# Two-host cells (16 chips): (cpi, pulse, crossing). "cpi" crossing =
# the batch axis spans hosts (the DESIGNED deployment: designed per-CPI
# collectives all ride the pulse axis inside a host; DCN carries only
# product egress). "pulse" crossing = the pulse ring itself crosses DCN
# (the anti-pattern cell, charged at DCN bandwidth/latency) — shown to
# quantify WHY the config keeps the pulse axis within a host.
DCN_CELLS = [(2, 8, "cpi"), (16, 1, "cpi"), (1, 16, "pulse")]


def comm_model(cfg, pipe, c_axis: int, p_axis: int) -> dict:
    """Per-rank per-CPI collective bytes — closed forms of
    docs/comm_model.md (validated vs HLO in test_collective_bytes).
    Complex64 = 8 B/element. All designed collectives ride the pulse
    axis; a pulse axis of 1 has none."""
    if p_axis == 1:
        return {"bytes_per_rank": 0, "n_collectives": 0, "detail": {}}

    from blah2_tpu.dsp.hamming import next_tpu_fft_size
    from blah2_tpu.parallel.sharded import pick_local_segments

    amb = pipe.ambiguity
    n = cfg.n_samples
    nb = cfg.process.clutter.delay_max - cfg.process.clutter.delay_min
    block_len = (-(-n // p_axis))
    n_seg_local = pick_local_segments(block_len, nb)
    seg_len = block_len // n_seg_local
    nfft_seg = next_tpu_fft_size(seg_len + nb - 1)
    n_delay = amb.n_delay_bins
    nd = amb.n_doppler_bins
    nd_pad = -(-nd // p_axis) * p_axis
    ns = pipe.spectrum.n_spectrum
    detail = {
        "halo_permutes": 3 * (nb - 1) * 8 + abs(
            cfg.process.clutter.delay_min) * 8,
        "clutter_psum": 2 * nfft_seg * 8,
        "doppler_psum_scatter": nd_pad * n_delay * 8 // p_axis,
        "spectrum_fold_psum": ns * 8,
    }
    return {
        "bytes_per_rank": int(sum(detail.values())),
        "n_collectives": 4 + 3,  # 4 permutes + 3 reductions
        "detail": detail,
    }


def measure_rank_compute(p_values, n_rep: int = 10) -> dict:
    """Fused data-resident compute at per-rank geometries n/P (queued
    protocol, adjacently-measured tunnel RTT excluded).

    All P values are measured in INTERLEAVED rounds within the same
    minutes, so multi-tenant tunnel drift hits every P equally — the r4
    per-P sequential measurement let one throttled minute skew a single
    P and with it every efficiency derived from its ratio to t1."""
    import jax
    import jax.numpy as jnp

    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _default_config
    from blah2_tpu.dsp.pipeline import CpiPipeline

    null = jax.jit(lambda v: v + 1.0)
    z8 = jnp.zeros(8, jnp.float32)
    np.asarray(null(z8))

    def null_rt() -> float:
        t0 = time.perf_counter()
        np.asarray(null(z8)[:1])
        return (time.perf_counter() - t0) * 1e3

    out = {"round_trip_ms": round(null_rt(), 2), "per_rank_fused_ms": {},
           "per_rank_rounds_ms": {}, "per_rank_geometry": {}}
    base = _default_config()
    fs, cpi = base.capture.fs, base.process.data.cpi
    rng = np.random.default_rng(0)

    # Phase 1: build + warm every per-P program (compiles load from the
    # persistent cache; a fresh geometry compiles remotely ONCE, outside
    # the timed rounds).
    pipes = {}
    for P in p_values:
        cfg = _default_config(fs=fs, cpi=cpi / P)
        # linear (segmented, shard-decomposable) clutter kernels — the
        # ones the sharded per-rank program actually runs. The circular
        # reference-exact mode does one full-length FFT whose size at
        # n/P can fall off the TPU FFT cliff — a proxy artifact the
        # sharded design never hits.
        pipe = CpiPipeline(cfg, clutter_mode="linear")
        n = cfg.n_samples
        c1 = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
              ).astype(np.complex64)
        c2 = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
              ).astype(np.complex64)
        xp = jax.device_put(pipe.to_planes(c1, pipe._plane_dtype))
        yp = jax.device_put(pipe.to_planes(c2, pipe._plane_dtype))
        np.asarray(jnp.ravel(xp)[:1])
        np.asarray(pipe._fn(xp, yp).noise_power)  # compile + warm
        pipes[P] = (pipe, xp, yp)
        out["per_rank_geometry"][P] = {
            "n": n, "n_doppler": pipe.ambiguity.n_doppler_bins,
            "nfft_compute": pipe.ambiguity.nfft_compute,
            "nfft_corr": pipe.clutter.nfft_corr if pipe.clutter else None}
        print(f"P={P}: n={n} warm", flush=True)

    # Phase 2: interleaved timed rounds. Queue depth scales with P (work
    # shrinks ~1/P) with a floor of 24, so every P's timed queue sits
    # well above the round trip's throttle variance; the baseline is the
    # adjacent min-of-3 floor and non-positive rounds are excluded (all
    # non-positive -> raw upper bound, flagged suspect) — a negative
    # per-rank time must never flow silently into the artifact.
    rounds = {P: [] for P in p_values}
    raws = {P: [] for P in p_values}
    depth = {P: min(120, max(24, n_rep * max(1, P))) for P in p_values}
    for _ in range(5):
        for P in p_values:
            pipe, xp, yp = pipes[P]
            rt = min(null_rt() for _ in range(3))
            t0 = time.perf_counter()
            o = None
            for _ in range(depth[P]):
                o = pipe._fn(xp, yp)
            np.asarray(o.noise_power)
            wall = (time.perf_counter() - t0) * 1e3
            rounds[P].append((wall - rt) / depth[P])
            raws[P].append(wall / depth[P])
    out["suspect_p"] = []
    for P in p_values:
        pos = [v for v in rounds[P] if v > 0]
        if pos:
            out["per_rank_fused_ms"][P] = round(float(np.median(pos)), 3)
        else:
            out["per_rank_fused_ms"][P] = round(
                float(np.median(raws[P])), 3)
            out["suspect_p"].append(P)
        out["per_rank_rounds_ms"][P] = [round(v, 3) for v in rounds[P]]
        print(f"P={P}: fused {out['per_rank_fused_ms'][P]} ms "
              f"(depth {depth[P]}, rounds {out['per_rank_rounds_ms'][P]})",
              flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="measure per-rank compute on the real chip "
                         "(otherwise: PROBE_STAGE_r03 t1 with ideal 1/P "
                         "split, flagged as unmeasured)")
    ap.add_argument("--out", default="SCALING_r05.json")
    ap.add_argument("--n-rep", type=int, default=10)
    args = ap.parse_args()

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

    # t1 anchor from the r3 queued-execution probe (re-measured live when
    # --measure, as the P=1 row).
    with open(_os.path.join(repo, "PROBE_STAGE_r03.json")) as f:
        probe = json.load(f)["result"]
    t1_ms = probe["fused_ms"]

    p_values = sorted({p for _, p in CELLS} |
                      {p for _, p, _ in DCN_CELLS})
    if args.measure:
        meas = measure_rank_compute(p_values, args.n_rep)
        t_rank_ms = {int(k): v for k, v in meas["per_rank_fused_ms"].items()}
        t1_ms = t_rank_ms.get(1, t1_ms)
        calibration = {"mode": "measured", **meas}
    else:
        t_rank_ms = {P: t1_ms / P for P in p_values}
        calibration = {"mode": "ideal-1/P (UNMEASURED; run --measure on "
                               "the chip)", "t1_ms": t1_ms}

    # Geometry handles for the comm model (CPU-safe: no device work).
    import jax

    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _default_config
    from blah2_tpu.dsp.pipeline import CpiPipeline

    cfg = _default_config()
    pipe = CpiPipeline(cfg)
    n = cfg.n_samples
    nb = cfg.process.clutter.delay_max - cfg.process.clutter.delay_min

    # Cross-check the analytic comm model against the HLO-measured r3
    # artifact where cells overlap.
    measured_cells = {}
    try:
        with open(_os.path.join(repo, "COMMSTATS_r03.json")) as f:
            for cell in json.load(f)["cells"]:
                if cell.get("row_shard"):
                    measured_cells[cell["mesh"]] = cell
    except OSError:
        pass

    # Output-gather charge for cells the HLO artifact does not cover:
    # GSPMD gathers the (row-sharded) map + dB + detections for product
    # emission; the measured 2x4 all-gather is ~1.65 MB/rank, matching
    # map complex + dB f32 (nd*n_delay*(8+4) ~ 1.5 MB). Charged flat per
    # rank per CPI on every N>1 cell.
    amb = pipe.ambiguity
    out_gather_est = amb.n_doppler_bins * amb.n_delay_bins * 12

    def cell_row(c_axis, p_axis, crossing=None):
        N = c_axis * p_axis
        comm = comm_model(cfg, pipe, c_axis, p_axis)
        key = f"{c_axis}x{p_axis}"
        if crossing is None and key in measured_cells:
            # HLO-audited total for this exact cell (incl. output
            # gathers) — prefer measurement over the model.
            bytes_rank = measured_cells[key]["total_bytes_per_rank"]
            n_coll = sum(k["count"] for k in
                         measured_cells[key]["by_kind"].values())
            src = "hlo-measured"
        else:
            bytes_rank = comm["bytes_per_rank"] + (
                out_gather_est if N > 1 else 0)
            n_coll = comm["n_collectives"] + (2 if N > 1 else 0)
            src = "analytic+output-estimate"
        if p_axis not in t_rank_ms:
            return None
        t_rank_s = t_rank_ms[p_axis] / 1e3
        # Per-corner step time: scale the collective-transport terms.
        effs, steps = {}, {}
        for corner, (bw_f, lat_f) in CORNERS.items():
            if crossing == "pulse":
                # The pulse ring crosses DCN: every collective is gated
                # by the DCN hop (conservative: full bytes at DCN rate).
                t_comm = bytes_rank / (DCN_BW * bw_f) + \
                    n_coll * DCN_LAT * lat_f
            else:
                t_comm = bytes_rank / (ICI_BW * bw_f) + \
                    n_coll * ICI_LAT * lat_f
                if crossing == "cpi":
                    # Batch axis across hosts: designed per-CPI
                    # collectives stay on ICI; DCN carries only product
                    # egress (~map+dB bytes per host per CPI, charged at
                    # DCN rate — it overlaps compute in the runtime but
                    # is charged serially here, conservative).
                    t_comm += out_gather_est / (DCN_BW * bw_f) + \
                        DCN_LAT * lat_f
            t_step = t_rank_s + t_comm + T_FIX
            steps[corner] = t_step
            effs[corner] = (t1_ms / 1e3) / (p_axis * t_step)
        t_step_s = steps["nominal"]
        thr = c_axis * n / t_step_s
        return {
            "mesh": key + (f" ({crossing}-axis across DCN, 2 hosts)"
                           if crossing else ""),
            "devices": N,
            "t_rank_ms": round(t_rank_s * 1e3, 3),
            "t_comm_us": round((t_step_s - t_rank_s - T_FIX) * 1e6, 1),
            "t_step_ms": round(t_step_s * 1e3, 3),
            "throughput_msps": round(thr / 1e6, 1),
            "efficiency": round(effs["nominal"], 3),
            "efficiency_corners": {k: round(v, 3) for k, v in effs.items()},
            "comm_bytes_per_rank": int(bytes_rank),
            "comm_bytes_source": src,
            "designed_collective_bytes": comm["bytes_per_rank"],
        }

    rows = []
    for c_axis, p_axis in CELLS:
        if c_axis * p_axis > 8:
            continue
        row = cell_row(c_axis, p_axis)
        if row:
            rows.append(row)
    for c_axis, p_axis, crossing in DCN_CELLS:
        row = cell_row(c_axis, p_axis, crossing)
        if row:
            rows.append(row)

    art = {
        "what": "Calibrated multi-chip scaling projection replacing the "
                "disclaimed virtual-CPU sweeps (SCALING_r02/r03): "
                "t_step = t_rank(P) + comm/ICI + t_fix per mesh cell; "
                "efficiency = t1 / (P*t_step). Collective byte counts "
                "are the analytic model pinned against compiled HLO "
                "(tests/test_collective_bytes.py, COMMSTATS_r03.json); "
                "per-rank compute is measured on the chip when "
                "calibration.mode == 'measured'.",
        "assumptions": {
            "ici_bandwidth_bytes_per_s": ICI_BW,
            "ici_latency_s_per_collective": ICI_LAT,
            "t_fix_s_direct_attach_launch": T_FIX,
            "dcn_bandwidth_bytes_per_s": DCN_BW,
            "dcn_latency_s_per_collective": DCN_LAT,
            "sensitivity_corners": {k: {"bw_factor": f[0],
                                        "latency_factor": f[1]}
                                    for k, f in CORNERS.items()},
            "notes": [
                "collectives charged as riding ONE ICI link direction "
                "(v5e has 4 links/chip; conservative)",
                "per-rank compute proxy compiles the pipeline at "
                f"n/P samples; halo padding adds <= {(nb - 1)}/"
                f"{n // max(p_values)} = "
                f"{round(100 * (nb - 1) / (n // max(p_values)), 2)}% "
                "work at the largest P (mildly optimistic proxy)",
                "the dev-host tunnel RTT (~24 ms) is a transport "
                "artifact and excluded; t_fix models a direct-attached "
                "launch",
            ],
        },
        "calibration": calibration,
        "cells": rows,
        "north_star": {
            "criterion": ">=80% scaling efficiency (BASELINE.md)",
            "holds_for": [r["mesh"] for r in rows if r["efficiency"] >= 0.8],
            "fails_for": [r["mesh"] for r in rows if r["efficiency"] < 0.8],
            "holds_under_pessimistic_corner": [
                r["mesh"] for r in rows
                if r["efficiency_corners"][
                    "pessimistic_bw/2_lat_x10"] >= 0.8],
        },
    }
    out_path = _os.path.join(repo, args.out)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"written": out_path,
                      "efficiency_by_cell": {
                          r["mesh"]: r["efficiency"] for r in rows}}))


if __name__ == "__main__":
    main()
