"""Quantitative multi-chip validation: HLO collective byte counts.

Pins the compiled sharded program's communication volume against the
analytic model of the design (SURVEY §2.5; the corner turn being replaced
is `Ambiguity.cpp:152-169`):

  - overlap-save halos: (nb−1) complex64 per neighbour per CPI — three for
    the Wiener path (two right-halo correlation extensions + the FIR left
    halo), two for ECA-B (history + lookahead) — plus |delayMin| samples
    for the linear lag shift;
  - clutter spectrum psum: 2·nfft_seg complex64 per rank (Wiener);
  - Doppler map reduction: psum_scatter of nd_rows_pad·n_delay/P complex64
    per rank when row-sharded, else a psum of nd·n_delay;
  - spectrum fold psum: n_spectrum complex64 (never the CPI itself — a
    regression here is exactly the 6 MB/CPI resharding r3 caught).

The production-shape test asserts the roofline property: total collective
traffic per rank per step stays below the rank's input bytes, so ICI is
never the bottleneck (ICI ~100 GB/s moves ~2 MB in tens of µs vs ~55 ms
compute).
"""

import numpy as np
import pytest

import jax

from blah2_tpu.config import config_from_dict
from blah2_tpu.parallel import commstats
from blah2_tpu.parallel.mesh import make_radar_mesh
from blah2_tpu.parallel.sharded import ShardedCpiPipeline


def _tiny_cfg(filt="wiener"):
    return config_from_dict({
        "capture": {"fs": 40_000, "fc": 204_640_000},
        "process": {
            "data": {"cpi": 0.1, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -200, "dopplerMax": 200},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 20,
                        "filter": filt, "nBatches": 8},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })


def _stats(pipe, n_cpi_batch):
    cfg = pipe.config
    x = np.zeros((n_cpi_batch, cfg.n_samples), np.complex64)
    ops = commstats.collect(pipe._fn, *pipe.shard_inputs(x, x))
    return ops, commstats.summarize(ops)


def _last_dim(shape_tok):
    dims = shape_tok.split("[")[1].rstrip("]")
    return int(dims.split(",")[-1]) if dims else 0


@pytest.mark.parametrize("filt,n_halos", [("wiener", 3), ("eca-b", 2)])
def test_halo_permute_bytes_match_model(filt, n_halos):
    mesh = make_radar_mesh(2, 4)
    pipe = ShardedCpiPipeline(_tiny_cfg(filt), mesh)
    ops, _ = _stats(pipe, 2)
    permutes = [op for op in ops if op.kind == "collective-permute"]
    h = pipe.nb - 1
    s = abs(pipe.clutter_delay_min)
    halo_ops = [op for op in permutes if _last_dim(op.shapes[0]) == h]
    shift_ops = [op for op in permutes if _last_dim(op.shapes[0]) == s]
    # Exactly the designed halos: (nb−1)-sample exchanges ride each CPI.
    assert len(halo_ops) == n_halos, [op.shapes for op in permutes]
    assert len(shift_ops) == 1
    # Byte model: B_local CPIs per rank × (nb−1) c64 per halo.
    b_local = 2 // mesh.shape["cpi"]
    for op in halo_ops:
        assert op.bytes_per_rank == b_local * h * 8
    # Nothing else big rides collective-permute (the fold/regression class).
    for op in permutes:
        assert op.bytes_per_rank <= b_local * max(h, s) * 8


def test_doppler_reduction_row_sharded():
    mesh = make_radar_mesh(2, 4)
    pipe = ShardedCpiPipeline(_tiny_cfg(), mesh, row_shard=True)
    assert pipe._row_shard
    ops, summary = _stats(pipe, 2)
    rs = [op for op in ops if op.kind == "reduce-scatter"]
    assert len(rs) == 1
    # Each rank keeps nd_rows_pad/P rows of the (·, n_delay) c64 map.
    P = mesh.shape["pulse"]
    b_local = 2 // mesh.shape["cpi"]
    expect = (pipe.nd_rows_pad // P) * pipe.ambiguity.n_delay_bins * 8 \
        * b_local
    assert rs[0].bytes_per_rank == expect


def test_doppler_reduction_replicated():
    mesh = make_radar_mesh(2, 4)
    pipe = ShardedCpiPipeline(_tiny_cfg(), mesh, row_shard=False)
    ops, summary = _stats(pipe, 2)
    assert "reduce-scatter" not in summary
    nd = pipe.ambiguity.n_doppler_bins
    ndelay = pipe.ambiguity.n_delay_bins
    ar = [op for op in ops if op.kind == "all-reduce"
          and any(f"[{nd}," in s for s in op.shapes)]
    assert ar, "Doppler map psum missing"
    b_local = 2 // mesh.shape["cpi"]
    assert ar[0].bytes_per_rank >= nd * ndelay * 8 * b_local


def test_clutter_and_spectrum_psums_present():
    mesh = make_radar_mesh(2, 4)
    pipe = ShardedCpiPipeline(_tiny_cfg(), mesh)
    ops, _ = _stats(pipe, 2)
    ar_dims = [_last_dim(s) for op in ops if op.kind == "all-reduce"
               for s in op.shapes]
    # Clutter correlation spectra (spec_a + spec_b) psum at nfft_seg.
    assert ar_dims.count(pipe.nfft_seg) == 2, ar_dims
    # Spectrum fold psum at n_spectrum — NOT an nfft-sized gather.
    assert pipe.spectrum.n_spectrum in ar_dims, ar_dims
    ag_dims = [_last_dim(s) for op in ops if op.kind == "all-gather"
               for s in op.shapes]
    assert pipe.spectrum.nfft not in ag_dims, \
        "spectrum stage reshards the full CPI"


def test_production_shape_roofline():
    """At the default blah2 geometry (fs=2 MHz, tCpi=0.75 s), total
    collective traffic per rank per step must stay below the rank's input
    bytes — the quantitative statement that the mesh design scales on ICI.
    Measured r3: ~2.2 MB/rank vs 3.03 MB input (ratio 0.73); the spectrum
    bug this guards against measured 8.3 MB (ratio 2.74)."""
    cfg = config_from_dict({
        "capture": {"fs": 2_000_000, "fc": 204_640_000},
        "process": {
            "data": {"cpi": 0.75, "buffer": 2},
            "ambiguity": {"delayMin": -10, "delayMax": 400,
                          "dopplerMin": -200, "dopplerMax": 200},
            "clutter": {"enable": True, "delayMin": -10, "delayMax": 400},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })
    mesh = make_radar_mesh(2, 4)
    pipe = ShardedCpiPipeline(cfg, mesh)
    x = np.zeros((2, cfg.n_samples), np.complex64)
    ops = commstats.collect(pipe._fn, *pipe.shard_inputs(x, x))
    total = sum(op.bytes_per_rank for op in ops)
    # One CPI per rank on the cpi axis: n_pad/P c64 input samples per rank.
    input_bytes = pipe.n_pad * 8 // mesh.shape["pulse"]
    assert total < input_bytes, (total, input_bytes)
    # No single collective moves anything near the CPI itself.
    biggest = max(ops, key=lambda op: op.bytes_per_rank)
    assert biggest.bytes_per_rank < input_bytes // 2, biggest.line[:200]
    # The designed halos are present at production scale too.
    h = pipe.nb - 1
    halos = [op for op in ops if op.kind == "collective-permute"
             and _last_dim(op.shapes[0]) == h]
    assert len(halos) == 3
