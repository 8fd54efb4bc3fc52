"""Multi-chip sharded CPI pipeline over a (cpi, pulse) mesh.

The per-CPI chain — Wiener-Hopf clutter filter, cross-ambiguity, metrics,
detection — runs as one jitted program whose heavy stages live inside a
`jax.shard_map` region with *explicit* collectives (SURVEY §2.5):

  - input IQ ``(B, n_pad)``: CPI batch sharded over ``cpi``; each CPI's time
    axis sharded in contiguous pulse blocks over ``pulse`` (the radar analog
    of sequence parallelism);
  - clutter filter: per-device segmented correlations (batched local FFTs)
    with an (n_bins−1)-sample *right-halo* `ppermute` from the next
    neighbour; partial spectra `psum` over ``pulse``; the small Toeplitz /
    Cholesky solve is computed replicated; the FIR apply is local with a
    *left-halo* `ppermute` (overlap-save) — this is the overlap-save
    boundary exchange of SURVEY §2.5 riding ICI;
  - ambiguity range stage: per-device batched FFT cross-correlation over its
    pulse block — fully local;
  - ambiguity Doppler stage: each device multiplies its pulse block against
    its column block of the shifted-DFT operator and the partial maps `psum`
    over ``pulse`` — one all-reduce of the small (n_doppler × n_delay) map
    replaces the reference's per-column FFT loop + corner turn
    (`Ambiguity.cpp:152-169`);
  - CFAR / centroid / interpolation run outside the shard_map on the
    (cpi-sharded, pulse-replicated) map — elementwise + top_k, no further
    communication.

All FFTs are device-local (never partitioned), which both matches the TPU
performance model and avoids XLA's sharded-FFT pitfalls. Clutter
correlations are *linear* (zero-extended) rather than the reference's
circular wrap — see `WienerHopfFilter(mode="linear")`; they differ by
O(n_bins/n) and the linear form is exactly decomposable across shards.

The pulse count is zero-padded to a multiple of the pulse-axis size with
phantom pulses whose DFT columns are zero, so any mesh shape works for any
config.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blah2_tpu.config import Config
from blah2_tpu.dsp.ambiguity import AmbiguityProcessor
from blah2_tpu.dsp.centroid import CentroidFilter
from blah2_tpu.dsp.hamming import next_tpu_fft_size
from blah2_tpu.dsp.interpolate import PeakInterpolator
from blah2_tpu.dsp.pipeline import CpiOutputs, _empty_detections
from blah2_tpu.ops.toeplitz import (hermitian_toeplitz, toeplitz_ij,
                                    toeplitz_kj)
from blah2_tpu.dsp.spectrum import SpectrumAnalyser
from blah2_tpu.parallel.halo import shift_from_next, shift_from_prev


def pick_local_segments(block_len: int, n_lags: int,
                        target: int = 16384) -> int:
    """Number of overlap-save segments per device block: a divisor of
    ``block_len`` giving segments ≥ max(4·n_lags, 1024), near ``target``."""
    floor = max(4 * n_lags, 1024)
    best = 1
    for k in range(1, block_len + 1):
        if k * k > block_len * 4:
            break
        if block_len % k == 0:
            s = block_len // k
            if s >= floor and abs(s - target) < abs(block_len // best - target):
                best = k
    return best


class ShardedCpiPipeline:
    def __init__(
        self,
        config: Config,
        mesh: Mesh,
        max_detections: int = 128,
        dtype=jnp.complex64,
        spectrum_bandwidth: Optional[float] = None,
        diag_load: float = 0.0,
        halo_backend: str = "ppermute",
        use_pallas_detect: bool = False,
        row_shard="auto",
    ):
        self.config = config
        self.mesh = mesh
        self.dtype = dtype
        # Halo-exchange backend (parallel.halo): "ppermute" (XLA collective
        # permute, the default everywhere) or "pallas" (explicit inter-chip
        # RDMA kernel for real ICI-connected slices; off-TPU it runs under
        # the TPU interpret mode, which simulates the remote DMAs on any
        # mesh shape — tests/test_halo.py and the dryrun matrix cover the
        # production 2-axis shape).
        if halo_backend not in ("ppermute", "pallas"):
            raise ValueError(f"unknown halo backend {halo_backend!r}")
        self._halo_kw = dict(backend=halo_backend)
        if halo_backend == "pallas":
            self._halo_kw["interpret"] = jax.default_backend() != "tpu"
            self._halo_kw["n_mesh_axes"] = len(mesh.axis_names)
        self.n_pulse_axis = mesh.shape["pulse"]
        self.n_cpi_axis = mesh.shape["cpi"]
        proc = config.process
        cap = config.capture
        self.n_samples = n = config.n_samples

        amb = AmbiguityProcessor(
            proc.ambiguity.delay_min, proc.ambiguity.delay_max,
            proc.ambiguity.doppler_min, proc.ambiguity.doppler_max,
            cap.fs, n, round_hamming=True, dtype=dtype,
        )
        self.ambiguity = amb

        # Pad the pulse axis to a multiple of the mesh's pulse dimension, AND
        # far enough that n_pad = nd_pad·n_corr covers all n input samples
        # (the spectrum analyser and clutter filter use the full CPI; samples
        # beyond n_used land in phantom pulses whose DFT columns are zero).
        nd = amb.n_doppler_bins
        min_pulses = max(nd, -(-n // amb.n_corr))
        self.nd_pad = -(-min_pulses // self.n_pulse_axis) * self.n_pulse_axis
        self.n_pad = self.nd_pad * amb.n_corr
        self.block_len = self.n_pad // self.n_pulse_axis
        # Row-sharded Doppler output: the Doppler-stage reduction becomes a
        # psum_scatter (each rank keeps its row block — half a psum's
        # traffic) and the map leaves the shard_map row-sharded, so the
        # per-row metrics/CFAR work downstream is pulse-parallel instead of
        # replicated (VERDICT r1 #7). Only worth it with enough rows per
        # rank to amortize the halo/gather collectives GSPMD inserts for
        # centroiding and top-k — measured crossover ~8 rows/rank on the
        # virtual 8-dev mesh at nd=41 (pulse=4, 10 rows/rank: step
        # 88->68 ms; pulse=8, 5 rows/rank: 209->322 ms).
        if row_shard == "auto":
            self._row_shard = (nd // self.n_pulse_axis) >= 8 or \
                self.n_pulse_axis == 1
        else:
            self._row_shard = bool(row_shard)
        self.nd_rows_pad = -(-nd // self.n_pulse_axis) * self.n_pulse_axis \
            if self._row_shard else nd
        w = np.asarray(amb._doppler_dft)
        w_pad = np.zeros((self.nd_rows_pad, self.nd_pad), dtype=w.dtype)
        w_pad[:nd, :nd] = w
        self._w_pad = w_pad.astype(np.dtype(dtype))
        if amb._ramp is not None:
            ramp_pad = np.zeros(self.n_pad, dtype=np.complex128)
            ramp_pad[: amb.n_used_samples] = np.asarray(amb._ramp)
            self._ramp_pad = ramp_pad.astype(np.dtype(dtype))
        else:
            self._ramp_pad = None

        if spectrum_bandwidth is None:
            spectrum_bandwidth = getattr(
                getattr(proc, "spectrum", None), "bandwidth", 2000.0)
        self.spectrum = SpectrumAnalyser(n, spectrum_bandwidth, cap.fc,
                                         dtype=dtype)
        # Fold twiddle padded to the sharded time axis: the spectrum folds
        # locally per rank inside the shard_map and psums (n_spectrum,)
        # partials — never reshards the CPI (see SpectrumAnalyser.fold_partial).
        self._spec_tw_pad = jnp.asarray(
            self.spectrum.twiddle_padded(self.n_pad))
        # Sub-CPI spectra in mesh mode (process.spectrum.nSub, round 3 —
        # same feature as CpiPipeline's, same pinned bin geometry): one
        # zero-padded fold twiddle row per segment (zeros outside the
        # segment double as its mask), each folded locally per rank and
        # psum'd — k·n_spectrum extra psum bytes, never resharding the CPI.
        self.spectrum_sub: Optional[SpectrumAnalyser] = None
        self.n_spectrum_sub = int(getattr(
            getattr(proc, "spectrum", None), "n_sub", 1) or 1)
        if self.n_spectrum_sub > 1:
            k_sub = self.n_spectrum_sub
            n_seg = n // k_sub
            if n_seg < 2 * self.spectrum.n_spectrum:
                raise ValueError(
                    f"process.spectrum.nSub={k_sub} leaves segments of "
                    f"{n_seg} samples — need at least "
                    f"2x{self.spectrum.n_spectrum} for the shared "
                    f"spectrum-bin geometry")
            self.spectrum_sub = SpectrumAnalyser(
                n_seg, spectrum_bandwidth, cap.fc, dtype=dtype,
                n_spectrum=self.spectrum.n_spectrum,
                offset_even=self.spectrum.decimation % 2 == 0)
            tw = np.asarray(self.spectrum_sub._twiddle).reshape(-1)
            tw_rows = np.zeros((k_sub, self.n_pad), dtype=tw.dtype)
            for s in range(k_sub):
                tw_rows[s, s * n_seg:s * n_seg + tw.shape[0]] = tw
            self._sub_tw_pad = jnp.asarray(tw_rows)
            self._sub_seg_len = n_seg

        self.clutter_enabled = proc.clutter.enable
        kind = (getattr(proc.clutter, "filter", "wiener") or "wiener").lower()
        kind = kind.replace("_", "-")
        if kind in ("eca-b", "ecab", "eca"):
            self.clutter_kind = "eca-b"
        elif kind == "nlms":
            # Sharded NLMS (round 3): the single-chip canceller
            # (`dsp.clutter_eca.NlmsClutterFilter`) restarts its weights at
            # every CPI, so restarting them at every *rank block* is the
            # same algorithm at a finer restart grid — each rank runs the
            # identical overlap-save frequency-domain block NLMS on its
            # contiguous time block, with the first block's overlap-save
            # history carried in by an L-sample ppermute halo from the
            # previous rank (real samples where the single-chip filter sees
            # its CPI-start zeros). Divergence from the single-chip filter
            # is the P−1 extra weight restarts per CPI; quantified in
            # tests/test_sharded.py::test_sharded_nlms_drift_vs_single_chip.
            self.clutter_kind = "nlms"
        else:
            self.clutter_kind = "wiener"
            if self.clutter_enabled and kind not in (
                    "wiener", "wiener-hopf", "wienerhopf"):
                import warnings

                warnings.warn(
                    f"process.clutter.filter={kind!r} is not supported in "
                    "mesh mode; falling back to the sharded Wiener-Hopf "
                    "canceller", stacklevel=2)
        if self.clutter_enabled:
            self.nb = proc.clutter.delay_max - proc.clutter.delay_min
            self.clutter_delay_min = proc.clutter.delay_min
            if self.nb - 1 > self.block_len:
                raise ValueError(
                    "clutter lag window exceeds per-device block; reduce the "
                    "pulse-axis size"
                )
            self.n_seg_local = pick_local_segments(self.block_len, self.nb)
            self.seg_len = self.block_len // self.n_seg_local
            self.nfft_seg = next_tpu_fft_size(self.seg_len + self.nb - 1)
            self.diag_load = diag_load
        if self.clutter_enabled and self.clutter_kind == "eca-b":
            # Sharded ECA-B (round 2): per-segment exact covariance-method
            # LS (same math as dsp.clutter_eca.EcaBFilter, see that module
            # docstring) over segments of the PADDED CPI. The time axis is
            # already sharded in contiguous blocks, so every segment's
            # Gram/solve is device-LOCAL — the only communication is the
            # (nb−1)-sample history/lookahead halo with the neighbour
            # ranks. Requested nBatches is rounded to the nearest
            # per-block segmentation (a divisor count of block_len);
            # segment boundaries therefore sit at multiples of
            # n_pad/(P·S), which differs from the single-chip filter's
            # ceil(n/B) grid — a documented divergence of mesh mode.
            nb = self.nb
            want_local = max(1, round(proc.clutter.n_batches /
                                      self.n_pulse_axis))
            divisors = [k for k in range(1, self.block_len + 1)
                        if self.block_len % k == 0 and
                        self.block_len // k > 2 * nb]
            if not divisors:
                raise ValueError(
                    "no valid ECA-B segmentation: clutter lag window too "
                    "large for the per-device block")
            self.n_seg_eca = min(divisors, key=lambda k: abs(k - want_local))
            self.seg_len_eca = self.block_len // self.n_seg_eca
            self.n_batches_eca = self.n_seg_eca * self.n_pulse_axis
            self.nfft_eca = next_tpu_fft_size(
                self.seg_len_eca + 2 * (nb - 1) + nb)
            v = np.arange(nb)[:, None]
            k = np.arange(nb)[None, :]
            self._eca_edge_mask = np.asarray(v < k)
            self.diag_load_eca = diag_load if diag_load > 0.0 else 1e-4
        if self.clutter_enabled and self.clutter_kind == "nlms":
            # Same block geometry as NlmsClutterFilter: L taps rounded up
            # to a power of two, 2L-point FFTs, weights adapt once per L.
            nb = self.nb
            self.nlms_L = 1 << (nb - 1).bit_length()
            self.nlms_M = 2 * self.nlms_L
            if self.nlms_L > self.block_len:
                raise ValueError(
                    "NLMS block (next pow2 of the clutter lag window) "
                    "exceeds the per-device block; reduce the pulse-axis "
                    "size")
            self.nlms_K = -(-self.block_len // self.nlms_L)
            self.nlms_mu = float(getattr(proc.clutter, "mu", 0.1))
            self.nlms_beta = 0.9
            self.nlms_eps = 1e-6
            # Warm-start replay: before filtering, each rank re-adapts over
            # the previous rank's last W blocks (halo-borne), so its
            # weights enter the block converged — approximating the
            # single-chip sequential chain at O(W) extra local FFT work
            # instead of a cross-device scan. W covers the NLMS
            # convergence time (~1/mu blocks) when the block affords it.
            self.nlms_W = max(0, min(round(2.0 / self.nlms_mu), 32,
                                     self.block_len // self.nlms_L - 1))

        self.detection_enabled = proc.detection.enable
        if self.detection_enabled:
            from blah2_tpu.dsp.cfar import make_cfar

            # CFAR selection via config (ca | os): both are per-Doppler-row
            # delay-window detectors, so they row-shard identically.
            self.cfar = make_cfar(
                proc.detection, amb.delay_axis, amb.doppler_axis,
                max_detections=max_detections)
            self.centroid = CentroidFilter(
                proc.detection.n_centroid, proc.detection.n_centroid,
                1.0 / proc.data.cpi,
            )
            self.interpolate = PeakInterpolator(
                True, True, amb.doppler_resolution, amb.n_doppler_bins,
                amb.n_delay_bins,
            )
            # Opt-in fused Pallas detection (ops.pallas_detect) vmapped over
            # the cpi-sharded maps. Off by default: the single-chip pipeline
            # enables it automatically, but under GSPMD auto-partitioning the
            # kernel's placement is less predictable than inside jit on one
            # device — validate on your slice before enabling in production.
            self.fused_detector = None
            if use_pallas_detect:
                from blah2_tpu.ops.pallas_detect import FusedDetector

                self.fused_detector = FusedDetector.from_config(
                    proc, amb, max_detections=max_detections)

        self._in_sharding = NamedSharding(mesh, P("cpi", "pulse", None))
        self._fn = jax.jit(self._step)

    # -- inside shard_map: one CPI, one device block -------------------------
    def _segments_right_halo(self, v_loc: jnp.ndarray,
                             cid: int = 0) -> jnp.ndarray:
        """(block_len,) → (n_seg_local, seg_len + nb − 1) with halo; the last
        segment's halo comes from the next device (zeros at the global end)."""
        h = self.nb - 1
        main = v_loc.reshape(self.n_seg_local, self.seg_len)
        halo_next = shift_from_next(v_loc, h, "pulse", collective_id=cid,
                                    **self._halo_kw)
        if self.n_seg_local > 1:
            tails = jnp.concatenate([main[1:, :h], halo_next[None, :]], axis=0)
        else:
            tails = halo_next[None, :]
        return jnp.concatenate([main, tails], axis=1)

    def _clutter_block(self, x_loc: jnp.ndarray, y_loc: jnp.ndarray):
        """Per-device Wiener-Hopf: returns (y_loc_filtered, ok)."""
        nb, f = self.nb, self.nfft_seg
        s = self.clutter_delay_min

        # Linear shift: xs[i] = x[i − s] with zero extension at the ends.
        if s < 0:
            incoming = shift_from_next(x_loc, -s, "pulse", collective_id=2,
                                       **self._halo_kw)
            xs_loc = jnp.concatenate([x_loc[-s:], incoming])
        elif s > 0:
            incoming = shift_from_prev(x_loc, s, "pulse", collective_id=2,
                                       **self._halo_kw)
            xs_loc = jnp.concatenate([incoming, x_loc[:-s]])
        else:
            xs_loc = x_loc

        # Distinct collective ids: these halo kernels have no data
        # dependency on each other, so XLA may run them concurrently.
        xs_ext = self._segments_right_halo(xs_loc, cid=0)
        y_ext = self._segments_right_halo(y_loc, cid=1)
        xs_seg = xs_loc.reshape(self.n_seg_local, self.seg_len)

        xf_seg = jnp.conj(jnp.fft.fft(xs_seg, n=f, axis=-1))
        spec_a = jnp.sum(jnp.fft.fft(xs_ext, n=f, axis=-1) * xf_seg, axis=0)
        spec_b = jnp.sum(jnp.fft.fft(y_ext, n=f, axis=-1) * xf_seg, axis=0)
        spec_a = jax.lax.psum(spec_a, "pulse")
        spec_b = jax.lax.psum(spec_b, "pulse")
        a = jnp.conj(jnp.fft.ifft(spec_a)[:nb])
        b = jnp.fft.ifft(spec_b)[:nb]

        # Replicated Toeplitz solve (410² is tiny); gather-free build
        # (ops.toeplitz — the index-matrix gather was ~1.7 ms on v5e).
        mat = hermitian_toeplitz(a)
        if self.diag_load > 0.0:
            mat = mat + (self.diag_load * jnp.real(a[0])).astype(mat.dtype) \
                * jnp.eye(nb, dtype=mat.dtype)
        chol = jnp.linalg.cholesky(mat)
        wgt = jax.scipy.linalg.cho_solve((chol, True), b)
        ok = jnp.all(jnp.isfinite(wgt.real) & jnp.isfinite(wgt.imag))
        wgt = jnp.where(ok, wgt, jnp.zeros_like(wgt))

        # Overlap-save FIR: left halo from the previous device.
        h = self.nb - 1
        halo_prev = shift_from_prev(xs_loc, h, "pulse", collective_id=3,
                                    **self._halo_kw)
        main = xs_seg
        if self.n_seg_local > 1:
            heads = jnp.concatenate(
                [halo_prev[None, :], main[:-1, self.seg_len - h:]], axis=0
            )
        else:
            heads = halo_prev[None, :]
        ext = jnp.concatenate([heads, main], axis=1)
        wf = jnp.fft.fft(wgt, n=f)
        conv = jnp.fft.ifft(jnp.fft.fft(ext, n=f, axis=-1) * wf[None, :],
                            axis=-1)
        filt = conv[:, h : h + self.seg_len].reshape(self.block_len)
        y2 = y_loc - filt
        return jnp.where(ok, y2, y_loc), ok

    def _clutter_block_ecab(self, x_loc: jnp.ndarray, y_loc: jnp.ndarray):
        """Per-device ECA-B: exact per-segment covariance-method LS with
        cross-boundary history (the sharded form of
        `dsp.clutter_eca.EcaBFilter` — same Gram identity
        ``G = Toeplitz(r) + P^H H − Q^H T``, verified against an explicit
        X^H X). All solves are local; only the (nb−1)-sample halos cross
        ranks. Returns ``(y_loc_filtered, ok_local)``."""
        nb = self.nb
        S, L, f = self.n_seg_eca, self.seg_len_eca, self.nfft_eca
        s = self.clutter_delay_min
        h = nb - 1

        # Linear shift xs[i] = x[i − s] with zero extension (same halo
        # pattern as the Wiener path).
        if s < 0:
            incoming = shift_from_next(x_loc, -s, "pulse", collective_id=2,
                                       **self._halo_kw)
            xs_loc = jnp.concatenate([x_loc[-s:], incoming])
        elif s > 0:
            incoming = shift_from_prev(x_loc, s, "pulse", collective_id=2,
                                       **self._halo_kw)
            xs_loc = jnp.concatenate([incoming, x_loc[:-s]])
        else:
            xs_loc = x_loc

        main = xs_loc.reshape(S, L)
        halo_next = shift_from_next(xs_loc, h, "pulse", collective_id=0,
                                    **self._halo_kw)
        halo_prev = shift_from_prev(xs_loc, h, "pulse", collective_id=1,
                                    **self._halo_kw)
        if S > 1:
            tails = jnp.concatenate([main[1:, :h], halo_next[None]], axis=0)
            heads = jnp.concatenate([halo_prev[None], main[:-1, L - h:]],
                                    axis=0)
        else:
            tails = halo_next[None]
            heads = halo_prev[None]
        # ext[i] = xs[t0 − (nb−1) + i]: history + body + lookahead.
        ext = jnp.concatenate([heads, main, tails], axis=1)  # (S, L+2h)
        yb = y_loc.reshape(S, L)

        ext_f = jnp.fft.fft(ext, n=f, axis=-1)
        c_seg = jnp.conj(jnp.fft.ifft(
            ext_f * jnp.conj(jnp.fft.fft(main, n=f, axis=-1)), axis=-1))
        c_y = jnp.conj(jnp.fft.ifft(
            ext_f * jnp.conj(jnp.fft.fft(yb, n=f, axis=-1)), axis=-1))
        r_full = c_seg[:, :2 * nb - 1]
        b = c_y[:, :nb][:, ::-1]

        L_eca = self.seg_len_eca
        Pm = toeplitz_ij(ext[:, :2 * nb - 1])
        # corner (nb−1,0) indexes one past ext; masked out in Q^H·T —
        # pad a zero (see dsp/clutter_eca.py).
        Qm = toeplitz_ij(
            jnp.pad(ext, ((0, 0), (0, 1)))[:, L_eca:L_eca + 2 * nb - 1])
        Hm = jnp.where(self._eca_edge_mask[None], Pm, 0)
        Tm = jnp.where(self._eca_edge_mask[None], Qm, 0)
        G = toeplitz_kj(r_full)
        G = G + jnp.einsum("svk,svj->skj", jnp.conj(Pm), Hm)
        G = G - jnp.einsum("svk,svj->skj", jnp.conj(Qm), Tm)
        load = (self.diag_load_eca * jnp.real(r_full[:, nb - 1]) + 1e-30
                ).astype(self.dtype)
        G = G + load[:, None, None] * jnp.eye(nb, dtype=self.dtype)[None]

        chol = jnp.linalg.cholesky(G)
        w = jax.scipy.linalg.cho_solve((chol, True), b[..., None])[..., 0]
        ok_seg = jnp.all(jnp.isfinite(w.real) & jnp.isfinite(w.imag),
                         axis=-1)
        w = jnp.where(ok_seg[:, None], w, jnp.zeros_like(w))

        filt = jnp.fft.ifft(
            jnp.fft.fft(w, n=f, axis=-1) * ext_f, axis=-1)[:, h:h + L]
        y2 = (yb - filt).reshape(self.block_len)
        return y2, jnp.all(ok_seg)

    def _clutter_block_nlms(self, x_loc: jnp.ndarray, y_loc: jnp.ndarray):
        """Per-device overlap-save frequency-domain block NLMS — the
        rank-local form of `dsp.clutter_eca.NlmsClutterFilter` (same L-tap
        blocks, per-bin power normalization, causal gradient constraint).
        The weight/power state restarts at each rank boundary and is then
        warm-started by replaying the previous rank's last ``nlms_W``
        blocks (halo-borne), so the weights enter the rank converged —
        approximating the single-chip sequential chain with O(W) extra
        rank-local FFT work; the first block's overlap-save history also
        arrives by halo, so no input samples are zero-filled mid-CPI.
        Residual divergence vs the single-chip filter is quantified in
        tests/test_sharded.py::test_sharded_nlms_drift_vs_single_chip_quantified.
        Scan chain is rank-local: no cross-device dependency, the only
        communication is the shift + replay-window ppermutes
        ((W+1)·L + W·L samples). Returns ``(y_filtered, True)``."""
        L, M, K, W = self.nlms_L, self.nlms_M, self.nlms_K, self.nlms_W
        s = self.clutter_delay_min

        if s < 0:
            incoming = shift_from_next(x_loc, -s, "pulse", collective_id=2,
                                       **self._halo_kw)
            xs_loc = jnp.concatenate([x_loc[-s:], incoming])
        elif s > 0:
            incoming = shift_from_prev(x_loc, s, "pulse", collective_id=2,
                                       **self._halo_kw)
            xs_loc = jnp.concatenate([incoming, x_loc[:-s]])
        else:
            xs_loc = x_loc

        halo_x = shift_from_prev(xs_loc, (W + 1) * L, "pulse",
                                 collective_id=3, **self._halo_kw)
        pad = K * L - self.block_len
        # Overlap-save windows [kL-L, kL+L), built gather-free from two
        # offset reshapes (an index-matrix gather of K*2L elements costs
        # ~10-20 ms on v5e — see dsp/clutter_eca.py, r5).
        body = jnp.concatenate([xs_loc, jnp.zeros(pad, xs_loc.dtype)])
        lead = jnp.concatenate([halo_x[-L:], body[:-L]])
        X = jnp.fft.fft(jnp.concatenate(
            [lead.reshape(K, L), body.reshape(K, L)], axis=-1),
            axis=-1)                                       # (K, M)
        yk = jnp.pad(y_loc, (0, pad)).reshape(K, L)

        real = jnp.float32 if self.dtype == jnp.complex64 else jnp.float64
        w0 = jnp.zeros(M, self.dtype)
        p0 = jnp.full(M, self.nlms_eps, real)

        def step(carry, inp):
            w, p = carry
            Xk, yb = inp
            yhat = jnp.fft.ifft(w * Xk)[L:]
            e = yb - yhat
            E = jnp.fft.fft(jnp.concatenate([jnp.zeros(L, e.dtype), e]))
            p = self.nlms_beta * p + (1.0 - self.nlms_beta) * \
                jnp.abs(Xk).astype(real) ** 2
            g = self.nlms_mu * jnp.conj(Xk) * E / \
                (p + self.nlms_eps).astype(self.dtype)
            w = w + g
            wt = jnp.fft.ifft(w).at[L:].set(0.0)
            return (jnp.fft.fft(wt), p), e

        if W > 0:
            # Warm-start replay over the previous rank's last W blocks
            # (zeros on rank 0 — a no-op adaptation, like the single-chip
            # CPI start). err from the replay is discarded; only the
            # converged (w, p) carry into the rank's own blocks.
            halo_y = shift_from_prev(y_loc, W * L, "pulse",
                                     collective_id=4, **self._halo_kw)
            Xw = jnp.fft.fft(jnp.concatenate(
                [halo_x[:-L].reshape(W, L), halo_x[L:].reshape(W, L)],
                axis=-1), axis=-1)                         # (W, M)
            yw = halo_y.reshape(W, L)
            (w0, p0), _ = jax.lax.scan(step, (w0, p0), (Xw, yw))

        (_, _), err = jax.lax.scan(step, (w0, p0), (X, yk))
        y2 = err.reshape(K * L)[:self.block_len]
        # The CPI pad region must stay zero (the Wiener/ECA-B paths get
        # this for free: their filters output w·xs = 0 there; NLMS's
        # -yhat is nonzero where a block straddles the valid/pad edge).
        d = jax.lax.axis_index("pulse")
        gidx = d * self.block_len + jnp.arange(self.block_len)
        y2 = jnp.where(gidx < self.n_samples, y2, jnp.zeros((), y2.dtype))
        return y2, jnp.asarray(True)

    def _ambiguity_block(self, x_loc: jnp.ndarray, y_loc: jnp.ndarray):
        """Per-device range + Doppler stages; psum over pulse → full map."""
        amb = self.ambiguity
        nc, nfft = amb.n_corr, amb.nfft
        ndp_l = self.nd_pad // self.n_pulse_axis
        d = jax.lax.axis_index("pulse")

        if self._ramp_pad is not None:
            ramp = jax.lax.dynamic_slice(
                self._ramp_pad, ((d * self.block_len).astype(jnp.int32),), (self.block_len,)
            )
            x_loc = x_loc * ramp

        xp = x_loc.reshape(ndp_l, nc)
        yp = y_loc.reshape(ndp_l, nc)
        xf = jnp.fft.fft(xp, n=nfft, axis=-1)
        yf = jnp.fft.fft(yp, n=nfft, axis=-1)
        z = jnp.fft.ifft(yf * jnp.conj(xf), axis=-1)
        c = jnp.roll(z, shift=-amb.delay_min, axis=-1)[:, : amb.n_delay_bins]

        w_blk = jax.lax.dynamic_slice(
            self._w_pad, (jnp.int32(0), (d * ndp_l).astype(jnp.int32)),
            (self.nd_rows_pad, ndp_l)
        )
        partial = jnp.matmul(w_blk, c, preferred_element_type=self.dtype)
        if self._row_shard:
            # Reduce-scatter over the pulse axis: each rank keeps its
            # Doppler row block (rows padded to a multiple of the axis),
            # so the map exits the shard_map row-sharded and the per-row
            # detection work downstream is pulse-parallel.
            return jax.lax.psum_scatter(partial, "pulse",
                                        scatter_dimension=0, tiled=True)
        return jax.lax.psum(partial, "pulse")

    # -- the jitted step -----------------------------------------------------
    def _step(self, xbp: jnp.ndarray, ybp: jnp.ndarray) -> CpiOutputs:
        """xbp, ybp: (B, n_pad, 2) float real/imag planes, sharded
        (cpi, pulse, None). Complex is formed on-device: complex host->device
        transfers are unsupported on some TPU transports, and split planes
        are the natural layout there anyway."""
        xb = jax.lax.complex(xbp[..., 0], xbp[..., 1]).astype(self.dtype)
        yb = jax.lax.complex(ybp[..., 0], ybp[..., 1]).astype(self.dtype)

        def block_fn(x_blk, y_blk):
            # x_blk: (B_local, block_len) on this device.
            d = jax.lax.axis_index("pulse")
            offset = (d * self.block_len).astype(jnp.int32)

            def one_cpi(x_loc, y_loc):
                if self.clutter_enabled and self.clutter_kind == "eca-b":
                    y2, ok_local = self._clutter_block_ecab(x_loc, y_loc)
                    # Per-rank solves: a failed segment anywhere flags the
                    # CPI (the Wiener path's replicated solve agrees on
                    # all ranks by construction; ECA-B's are local).
                    ok = jax.lax.psum(
                        jnp.logical_not(ok_local).astype(jnp.int32),
                        "pulse") == 0
                elif self.clutter_enabled and self.clutter_kind == "nlms":
                    y2, ok = self._clutter_block_nlms(x_loc, y_loc)
                elif self.clutter_enabled:
                    y2, ok = self._clutter_block(x_loc, y_loc)
                else:
                    y2, ok = y_loc, jnp.asarray(True)
                z = self._ambiguity_block(x_loc, y2)
                # Reference-channel spectrum: local fold + tiny psum (the
                # full-CPI fold would otherwise reshard across ranks).
                fold = jax.lax.psum(
                    self.spectrum.fold_partial(x_loc, offset,
                                               self._spec_tw_pad), "pulse")
                if self.spectrum_sub is None:
                    return z, ok, fold
                # Sub-CPI spectra: one masked fold per segment (the
                # segment-zeroed twiddle rows make out-of-segment samples
                # vanish), psum'd as a (k, ns) stack.
                subs = jnp.stack([
                    self.spectrum_sub.fold_partial(
                        x_loc, offset, self._sub_tw_pad[s],
                        bucket_origin=s * self._sub_seg_len)
                    for s in range(self.n_spectrum_sub)])
                return z, ok, fold, jax.lax.psum(subs, "pulse")

            return jax.vmap(one_cpi)(x_blk, y_blk)

        z_spec = P("cpi", "pulse", None) if self._row_shard \
            else P("cpi", None, None)
        out_specs = (z_spec, P("cpi"), P("cpi", None))
        if self.spectrum_sub is not None:
            out_specs += (P("cpi", None, None),)
        outs = jax.shard_map(
            block_fn,
            mesh=self.mesh,
            in_specs=(P("cpi", "pulse"), P("cpi", "pulse")),
            out_specs=out_specs,
            check_vma=False,
        )(xb, yb)
        if self.spectrum_sub is not None:
            z, clutter_ok, folded, sub_folded = outs
        else:
            z, clutter_ok, folded = outs
            sub_folded = None
        if self._row_shard:
            # Drop the phantom Doppler rows (row padding for psum_scatter)
            # and keep the row-sharded layout through metrics/CFAR — XLA
            # partitions the per-row work over the pulse axis and inserts
            # the small halo/gather collectives centroiding and top-k need.
            nd = self.ambiguity.n_doppler_bins
            z = jax.lax.with_sharding_constraint(
                z[:, :nd, :], NamedSharding(self.mesh, z_spec))

        # Small final FFT + bin permutation on the psum'd fold (replicated
        # per CPI row; n_spectrum-point — partitioner-trivial).
        spec = jax.vmap(self.spectrum.finish)(folded)
        spec_db = SpectrumAnalyser.to_db(spec)
        sub_db = None
        if sub_folded is not None:
            sub_db = SpectrumAnalyser.to_db(
                jax.vmap(jax.vmap(self.spectrum_sub.finish))(sub_folded))

        if self.detection_enabled and self.fused_detector is not None:
            def fused_one(z_i):
                db_i, noise_i, maxp_i, det = self.fused_detector(z_i)
                det = self.interpolate(det, db_i - noise_i)
                return db_i, noise_i, maxp_i, det

            db, noise, max_power, det = jax.vmap(fused_one)(z)
        else:
            db = 10.0 * jnp.log10(jnp.abs(z))
            noise = jnp.mean(db, axis=(-2, -1))
            raw_max = jnp.maximum(0.0, jnp.max(db, axis=(-2, -1)))
            max_power = raw_max - noise

            if self.detection_enabled:
                def detect_one(z_i, noise_i, db_i):
                    det = self.cfar(z_i, noise_i)
                    det = self.centroid(det)
                    return self.interpolate(det, db_i - noise_i)

                det = jax.vmap(detect_one)(z, noise, db)
            else:
                det = jax.vmap(lambda _: _empty_detections())(noise)

        return CpiOutputs(
            db_map=db, noise_power=noise, max_power=max_power,
            spectrum_db=spec_db, clutter_ok=clutter_ok, detections=det,
            sub_spectra_db=sub_db,
        )

    # -- public --------------------------------------------------------------
    def _place(self, arr: np.ndarray) -> jnp.ndarray:
        """Place a full host array on the mesh. Single-process: one
        device_put. Multi-process (multi-host): every process holds the
        same full host array (each host's capture feeds the same global
        CPI schedule) and contributes only its addressable shards via
        `make_array_from_callback`."""
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                arr.shape, self._in_sharding, lambda idx: arr[idx])
        return jax.device_put(arr, self._in_sharding)

    def shard_inputs(self, xb, yb) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pad (B, n_samples) host arrays to n_pad and place on the mesh."""
        xb = np.asarray(xb)
        yb = np.asarray(yb)
        if xb.ndim == 1:
            xb, yb = xb[None], yb[None]
        if xb.shape[0] % self.n_cpi_axis:
            raise ValueError(
                f"batch {xb.shape[0]} not divisible by cpi axis "
                f"{self.n_cpi_axis}"
            )
        pad = self.n_pad - xb.shape[1]
        if pad < 0:
            xb, yb = xb[:, : self.n_pad], yb[:, : self.n_pad]
        elif pad > 0:
            xb = np.pad(xb, ((0, 0), (0, pad)))
            yb = np.pad(yb, ((0, 0), (0, pad)))
        plane = np.float64 if self.dtype == jnp.complex128 else np.float32
        xp = np.stack([xb.real, xb.imag], axis=-1).astype(plane)
        yp = np.stack([yb.real, yb.imag], axis=-1).astype(plane)
        return self._place(xp), self._place(yp)

    def __call__(self, xb, yb) -> CpiOutputs:
        return self._fn(xb, yb)


def calibrate_row_shard(config: Config, mesh: Mesh, n_trials: int = 3,
                        **pipeline_kw) -> dict:
    """Measure both Doppler-output layouts on THIS mesh and pick the winner.

    The ``row_shard="auto"`` crossover (≥8 Doppler rows per rank) was
    measured on the virtual CPU mesh, whose collective-cost ratios differ
    from ICI — so on real hardware the static default can be wrong exactly
    where it matters. This runs one step per layout per trial on random
    planes (compile excluded; best-of-``n_trials`` to ride out tenancy)
    and returns ``{"row_shard": bool, "ms_on": .., "ms_off": ..,
    "pipeline": <the winning ShardedCpiPipeline>}`` (already compiled —
    callers should use it rather than rebuilding). Wire it via
    ``RadarRuntime(row_shard="calibrate")`` or ``--row-shard calibrate``;
    the measured decision is logged."""
    import time

    def force(out):
        # Force true completion with a SMALL fetch. On multi-host meshes
        # the output spans non-addressable devices; fetch only this
        # process's shard (each host times its local completion).
        leaf = out.noise_power
        shards = getattr(leaf, "addressable_shards", None)
        if shards is not None and jax.process_count() > 1:
            np.asarray(shards[0].data)
        else:
            np.asarray(leaf)

    rng = np.random.default_rng(0)
    b = mesh.shape["cpi"]
    ms: dict = {}
    pipes: dict = {}
    for name, flag in (("ms_on", True), ("ms_off", False)):
        pipe = ShardedCpiPipeline(config, mesh, row_shard=flag,
                                  **pipeline_kw)
        pipes[flag] = pipe
        n = config.n_samples
        xb = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n)))
        yb = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n)))
        xj, yj = pipe.shard_inputs(xb, yb)
        force(pipe(xj, yj))  # compile + warm
        best = float("inf")
        for _ in range(n_trials):
            t0 = time.perf_counter()
            force(pipe(xj, yj))
            best = min(best, 1e3 * (time.perf_counter() - t0))
        ms[name] = best
    ms["row_shard"] = ms["ms_on"] <= ms["ms_off"]
    if jax.process_count() > 1:
        # All processes must run the SAME program: take rank 0's decision
        # (per-host timings can disagree under load).
        from jax.experimental import multihost_utils

        ms["row_shard"] = bool(multihost_utils.broadcast_one_to_all(
            np.asarray(ms["row_shard"])))
    ms["pipeline"] = pipes[ms["row_shard"]]
    return ms
