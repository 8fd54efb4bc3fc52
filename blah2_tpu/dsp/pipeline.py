"""The fused per-CPI processing pipeline.

One jitted XLA program per CPI replaces the reference's sequential stage calls
in the hot loop (`src/blah2.cpp:245-361`): spectrum → Wiener-Hopf clutter
filter → cross-ambiguity → map metrics → CFAR → centroid → interpolation.
XLA fuses the elementwise stages between the FFTs/matmuls; the host receives
only small products (dB map, spectrum, fixed-capacity detections).

The tracker stays on the host (`blah2_tpu.tracker`): it is tiny, sequential
and stateful — a poor fit for the device (SURVEY §7.3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from blah2_tpu.config import Config
from blah2_tpu.dsp.ambiguity import AmbiguityProcessor, map_metrics
from blah2_tpu.dsp.cfar import CfarDetections, CfarDetector
from blah2_tpu.dsp.centroid import CentroidFilter
from blah2_tpu.dsp.clutter import WienerHopfFilter
from blah2_tpu.dsp.interpolate import PeakInterpolator
from blah2_tpu.dsp.spectrum import SpectrumAnalyser


class CpiOutputs(NamedTuple):
    db_map: jnp.ndarray        # (n_doppler_bins, n_delay_bins) absolute dB
    noise_power: jnp.ndarray   # scalar dB
    max_power: jnp.ndarray     # scalar dB (max − noise)
    spectrum_db: jnp.ndarray   # (n_spectrum,) dB
    clutter_ok: jnp.ndarray    # bool scalar
    detections: Optional[CfarDetections]
    # Sub-CPI spectra (process.spectrum.nSub > 1, `SpectrumAnalyser.h:6`
    # TODO): (k, n_spectrum) dB, None when disabled.
    sub_spectra_db: Optional[jnp.ndarray] = None


def _empty_detections() -> CfarDetections:
    z = jnp.zeros((0,), dtype=jnp.float32)
    zi = jnp.zeros((0,), dtype=jnp.int32)
    return CfarDetections(
        row=zi, col=zi, delay=z, doppler=z, snr=z,
        valid=jnp.zeros((0,), dtype=bool), count=jnp.zeros((), dtype=jnp.int32),
    )


class CpiPipeline:
    """Builds and jit-compiles the full CPI processor for one config."""

    def __init__(
        self,
        config: Config,
        max_detections: int = 128,
        dtype=jnp.complex64,
        spectrum_bandwidth: Optional[float] = None,
        diag_load: float = 0.0,
        use_jit: bool = True,
        clutter_mode: str = "circular",
        use_pallas: "str | bool" = "auto",
    ):
        self.config = config
        cap = config.capture
        proc = config.process
        n = config.n_samples
        if spectrum_bandwidth is None:
            spectrum_bandwidth = getattr(
                getattr(proc, "spectrum", None), "bandwidth", 2000.0)

        self.ambiguity = AmbiguityProcessor(
            proc.ambiguity.delay_min,
            proc.ambiguity.delay_max,
            proc.ambiguity.doppler_min,
            proc.ambiguity.doppler_max,
            cap.fs,
            n,
            round_hamming=True,
            dtype=dtype,
        )
        self.clutter: Optional[WienerHopfFilter] = None
        if proc.clutter.enable:
            # Canceller selection via config (wiener | eca-b | nlms);
            # "wiener" is the reference algorithm (`WienerHopf.cpp`).
            from blah2_tpu.dsp.clutter_eca import make_clutter_filter

            self.clutter = make_clutter_filter(
                proc.clutter, n, dtype=dtype, mode=clutter_mode,
                diag_load=diag_load)
        # Spectrum bandwidth is hardcoded to 2 kHz in the reference
        # (`src/blah2.cpp:198`); here it comes from the
        # process.spectrum.bandwidth config key (SURVEY §2.1 fix), and fc
        # is plumbed from config too.
        self.spectrum = SpectrumAnalyser(n, spectrum_bandwidth, cap.fc, dtype=dtype)
        # Sub-CPI spectra (`SpectrumAnalyser.h:6` TODO, schema extension
        # process.spectrum.nSub): k segments of n//k samples. The sub
        # analyser's bin count AND offset parity are pinned to the
        # full-CPI analyser's, so every waterfall row shares the one
        # emitted frequency axis (a free-running sub geometry diverges at
        # production scale: n=1.5e6, nSub=4 gives 2005 bins vs 2000 — and
        # a 2005-point FFT sits on the exotic-size compile cliff).
        self.spectrum_sub: Optional[SpectrumAnalyser] = None
        self.n_spectrum_sub = int(getattr(
            getattr(proc, "spectrum", None), "n_sub", 1) or 1)
        if self.n_spectrum_sub > 1:
            n_seg = n // self.n_spectrum_sub
            if n_seg < 2 * self.spectrum.n_spectrum:
                raise ValueError(
                    f"process.spectrum.nSub={self.n_spectrum_sub} leaves "
                    f"segments of {n_seg} samples — need at least "
                    f"2x{self.spectrum.n_spectrum} for the shared "
                    f"spectrum-bin geometry")
            self.spectrum_sub = SpectrumAnalyser(
                n_seg, spectrum_bandwidth, cap.fc, dtype=dtype,
                n_spectrum=self.spectrum.n_spectrum,
                offset_even=self.spectrum.decimation % 2 == 0)

        self.detection_enabled = proc.detection.enable
        self.cfar: Optional[CfarDetector] = None
        self.centroid: Optional[CentroidFilter] = None
        self.interpolate: Optional[PeakInterpolator] = None
        # Fused Pallas metrics+CFAR+centroid kernel (ops.pallas_detect):
        # default on for TPU backends, interpreter-mode available for tests.
        if use_pallas == "auto":
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = bool(use_pallas)
        self.fused_detector = None
        if self.detection_enabled:
            from blah2_tpu.dsp.cfar import make_cfar

            # CFAR selection via config (ca | os); "ca" is the reference
            # algorithm (`CfarDetector1D.cpp`). The fused Pallas detection
            # kernel implements CA; OS-CFAR runs the XLA chain (its sort
            # fuses well there).
            self.cfar = make_cfar(
                proc.detection, self.ambiguity.delay_axis,
                self.ambiguity.doppler_axis, max_detections=max_detections)
            # Centroid Doppler window uses the *configured* CPI (1/tCpi), as in
            # `src/blah2.cpp:186`; interpolation uses the map's true-CPI
            # Doppler resolution (axis spacing, `Interpolate.cpp:81`).
            self.centroid = CentroidFilter(
                proc.detection.n_centroid,
                proc.detection.n_centroid,
                1.0 / proc.data.cpi,
            )
            self.interpolate = PeakInterpolator(
                True,
                True,
                self.ambiguity.doppler_resolution,
                self.ambiguity.n_doppler_bins,
                self.ambiguity.n_delay_bins,
            )
            if self.use_pallas and isinstance(self.cfar, CfarDetector):
                from blah2_tpu.ops.pallas_detect import FusedDetector

                self.fused_detector = FusedDetector.from_config(
                    proc, self.ambiguity, max_detections=max_detections)

        def complex_of_parts(re, im):
            real = jnp.float64 if dtype == jnp.complex128 else jnp.float32
            return jax.lax.complex(re.astype(real),
                                   im.astype(real)).astype(dtype)

        def fn_complex(x: jnp.ndarray, y: jnp.ndarray) -> CpiOutputs:
            spec_db = SpectrumAnalyser.to_db(self.spectrum(x))
            sub_db = None if self.spectrum_sub is None \
                else self._sub_spectra_db(x)
            if self.clutter is not None:
                y, clutter_ok = self.clutter(x, y)
            else:
                clutter_ok = jnp.asarray(True)
            z = self.ambiguity(x, y)
            if self.detection_enabled and self.fused_detector is not None:
                db, noise, max_power, det = self.fused_detector(z)
                det = self.interpolate(det, db - noise)
            elif self.detection_enabled:
                db, noise, max_power = map_metrics(z)
                det = self.cfar(z, noise)
                det = self.centroid(det)
                det = self.interpolate(det, db - noise)
            else:
                db, noise, max_power = map_metrics(z)
                det = _empty_detections()
            return CpiOutputs(
                db_map=db,
                noise_power=noise,
                max_power=max_power,
                spectrum_db=spec_db,
                clutter_ok=clutter_ok,
                detections=det,
                sub_spectra_db=sub_db,
            )

        def fn(xp: jnp.ndarray, yp: jnp.ndarray) -> CpiOutputs:
            # Inputs are real/imag planes (n, 2): complex64 host<->device
            # transfers are unsupported on some TPU transports, and split
            # planes are the natural TPU layout anyway. int16 planes (raw
            # ADC counts, the SDR wire format) are accepted and widened
            # on-device — 4x less host->device traffic than f32. Complex is
            # formed on-device.
            return fn_complex(complex_of_parts(xp[:, 0], xp[:, 1]),
                              complex_of_parts(yp[:, 0], yp[:, 1]))

        self._fn = jax.jit(fn) if use_jit else fn
        self._fn_complex = fn_complex
        self._complex_of_parts = complex_of_parts
        # Quad entry: one (n, 4) int16 [i1,q1,i2,q2] array — the replay/SDR
        # record format (RspDuo.cpp:150-179) — as a SINGLE host->device
        # transfer; channels split and widen on device.
        self._fn_quad = jax.jit(lambda q: fn(q[:, :2], q[:, 2:]))
        # Packed-12-bit entry (ops.pack12): the RSPduo digitises at 12
        # bits, so quads pack losslessly two values per 3 bytes — 25%
        # fewer host->device bytes than int16. The planar component-major
        # layout (pack12_quads) makes the unpack pure contiguous vector
        # ops — the previous interleaved layout's relayouts cost more
        # than the entire DSP pipeline (see ops/pack12.py).

        def fn_quad12(packed):
            from blah2_tpu.ops.pack12 import unpack12_quads

            xr, xi, yr, yi = unpack12_quads(packed, n)
            return fn_complex(complex_of_parts(xr, xi),
                              complex_of_parts(yr, yi))

        self._fn_quad12 = jax.jit(fn_quad12)
        self._fn_raw = fn
        # Chunked entries (streaming ingest): the CPI arrives as B
        # fixed-size plane blocks already resident on device (the runtime
        # device_puts each block as capture delivers it, so the transfer
        # rides the CPI fill window like the reference's capture thread t1,
        # `src/blah2.cpp:137-139`); the program concatenates on device.
        self._chunked_cache: dict = {}
        self._plane_dtype = jnp.float64 if dtype == jnp.complex128 \
            else jnp.float32

        # -- staged mode: separately-jitted sub-programs so the runtime can
        # time each stage under the reference's timing keys (spectrum /
        # clutter_filter / ambiguity_processing / detector,
        # `src/blah2.cpp:261-337`). Complex intermediates stay on device
        # between stages; only the jit boundary differs from the fused path.
        def _complex_of(p):
            real = jnp.float64 if dtype == jnp.complex128 else jnp.float32
            p = p.astype(real)  # widen int16/int8 wire planes
            return jax.lax.complex(p[:, 0], p[:, 1]).astype(dtype)

        def stage_spectrum(xp):
            return SpectrumAnalyser.to_db(self.spectrum(_complex_of(xp)))

        # Sub-CPI spectra for the staged path (the fused program computes
        # them inline via the same _sub_spectra_db; staged samples call
        # this outside the timed marks so the timing split stays a pure
        # reference-stage measurement).
        self.sub_spectra_fn = None
        if self.spectrum_sub is not None:
            self.sub_spectra_fn = jax.jit(
                lambda xp: self._sub_spectra_db(_complex_of(xp)))

        def stage_clutter(xp, yp):
            x = _complex_of(xp)
            y = _complex_of(yp)
            if self.clutter is None:
                return x, y, jnp.asarray(True)
            y2, ok = self.clutter(x, y)
            return x, y2, ok

        def stage_ambiguity(x, y):
            z = self.ambiguity(x, y)
            db, noise, max_power = map_metrics(z)
            return z, db, noise, max_power

        def stage_detect(z, db, noise):
            if not self.detection_enabled:
                return _empty_detections()
            if self.fused_detector is not None:
                # Time the production path: the fused Pallas kernel (its
                # metrics recompute is part of that kernel's real cost).
                db_f, noise_f, _, det = self.fused_detector(z)
                return self.interpolate(det, db_f - noise_f)
            det = self.cfar(z, noise)
            det = self.centroid(det)
            return self.interpolate(det, db - noise)

        self.stage_spectrum = jax.jit(stage_spectrum)
        self.stage_clutter = jax.jit(stage_clutter)
        self.stage_ambiguity = jax.jit(stage_ambiguity)
        self.stage_detect = jax.jit(stage_detect)

    def _sub_spectra_db(self, x: jnp.ndarray) -> jnp.ndarray:
        """(k, n_spectrum) dB sub-CPI spectra of the complex CPI — the one
        segment-slicing implementation shared by the fused program and the
        staged-path `sub_spectra_fn`."""
        k, n_seg = self.n_spectrum_sub, self.spectrum_sub.n_samples
        xs = x[: k * n_seg].reshape(k, n_seg)
        return SpectrumAnalyser.to_db(jax.vmap(self.spectrum_sub)(xs))

    @staticmethod
    def to_planes(x, plane_dtype=jnp.float32):
        """complex array → (n, 2) real/imag planes (zero-copy for numpy).

        Integer planes (int16 ADC counts) pass through unchanged — the
        jitted program widens them on-device.
        """
        import numpy as np

        if isinstance(x, np.ndarray) and x.dtype == np.complex64 \
                and plane_dtype == jnp.float32:
            return np.ascontiguousarray(x).view(np.float32).reshape(-1, 2)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
            return jnp.stack([jnp.real(x), jnp.imag(x)],
                             axis=-1).astype(plane_dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.integer):
            return x  # int planes: widen on device, not on host
        return jnp.asarray(x, plane_dtype)  # already planes

    def __call__(self, x, y) -> CpiOutputs:
        """Accepts complex IQ arrays or pre-split (n, 2) planes."""
        return self._fn(self.to_planes(x, self._plane_dtype),
                        self.to_planes(y, self._plane_dtype))

    def call_quad(self, quads) -> CpiOutputs:
        """Process one CPI from interleaved (n, 4) [i1,q1,i2,q2] samples —
        the SDR/replay record layout — in a single host->device transfer."""
        return self._fn_quad(quads)

    def call_quad12(self, packed) -> CpiOutputs:
        """Process one CPI from a packed-12-bit quad buffer
        (`ops.pack12.pack12` of the (n, 4) int16 quads): the minimal wire
        format for 12-bit front-ends like the RSPduo — 6 bytes/sample
        instead of 8."""
        return self._fn_quad12(packed)

    def call_chunks(self, x_chunks, y_chunks) -> CpiOutputs:
        """Process one CPI delivered as equal-size (c, 2) plane chunks.

        The chunks are typically device-resident already (streaming ingest:
        the runtime ships each block as capture delivers it); the jitted
        program concatenates them on device and runs the standard pipeline.
        One program is compiled and cached per chunk count.
        """
        key = (len(x_chunks), len(y_chunks))
        prog = self._chunked_cache.get(key)
        if prog is None:
            fn = self._fn_raw

            def fnc(xc, yc):
                from blah2_tpu.ops.pack12 import unpack_components

                def cat(chunks):
                    # Component-wise concatenation: packed chunks decode
                    # to contiguous (re, im) vectors (zero relayouts);
                    # plane chunks split by column as before.
                    parts = [unpack_components(ch) for ch in chunks]
                    return self._complex_of_parts(
                        jnp.concatenate([p[0] for p in parts]),
                        jnp.concatenate([p[1] for p in parts]))

                return self._fn_complex(cat(xc), cat(yc))

            prog = jax.jit(fnc)
            self._chunked_cache[key] = prog
        return prog(tuple(x_chunks), tuple(y_chunks))

    def call_staged(self, x, y, timer=None) -> CpiOutputs:
        """Run the pipeline as separately-timed stages.

        Slower than the fused path (per-stage dispatch + sync barriers) but
        fills every reference timing key; ``timer`` is a
        :class:`blah2_tpu.data.timing.StageTimer` receiving ``stage()``
        calls with the reference names.
        """
        import numpy as np

        xp = self.to_planes(x, self._plane_dtype)
        yp = self.to_planes(y, self._plane_dtype)

        def mark(name, leaf):
            # Force true completion of the stage's program by fetching a
            # SMALL output of it: block_until_ready returns before
            # execution finishes on some remote TPU transports, which
            # would time only async dispatch. Fetching any output forces
            # the whole program; ``leaf`` is chosen tiny (a scalar or a
            # short vector) so the fetch itself costs one round trip, not
            # a product transfer. Skipped when not timing.
            if timer is not None:
                np.asarray(leaf)
                timer.stage(name)

        spec_db = self.stage_spectrum(xp)
        mark("spectrum", spec_db)
        xc, yc, clutter_ok = self.stage_clutter(xp, yp)
        mark("clutter_filter", clutter_ok)
        z, db, noise, max_power = self.stage_ambiguity(xc, yc)
        mark("ambiguity_processing", noise)
        det = self.stage_detect(z, db, noise)
        mark("detector", det.count)
        return CpiOutputs(
            db_map=db, noise_power=noise, max_power=max_power,
            spectrum_db=spec_db, clutter_ok=clutter_ok, detections=det,
        )
