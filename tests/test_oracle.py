"""Cross-validation against the REFERENCE implementation itself.

tests/oracle/ compiles the reference's unmodified DSP core
(`Ambiguity.cpp`, `WienerHopf.cpp`, `CfarDetector1D.cpp`, data classes)
with shim headers standing in for fftw3/armadillo/rapidjson, and this test
runs both implementations on the same generated .rspduo file — the
functional tier the reference sketched but never built
(`test/README.md`), with the reference code as the oracle instead of a
re-derivation. Retires the round-1 "self-referential parity" risk.

Skips when no C++ toolchain is present or the reference tree is absent.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = os.path.join(REPO, "tests", "oracle")
REFERENCE = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.isdir(REFERENCE),
    reason="oracle needs g++ and the mounted reference tree")

FS = 200_000
CPI_S = 0.1
SCENE = dict(targets=[(40, -77.0, 0.05), (61, 112.0, 0.03)],
             clutter=3.0, noise=1e-3, seed=20240817)
AMB = dict(delay_min=-10, delay_max=100, doppler_min=-200, doppler_max=200)
CLUTTER = dict(delay_min=-10, delay_max=100)
DET = dict(pfa=1e-5, n_guard=2, n_train=6, min_delay=5, min_doppler=15.0)


@pytest.fixture(scope="module")
def oracle_bin():
    r = subprocess.run(["make", "-C", ORACLE_DIR], capture_output=True,
                       text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed:\n{r.stdout}\n{r.stderr}")
    return os.path.join(ORACLE_DIR, "oracle")


def test_fft_shim_matches_numpy(oracle_bin, tmp_path):
    """The fftw3 shim is load-bearing for every oracle number; pin it to
    numpy.fft through the harness: with clutter+detection off and a
    delta-like scene, the map IS a set of DFT values. Cheaper and tighter:
    validated implicitly by the map parity below — this test just asserts
    the harness runs and reports sane dims for the golden-constant config
    (nCorr=3322, nfft 6643→6750, `TestAmbiguity.cpp:89-92,112-115`)."""
    rng = np.random.default_rng(0)
    n = int(2_000_000 * 0.5)
    quads = (rng.standard_normal((n, 4)) * 400).astype(np.int16)
    f = tmp_path / "rand.rspduo"
    quads.tofile(f)
    out = tmp_path / "out.bin"
    r = subprocess.run(
        [oracle_bin, str(f), str(out), "2000000", "0.5", "-10", "300",
         "-300", "300", "0", "0", "0", "1e-5", "2", "6", "5", "15"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    rows, cols, cmap, noise, maxp, ok, det = _read_oracle(out)
    assert rows == 301 and cols == 311  # nDopplerBins, nDelayBins (+1 ref)
    assert np.isfinite(cmap).all()
    assert noise > 0 and maxp > 0


def _scene_file(tmp_path):
    from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
    from blah2_tpu.capture.source import Source

    n = int(FS * CPI_S)
    x, y = synthetic_cpi(
        n, FS, [TargetSpec(*t) for t in SCENE["targets"]],
        clutter_amplitude=SCENE["clutter"], noise_amplitude=SCENE["noise"],
        seed=SCENE["seed"])
    src = Source("RspDuo", FS, 204_640_000, path=str(tmp_path))
    fname = src.open_record_file()
    src.record(x * 4000.0, y * 4000.0)
    src.close_record_file()
    return fname, n


def _read_oracle(path):
    with open(path, "rb") as f:
        rows, cols = struct.unpack("<ii", f.read(8))
        cmap = np.fromfile(f, dtype=np.complex128, count=rows * cols)
        cmap = cmap.reshape(rows, cols)
        noise, maxp = struct.unpack("<dd", f.read(16))
        ok, ndet = struct.unpack("<ii", f.read(8))
        det = np.fromfile(f, dtype=np.float64,
                          count=3 * ndet).reshape(ndet, 3)
    return rows, cols, cmap, noise, maxp, ok, det


@pytest.fixture(scope="module")
def both_outputs(oracle_bin, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("oracle")
    fname, n = _scene_file(tmp_path)
    out = tmp_path / "oracle.bin"
    r = subprocess.run(
        [oracle_bin, fname, str(out), str(FS), str(CPI_S),
         str(AMB["delay_min"]), str(AMB["delay_max"]),
         str(AMB["doppler_min"]), str(AMB["doppler_max"]),
         "1", str(CLUTTER["delay_min"]), str(CLUTTER["delay_max"]),
         str(DET["pfa"]), str(DET["n_guard"]), str(DET["n_train"]),
         str(DET["min_delay"]), str(DET["min_doppler"])],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr + r.stdout
    oracle = _read_oracle(out)

    # Same file through the TPU pipeline at float64 with the reference's
    # circular clutter mode.
    import jax.numpy as jnp

    from blah2_tpu.capture.replay import FileReplaySource
    from blah2_tpu.config import config_from_dict
    from blah2_tpu.data.iq import IqRingBuffer
    from blah2_tpu.dsp.pipeline import CpiPipeline

    cfg = config_from_dict({
        "capture": {"fs": FS, "fc": 204_640_000},
        "process": {
            "data": {"cpi": CPI_S, "buffer": 2},
            "ambiguity": {"delayMin": AMB["delay_min"],
                          "delayMax": AMB["delay_max"],
                          "dopplerMin": AMB["doppler_min"],
                          "dopplerMax": AMB["doppler_max"]},
            "clutter": {"enable": True,
                        "delayMin": CLUTTER["delay_min"],
                        "delayMax": CLUTTER["delay_max"]},
            "detection": {"enable": True, "pfa": DET["pfa"],
                          "nGuard": DET["n_guard"],
                          "nTrain": DET["n_train"],
                          "minDelay": DET["min_delay"],
                          "minDoppler": DET["min_doppler"],
                          "nCentroid": 6},
        },
    })
    buf1, buf2 = IqRingBuffer(2 * n), IqRingBuffer(2 * n)
    FileReplaySource(FS, 204_640_000, fname, loop=False).process(buf1, buf2)
    xr = buf1.pop(n, timeout=0)
    yr = buf2.pop(n, timeout=0)
    pipe = CpiPipeline(cfg, dtype=jnp.complex128, use_pallas=False)
    ours = pipe(xr.astype(np.complex128), yr.astype(np.complex128))
    return oracle, ours, cfg, (xr, yr)


class TestOracleParity:
    def test_map_dimensions(self, both_outputs):
        (rows, cols, cmap, *_), ours, _, _ = both_outputs
        db = np.asarray(ours.db_map)
        # Reference nDelayBins = delayMax-delayMin+1 with an acknowledged
        # 1-bin windowing offset (`Ambiguity.h:7`, `Ambiguity.cpp:131-146`)
        # and this build keeps delayMax-delayMin+1 too.
        assert (rows, cols) == db.shape

    def test_map_cellwise_parity(self, both_outputs):
        """Cell-wise complex map parity, float64 both sides. Both compute
        identical linear correlations (different-but-sufficient FFT sizes)
        so disagreement means an algorithm divergence, not noise."""
        (rows, cols, cmap, *_), ours, _, _ = both_outputs
        ours_db = np.asarray(ours.db_map)
        ref_db = 10 * np.log10(np.abs(cmap))
        np.testing.assert_allclose(ours_db, ref_db, rtol=0, atol=1e-6)

    def test_metrics_parity(self, both_outputs):
        (_, _, _, noise, maxp, ok, _), ours, _, _ = both_outputs
        assert ok == 1 and bool(ours.clutter_ok)
        assert abs(float(ours.noise_power) - noise) < 1e-6
        assert abs(float(ours.max_power) - maxp) < 1e-6

    def test_detection_parity(self, both_outputs):
        """Raw CFAR cells must agree. The TPU pipeline's emitted product
        applies centroid+interpolation after CFAR, so compare its raw CFAR
        stage (same class the product uses) against the oracle's cells."""
        (_, _, cmap, noise, _, _, det_ref), ours, cfg, _ = both_outputs
        import jax.numpy as jnp

        from blah2_tpu.dsp.ambiguity import AmbiguityProcessor
        from blah2_tpu.dsp.cfar import CfarDetector

        amb = AmbiguityProcessor(
            AMB["delay_min"], AMB["delay_max"], AMB["doppler_min"],
            AMB["doppler_max"], FS, int(FS * CPI_S), dtype=jnp.complex128)
        cfar = CfarDetector(DET["pfa"], DET["n_guard"], DET["n_train"],
                            DET["min_delay"], DET["min_doppler"],
                            amb.delay_axis, amb.doppler_axis,
                            max_detections=256)
        det = cfar(jnp.asarray(cmap), jnp.asarray(noise))
        v = np.asarray(det.valid)
        got = np.array(sorted(zip(np.asarray(det.delay)[v],
                                  np.asarray(det.doppler)[v],
                                  np.asarray(det.snr)[v])))
        want = np.array(sorted(map(tuple, det_ref)))
        assert got.shape == want.shape, (got, want)
        # Same cells (delay exact; doppler axis is stored f32 on our side),
        # same SNRs.
        np.testing.assert_allclose(got[:, 0], want[:, 0], atol=0)
        np.testing.assert_allclose(got[:, 1], want[:, 1],
                                   rtol=1e-6, atol=1e-4)
        np.testing.assert_allclose(got[:, 2], want[:, 2],
                                   rtol=0, atol=1e-4)  # SNR stored f32


class TestOracleF32:
    """Production-dtype (complex64) bound against the float64 compiled
    oracle — BASELINE's "maps bit-matched within SNR bound" criterion with
    the bound quantified (also stated in PARITY.md): measured max cell-wise
    error on this scene is 0.0104 dB across the whole map; asserted at
    0.05 dB. Detection sets at the default pfa must be identical."""

    @pytest.fixture(scope="class")
    def f32_outputs(self, both_outputs):
        import jax.numpy as jnp

        from blah2_tpu.dsp.pipeline import CpiPipeline

        (_, _, cmap, noise, maxp, ok, det_ref), _, cfg, (xr, yr) = \
            both_outputs
        pipe = CpiPipeline(cfg, dtype=jnp.complex64, use_pallas=False)
        x32, y32 = xr.astype(np.complex64), yr.astype(np.complex64)
        out = pipe(x32, y32)
        # The staged API exposes the complex map for raw-CFAR comparison.
        xc, yc, _ = pipe.stage_clutter(pipe.to_planes(x32),
                                       pipe.to_planes(y32))
        z32, _, noise32, _ = pipe.stage_ambiguity(xc, yc)
        return out, np.asarray(z32), float(noise32), \
            (cmap, noise, maxp, det_ref)

    def test_map_cellwise_db_bound(self, f32_outputs):
        out, _, _, (cmap, _, _, _) = f32_outputs
        ref_db = 10 * np.log10(np.abs(cmap))
        diff = np.abs(np.asarray(out.db_map) - ref_db)
        assert float(diff.max()) < 0.05, float(diff.max())

    def test_metrics_bound(self, f32_outputs):
        out, _, _, (_, noise, maxp, _) = f32_outputs
        assert abs(float(out.noise_power) - noise) < 1e-3
        assert abs(float(out.max_power) - maxp) < 1e-3

    def test_detection_set_equality(self, f32_outputs):
        """Raw CFAR at complex64 must fire on exactly the oracle's cells at
        the default pfa (the f32 dB perturbation is far below the CFAR
        threshold margin on this scene)."""
        import jax.numpy as jnp

        from blah2_tpu.dsp.ambiguity import AmbiguityProcessor
        from blah2_tpu.dsp.cfar import CfarDetector

        _, z32, noise32, (_, _, _, det_ref) = f32_outputs
        amb = AmbiguityProcessor(
            AMB["delay_min"], AMB["delay_max"], AMB["doppler_min"],
            AMB["doppler_max"], FS, int(FS * CPI_S), dtype=jnp.complex64)
        cfar = CfarDetector(DET["pfa"], DET["n_guard"], DET["n_train"],
                            DET["min_delay"], DET["min_doppler"],
                            amb.delay_axis, amb.doppler_axis,
                            max_detections=256)
        det = cfar(jnp.asarray(z32), jnp.asarray(noise32))
        v = np.asarray(det.valid)
        got = np.array(sorted(zip(np.asarray(det.delay)[v],
                                  np.asarray(det.doppler)[v])))
        want = np.array(sorted(map(tuple, det_ref[:, :2])))
        assert got.shape == want.shape, (got, want)
        np.testing.assert_allclose(got[:, 0], want[:, 0], atol=0)
        np.testing.assert_allclose(got[:, 1], want[:, 1],
                                   rtol=1e-6, atol=1e-4)
