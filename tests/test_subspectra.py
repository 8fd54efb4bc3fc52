"""Sub-CPI spectra (process.spectrum.nSub — implements the reference's
`SpectrumAnalyser.h:6` TODO "Potentially create k spectrum plots from
sub-CPIs"; schema extension, single-chip pipeline).

The CPI splits into k equal segments; each runs the same
decimate-by-folding analyser at the segment length (same bandwidth ⇒ the
same n_spectrum bin count and frequency axis, coarser underlying
resolution). The IQ product gains a (k, n_spectrum) ``subSpectra`` member
and the iqdata stash turns it into a k×-finer waterfall.
"""

import json

import jax.numpy as jnp
import numpy as np

from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
from blah2_tpu.config import config_from_dict
from blah2_tpu.data.iq import IqMetadata
from blah2_tpu.dsp.pipeline import CpiPipeline
from blah2_tpu.net.stash import IqDataStash


def _config(n_sub=4, fs=80_000, cpi=0.2):
    return config_from_dict({
        "capture": {"fs": fs, "fc": 204_640_000},
        "process": {
            "data": {"cpi": cpi, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 60,
                          "dopplerMin": -100, "dopplerMax": 100},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 30},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
            "spectrum": {"bandwidth": 2000.0, "nSub": n_sub},
        },
    })


def _spectrum_oracle_db(x, bandwidth):
    """Brute-force reference semantics (`SpectrumAnalyser.cpp:16-55`):
    full nfft-point FFT, bin permutation, stride decimation."""
    n = len(x)
    dec = int(n / bandwidth)
    return _decimated_oracle_db(x, dec, n // dec)


def _decimated_oracle_db(x, dec, ns):
    nfft = ns * dec
    f = np.fft.fft(np.asarray(x[:nfft], complex))
    sel = (np.arange(ns) * dec + nfft // 2 + 1) % nfft
    return 10.0 * np.log10(np.abs(f[sel]))


def _sub_oracle_db(x_seg, ns, offset_even):
    """Sub-analyser geometry: bin count pinned to the full analyser's,
    decimation parity coerced to match its frequency-offset convention."""
    dec = len(x_seg) // ns
    if (dec % 2 == 0) != offset_even:
        dec -= 1
    return _decimated_oracle_db(x_seg, dec, ns)


def test_sub_spectra_match_per_segment_oracle():
    cfg = _config(n_sub=4)
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(20, -44.0, 0.1)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3,
                         seed=9)
    pipe = CpiPipeline(cfg, dtype=jnp.complex128)
    out = pipe(jnp.asarray(x), jnp.asarray(y))
    sub = np.asarray(out.sub_spectra_db)
    ns = pipe.spectrum.n_spectrum
    n_seg = pipe.spectrum_sub.n_samples
    assert sub.shape == (4, ns)
    assert n_seg == cfg.n_samples // 4
    even = pipe.spectrum.decimation % 2 == 0
    for k in range(4):
        want = _sub_oracle_db(x[k * n_seg:(k + 1) * n_seg], ns, even)
        np.testing.assert_allclose(sub[k], want, rtol=1e-8, atol=1e-8)
    # The full-CPI spectrum is still the reference-exact one.
    want_full = _spectrum_oracle_db(x, cfg.process.spectrum.bandwidth)
    np.testing.assert_allclose(np.asarray(out.spectrum_db), want_full,
                               rtol=1e-8, atol=1e-8)


def test_sub_spectra_disabled_by_default():
    cfg = _config(n_sub=1)
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(20, -44.0, 0.1)], seed=3)
    pipe = CpiPipeline(cfg)
    assert pipe.spectrum_sub is None
    out = pipe(jnp.asarray(x, jnp.complex64), jnp.asarray(y, jnp.complex64))
    assert out.sub_spectra_db is None


def test_sub_analyser_geometry_pinned_at_production_scale():
    """At the production 1.5 Msample CPI a free-running sub analyser
    diverges (nSub=4 segment: dec=int(375000/2000)=187 -> 2005 bins vs
    the full analyser's 2000, an exotic FFT size on TPU). The pinned
    geometry must keep the bin count, offset parity and frequency axis
    identical to the full-CPI analyser's."""
    from blah2_tpu.dsp.spectrum import SpectrumAnalyser

    full = SpectrumAnalyser(1_500_000, 2000.0)
    assert full.n_spectrum == 2000 and full.decimation == 750
    free = SpectrumAnalyser(375_000, 2000.0)
    assert free.n_spectrum != full.n_spectrum  # the divergence being fixed
    sub = SpectrumAnalyser(375_000, 2000.0,
                           n_spectrum=full.n_spectrum,
                           offset_even=full.decimation % 2 == 0)
    assert sub.n_spectrum == full.n_spectrum
    assert sub.decimation % 2 == full.decimation % 2 == 0
    assert sub.decimation == 186  # 187 coerced down for parity
    np.testing.assert_allclose(sub.frequency_khz, full.frequency_khz)


def test_stash_cpi_window_survives_mixed_docs():
    """Retention is counted in CPIs, not rows: a doc without subSpectra
    arriving amid sub-carrying docs must not collapse the waterfall."""
    meta = IqMetadata()
    freq = np.linspace(204_000.0, 204_100.0, 8)
    spec = np.arange(8.0)
    sub = np.stack([spec + 10.0, spec + 20.0])
    stash = IqDataStash()
    for t in range(5):
        meta.update(freq, spec, sub)
        stash.update(meta.to_json(1000 + t))
    plain = IqMetadata()
    plain.update(freq, spec)
    stash.update(plain.to_json(1010))
    d = json.loads(stash.get())
    # 5 sub docs x 2 rows + 1 plain row — nothing trimmed (6 CPIs < 20).
    assert len(d["spectrum"]) == 11


def test_n_sub_too_large_rejected():
    import pytest

    with pytest.raises(ValueError, match="nSub"):
        CpiPipeline(_config(n_sub=64, fs=40_000, cpi=0.1))


def test_iq_json_and_stash_carry_sub_spectra():
    meta = IqMetadata()
    freq = np.linspace(204_000.0, 204_100.0, 8)
    spec = np.arange(8.0)
    sub = np.stack([spec + 10.0, spec + 20.0])
    meta.update(freq, spec, sub)
    doc = json.loads(meta.to_json(1234))
    assert np.asarray(doc["subSpectra"]).shape == (2, 8)

    stash = IqDataStash()
    stash.update(meta.to_json(1234))
    stash.update(meta.to_json(1235))
    d = json.loads(stash.get())
    # Two CPIs x 2 sub-rows each = 4 waterfall rows, newest last.
    assert len(d["spectrum"]) == 4
    np.testing.assert_allclose(d["spectrum"][-1], sub[1])
    # A staged-sample CPI omits sub spectra: the product retains the
    # previous ones instead of flickering to nothing.
    meta.update(freq, spec, None)
    doc2 = json.loads(meta.to_json(1236))
    assert np.asarray(doc2["subSpectra"]).shape == (2, 8)

    # Window cap: N_CPI x k rows.
    for t in range(50):
        stash.update(meta.to_json(2000 + t))
    d = json.loads(stash.get())
    assert len(d["spectrum"]) == IqDataStash.N_CPI * 2


def test_mesh_sub_spectra_match_single_chip():
    """Mesh-mode sub spectra (per-segment masked folds + one (k, ns)
    psum) must equal the single-chip pipeline's exactly — the segment
    twiddle rows are zero outside their segment, so rank blocks
    straddling a boundary contribute to both sides correctly."""
    from blah2_tpu.parallel.mesh import make_radar_mesh
    from blah2_tpu.parallel.sharded import ShardedCpiPipeline

    cfg = _config(n_sub=4)
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(20, -44.0, 0.1)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3,
                         seed=13)
    single = CpiPipeline(cfg, dtype=jnp.complex128)
    o1 = single(jnp.asarray(x), jnp.asarray(y))

    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex128)
    assert sp.spectrum_sub is not None
    o2 = sp(*sp.shard_inputs(np.stack([x, x]), np.stack([y, y])))
    sub1 = np.asarray(o1.sub_spectra_db)
    sub2 = np.asarray(o2.sub_spectra_db)
    assert sub2.shape == (2, 4, sp.spectrum.n_spectrum)
    np.testing.assert_allclose(sub2[0], sub1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o2.spectrum_db)[0],
                               np.asarray(o1.spectrum_db),
                               rtol=1e-6, atol=1e-6)


def test_runtime_emits_sub_spectra():
    """Full runtime loop: /api-bound iqdata JSON carries subSpectra on
    every CPI (including fused ones after a staged timing sample)."""
    from blah2_tpu.config import load_config
    from blah2_tpu.runtime.radar import RadarRuntime

    cfg = load_config("config/config-synthetic.yml")
    cfg.process.spectrum.n_sub = 4
    rt = RadarRuntime(cfg, staged_sample_every=2, staged_warmup="sync")
    docs = []
    orig = rt._emit

    def capture(product, payload, **kw):
        if product == "iqdata":
            docs.append(json.loads(payload))
        return orig(product, payload, **kw)

    rt._emit = capture
    rt.start_capture()
    try:
        rt.run(n_cpis=3, quiet=True)
    finally:
        rt.stop()
    assert len(docs) == 3
    k = None
    for doc in docs:
        assert "subSpectra" in doc
        sub = np.asarray(doc["subSpectra"], dtype=float)
        assert sub.ndim == 2 and sub.shape[0] == 4
        assert np.all(np.isfinite(sub))
        k = sub.shape
    assert k is not None
