"""Sharded pipeline on the virtual 8-device CPU mesh vs single-device parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
from blah2_tpu.config import config_from_dict
from blah2_tpu.dsp.pipeline import CpiPipeline
from blah2_tpu.parallel.mesh import make_radar_mesh
from blah2_tpu.parallel.sharded import ShardedCpiPipeline


def _config(fs=80_000, cpi=0.2, detection=True, clutter=True):
    return config_from_dict({
        "capture": {"fs": fs, "fc": 204_640_000},
        "process": {
            "data": {"cpi": cpi, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 60,
                          "dopplerMin": -100, "dopplerMax": 100},
            "clutter": {"enable": clutter, "delayMin": -5, "delayMax": 30},
            "detection": {"enable": detection, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })


def _batch(cfg, b=2, seed=0):
    xs, ys = [], []
    for k in range(b):
        x, y = synthetic_cpi(
            cfg.n_samples, cfg.capture.fs,
            [TargetSpec(20, -44.0, 0.1)],
            clutter_amplitude=2.0, noise_amplitude=1e-3, seed=seed + k)
        xs.append(x)
        ys.append(y)
    return np.stack(xs), np.stack(ys)


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_sharded_matches_single_device(mesh_shape):
    cfg = _config()
    xb, yb = _batch(cfg, b=mesh_shape[0] if mesh_shape[0] > 1 else 2)

    mesh = make_radar_mesh(*mesh_shape)
    sp = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex128)
    out = sp(*sp.shard_inputs(xb, yb))

    # The sharded pipeline computes linear (zero-extended) clutter
    # correlations; compare against the single-device linear mode.
    single = CpiPipeline(cfg, dtype=jnp.complex128, clutter_mode="linear")
    for i in range(xb.shape[0]):
        ref = single(jnp.asarray(xb[i]), jnp.asarray(yb[i]))
        np.testing.assert_allclose(np.asarray(out.db_map)[i],
                                   np.asarray(ref.db_map),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(out.noise_power[i]),
                                   float(ref.noise_power), atol=1e-8)
        np.testing.assert_allclose(np.asarray(out.spectrum_db)[i],
                                   np.asarray(ref.spectrum_db),
                                   rtol=1e-6, atol=1e-6)
        # detection sets agree
        v_s = np.asarray(out.detections.valid)[i]
        v_r = np.asarray(ref.detections.valid)
        got = set(zip(np.asarray(out.detections.row)[i][v_s],
                      np.asarray(out.detections.col)[i][v_s]))
        want = set(zip(np.asarray(ref.detections.row)[v_r],
                       np.asarray(ref.detections.col)[v_r]))
        assert got == want
        assert bool(out.clutter_ok[i]) == bool(ref.clutter_ok)


def test_sharded_target_found():
    cfg = _config()
    xb, yb = _batch(cfg, b=2, seed=5)
    mesh = make_radar_mesh(1, 8)
    sp = ShardedCpiPipeline(cfg, mesh)
    out = sp(*sp.shard_inputs(xb, yb))
    for i in range(2):
        v = np.asarray(out.detections.valid)[i]
        delays = np.asarray(out.detections.delay)[i][v]
        assert np.any(np.abs(delays - 20) < 1.0)


def test_sharded_detection_disabled():
    cfg = _config(detection=False)
    xb, yb = _batch(cfg, b=2)
    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh)
    out = sp(*sp.shard_inputs(xb, yb))
    assert out.detections.delay.shape == (2, 0)


@pytest.mark.parametrize("row_shard", [True, False])
def test_row_shard_layouts_match_single_device(row_shard):
    """The psum_scatter row-sharded Doppler/detection layout (VERDICT r1
    #7) and the replicated psum layout must produce identical products;
    'auto' picks by rows-per-rank, this pins both branches explicitly."""
    cfg = _config()
    xb, yb = _batch(cfg, b=2, seed=11)
    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex128,
                            row_shard=row_shard)
    assert sp._row_shard is row_shard
    out = sp(*sp.shard_inputs(xb, yb))
    single = CpiPipeline(cfg, dtype=jnp.complex128, clutter_mode="linear")
    for i in range(2):
        ref = single(jnp.asarray(xb[i]), jnp.asarray(yb[i]))
        np.testing.assert_allclose(np.asarray(out.db_map)[i],
                                   np.asarray(ref.db_map),
                                   rtol=1e-6, atol=1e-6)
        v_s = np.asarray(out.detections.valid)[i]
        v_r = np.asarray(ref.detections.valid)
        got = set(zip(np.asarray(out.detections.row)[i][v_s],
                      np.asarray(out.detections.col)[i][v_s]))
        want = set(zip(np.asarray(ref.detections.row)[v_r],
                       np.asarray(ref.detections.col)[v_r]))
        assert got == want


def test_sharded_ecab_matches_exact_ls_oracle():
    """Sharded ECA-B (round 2): per-segment exact covariance-method LS
    with halo-borne cross-boundary history. Must equal the NumPy lstsq
    oracle applied to the padded CPI at the sharded segmentation, followed
    by the ambiguity chain."""
    from tests.test_clutter_eca import _exact_ls_oracle

    cfg = _config()
    cfg.process.clutter.filter = "eca-b"
    cfg.process.clutter.n_batches = 8
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(20, -44.0, 0.1)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3,
                         seed=21)

    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex128,
                            diag_load=1e-30)
    assert sp.clutter_kind == "eca-b"
    out = sp(*sp.shard_inputs(np.stack([x, x]), np.stack([y, y])))
    assert bool(out.clutter_ok[0])

    # Oracle: exact LS on the padded CPI at the sharded segment grid.
    n, n_pad = cfg.n_samples, sp.n_pad
    xp = np.pad(x, (0, n_pad - n))
    yp = np.pad(y, (0, n_pad - n))
    y_exp = _exact_ls_oracle(xp, yp, cfg.process.clutter.delay_min,
                             cfg.process.clutter.delay_max,
                             sp.n_batches_eca)

    cfg2 = _config()
    cfg2.process.clutter.enable = False
    single = CpiPipeline(cfg2, dtype=jnp.complex128)
    ref = single(jnp.asarray(x), jnp.asarray(y_exp[:n]))
    np.testing.assert_allclose(np.asarray(out.db_map)[0],
                               np.asarray(ref.db_map),
                               rtol=1e-6, atol=1e-6)


def test_sharded_ecab_detects_target_under_drifting_clutter():
    """End-to-end value check: eca-b in mesh mode cancels drifting clutter
    the full-CPI Wiener filter cannot, recovering the target."""
    rng = np.random.default_rng(3)
    cfg = _config()
    cfg.process.clutter.filter = "eca-b"
    cfg.process.clutter.n_batches = 8
    n, fs = cfg.n_samples, cfg.capture.fs
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    t = np.arange(n) / fs
    gain = (2.0 + 1.0 * np.sin(2 * np.pi * t / t[-1])) * \
        np.exp(1j * np.pi * (t / t[-1]) ** 2)
    # Target OUTSIDE the clutter lag window (delay 35 > delayMax 30):
    # the canceller must remove the drifting clutter and keep the target.
    xd = np.zeros_like(x)
    xd[35:] = x[:-35]
    y = gain * x + 0.1 * xd * np.exp(2j * np.pi * -44.0 * t) + \
        1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh)
    out = sp(*sp.shard_inputs(np.stack([x, x]), np.stack([y, y])))
    v = np.asarray(out.detections.valid)[0]
    delays = np.asarray(out.detections.delay)[0][v]
    assert np.any(np.abs(delays - 35) < 1.0)


def test_sharded_ecab_drift_vs_single_chip_quantified():
    """Mesh ECA-B uses a different segmentation grid than the single-chip
    filter (per-rank divisor segments of block_len vs ceil(n/B) —
    `parallel/sharded.py`, documented divergence). This pins the drift
    with numbers on a drifting-clutter scene (fs=80 kHz, 0.2 s CPI,
    2x4 mesh, nBatches 8): measured r3 —

      zero-Doppler ridge residual:  single 11.86 dB, mesh 12.04 dB (Δ 0.18)
      target-cell SNR:              single 17.12 dB, mesh 17.34 dB (Δ 0.22)
      noise power:                  single 13.88 dB, mesh 13.80 dB (Δ 0.08)

    Asserted at 1 dB. Individual noise-floor cells legitimately differ by
    >10 dB (different residuals of different LS fits); the *suppression*
    metrics and the detection outcome are the invariants."""
    rng = np.random.default_rng(3)
    cfg = _config()
    cfg.process.clutter.filter = "eca-b"
    cfg.process.clutter.n_batches = 8
    n, fs = cfg.n_samples, cfg.capture.fs
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    t = np.arange(n) / fs
    gain = (2.0 + 1.0 * np.sin(2 * np.pi * t / t[-1])) * \
        np.exp(1j * np.pi * (t / t[-1]) ** 2)
    xd = np.zeros_like(x)
    xd[35:] = x[:-35]
    y = gain * x + 0.1 * xd * np.exp(2j * np.pi * -44.0 * t) + \
        1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    single = CpiPipeline(cfg, dtype=jnp.complex128)
    o1 = single(jnp.asarray(x), jnp.asarray(y))
    sp = ShardedCpiPipeline(cfg, make_radar_mesh(2, 4),
                            dtype=jnp.complex128)
    o2 = sp(*sp.shard_inputs(np.stack([x, x]), np.stack([y, y])))

    db1 = np.asarray(o1.db_map)
    db2 = np.asarray(o2.db_map)[0]
    dop = np.asarray(sp.ambiguity.doppler_axis)
    dly = np.asarray(sp.ambiguity.delay_axis)
    ridge = np.abs(dop) < 15

    assert abs(db1[ridge].mean() - db2[ridge].mean()) < 1.0
    assert abs(float(o1.noise_power) - float(o2.noise_power[0])) < 1.0
    r = int(np.argmin(np.abs(dop - (-44.0))))
    c = int(np.argmin(np.abs(dly - 35)))
    snr1 = db1[r, c] - float(o1.noise_power)
    snr2 = db2[r, c] - float(o2.noise_power[0])
    assert abs(snr1 - snr2) < 1.0, (snr1, snr2)
    # Same product outcome: both detect the target at delay 35.
    for out, idx in ((o1, slice(None)), (o2, 0)):
        v = np.asarray(out.detections.valid)[idx]
        delays = np.asarray(out.detections.delay)[idx][v]
        assert np.any(np.abs(delays - 35) < 1.0)


def _nlms_rank_oracle(xs, y, block_len, L, W, mu=0.1, beta=0.9, eps=1e-6):
    """Rank-local overlap-save block NLMS in plain NumPy: the oracle
    `ShardedCpiPipeline._clutter_block_nlms` must match. ``xs`` is the
    globally shifted padded reference, ``y`` the padded surveillance.
    Weights/power restart at every ``block_len`` boundary, then warm-start
    by replaying the previous rank's last ``W`` blocks; overlap-save
    history is the real preceding ``L`` samples (zeros at the CPI start)."""
    n_pad = len(y)
    M = 2 * L

    def adapt(w, p, Xk, yb, err_out=None):
        e = yb - np.fft.ifft(w * Xk)[L:]
        E = np.fft.fft(np.concatenate([np.zeros(L, complex), e]))
        p = beta * p + (1.0 - beta) * np.abs(Xk) ** 2
        w = w + mu * np.conj(Xk) * E / (p + eps)
        wt = np.fft.ifft(w)
        wt[L:] = 0.0
        if err_out is not None:
            err_out[:] = e
        return np.fft.fft(wt), p

    out = np.zeros(n_pad, complex)
    for lo in range(0, n_pad, block_len):
        # (W+1)·L / W·L-sample halos from the previous rank (zeros on
        # rank 0).
        halo_x = np.zeros((W + 1) * L, complex)
        halo_y = np.zeros(W * L, complex)
        take = min((W + 1) * L, lo)
        if take:
            halo_x[(W + 1) * L - take:] = xs[lo - take:lo]
        take_y = min(W * L, lo)
        if take_y:
            halo_y[W * L - take_y:] = y[lo - take_y:lo]
        w = np.zeros(M, complex)
        p = np.full(M, eps)
        for k in range(W):
            Xk = np.fft.fft(halo_x[k * L:k * L + M])
            w, p = adapt(w, p, Xk, halo_y[k * L:(k + 1) * L])
        K = -(-block_len // L)
        pad = K * L - block_len
        xs_loc = np.concatenate([halo_x[-L:], xs[lo:lo + block_len],
                                 np.zeros(pad, complex)])
        yk = np.concatenate([y[lo:lo + block_len],
                             np.zeros(pad, complex)]).reshape(K, L)
        err = np.zeros((K, L), complex)
        for k in range(K):
            Xk = np.fft.fft(xs_loc[k * L:k * L + M])
            w, p = adapt(w, p, Xk, yk[k], err[k])
        out[lo:lo + block_len] = err.reshape(K * L)[:block_len]
    return out


def test_sharded_nlms_matches_rank_local_oracle():
    """Sharded NLMS (round 3): rank-local block NLMS with halo-borne
    overlap-save history. Must equal the NumPy oracle applied to the
    padded CPI at the per-rank restart grid, followed by the ambiguity
    chain (same harness as the ECA-B oracle test)."""
    cfg = _config()
    cfg.process.clutter.filter = "nlms"
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(20, -44.0, 0.1)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3,
                         seed=33)

    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex128)
    assert sp.clutter_kind == "nlms"
    out = sp(*sp.shard_inputs(np.stack([x, x]), np.stack([y, y])))
    assert bool(out.clutter_ok[0])

    n, n_pad = cfg.n_samples, sp.n_pad
    s = cfg.process.clutter.delay_min
    xp = np.pad(x, (0, n_pad - n))
    yp = np.pad(y, (0, n_pad - n))
    xs = np.zeros(n_pad, complex)
    if s < 0:
        xs[:n_pad + s] = xp[-s:]
    elif s > 0:
        xs[s:] = xp[:-s]
    else:
        xs = xp.astype(complex)
    y_exp = _nlms_rank_oracle(xs, yp, sp.block_len, sp.nlms_L, sp.nlms_W,
                              mu=sp.nlms_mu, beta=sp.nlms_beta,
                              eps=sp.nlms_eps)

    cfg2 = _config()
    cfg2.process.clutter.enable = False
    single = CpiPipeline(cfg2, dtype=jnp.complex128)
    ref = single(jnp.asarray(x), jnp.asarray(y_exp[:n]))
    np.testing.assert_allclose(np.asarray(out.db_map)[0],
                               np.asarray(ref.db_map),
                               rtol=1e-6, atol=1e-6)


def test_sharded_nlms_drift_vs_single_chip_quantified():
    """Mesh NLMS restarts the weight/power state at every rank block and
    warm-starts it by replaying the previous rank's last W blocks
    (`parallel/sharded.py`, documented divergence). Pinned with numbers
    on the drifting-clutter scene of the ECA-B drift test (fs=80 kHz,
    0.2 s CPI, 2x4 mesh, W=20): measured r3 —

      zero-Doppler ridge residual:  single 18.38 dB, mesh 19.03 (Δ 0.65)
      noise power:                  single 17.49 dB, mesh 17.45 (Δ 0.04)
      target-cell SNR:              single 13.62 dB, mesh 13.74 (Δ 0.13)

    (without the warm-start replay the ridge drift was 2.95 dB — the
    replay is what makes rank restarts cheap). Asserted at 2 dB; both
    modes must detect the target at delay 35."""
    rng = np.random.default_rng(3)
    cfg = _config()
    cfg.process.clutter.filter = "nlms"
    n, fs = cfg.n_samples, cfg.capture.fs
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    t = np.arange(n) / fs
    gain = (2.0 + 1.0 * np.sin(2 * np.pi * t / t[-1])) * \
        np.exp(1j * np.pi * (t / t[-1]) ** 2)
    xd = np.zeros_like(x)
    xd[35:] = x[:-35]
    y = gain * x + 0.1 * xd * np.exp(2j * np.pi * -44.0 * t) + \
        1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    single = CpiPipeline(cfg, dtype=jnp.complex128)
    o1 = single(jnp.asarray(x), jnp.asarray(y))
    sp = ShardedCpiPipeline(cfg, make_radar_mesh(2, 4),
                            dtype=jnp.complex128)
    assert sp.clutter_kind == "nlms"
    o2 = sp(*sp.shard_inputs(np.stack([x, x]), np.stack([y, y])))

    db1 = np.asarray(o1.db_map)
    db2 = np.asarray(o2.db_map)[0]
    dop = np.asarray(sp.ambiguity.doppler_axis)
    dly = np.asarray(sp.ambiguity.delay_axis)
    ridge = np.abs(dop) < 15

    assert abs(db1[ridge].mean() - db2[ridge].mean()) < 2.0
    assert abs(float(o1.noise_power) - float(o2.noise_power[0])) < 2.0
    r = int(np.argmin(np.abs(dop - (-44.0))))
    c = int(np.argmin(np.abs(dly - 35)))
    snr1 = db1[r, c] - float(o1.noise_power)
    snr2 = db2[r, c] - float(o2.noise_power[0])
    assert abs(snr1 - snr2) < 2.0, (snr1, snr2)
    for out, idx in ((o1, slice(None)), (o2, 0)):
        v = np.asarray(out.detections.valid)[idx]
        delays = np.asarray(out.detections.delay)[idx][v]
        assert np.any(np.abs(delays - 35) < 1.0)


def test_calibrate_row_shard_picks_measured_winner():
    """row_shard='calibrate' (round 3): measure both Doppler-output
    layouts on the actual mesh and keep the faster — replaces the static
    'auto' crossover, which was calibrated on the virtual CPU mesh and
    may be wrong on real ICI (VERDICT r2 #6). Here we only pin the
    contract: both arms measured, winner consistent with the numbers."""
    from blah2_tpu.parallel.sharded import calibrate_row_shard

    cfg = _config()
    cal = calibrate_row_shard(cfg, make_radar_mesh(2, 4), n_trials=2)
    assert cal["ms_on"] > 0.0 and cal["ms_off"] > 0.0
    assert cal["row_shard"] == (cal["ms_on"] <= cal["ms_off"])


def test_sharded_os_cfar_matches_single_device():
    """process.detection.cfar='os' in mesh mode: the OS-CFAR detector
    row-shards like CA (per-Doppler-row delay windows); detection sets
    must match the single-device OS pipeline."""
    cfg = _config()
    cfg.process.detection.cfar = "os"
    xb, yb = _batch(cfg, b=2, seed=3)

    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex128)
    from blah2_tpu.dsp.cfar import OsCfarDetector

    assert isinstance(sp.cfar, OsCfarDetector)
    out = sp(*sp.shard_inputs(xb, yb))

    single = CpiPipeline(cfg, dtype=jnp.complex128, clutter_mode="linear")
    assert isinstance(single.cfar, OsCfarDetector)
    for i in range(2):
        ref = single(jnp.asarray(xb[i]), jnp.asarray(yb[i]))
        v_s = np.asarray(out.detections.valid)[i]
        v_r = np.asarray(ref.detections.valid)
        got = set(zip(np.asarray(out.detections.row)[i][v_s],
                      np.asarray(out.detections.col)[i][v_s]))
        want = set(zip(np.asarray(ref.detections.row)[v_r],
                       np.asarray(ref.detections.col)[v_r]))
        assert got == want and len(want) >= 1
