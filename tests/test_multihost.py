"""Multi-host distribution test: 2 processes × 4 virtual CPU devices run
the sharded pipeline over a global 8-device mesh and must match the
single-process 8-device result (SURVEY §2.5 "CPI sharding across hosts";
the reference has no distributed mode at all).
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Run the same scenes on this process's own 8-device mesh."""
    from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
    from blah2_tpu.config import config_from_dict
    from blah2_tpu.parallel.mesh import make_radar_mesh
    from blah2_tpu.parallel.sharded import ShardedCpiPipeline
    import jax.numpy as jnp

    cfg = config_from_dict({
        "capture": {"fs": 40_000, "fc": 204_640_000},
        "process": {
            "data": {"cpi": 0.1, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -200, "dopplerMax": 200},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 20},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })
    xs, ys = [], []
    for k in range(2):
        x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                             [TargetSpec(10, -33.0, 0.1)],
                             clutter_amplitude=2.0, noise_amplitude=1e-3,
                             seed=100 + k)
        xs.append(x)
        ys.append(y)
    xb, yb = np.stack(xs), np.stack(ys)

    out = {}
    for n_cpi, n_pulse in ((2, 4), (1, 8)):
        mesh = make_radar_mesh(n_cpi, n_pulse)
        # complex64 like the workers.
        pipe = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex64)
        res = pipe(*pipe.shard_inputs(xb[:n_cpi], yb[:n_cpi]))
        out[f"db_{n_cpi}x{n_pulse}"] = np.asarray(res.db_map)
        out[f"ok_{n_cpi}x{n_pulse}"] = np.asarray(res.clutter_ok)
    return out


def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    out_npz = str(tmp_path / "rank0.npz")
    env_base = {
        **os.environ,
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        # Isolate from the session's axon sitecustomize and any
        # conftest-driven settings.
        "JAX_NUM_CPU_DEVICES": "",
    }
    env_base.pop("JAX_NUM_CPU_DEVICES")
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--out", out_npz],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    got = np.load(out_npz)
    want = _single_process_reference()
    for key in ("db_2x4", "db_1x8"):
        assert got[key].shape == want[key].shape
        # Same math, same global device count; tolerance covers f32
        # reduction-order differences across process boundaries.
        np.testing.assert_allclose(got[key], want[key], rtol=0, atol=2e-2)
    assert got["ok_2x4"].all() and got["ok_1x8"].all()
