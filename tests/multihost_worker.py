"""Multi-process worker for the multi-host sharded-pipeline test.

Launched by tests/test_multihost.py (and `__graft_entry__.py dryrun2proc`)
as N coordinated processes, each with its own set of virtual CPU devices
(`--xla_force_host_platform_device_count`). Every process runs the same
program: initialize `jax.distributed`, build a global (cpi × pulse) mesh,
run the sharded pipeline on a seeded synthetic batch, allgather the map,
and (rank 0) save outputs for the parent to compare against a
single-process run.

Two mesh shapes exercise both distribution regimes (SURVEY §2.5):
  - (cpi=2, pulse=4): each CPI entirely inside one process — cross-host
    data parallelism, no cross-host halo traffic;
  - (cpi=1, pulse=8): one CPI's time axis spanning both processes — the
    overlap-save halo exchange and the Doppler psum cross the process
    boundary (the DCN path on a real deployment).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True, help="rank-0 output .npz path")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from blah2_tpu.parallel.distributed import maybe_initialize

    assert maybe_initialize(args.coordinator, args.num_processes,
                            args.process_id)
    assert jax.process_count() == args.num_processes

    import numpy as np
    from jax.experimental import multihost_utils

    from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
    from blah2_tpu.config import config_from_dict
    from blah2_tpu.parallel.mesh import make_radar_mesh
    from blah2_tpu.parallel.sharded import ShardedCpiPipeline

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
    # Same seeded scene on every process (each host's capture feeds the
    # same global CPI schedule in this test).
    xs, ys = [], []
    for k in range(2):
        x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                             [TargetSpec(10, -33.0, 0.1)],
                             clutter_amplitude=2.0, noise_amplitude=1e-3,
                             seed=100 + k)
        xs.append(x)
        ys.append(y)
    xb, yb = np.stack(xs), np.stack(ys)

    n_dev = len(jax.devices())
    results = {}
    for n_cpi, n_pulse in ((2, n_dev // 2), (1, n_dev)):
        mesh = make_radar_mesh(n_cpi, n_pulse)
        pipe = ShardedCpiPipeline(cfg, mesh)
        bsel = slice(0, n_cpi)
        out = pipe(*pipe.shard_inputs(xb[bsel], yb[bsel]))
        db = multihost_utils.process_allgather(out.db_map, tiled=True)
        ok = multihost_utils.process_allgather(out.clutter_ok, tiled=True)
        results[f"db_{n_cpi}x{n_pulse}"] = np.asarray(db)
        results[f"ok_{n_cpi}x{n_pulse}"] = np.asarray(ok)
        print(f"[rank {args.process_id}] mesh {n_cpi}x{n_pulse}: "
              f"map {np.asarray(db).shape} ok={np.asarray(ok).tolist()}",
              flush=True)

    # Cross-host row-shard calibration (round 3): every process must end
    # up with rank 0's broadcast decision, and the local-shard forcing
    # must not trip the non-addressable-fetch error.
    from blah2_tpu.parallel.sharded import calibrate_row_shard

    cal = calibrate_row_shard(cfg, make_radar_mesh(2, n_dev // 2),
                              n_trials=1)
    assert isinstance(cal["row_shard"], bool)
    assert cal["pipeline"]._row_shard == cal["row_shard"]
    agreed = multihost_utils.process_allgather(
        np.asarray([cal["row_shard"]]), tiled=True)
    assert np.all(agreed == agreed[0]), agreed
    print(f"[rank {args.process_id}] calibrate: row_shard="
          f"{cal['row_shard']} (on={cal['ms_on']:.1f} "
          f"off={cal['ms_off']:.1f})", flush=True)

    if args.process_id == 0:
        np.savez(args.out, **results)
    multihost_utils.sync_global_devices("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
