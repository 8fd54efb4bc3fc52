"""CLI entry point: ``python -m blah2_tpu.runtime.cli --config <file.yml>``.

Mirrors the reference binary's interface ``blah2 -c config.yml``
(`src/blah2.cpp:387-436`), plus flags for the TPU build: platform selection,
CPI count limits, in-process vs TCP API wiring, and a web root for the
display layer.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="blah2_tpu",
                                     description="TPU-native passive radar")
    parser.add_argument("--config", "-c", required=True,
                        help="YAML config file (blah2 schema)")
    parser.add_argument("--cpis", type=int, default=None,
                        help="stop after N CPIs (default: run forever)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu, tpu)")
    parser.add_argument("--no-api", action="store_true",
                        help="do not start the REST API server")
    parser.add_argument("--tcp-egress", action="store_true",
                        help="send products over the six TCP streams "
                             "(reference wire contract) instead of "
                             "in-process publishing")
    default_web = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "web")
    parser.add_argument("--web-root",
                        default=default_web if os.path.isdir(default_web)
                        else None,
                        help="serve the web frontend from this directory "
                             "(default: the repo's web/)")
    parser.add_argument("--staged-timing", action="store_true",
                        help="time each DSP stage separately (fills all "
                             "reference timing keys; adds sync barriers)")
    parser.add_argument("--staged-sample-every", type=int, default=16,
                        metavar="N",
                        help="refresh the fused path's per-stage timing "
                             "split with a staged sample every N CPIs "
                             "(0 disables — use on transports where the "
                             "extra staged compiles are too slow; "
                             "default 16)")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace for the first CPIs "
                             "to this directory")
    parser.add_argument("--no-defer-fetch", action="store_true",
                        help="fetch each CPI's products synchronously "
                             "instead of one CPI behind (deferred fetch "
                             "overlaps the fetch round trip with the next "
                             "CPI's in-flight work; default on)")
    parser.add_argument("--transport-recycle", type=int, default=0,
                        metavar="N",
                        help="recycle the device transport every N CPIs "
                             "(bounds native per-RPC RSS retention on "
                             "remote transports; 0 disables)")
    parser.add_argument("--ingest-chunks", type=int, default=None,
                        help="stream each CPI to the device in this many "
                             "blocks as capture delivers them (transfer "
                             "overlaps the fill window; default: auto)")
    parser.add_argument("--mesh", default=None, metavar="CPIxPULSE",
                        help="run the multi-chip sharded pipeline over a "
                             "(cpi, pulse) device mesh, e.g. 2x4 "
                             "(requires cpi*pulse <= len(jax.devices()))")
    parser.add_argument("--halo-backend", default="ppermute",
                        choices=("ppermute", "pallas"),
                        help="overlap-save halo exchange backend in mesh "
                             "mode")
    parser.add_argument("--row-shard", default="auto",
                        choices=("auto", "on", "off", "calibrate"),
                        help="mesh-mode Doppler-output layout: auto "
                             "(static rows-per-rank crossover), on/off, "
                             "or calibrate (measure both layouts on this "
                             "mesh at startup and keep the winner)")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host: coordinator host:port (or 'auto' "
                             "for cloud-TPU detection); also via "
                             "BLAH2_COORDINATOR")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="multi-host: total process count "
                             "(BLAH2_NUM_PROCESSES)")
    parser.add_argument("--process-id", type=int, default=None,
                        help="multi-host: this process's rank "
                             "(BLAH2_PROCESS_ID)")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # Persistent compile cache: the production answer to a leaky remote
    # transport is bounded process lifetime + restart (SOAK_r04), which
    # only stays under the 60 s watchdog staleness bound if a restarted
    # process loads its programs from cache instead of recompiling
    # (minutes on remote transports). Honors JAX_COMPILATION_CACHE_DIR.
    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from blah2_tpu.parallel.distributed import maybe_initialize

    distributed = maybe_initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    if distributed:
        import jax

        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices",
              flush=True)

    from blah2_tpu.config import load_config
    from blah2_tpu.runtime.radar import RadarRuntime

    config = load_config(args.config)

    if distributed:
        import jax

        if jax.process_index() != 0:
            # One API/egress owner per job: non-zero ranks compute only.
            args.no_api = True

    api_server = None
    if not args.no_api:
        from blah2_tpu.net.api import ApiServer

        api_server = ApiServer(config, web_root=args.web_root)
        api_server.start(with_ingest=args.tcp_egress)
        print(f"API on http://{config.network.ip}:{config.network.api}",
              flush=True)

    mesh = None
    if args.mesh:
        from blah2_tpu.parallel.mesh import make_radar_mesh

        try:
            n_cpi, n_pulse = (int(v) for v in args.mesh.lower().split("x"))
        except ValueError:
            parser.error(f"--mesh must look like 2x4, got {args.mesh!r}")
        mesh = make_radar_mesh(n_cpi, n_pulse)

    runtime = RadarRuntime(config, api_server=api_server,
                           use_tcp_egress=args.tcp_egress,
                           staged_timing=args.staged_timing,
                           staged_sample_every=args.staged_sample_every,
                           ingest_chunks=args.ingest_chunks,
                           defer_fetch=not args.no_defer_fetch,
                           recycle_every_cpis=args.transport_recycle,
                           mesh=mesh, halo_backend=args.halo_backend,
                           row_shard={"on": True, "off": False}.get(
                               args.row_shard, args.row_shard))
    runtime.install_signal_handlers()
    runtime.start_capture()
    profiler = None
    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)
        profiler = jax
    try:
        runtime.run(n_cpis=args.cpis, quiet=args.quiet)
    finally:
        if profiler is not None:
            profiler.profiler.stop_trace()
        runtime.stop()
        if api_server is not None:
            api_server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
