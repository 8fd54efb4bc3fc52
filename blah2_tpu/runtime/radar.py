"""The radar runtime: capture thread + CPI processing loop + egress.

This is the TPU-native equivalent of the reference's `main()` and its two
threads (`src/blah2.cpp:56-365`):

  - a capture thread feeds the two ring buffers (vectorized blocks instead of
    the reference's per-sample deque pushes, `src/blah2.cpp:248-260`);
  - the CPI loop extracts one CPI of samples, ships both channels to the
    device in one transfer, runs the fused jitted pipeline, then emits the
    products over the same six JSON/TCP streams the reference uses
    (`src/blah2.cpp:298-350`) — or straight into an in-process API;
  - per-stage wall-clock timing uses the reference's stage names
    {extract_buffer, spectrum+clutter+ambiguity fused as device_pipeline,
    detector, tracker, output_radar_data, cpi} and the same Timing JSON
    (`src/blah2.cpp:261-345`). Because the device pipeline is one fused
    program, the individual DSP stages are not separately timed on the hot
    path (the fusion is the point); stage names retain the reference's keys
    with the fused stages reported under ``ambiguity_processing``.
  - SIGTERM drains gracefully (`src/blah2.cpp:368-378`).
"""

from __future__ import annotations

import json
import os
import signal
import threading
import time
from typing import Optional

import numpy as np

from blah2_tpu.config import Config
from blah2_tpu.constants import SPEED_OF_LIGHT
from blah2_tpu.capture.capture import Capture
from blah2_tpu.data.ddmap import DelayDopplerMap
from blah2_tpu.data.detection import Detection
from blah2_tpu.data.iq import IqMetadata
from blah2_tpu.data.timing import StageTimer, Timing
from blah2_tpu.tracker import Tracker
from blah2_tpu.utils import jsonfmt


def _now_ms() -> int:
    return int(time.time() * 1000)


class RadarRuntime:
    def __init__(
        self,
        config: Config,
        api_server=None,
        use_tcp_egress: bool = False,
        max_detections: int = 128,
        staged_timing: bool = False,
        ingest_chunks: Optional[int] = None,
        mesh=None,
        halo_backend: str = "ppermute",
        row_shard="auto",
        staged_sample_every: int = 16,
        staged_warmup: str = "async",
        enable_pack12: bool = True,
        defer_fetch: bool = True,
        recycle_every_cpis: int = 0,
    ):
        """``api_server``: an ApiServer for in-process publishing; when
        ``use_tcp_egress`` the products are instead sent over the six TCP
        streams (reference contract). ``staged_timing`` runs the device
        pipeline as separately-timed stages so the timing product carries
        every reference stage key (slower: per-stage sync barriers).

        ``ingest_chunks``: chunked streaming ingest — pop the CPI from the
        rings in this many fixed-size blocks and ship each to the device as
        soon as capture delivers it (async ``device_put``), so the
        host->device transfer overlaps the CPI fill window exactly like the
        reference's capture thread t1 runs concurrently with the process
        thread t2 (`src/blah2.cpp:137-139`). Per-CPI latency then excludes
        the transfer. ``None`` picks 8 when the geometry allows (chunk size
        must divide both n_samples and the overlap advance), 1 otherwise;
        1 disables chunking. Ignored under ``staged_timing``.

        ``defer_fetch``: one-CPI-deferred product fetch on the chunked
        fused path — CPI k's program is dispatched async and CPI k−1's
        products are fetched/emitted behind it, so the fetch round trip
        rides the in-flight work instead of serialising after it (the
        measured-best protocol of bench.py, now the production default;
        the analog of the reference's capture/process thread overlap,
        `src/blah2.cpp:137-139,245-361`). Products are still emitted
        every CPI, one behind; the timing product carries an explicit
        ``latency`` key (emission − extraction, including the deferral)
        next to the host-wall ``cpi`` key. Staged-timing sample CPIs
        flush the pending CPI first and run synchronously, so per-stage
        measurements stay honest.

        ``mesh``: a `jax.sharding.Mesh` with axes ``(cpi, pulse)`` — run
        the multi-chip `ShardedCpiPipeline` instead of the single-chip
        pipeline. The loop collects ``mesh.shape['cpi']`` CPI windows,
        processes the batch in one sharded program (pulse-axis sequence
        parallelism + cpi-axis data parallelism, SURVEY §2.5) and emits
        every product per CPI; throughput scales with the mesh, product
        latency becomes ~batch·tCpi. ``halo_backend`` selects the
        overlap-save exchange ("ppermute" or "pallas" RDMA)."""
        import jax.numpy as jnp

        from blah2_tpu.dsp.pipeline import CpiPipeline

        self.config = config
        self.api_server = api_server
        self.use_tcp_egress = use_tcp_egress
        self._jnp = jnp

        self.pipeline = CpiPipeline(config, max_detections=max_detections)
        self.staged_timing = bool(staged_timing)
        # Full reference timing keys on the fused hot path: every Nth CPI
        # runs the (identical-output) staged pipeline to measure the true
        # per-stage device split; the fused CPIs in between report their
        # measured device wall apportioned by the latest sample's
        # fractions, so /api/timing always carries spectrum /
        # clutter_filter / ambiguity_processing / detector like
        # `src/blah2.cpp:261-345` without per-CPI sync barriers. 0 disables
        # sampling (single ambiguity_processing key, round-1 behavior).
        # The staged programs compile in a background warmup thread
        # (_start_staged_warmup) so the product stream never stalls
        # behind their compile time.
        self.staged_sample_every = max(0, int(staged_sample_every))
        # "async" (production): the staged programs compile in a
        # background thread started on CPI 0 and sampling begins once
        # they are warm; "sync": compile inline on the first sample CPI
        # (deterministic for tests; stalls the stream for the compile).
        if staged_warmup not in ("async", "sync"):
            raise ValueError(
                f"staged_warmup must be 'async' or 'sync', "
                f"got {staged_warmup!r}")
        self.staged_warmup = staged_warmup
        self._staged_ready = threading.Event()
        self._staged_warmup_thread: Optional[threading.Thread] = None
        self._staged_warmed_dtype: Optional[np.dtype] = None
        self._sample_stage_ms: Optional[dict] = None
        amb = self.pipeline.ambiguity
        self.sharded = None
        self.cpi_batch = 1
        if mesh is not None:
            from blah2_tpu.parallel.sharded import (
                ShardedCpiPipeline, calibrate_row_shard)

            if row_shard == "calibrate":
                # Measure both Doppler-output layouts on the actual mesh
                # (the static "auto" crossover came from the virtual CPU
                # mesh; ICI cost ratios differ) and keep the winner —
                # reusing its already-compiled pipeline.
                cal = calibrate_row_shard(
                    config, mesh, max_detections=max_detections,
                    halo_backend=halo_backend)
                print(f"[mesh] row_shard calibration: "
                      f"on={cal['ms_on']:.1f} ms off={cal['ms_off']:.1f} ms "
                      f"-> row_shard={cal['row_shard']}", flush=True)
                self.sharded = cal["pipeline"]
            else:
                self.sharded = ShardedCpiPipeline(
                    config, mesh, max_detections=max_detections,
                    halo_backend=halo_backend, row_shard=row_shard)
            self.cpi_batch = int(mesh.shape["cpi"])
            # For recycle_transport: rebuild options (row_shard resolved
            # to the pipeline's actual boolean — no recalibration).
            self._mesh_opts = dict(
                max_detections=max_detections, halo_backend=halo_backend)

        from blah2_tpu.native import make_ring_buffer

        self.n_samples = config.n_samples
        # CPI overlap (process.data.overlap): the reference parses this key
        # but never implements it (`config/config.yml:23`, SURVEY §5); here
        # overlap f ∈ [0, 1) yields sliding CPI windows that advance by
        # n·(1−f) samples, reusing the tail of the previous CPI — finer
        # track update rates from the same sample stream.
        self.overlap = float(config.process.data.overlap)
        if not 0.0 <= self.overlap < 1.0:
            raise ValueError(
                f"process.data.overlap must be in [0, 1), got {self.overlap}")
        self.advance = self.n_samples if self.overlap == 0.0 else max(
            1, int(round(self.n_samples * (1.0 - self.overlap))))
        self._tail_x: Optional[np.ndarray] = None
        self._tail_y: Optional[np.ndarray] = None
        self._last_drops = (0, 0)
        # Chunked streaming ingest state (see __init__ docstring).
        if ingest_chunks is None:
            ingest_chunks = 8
            if self.n_samples % ingest_chunks:
                ingest_chunks = 1
            elif self.advance < self.n_samples and \
                    self.advance % (self.n_samples // ingest_chunks):
                ingest_chunks = 1
        self.ingest_chunks = max(1, int(ingest_chunks))
        if self.ingest_chunks > 1:
            if self.n_samples % self.ingest_chunks:
                raise ValueError(
                    f"ingest_chunks={self.ingest_chunks} must divide "
                    f"n_samples={self.n_samples}")
            chunk = self.n_samples // self.ingest_chunks
            if self.advance < self.n_samples and self.advance % chunk:
                raise ValueError(
                    f"chunk size {chunk} must divide the overlap advance "
                    f"{self.advance}")
        self._retained_chunks: list = []   # device (xd, yd) pairs kept
        self._pending_chunks: list = []    # device pairs of the in-fill CPI
        # Deferred-fetch state: (device outputs, t0, extract_ms,
        # dispatch_ms) of the CPI whose products are fetched one CPI later.
        self.defer_fetch = bool(defer_fetch) and not self.staged_timing
        self._pending_out = None
        self._pending_batch = None  # mesh-mode deferred batch
        # Periodic transport recycle (see recycle_transport): 0 disables.
        self.recycle_every_cpis = max(0, int(recycle_every_cpis))
        # Wire dtype for host->device ingest: sources that deliver integer
        # ADC counts (stored exactly in the complex64 rings) ship as int
        # planes and widen on device — half (int16) or a quarter (int8)
        # of the f32-plane bytes; the dominant cost on remote transports
        # and still the largest data movement on direct-attached hosts.
        # Float-valued sources (Synthetic, Usrp fc32) keep f32 planes.
        wire_map = {"RspDuo": np.int16, "HackRF": np.int8,
                    "Kraken": np.int8}
        if config.capture.replay.state:
            self._wire_dtype = np.int16  # record files are int16 quads
        else:
            self._wire_dtype = wire_map.get(config.capture.device_type)
        # 12-bit packing of int16 chunks (ops.pack12, 25% fewer bytes):
        # attempted while the stream stays within the 12-bit ADC range
        # (the RSPduo's native depth), permanently disabled the first time
        # a block exceeds it. ``enable_pack12=False`` forces plain int16
        # wire (the A/B control for the wire-format decision,
        # bench_runtime --wire).
        self._pack12_ok = bool(enable_pack12)
        # Native C++ ring buffers when built (make -C native), else Python.
        self.buffer1 = make_ring_buffer(config.buffer_samples)
        self.buffer2 = make_ring_buffer(config.buffer_samples)

        self.capture = Capture(
            config.capture.device_type, config.capture.fs, config.capture.fc,
            config.save.path if config.save.iq else None,
        )
        if config.capture.replay.state:
            self.capture.set_replay(config.capture.replay.loop,
                                    config.capture.replay.file)

        self.tracker: Optional[Tracker] = None
        if config.process.tracker.enable and config.process.detection.enable:
            t = config.process.tracker
            self.tracker = Tracker(
                t.m, t.n, t.n_delete, amb.cpi, t.max_acc,
                SPEED_OF_LIGHT / config.capture.fs,
                SPEED_OF_LIGHT / config.capture.fc,
                smooth=t.smooth, smooth_alpha=t.smooth_alpha,
                smooth_beta=t.smooth_beta, kalman_q=t.kalman_q,
                kalman_r_delay=t.kalman_r_delay,
                kalman_r_doppler=t.kalman_r_doppler,
            )

        self.iq_meta = IqMetadata()
        self.timing = Timing(_now_ms())
        self.timer = StageTimer()

        self._senders = {}
        if use_tcp_egress:
            from blah2_tpu.net.socket import JsonTcpSender

            net = config.network
            for name, port in (("map", net.map), ("detection", net.detection),
                               ("track", net.track),
                               ("timestamp", net.timestamp),
                               ("timing", net.timing),
                               ("iqdata", net.iqdata)):
                self._senders[name] = JsonTcpSender(net.ip, port)

        # save paths (`src/blah2.cpp:212-241`)
        self._save_map_path = None
        self._save_detection_path = None
        self._save_timing_path = None
        if config.save.map or config.save.detection or config.save.timing:
            ts = time.strftime("%Y%m%d-%H%M%S")
            base = os.path.join(config.save.path, ts)
            os.makedirs(config.save.path, exist_ok=True)
            if config.save.map:
                self._save_map_path = base + ".map"
            if config.save.detection:
                self._save_detection_path = base + ".detection"
            if config.save.timing:
                self._save_timing_path = base + ".timing"

        self._stop = threading.Event()
        self._capture_thread: Optional[threading.Thread] = None
        self.n_cpis_done = 0

    # -- egress --------------------------------------------------------------
    def _emit(self, product: str, payload: str, parsed=None) -> None:
        if self.api_server is not None:
            # ``parsed`` hands the already-built objects to the stashes so
            # the in-process path never re-parses the JSON it just built
            # (the map parse alone was ~26% of the CPI wall, VERDICT r3).
            self.api_server.publish(product, payload, parsed=parsed)
        if self.use_tcp_egress and product in self._senders:
            self._senders[product].send_data(payload)

    # -- lifecycle -----------------------------------------------------------
    def start_capture(self) -> None:
        net = self.config.network
        self._capture_thread = threading.Thread(
            target=self.capture.process,
            args=(self.buffer1, self.buffer2,
                  self.config.capture.device, net.ip, net.api),
            daemon=True,
        )
        self._capture_thread.start()

    def install_signal_handlers(self) -> None:
        def handler(signum, frame):
            print(f"Caught signal {signum}", flush=True)
            self.stop()

        signal.signal(signal.SIGTERM, handler)
        signal.signal(signal.SIGINT, handler)

    def _join_staged_warmup(self) -> None:
        """Drain the staged-warmup thread: it bails at the next stage
        boundary, but an in-flight XLA compile must finish before native
        teardown (a teardown under a live compile aborts the process)."""
        t = self._staged_warmup_thread
        if t is not None and t is not threading.current_thread() \
                and t.is_alive():
            print("[timing] waiting for the staged-timing warmup compile "
                  "to finish...", flush=True)
            t.join()

    def stop(self) -> None:
        self._stop.set()
        self.capture.stop()
        self.buffer1.close()
        self.buffer2.close()
        self._join_staged_warmup()

    def recycle_transport(self) -> float:
        """Tear down and re-create the device transport between CPIs.

        Mitigation for transports whose native client retains per-RPC
        memory — IF the client frees on destruction. Measured on THIS
        host's tunneled transport it does NOT (SOAK_r04
        ``recycle_experiment``): RSS kept growing across recycles, so the
        retention lives in the plugin's process-global state and the
        production mitigation there is a bounded process lifetime
        (``--cpis N`` + the deployment restart policy; restart cost =
        persistent-cache reload). The mechanism is kept, correctness
        across recycles is tested: every backend handle is dropped so
        the PJRT client rebuilds on next use; jitted executables reload
        from the persistent compile cache (seconds, not minutes).
        Device-resident overlap tails are discarded (same seam semantics
        as a ring overflow: the next window assembles fresh). Returns the
        recycle wall time in seconds. Wire into the loop with
        ``recycle_every_cpis`` (CLI ``--transport-recycle``)."""
        import jax

        t0 = time.perf_counter()
        self._flush_pending()
        self._flush_pending_batch()
        self._retained_chunks = []
        self._pending_chunks = []
        self._tail_x = self._tail_y = None
        # Staged-warmup thread may hold live executables; let it finish.
        self._join_staged_warmup()
        try:
            jax.clear_caches()
            jax.extend.backend.clear_backends()
        except Exception as e:  # never take down the CPI loop
            print(f"[recycle] clear_backends failed: {e}", flush=True)
        # Compiled-program caches keyed on dead executables must go too.
        self.pipeline._chunked_cache.clear()
        # Staged programs lived on the dead backend: re-warm in the
        # background (persistent-cache reload) instead of stalling the
        # next sample CPI with an inline reload.
        if self.staged_sample_every > 0 and self._staged_ready.is_set():
            self._staged_ready.clear()
            self._staged_warmup_thread = None
        if self.sharded is not None:
            # The Mesh and NamedShardings bind the DEAD device objects:
            # rebuild the sharded pipeline on the fresh backend (compiled
            # programs reload from the persistent cache; the resolved
            # row_shard boolean carries over — no recalibration).
            from blah2_tpu.parallel.mesh import make_radar_mesh
            from blah2_tpu.parallel.sharded import ShardedCpiPipeline

            shape = dict(self.sharded.mesh.shape)
            self.sharded = ShardedCpiPipeline(
                self.config, make_radar_mesh(shape["cpi"], shape["pulse"]),
                row_shard=bool(self.sharded._row_shard),
                **self._mesh_opts)
        return time.perf_counter() - t0

    # -- the CPI loop --------------------------------------------------------
    DEVICE_STAGES = ("spectrum", "clutter_filter", "ambiguity_processing",
                     "detector")

    def _wire(self, planes: np.ndarray) -> np.ndarray:
        """Cast f32 planes to the stream's integer wire dtype (half/quarter
        the transfer bytes; the device program widens). Every cast is
        verified exact — the first non-integer or out-of-range block
        permanently falls back to f32 planes, so a mislabeled stream can
        never be silently quantised. The verification is one vectorized
        compare, far cheaper than the bytes it saves."""
        if self._wire_dtype is None or not isinstance(planes, np.ndarray):
            return planes
        cast = planes.astype(self._wire_dtype)
        if not np.array_equal(cast, planes):
            self._wire_dtype = None
            return planes
        return cast

    def _wire_chunk(self, planes: np.ndarray) -> np.ndarray:
        """Chunk-path wire conversion: ``_wire`` plus packed-12-bit
        encoding for int16 streams within the 12-bit range (the chunked
        device program unpacks uint8 chunks)."""
        p = self._wire(planes)
        if self._pack12_ok and isinstance(p, np.ndarray) and \
                p.dtype == np.int16:
            from blah2_tpu.ops.pack12 import pack12_planes

            try:
                return pack12_planes(p)
            except ValueError:  # exceeds 12-bit range: real 16-bit stream
                self._pack12_ok = False
        return p

    def _staged_input_dtype(self) -> np.dtype:
        """Plane dtype the staged programs will currently see (tracks the
        live wire-format state, which can flip at runtime)."""
        if self.ingest_chunks > 1 and self._wire_dtype is not None:
            # Chunked staged samples receive cat_planes output: unpack12
            # yields int32 planes on the packed path, otherwise the wire
            # dtype passes through.
            return np.dtype(np.int32) if (
                self._pack12_ok and self._wire_dtype == np.int16) \
                else np.dtype(self._wire_dtype)
        # Unchunked staged samples go through to_planes of the host
        # complex window: float planes.
        return np.dtype(self.pipeline._plane_dtype)

    def _staged_warm_planes(self) -> np.ndarray:
        """Zero planes in the dtype/shape the staged programs will see,
        so the warmup compiles the same executables the samples use."""
        return np.zeros((self.n_samples, 2),
                        dtype=self._staged_input_dtype())

    def _start_staged_warmup(self) -> None:
        """Compile the four staged-timing programs OFF the hot path.

        Compiling them lazily on the first sample CPI would stall the
        product stream for the compile time (minutes on remote
        transports — long enough to trip the reference's 60 s watchdog
        staleness bound, `script/blah2_rspduo_restart.bash:8-11`).
        Instead the first sample CPI starts this warmup; staged sampling
        begins at the first scheduled CPI after it completes, and fused
        CPIs keep flowing meanwhile (reporting their wall under
        ambiguity_processing until fractions exist)."""
        # Snapshot the wire dtype NOW: a flip mid-warmup must not change
        # what this warmup compiles (the flip is caught at the next sample
        # gate, which re-warms for the new dtype).
        xp0 = self._staged_warm_planes()
        self._staged_warmed_dtype = xp0.dtype

        def warm():
            try:
                import jax

                p = self.pipeline
                xp = xp0
                # Bail between stage compiles on shutdown: a compile
                # cannot be interrupted, but the next one need not start.
                # (The thread is non-daemon and joined in stop() — a
                # daemon thread still inside XLA at interpreter exit
                # aborts the process in native teardown.)
                if self._stop.is_set():
                    return
                spec = p.stage_spectrum(xp)
                if self._stop.is_set():
                    return
                xc, yc, ok = p.stage_clutter(xp, xp)
                if self._stop.is_set():
                    return
                z, db, noise, mp = p.stage_ambiguity(xc, yc)
                if self._stop.is_set():
                    return
                det = p.stage_detect(z, db, noise)
                if p.sub_spectra_fn is not None:
                    # Sample CPIs also run the sub-CPI spectra program;
                    # compile it here too or the first sample stalls the
                    # stream behind its remote compile.
                    sub = p.sub_spectra_fn(xp)
                    jax.block_until_ready(sub)
                jax.block_until_ready((spec, ok, noise, det.count))
            except Exception as e:  # never take down the CPI loop
                print(f"[timing] staged warmup failed: {e}", flush=True)
            finally:
                self._staged_ready.set()

        if self.staged_warmup == "sync":
            warm()
            self._staged_warmup_thread = threading.current_thread()
        else:
            self._staged_warmup_thread = threading.Thread(
                target=warm, daemon=False, name="staged-warmup")
            self._staged_warmup_thread.start()

    def _is_sample_cpi(self) -> bool:
        if self.staged_sample_every <= 0:
            return False
        if not self._staged_ready.is_set():
            if self._staged_warmup_thread is None:
                self._start_staged_warmup()
            if not self._staged_ready.is_set():
                return False
        if self._staged_warmed_dtype != self._staged_input_dtype():
            # Wire format flipped after warmup (f32 fallback on the first
            # non-exact block, or pack12 disabled on out-of-range data):
            # running a staged sample now would recompile all four staged
            # programs INLINE — minutes of stall on remote transports.
            # Re-warm for the new dtype in the background instead; fused
            # CPIs keep flowing meanwhile.
            self._staged_ready.clear()
            self._start_staged_warmup()
            return False
        return self.n_cpis_done % self.staged_sample_every == 0

    def _null_round_trip_ms(self) -> float:
        """Fixed dispatch+fetch floor of the device transport (min of 2
        adjacent samples of a null program)."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_null_fn", None) is None:
            self._null_fn = jax.jit(lambda v: v + 1.0)
            np.asarray(self._null_fn(jnp.zeros(8, jnp.float32)))  # compile
        z = jnp.zeros(8, jnp.float32)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(self._null_fn(z)[:1])
            best = min(best, (time.perf_counter() - t0) * 1e3)
        return best

    def _run_staged_sample(self, x, y):
        """Run the staged pipeline once, install the measured per-stage
        times and refresh the apportioning sample.

        Before timing stage 1, the inputs are forced resident with one
        tiny joint fetch and the wait is recorded under ``wire_transfer``:
        the chunks shipped async during the CPI fill window, and whatever
        transfer remains is wire delivery, not device compute — without
        this the first device stage (spectrum) absorbs the whole residual
        transfer (measured 118 ms of a 171 ms CPI on the tunneled chip).
        ``wire_transfer`` is deliberately NOT a reference stage key: the
        reference's CPU pipeline has no device wire
        (`src/blah2.cpp:261-345`); the timing page plots keys
        dynamically."""
        import jax
        import jax.numpy as jnp

        p = self.pipeline
        xp = p.to_planes(x, p._plane_dtype)
        yp = p.to_planes(y, p._plane_dtype)
        t_w = time.perf_counter()
        if not isinstance(xp, jax.Array):
            xp = jax.device_put(xp)
        if not isinstance(yp, jax.Array):
            yp = jax.device_put(yp)
        np.asarray(jnp.ravel(xp)[:1])
        np.asarray(jnp.ravel(yp)[:1])
        wire_ms = (time.perf_counter() - t_w) * 1e3

        # Each staged mark forces completion with a tiny fetch, which on a
        # remote transport costs a full ~24 ms round trip per stage —
        # leaving it inside the stage times biases the apportioning split
        # toward uniform (four ~24 ms stages instead of the probe's
        # 0.8/0.6/0.5/0.1 device split). Measure the null round trip
        # ADJACENT to the sample (min of 2: underestimates under
        # throttle, so stages are never over-subtracted) and move that
        # per-mark transport share to ``wire_transfer`` where it belongs.
        rt_ms = self._null_round_trip_ms()
        st = StageTimer()
        st.start()
        out = p.call_staged(xp, yp, timer=st)
        out = jax.device_get(out)  # batched product fetch (one round trip)
        corrected = [max(0.0, v - rt_ms) for v in st.times_ms]
        self.timer.record("wire_transfer",
                          wire_ms + sum(st.times_ms) - sum(corrected))
        for name, ms in zip(st.names, corrected):
            self.timer.record(name, ms)
        self._sample_stage_ms = dict(zip(st.names, corrected))
        if p.sub_spectra_fn is not None:
            # Sub-CPI spectra (fused CPIs compute them inline): computed
            # after the marks so the staged timing stays a pure
            # reference-stage measurement.
            out = out._replace(sub_spectra_db=jax.device_get(
                p.sub_spectra_fn(xp)))
        return out

    def _record_device_split(self, total_ms: float, timer=None) -> None:
        """Report the fused program's wall under every reference stage key
        plus ``wire_transfer`` (estimates, refreshed every
        ``staged_sample_every`` CPIs; the stage boundaries do not exist
        inside the fused XLA program).

        Device compute is stable CPI to CPI while the wire varies ~10×
        under multi-tenant throttling, so the device stages get their
        sampled absolute times and the wall surplus over their sum is
        attributed to ``wire_transfer`` (scaled down proportionally on the
        CPI whose wall is below the sampled device sum — routine under
        deferred fetch, where compute overlaps the next CPI's fill)."""
        timer = self.timer if timer is None else timer
        sm = self._sample_stage_ms
        if sm is None:
            timer.record("wire_transfer", 0.0)
            for name in self.DEVICE_STAGES:
                timer.record(
                    name, total_ms if name == "ambiguity_processing" else 0.0)
            return
        dev_total = sum(sm.get(n, 0.0) for n in self.DEVICE_STAGES)
        wire = max(0.0, total_ms - dev_total)
        scale = 1.0 if dev_total <= 0.0 else (total_ms - wire) / dev_total
        timer.record("wire_transfer", wire)
        for name in self.DEVICE_STAGES:
            timer.record(name, sm.get(name, 0.0) * scale)

    def process_one_cpi(self, x: np.ndarray, y: np.ndarray,
                        timestamp_ms: Optional[int] = None) -> dict:
        """Process one CPI of host samples and emit all products.

        Returns a dict of the emitted JSON strings (for tests/inspection).
        """
        import jax

        timer = self.timer
        t0 = timestamp_ms if timestamp_ms is not None else _now_ms()

        if self.staged_timing:
            # Separately-jitted stages: every reference timing key is
            # recorded (spectrum / clutter_filter / ambiguity_processing /
            # detector) at the cost of per-stage sync barriers.
            out = self.pipeline.call_staged(x, y, timer=timer)
            if self.pipeline.sub_spectra_fn is not None:
                # call_staged runs reference stages only — attach the
                # sub-CPI spectra (process.spectrum.nSub) outside the
                # timed marks, like _run_staged_sample does.
                xp = self.pipeline.to_planes(x, self.pipeline._plane_dtype)
                out = out._replace(sub_spectra_db=jax.device_get(
                    self.pipeline.sub_spectra_fn(xp)))
        elif self._is_sample_cpi():
            out = self._run_staged_sample(x, y)
        else:
            pipe = self.pipeline
            t_dev = time.perf_counter()
            out = pipe._fn(self._wire(pipe.to_planes(x, pipe._plane_dtype)),
                           self._wire(pipe.to_planes(y, pipe._plane_dtype)))
            # One batched device->host fetch of every product: N small
            # np.asarray fetches would each pay the transport round trip,
            # and it (not block_until_ready, which returns early on some
            # remote transports) forces true completion so the device
            # split is measured, not deferred into serialization.
            out = jax.device_get(out)
            self._record_device_split(
                (time.perf_counter() - t_dev) * 1e3)
        return self._emit_products(out, t0)

    def process_one_cpi_chunks(self, x_chunks, y_chunks,
                               timestamp_ms: Optional[int] = None,
                               extract_ms: float = 0.0) -> Optional[dict]:
        """Process one CPI delivered as device-resident plane chunks
        (streaming ingest, `_extract_cpi_chunks`) and emit products.

        With ``defer_fetch`` (production default) the CPI's program is
        dispatched async and the PREVIOUS CPI's products are fetched and
        emitted behind it (products + timing + timestamp, one CPI behind);
        returns ``None`` — the caller must not emit timing for the current
        CPI, and must call :meth:`_flush_pending` after the last CPI.
        Staged-timing sample CPIs flush the pending CPI first, then run
        synchronously (honest per-stage measurement) and return their
        emitted dict as before."""
        import jax
        import jax.numpy as jnp

        t0 = timestamp_ms if timestamp_ms is not None else _now_ms()

        def cat_planes(chunks):
            from blah2_tpu.ops.pack12 import unpack_planes

            return jnp.concatenate(
                [unpack_planes(ch) for ch in chunks], axis=0)

        if self._is_sample_cpi():
            # Flush the deferred CPI first (product order stays
            # monotonic) and shift the live timer past the flush wall so
            # the flushed CPI's fetch+emit cost is not double-counted
            # into this sample CPI's own 'cpi' measurement.
            t_f0 = time.perf_counter()
            self._flush_pending()
            shift = int((time.perf_counter() - t_f0) * 1e6)
            if self.timer.marks_us:
                self.timer.marks_us = [m + shift
                                       for m in self.timer.marks_us]
            out = self._run_staged_sample(cat_planes(x_chunks),
                                          cat_planes(y_chunks))
            return self._emit_products(out, t0)
        if self.defer_fetch:
            t_d = time.perf_counter()
            out = self.pipeline.call_chunks(x_chunks, y_chunks)
            dispatch_ms = (time.perf_counter() - t_d) * 1e3
            # Fetch the previous CPI's products now that this CPI's work
            # is in flight: the fetch round trip rides the in-flight
            # transfer/compute instead of serialising after it
            # (bench.py's measured ~20-30 ms/CPI win, now in production).
            self._flush_pending()
            self._pending_out = (out, t0, float(extract_ms), dispatch_ms)
            return None
        t_dev = time.perf_counter()
        out = self.pipeline.call_chunks(x_chunks, y_chunks)
        # Batched fetch; forces true completion (see process_one_cpi).
        out = jax.device_get(out)
        self._record_device_split(
            (time.perf_counter() - t_dev) * 1e3)
        return self._emit_products(out, t0)

    def _flush_pending(self) -> Optional[dict]:
        """Fetch and emit the deferred CPI's products + timing + timestamp.

        Timing semantics: the deferred CPI's ``cpi`` key is the
        host-attributable wall (extract + dispatch + residual fetch +
        serialization + tracker) — the inter-CPI fill wait, during which
        the device computes, belongs to capture pacing, not this CPI. The
        extra ``latency`` key reports true product age (emission − window
        extraction, including the one-CPI deferral), so the trade is
        visible in /api/timing rather than hidden."""
        if self._pending_out is None:
            return None
        import jax

        out_dev, t0, extract_ms, dispatch_ms = self._pending_out
        self._pending_out = None
        t_f = time.perf_counter()
        out = jax.device_get(out_dev)
        fetch_ms = (time.perf_counter() - t_f) * 1e3
        st = StageTimer()
        st.start()
        st.record("extract_buffer", extract_ms)
        self._record_device_split(dispatch_ms + fetch_ms, timer=st)
        emitted = self._emit_products(out, t0, timer=st)
        cpi_ms = float(sum(st.times_ms))
        st.record("latency", float(max(0, _now_ms() - t0)))
        st.names.append("cpi")
        st.times_ms.append(cpi_ms)
        self._emit_timing(t0, st.times_ms, st.names)
        self._emit("timestamp", str(t0))
        if not getattr(self, "_quiet", True):
            print(f"CPI time (ms): {cpi_ms:.1f} (deferred fetch)",
                  flush=True)
        return emitted

    def process_cpi_batch(self, windows, stamps, extract_ms=None) -> list:
        """Process ``len(windows)`` CPI windows in one sharded multi-chip
        program (mesh mode) and emit every product per CPI.

        ``windows`` is a list of host ``(x, y)`` pairs, ``stamps`` their
        extraction timestamps (ms), ``extract_ms`` the measured per-window
        ring-assembly times. The device wall is amortized over the batch
        under ``ambiguity_processing`` (the batch runs as one program);
        the ``cpi`` key reports each product's TRUE latency — emission
        time minus that window's extraction stamp — which includes the
        wait for the batch to fill (~batch·tCpi at steady state; the
        throughput-for-latency trade of mesh mode) and, under
        ``defer_fetch``, the one-batch deferral. Returns the list of
        emitted-JSON dicts, or ``None`` when deferred (the previous
        batch was emitted inside; the caller flushes the last batch via
        ``_flush_pending_batch``)."""
        xb = np.stack([w[0] for w in windows])  # host memcpy: not device
        yb = np.stack([w[1] for w in windows])
        t_dev0 = time.perf_counter()
        xj, yj = self.sharded.shard_inputs(xb, yb)
        out = self.sharded(xj, yj)
        dispatch_ms = (time.perf_counter() - t_dev0) * 1e3
        if self.defer_fetch:
            # Batch-level deferral (mesh analog of the single-chip
            # protocol): fetch+emit the PREVIOUS batch behind this one's
            # in-flight shard transfer/compute. Mesh mode's ``cpi`` key
            # is already true product latency (emission − extraction),
            # so the extra batch of deferral shows up there honestly.
            self._flush_pending_batch()
            self._pending_batch = (out, list(stamps),
                                   list(extract_ms or []), dispatch_ms)
            return None
        fetched, fetch_ms = self._fetch_batch(out)
        return self._emit_batch(fetched, stamps, list(extract_ms or []),
                                dispatch_ms, wire_ms=fetch_ms)

    @staticmethod
    def _fetch_batch(out):
        """Device->host fetch of one batch's products; forces end-to-end
        completion (block_until_ready returns early on some remote
        transports). Multi-host meshes shard the batch across processes,
        so gather globally there."""
        import jax

        t0 = time.perf_counter()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            out = jax.tree.map(
                lambda a: np.asarray(
                    multihost_utils.process_allgather(a, tiled=True)), out)
        else:
            out = jax.device_get(out)
        return out, (time.perf_counter() - t0) * 1e3

    def _flush_pending_batch(self) -> Optional[list]:
        """Fetch and emit the deferred mesh batch (see process_cpi_batch)."""
        pending = self._pending_batch
        if pending is None:
            return None
        self._pending_batch = None
        out_dev, stamps, extract_ms, dispatch_ms = pending
        fetched, fetch_ms = self._fetch_batch(out_dev)
        return self._emit_batch(fetched, stamps, extract_ms,
                                dispatch_ms, wire_ms=fetch_ms)

    def _emit_batch(self, out, stamps, extract_ms, device_ms,
                    wire_ms: float = 0.0) -> list:
        """Per-CPI product emission for one fetched mesh batch.

        Key-set contract: mesh docs carry the SAME keys as single-chip
        docs (every reference stage key plus ``wire_transfer`` and
        ``latency``), so a ``TimingStash`` fed by a mesh deployment
        produces identically-shaped series as the single-chip console
        expects. The batch's dispatch wall is amortized per CPI under
        ``ambiguity_processing`` (one sharded program — no internal stage
        boundaries; spectrum/clutter/detector report 0 like an unsampled
        single-chip CPI), the measured fetch wall goes under
        ``wire_transfer``, and ``latency`` duplicates ``cpi`` (mesh
        ``cpi`` is already true product latency: emission − extraction)."""
        import jax

        n_batch = len(stamps)
        results = []
        for i in range(n_batch):
            out_i = jax.tree.map(lambda a: a[i], out)
            st = StageTimer()
            st.start()
            st.record("extract_buffer",
                      extract_ms[i] if i < len(extract_ms) else 0.0)
            for name in self.DEVICE_STAGES:
                st.record(name, device_ms / n_batch
                          if name == "ambiguity_processing" else 0.0)
            emitted = self._emit_products(out_i, stamps[i], timer=st)
            st.record("wire_transfer", wire_ms / n_batch)
            latency = float(max(0, _now_ms() - stamps[i]))
            st.record("latency", latency)
            st.names.append("cpi")
            st.times_ms.append(latency)
            self._emit_timing(stamps[i], st.times_ms, st.names)
            self._emit("timestamp", str(stamps[i]))
            results.append(emitted)
        return results

    def _emit_timing(self, t0: int, times_ms, names) -> str:
        """Update and emit the timing product (parsed doc to the stash)."""
        self.timing.update(t0, times_ms, names)
        doc = self.timing.to_doc()
        timing_json = jsonfmt.dumps(doc)
        if self._save_timing_path:
            Timing.save(timing_json, self._save_timing_path)
        self._emit("timing", timing_json, parsed=doc)
        return timing_json

    def _emit_products(self, out, t0: int, timer=None) -> dict:
        """Serialize and emit every JSON product for one CPI's outputs.

        Host-side serialization + publish time is reported under
        ``output_radar_data`` (the reference's egress block,
        `src/blah2.cpp:298-328`) and the host tracker under ``tracker``,
        regardless of the interleaved execution order here.
        """
        cfg = self.config
        amb = self.pipeline.ambiguity
        timer = self.timer if timer is None else timer
        emitted = {}
        t_ser0 = time.perf_counter()
        tracker_ms = 0.0

        # IqData metadata (spectrum, plus sub-CPI spectra when enabled)
        sub = getattr(out, "sub_spectra_db", None)
        self.iq_meta.update(self.pipeline.spectrum.frequency_khz,
                            np.asarray(out.spectrum_db),
                            None if sub is None else np.asarray(sub))
        iq_doc = self.iq_meta.to_doc(t0)
        iq_json = json.dumps(iq_doc, separators=(",", ":"))
        self._emit("iqdata", iq_json, parsed=iq_doc)
        emitted["iqdata"] = iq_json

        # Map
        ddmap = DelayDopplerMap(None, amb.delay_axis, amb.doppler_axis,
                                db_data=np.asarray(out.db_map))
        ddmap.set_metrics(float(out.noise_power), float(out.max_power))
        map_json, map_head, map_db = ddmap.to_json_parts(
            t0, fs_km=cfg.capture.fs)
        if self._save_map_path:
            DelayDopplerMap.save(map_json, self._save_map_path)
        self._emit("map", map_json, parsed=(map_head, t0, map_db))
        emitted["map"] = map_json

        # Detection
        detection = None
        if cfg.process.detection.enable:
            det = out.detections
            detection = Detection.from_arrays(
                np.asarray(det.delay), np.asarray(det.doppler),
                np.asarray(det.snr), np.asarray(det.valid))
            det_doc = detection.to_doc(t0, fs_km=cfg.capture.fs)
            det_json = json.dumps(det_doc, separators=(",", ":"))
            if self._save_detection_path:
                Detection.save(det_json, self._save_detection_path)
            self._emit("detection", det_json, parsed=det_doc)
            emitted["detection"] = det_json
            # The on-device detector time is reported by the staged run or
            # the apportioned split; host-side serialization of detections
            # folds into output_radar_data below.

        # Tracker
        if self.tracker is not None and detection is not None:
            t_trk = time.perf_counter()
            track = self.tracker.process(detection, t0)
            tracker_ms = (time.perf_counter() - t_trk) * 1e3
            track_json = track.to_json(t0)
            self._emit("track", track_json)
            emitted["track"] = track_json

        timer.record("tracker", tracker_ms)
        timer.record("output_radar_data",
                     (time.perf_counter() - t_ser0) * 1e3 - tracker_ms)
        return emitted

    def _extract_cpi(self, timeout: float = 1.0):
        """Pop the next CPI window, honouring ``process.data.overlap``.

        With overlap, only ``advance`` new samples are popped per CPI and the
        previous window's tail is reused. Returns ``(x, y)`` or ``None`` on
        timeout. Both buffers are popped only once BOTH hold enough samples
        (they fill in lockstep from the capture callback), so a slow channel
        can never leave the other one popped-and-discarded — that would
        desynchronize the channels permanently. Starts the stage timer once
        samples are available so ``extract_buffer`` times the assembly, not
        the wait.
        """
        n, adv = self.n_samples, self.advance

        def drops():
            return (getattr(self.buffer1, "dropped", 0),
                    getattr(self.buffer2, "dropped", 0))

        # Seam detection: if the drop-oldest ring overflowed since the last
        # extraction, the kept tail is no longer contiguous with the next
        # popped samples — discard it and assemble a fresh full window.
        if drops() != self._last_drops:
            self._tail_x = self._tail_y = None
        fresh = self._tail_x is None or adv >= n
        count = n if fresh else adv
        deadline = time.monotonic() + timeout
        if not self.buffer1.wait_for(count, timeout=timeout):
            return None
        if not self.buffer2.wait_for(
                count, timeout=max(0.0, deadline - time.monotonic())):
            return None
        self.timer.start()
        xnew = self.buffer1.pop(count, timeout=0.1)
        ynew = self.buffer2.pop(count, timeout=0.1)
        if xnew is None or ynew is None:  # closed mid-pop
            self._tail_x = self._tail_y = None
            return None
        # Re-read AFTER the pops: an overflow racing the wait/pop would
        # seam tail↔new continuity (a freshly popped full window is always
        # internally contiguous — the ring lock covers the copy).
        d_now = drops()
        seamed = not fresh and d_now != self._last_drops
        self._last_drops = d_now
        if seamed:
            self._tail_x = self._tail_y = None
            return None
        if fresh:
            x, y = xnew, ynew
        else:
            x = np.concatenate([self._tail_x, xnew])
            y = np.concatenate([self._tail_y, ynew])
        if adv < n:
            self._tail_x, self._tail_y = x[adv:], y[adv:]
        return x, y

    def _extract_cpi_chunks(self, timeout: float = 1.0):
        """Streaming-ingest extraction: pop the CPI in fixed-size blocks and
        ship each block to the device the moment capture delivers it
        (async ``device_put``), so the host->device transfer rides the CPI
        fill window — the analog of the reference's capture thread t1
        filling the rings while thread t2 processes
        (`src/blah2.cpp:137-139,245-260`). Returns ``(x_chunks, y_chunks)``
        lists of device-resident (c, 2) plane arrays, or ``None`` on
        timeout (accumulated chunks are kept for the next call).

        Overlap reuses the previous window's tail chunks (device-resident;
        chunk size divides the advance, enforced at init). Ring overflow
        (drop-oldest) breaks contiguity between already-popped chunks and
        the next pop, so on a drop-counter change all accumulated chunks
        are discarded and the window restarts — same seam semantics as
        `_extract_cpi`.
        """
        import jax

        pipe = self.pipeline
        n = self.n_samples
        B = self.ingest_chunks
        c = n // B
        keep = 0 if self.advance >= n else (n - self.advance) // c

        def drops():
            return (getattr(self.buffer1, "dropped", 0),
                    getattr(self.buffer2, "dropped", 0))

        if drops() != self._last_drops:
            # Contiguity with everything accumulated so far is broken; new
            # pops are still contiguous among themselves, so re-baseline the
            # drop counters here (the in-loop recheck catches later races).
            self._last_drops = drops()
            self._retained_chunks = []
            self._pending_chunks = []
        deadline = time.monotonic() + timeout
        while len(self._retained_chunks) + len(self._pending_chunks) < B:
            rem = deadline - time.monotonic()
            if rem <= 0:
                return None
            if not self.buffer1.wait_for(c, timeout=rem):
                return None
            if not self.buffer2.wait_for(
                    c, timeout=max(0.0, deadline - time.monotonic())):
                return None
            xb = self.buffer1.pop(c, timeout=0.1)
            yb = self.buffer2.pop(c, timeout=0.1)
            if xb is None or yb is None:  # closed mid-pop
                self._retained_chunks = []
                self._pending_chunks = []
                return None
            # Re-read AFTER the pops: an overflow racing the wait/pop may
            # have desynchronised this pair from the accumulated chunks (or
            # the two channels from each other) — discard and restart.
            d_now = drops()
            if d_now != self._last_drops:
                self._last_drops = d_now
                self._retained_chunks = []
                self._pending_chunks = []
                continue
            xd = jax.device_put(self._wire_chunk(pipe.to_planes(
                xb, pipe._plane_dtype)))
            yd = jax.device_put(self._wire_chunk(pipe.to_planes(
                yb, pipe._plane_dtype)))
            self._pending_chunks.append((xd, yd))
        self.timer.start()
        chunks = self._retained_chunks + self._pending_chunks
        self._retained_chunks = chunks[B - keep:] if keep else []
        self._pending_chunks = []
        return [p[0] for p in chunks], [p[1] for p in chunks]

    def run(self, n_cpis: Optional[int] = None, quiet: bool = False) -> None:
        """Main CPI loop (`src/blah2.cpp:245-361`).

        In mesh mode (``self.sharded``) windows are accumulated into
        cpi-axis batches; ``n_cpis`` may be overshot by up to batch−1.
        """
        if self.sharded is not None:
            windows, stamps, extracts = [], [], []
            while not self._stop.is_set():
                if n_cpis is not None and self.n_cpis_done >= n_cpis:
                    break
                got = self._extract_cpi()
                if got is None:
                    # Capture stall: emit the deferred batch now rather
                    # than withholding finished products for the gap.
                    self._flush_pending_batch()
                    continue
                self.timer.stage("extract_buffer")
                windows.append(got)
                stamps.append(_now_ms())
                extracts.append(self.timer.times_ms[-1])
                if len(windows) < self.cpi_batch:
                    continue
                t0 = time.perf_counter()
                res = self.process_cpi_batch(windows, stamps, extracts)
                if not quiet:
                    per = (time.perf_counter() - t0) * 1e3 / len(windows)
                    tag = " dispatched, deferred" if res is None else ""
                    print(f"CPI time (ms): {per:.1f} "
                          f"(batch of {len(windows)}{tag})", flush=True)
                self.n_cpis_done += len(windows)
                windows, stamps, extracts = [], [], []
                if self.recycle_every_cpis and \
                        self.n_cpis_done % self.recycle_every_cpis < \
                        self.cpi_batch:
                    dt = self.recycle_transport()  # flushes pending batch
                    if not quiet:
                        print(f"[recycle] transport recycled in {dt:.1f} s "
                              f"(CPI {self.n_cpis_done})", flush=True)
            # Drain the deferred batch so every processed CPI emits.
            self._flush_pending_batch()
            return

        chunked = self.ingest_chunks > 1 and not self.staged_timing
        self._quiet = quiet
        while not self._stop.is_set():
            if n_cpis is not None and self.n_cpis_done >= n_cpis:
                break
            if chunked:
                got = self._extract_cpi_chunks()
            else:
                got = self._extract_cpi()
            if got is None:
                # Capture stall: the deferred CPI's products are done on
                # device — emit them now rather than withholding them for
                # the whole gap (they would otherwise go stale past the
                # deferral's documented one-CPI bound, possibly past the
                # watchdog's 60 s staleness window).
                self._flush_pending()
                continue
            x, y = got
            t0 = _now_ms()
            self.timer.stage("extract_buffer")
            if chunked:
                res = self.process_one_cpi_chunks(
                    x, y, t0, extract_ms=self.timer.times_ms[-1])
            else:
                res = self.process_one_cpi(x, y, t0)
            self.n_cpis_done += 1
            if res is not None:
                # Synchronous emission: finish this CPI's timing product
                # before any recycle below (a recycled CPI must not lose
                # its timing/timestamp). 'latency' is emitted on EVERY
                # single-chip doc (not just deferred ones) so the
                # TimingStash per-key series stay index-aligned.
                self.timer.record("latency",
                                  float(max(0, _now_ms() - t0)))
                cpi_ms = self.timer.finish_cpi()
                if not quiet:
                    print(f"CPI time (ms): {cpi_ms:.1f}", flush=True)
                self._emit_timing(t0, self.timer.times_ms, self.timer.names)
                self._emit("timestamp", str(t0))
            # else: deferred fetch — the previous CPI's products and
            # timing were emitted inside; this CPI's are pending (the
            # recycle below flushes them first).
            if self.recycle_every_cpis and \
                    self.n_cpis_done % self.recycle_every_cpis == 0:
                dt = self.recycle_transport()
                if not quiet:
                    print(f"[recycle] transport recycled in {dt:.1f} s "
                          f"(CPI {self.n_cpis_done})", flush=True)
        if chunked:
            # Drain the deferred CPI so every processed CPI emits.
            self._flush_pending()
