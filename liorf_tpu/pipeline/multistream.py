"""Multi-session serving: N independent SLAM streams, ONE device program.

A single 10 Hz lidar stream leaves the chip ~99% idle (the per-frame
program runs ~1 ms of device work every 100 ms of wall clock). For fleet /
server deployments the natural scaling axis is therefore BATCH, not
kernel speed: `MultiStreamPipeline` runs N independent sessions through
one ``vmap``-ped ``resident_step`` with a leading stream axis, so deskew,
registration, fusion, the keyframe graph, and loop closure all execute
batched for every stream in one dispatch per frame tick.

Semantics per stream are the single-stream ``ResidentPipeline``'s (same
traced computation; ``lax.cond`` branches lower to ``select`` under vmap,
which executes both branches but selects the same values the single-
stream program computes — parity is asserted in tests/test_multistream.py
up to f32 reduction-layout noise).

Constraints (by design of the batched mode):

* All streams share one ``SlamConfig`` (one compiled program).
* Capacities must be preallocated for the whole session — device-ring
  growth would retrace ALL streams at once; the pipeline raises before a
  ring can overflow instead of growing (size ``kf_capacity`` /
  ``traj_capacity`` etc. upfront).
* Streams advance in lock-step ticks: every stream processes exactly one
  scan per ``step()`` (the host feeds one scan per stream per tick, as a
  lidar fleet does); the mapping throttle must stay disabled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .resident import (
    ResidentPipeline,
    frame_buf_size,
    resident_step_packed,
)


@partial(jax.jit, static_argnames=("params", "S", "W"), donate_argnums=(0,))
def resident_step_multi(states, bufs, params, S: int, W: int):
    """One lock-step tick for all streams: vmapped resident_step_packed."""
    return jax.vmap(
        lambda st, buf: resident_step_packed.__wrapped__(st, buf, params, S, W)
    )(states, bufs)


class _BatchedMarker:
    """Sentinel standing in for a stream shell's state while the real
    state lives stacked in the coordinator."""

    def __bool__(self):  # pragma: no cover - defensive
        return True


_BATCHED = _BatchedMarker()


class _StreamShell(ResidentPipeline):
    """Per-stream host shell: does all host-side work (scan packing, IMU
    windows, GPS gating, loop cadence) but hands its frame buffer to the
    coordinator instead of dispatching."""

    def __init__(self, cfg, coord, lane: int):
        super().__init__(cfg)
        self._coord = coord
        self._lane = lane

    def _dispatch_step(self, buf: np.ndarray, S: int, W: int):
        self._coord._stash(self._lane, buf)

    def _maybe_grow_rings(self):
        # growth is unsupported in batched mode: check the same host-side
        # bounds the single-stream pipeline grows on, and fail LOUDLY
        # before any ring can overflow (silent wraparound would corrupt
        # the graph)
        st = self._coord._ring_shapes
        m = 2
        kf_bound = self._kf_known[0] + (self.frame_idx - self._kf_known[1])
        g_bound = self._g_known[0] + (self._gps_feeds - self._g_known[1])
        l_bound = self._l_known[0] + (self._loop_flags - self._l_known[1])
        over = []
        if self.frame_idx >= st["traj"] - m:
            over.append(f"traj({st['traj']})")
        if kf_bound >= st["kf"] - m:
            over.append(f"kf({st['kf']})")
        if g_bound >= st["gps"] - m:
            over.append(f"gps({st['gps']})")
        if l_bound >= st["loop"] - m:
            over.append(f"loop({st['loop']})")
        if self._imu_feeds >= st["imu"] - (m + 2) * self.cfg.imu_window:
            over.append(f"imu_rate({st['imu']})")
        if over:
            raise RuntimeError(
                "MultiStreamPipeline rings near capacity: "
                + ", ".join(over)
                + " — batched mode cannot grow mid-run; raise the "
                "corresponding SlamConfig capacities upfront."
            )

    def block(self):
        self._coord.block()


class MultiStreamPipeline:
    """Coordinator for N lock-step SLAM sessions on one chip.

    Usage::

        pipe = MultiStreamPipeline(cfg, n_streams=8)
        pipe.push_imu(lane, sample)           # per-stream ingest
        pipe.step([scan_0, ..., scan_{N-1}])  # one scan per stream
        pipe.finish()
        times, poses = pipe.stream(0).trajectory_arrays()
    """

    def __init__(self, cfg, n_streams: int):
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        if cfg.mappingProcessInterval > 0.0:
            raise ValueError(
                "batched streams advance in lock-step; set "
                "mappingProcessInterval=0 (the host feed controls cadence)"
            )
        self.cfg = cfg
        self.n = n_streams
        self.streams = [_StreamShell(cfg, self, i) for i in range(n_streams)]
        self.states = None  # stacked pytree [N, ...] once all bootstrapped
        self._bufs: list = [None] * n_streams
        self._ring_shapes = dict(
            traj=cfg.traj_capacity, kf=cfg.kf_capacity, gps=cfg.gps_capacity,
            loop=cfg.loop_capacity, imu=cfg.imu_rate_capacity,
        )

    # -- ingest --------------------------------------------------------
    def stream(self, lane: int) -> _StreamShell:
        return self.streams[lane]

    def push_imu(self, lane: int, sample):
        self.streams[lane].push_imu(sample)

    def push_gps(self, lane: int, fix):
        self.streams[lane].push_gps(fix)

    # -- per-tick ------------------------------------------------------
    def _stash(self, lane: int, buf: np.ndarray):
        self._bufs[lane] = buf

    def step(self, scans):
        """Process exactly one scan per stream (lock-step tick)."""
        if len(scans) != self.n:
            raise ValueError(f"expected {self.n} scans, got {len(scans)}")
        for shell, scan in zip(self.streams, scans):
            shell.process_scan(scan)
        if self.states is None:
            # bootstrap tick: every shell built its own single-stream state
            if any(s.state is None or s.state is _BATCHED for s in self.streams):
                raise RuntimeError("a stream failed to bootstrap")
            self.states = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[s.state for s in self.streams]
            )
            for s in self.streams:
                s.state = _BATCHED
            return
        if any(b is None for b in self._bufs):
            missing = [i for i, b in enumerate(self._bufs) if b is None]
            raise RuntimeError(
                f"streams {missing} produced no frame this tick (mapping "
                "throttle or empty scan?) — batched mode is lock-step"
            )
        S, W = self.cfg.raw_cap, self.cfg.imu_window
        bufs = jnp.asarray(np.stack(self._bufs))
        self._bufs = [None] * self.n
        self.states = resident_step_multi(
            self.states, bufs, self.streams[0].params, S, W
        )

    # -- end-of-run ----------------------------------------------------
    def block(self):
        if self.states is not None:
            jax.block_until_ready(self.states.traj_count)

    def finish(self):
        """Barrier + hand each stream its own state slice so the normal
        single-stream readbacks (trajectory_arrays / save_tum /
        sync_store / save_checkpoint) work per stream."""
        self.block()
        if self.states is None:
            return
        for i, s in enumerate(self.streams):
            s.state = jax.tree_util.tree_map(lambda a, i=i: a[i], self.states)
            s._synced = False
