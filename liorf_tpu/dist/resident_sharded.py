"""Multi-device resident pipeline: the FULL per-frame SLAM program sharded
over a device mesh.

``ResidentPipeline`` runs the whole frame — deskew, voxel downsample,
point-to-plane GN registration, IMU fusion, keyframe factor graph, loop
closure, graph solve, local-map rebuild — as ONE jit program.
``ShardedResidentPipeline`` compiles that SAME program under GSPMD with
the scan points sharded across the mesh's ``graph`` axis: the per-point
front-end (deskew rotate, k-NN gather, plane fits, J/r rows) executes
data-parallel across devices and XLA inserts the cross-device reductions
for the 6x6 normal equations — the OpenMP-over-points loop of the
reference (mapOptmization.cpp:1078) scaled across chips, with the exact
same numerics path as the single-chip pipeline (trajectory parity is
asserted in tests/test_dist.py and the driver's dryrun).

The small replicated state (keyframe rings, factor rings, grid) rides
along replicated; the graph solve inside the step stays replicated here —
the keyframe-sharded solvers (dist/sharded.py, dist/shard_map_solver.py)
remain the scaling path for huge graphs and are exercised separately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.resident import ResidentPipeline, resident_step


class ShardedResidentPipeline(ResidentPipeline):
    """Same API and semantics as ResidentPipeline; scan points sharded
    across ``mesh`` (1D, axis ``graph``). Scan capacity must be divisible
    by the mesh size."""

    def __init__(self, cfg, mesh: Mesh):
        super().__init__(cfg)
        self.mesh = mesh
        axis = mesh.axis_names[0]
        self._sh_repl = NamedSharding(mesh, P())
        self._sh_pts = NamedSharding(mesh, P(axis))
        self._sh_pts2 = NamedSharding(mesh, P(axis, None))
        if cfg.raw_cap % mesh.devices.size:
            raise ValueError(
                f"raw scan capacity {cfg.raw_cap} not divisible by the "
                f"{mesh.devices.size}-device mesh"
            )
        # the same traced computation as the single-chip path; sharding
        # comes from the committed input placements, not a separate code
        # path. The state is rebound on every step, so donating it is safe
        # and halves steady-state HBM (without donation every step keeps
        # two full copies of the map grid + keyframe clouds live).
        self._jit_step = jax.jit(
            resident_step.__wrapped__, static_argnames=("params",),
            donate_argnums=(0,),
        )
        self._state_replicated = False

    def _dispatch_step(self, buf: np.ndarray, S: int, W: int):
        if not self._state_replicated:
            # bootstrap built the state on one device; replicate it across
            # the mesh once, then let GSPMD carry placements forward
            self.state = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, self._sh_repl), self.state
            )
            self._state_replicated = True
        self.state = self._sharded_call(self.state, buf, S, W)

    def _warm_step(self, grown, buf: np.ndarray, S: int, W: int):
        # growth precompile must warm THIS pipeline's executable (the
        # unpacked sharded step), not resident_step_packed — the base
        # class's warm would compile a program this pipeline never
        # dispatches and growth would still stall on a synchronous compile
        grown = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self._sh_repl), grown
        )
        out = self._sharded_call(grown, buf, S, W)
        jax.block_until_ready(out.traj_count)

    def _sharded_call(self, state, buf: np.ndarray, S: int, W: int):
        # host-side unpack of the flat frame buffer (layout: frame_buf_size)
        o = 0

        def take(n):
            nonlocal o
            v = buf[o : o + n]
            o += n
            return v

        xyz = take(3 * S).reshape(S, 3)
        rel_t = take(S)
        n_kept = float(take(1)[0])
        mask = (np.arange(S) < n_kept)
        scan_start = take(1)[0]
        dk_times = take(W)
        dk_gyr = take(3 * W).reshape(W, 3)
        dk_mask = take(W) > 0.5
        fu_acc = take(3 * W).reshape(W, 3)
        fu_gyr = take(3 * W).reshape(W, 3)
        fu_dts = take(W)
        fu_mask = take(W) > 0.5
        fu_times = take(W)
        imu_rpy = take(3)
        imu_rpy_ok = take(1)[0] > 0.5
        gps_has = take(1)[0] > 0.5
        gps_enu = take(3)
        gps_sigma = take(3)
        do_loop = take(1)[0] > 0.5
        ext_has = take(1)[0] > 0.5
        ext_t_cur = take(1)[0]
        ext_t_pre = take(1)[0]
        if o != buf.size:
            raise RuntimeError(f"frame buffer layout drift: {o} != {buf.size}")

        put_p2 = lambda a: jax.device_put(jnp.asarray(a, jnp.float32), self._sh_pts2)
        put_p = lambda a, dt=jnp.float32: jax.device_put(jnp.asarray(a, dt), self._sh_pts)
        put_r = lambda a, dt=jnp.float32: jax.device_put(jnp.asarray(a, dt), self._sh_repl)

        return self._jit_step(
            state,
            put_p2(xyz), put_p(rel_t), put_p(mask, bool),
            put_r(np.float32(scan_start)),
            put_r(dk_times), put_r(dk_gyr), put_r(dk_mask, bool),
            put_r(fu_acc), put_r(fu_gyr), put_r(fu_dts), put_r(fu_mask, bool),
            put_r(fu_times),
            put_r(imu_rpy), put_r(bool(imu_rpy_ok), bool),
            put_r(bool(gps_has), bool), put_r(gps_enu), put_r(gps_sigma),
            put_r(bool(do_loop), bool),
            put_r(bool(ext_has), bool), put_r(np.float32(ext_t_cur)),
            put_r(np.float32(ext_t_pre)),
            params=self.params,
        )
