"""Pallas TPU kernel: tiled exact k-NN (flash-attention-style streaming).

The loop-closure ICP verifier does 1-NN of ~16k source points against a
~16k-point submap every GN iteration (``ops.icp``; reference PCL ICP at
``/root/reference/src/mapOptmization.cpp:571-585``). The XLA formulation
(``ops.knn.knn_bruteforce``) materializes per-tile [N, T] distance blocks
through HBM and runs a full ``lax.top_k`` sort per tile. This kernel keeps
everything on-chip:

* query tiles [TQ, 3] and target chunks [TM, 3] live in VMEM;
* the cross term q . t^T rides the MXU (|q|^2 + |t|^2 - 2 q.t^T);
* a running top-k per query is maintained in registers/VMEM across chunks
  with k min-extraction passes (VPU) — no sort, no [N, M] HBM traffic.

Numerically identical to ``knn_bruteforce`` (same expansion, f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sentinel for "no neighbor" (kept finite inside the kernel; the wrapper
# converts to +inf to match knn_bruteforce's contract). Python float, not a
# jnp scalar: a traced constant would be captured by the kernel (a Pallas
# error) and hoisted into an executable parameter (the axon slow path).
_BIG = 1e30


def _kernel(q_ref, t_ref, pen_ref, out_d_ref, out_i_ref, *, k: int, tm: int):
    q = q_ref[:]  # [TQ, 3]
    tq = q.shape[0]
    m = t_ref.shape[0]
    n_chunks = m // tm
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # [TQ, 1]

    def chunk(c, carry):
        best_d, best_i = carry  # [TQ, k], [TQ, k]
        t = t_ref[pl.ds(c * tm, tm), :]  # [TM, 3]
        # penalty rides as [1, M]: a 1-D operand's block spec cannot lower
        # under vmap batching (multistream pipeline), a [1, M] one can
        pen = pen_ref[0, pl.ds(c * tm, tm)]  # [TM] 0 or BIG (masked/padded)
        cross = jax.lax.dot_general(
            q, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [TQ, TM] — MXU
        t2 = jnp.sum(t * t, axis=1)[None, :]
        d2 = q2 + t2 - 2.0 * cross + pen[None, :]

        base = (c * tm).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tm), 1) + base

        # merge the running best into the candidate block, then re-extract
        # the k smallest with k min passes (first-index tie-break via argmin)
        comb_d = jnp.concatenate([best_d, d2], axis=1)  # [TQ, k+TM]
        comb_i = jnp.concatenate([best_i, cols], axis=1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, comb_d.shape, 1)
        new_d, new_i = [], []
        for _ in range(k):
            p = jnp.argmin(comb_d, axis=1).astype(jnp.int32)  # [TQ]
            hit = lanes == p[:, None]
            new_d.append(jnp.min(comb_d, axis=1))
            new_i.append(jnp.sum(jnp.where(hit, comb_i, 0), axis=1))
            comb_d = jnp.where(hit, _BIG, comb_d)
        return jnp.stack(new_d, axis=1), jnp.stack(new_i, axis=1)

    init = (
        jnp.full((tq, k), _BIG, jnp.float32),
        jnp.zeros((tq, k), jnp.int32),
    )
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, chunk, init)
    out_d_ref[:] = best_d
    out_i_ref[:] = best_i


def _cand_kernel(q_ref, cx_ref, cy_ref, cz_ref, ci_ref, out_d_ref, out_i_ref,
                 *, k: int):
    """Fused d2 + masked top-k over per-query candidate lists.

    Replaces the scan-matcher's XLA gather->sort pipeline tail
    (``knn.knn_grid``): one VMEM pass computes the squared distances of all
    C candidates and extracts the k smallest with k min passes — no [N, C]
    HBM intermediate, no sort.
    """
    q = q_ref[:]  # [TQ, 3]
    dx = cx_ref[:] - q[:, 0:1]
    dy = cy_ref[:] - q[:, 1:2]
    dz = cz_ref[:] - q[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz  # [TQ, C]
    ci = ci_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    ds, is_ = [], []
    for _ in range(k):
        p = jnp.argmin(d2, axis=1).astype(jnp.int32)
        hit = lanes == p[:, None]
        ds.append(jnp.min(d2, axis=1))
        is_.append(jnp.sum(jnp.where(hit, ci, 0), axis=1))
        d2 = jnp.where(hit, _BIG, d2)
    out_d_ref[:] = jnp.stack(ds, axis=1)
    out_i_ref[:] = jnp.stack(is_, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "interpret"))
def topk_candidates_pallas(
    queries: jax.Array,   # [N, 3]
    cand_xyz: jax.Array,  # [N, C, 3] candidate coords (invalid -> huge)
    cand_idx: jax.Array,  # [N, C] int32 global indices
    k: int = 5,
    tile_q: int = 256,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """k nearest of each query's candidate list; invalid candidates must be
    pre-set to far-away coordinates. Returns (d2 [N,k], idx [N,k]) with
    missing neighbors as (+inf, 0)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, c = cand_idx.shape
    np_ = (-n) % tile_q
    q_pad = jnp.pad(queries, ((0, np_), (0, 0)))
    # split components: [N, C] blocks keep the lane dimension = C (a [N, C, 3]
    # block would pad the 3-lane axis to 128 and blow VMEM)
    cx = jnp.pad(cand_xyz[..., 0], ((0, np_), (0, 0)), constant_values=_BIG)
    cy = jnp.pad(cand_xyz[..., 1], ((0, np_), (0, 0)), constant_values=_BIG)
    cz = jnp.pad(cand_xyz[..., 2], ((0, np_), (0, 0)), constant_values=_BIG)
    ci = jnp.pad(cand_idx, ((0, np_), (0, 0)))

    kern = functools.partial(_cand_kernel, k=k)
    row = pl.BlockSpec((tile_q, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_d, out_i = pl.pallas_call(
        kern,
        grid=((n + np_) // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row, row, row,
            pl.BlockSpec((tile_q, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + np_, k), jnp.float32),
            jax.ShapeDtypeStruct((n + np_, k), jnp.int32),
        ],
        interpret=interpret,
    )(q_pad, cx, cy, cz, ci)

    best_d = out_d[:n]
    best_i = out_i[:n]
    missing = best_d >= _BIG * 0.5
    best_d = jnp.where(missing, jnp.inf, jnp.maximum(best_d, 0.0))
    best_i = jnp.where(missing, 0, best_i)
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "tile_m", "interpret"))
def knn_bruteforce_pallas(
    map_xyz: jax.Array,
    map_mask: jax.Array,
    queries: jax.Array,
    query_mask: jax.Array,
    k: int = 5,
    tile_q: int = 256,
    tile_m: int = 2048,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ``knn.knn_bruteforce`` (same signature/contract).

    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere
    (so the same tests run on the CPU mesh).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = queries.shape[0]
    m = map_xyz.shape[0]
    np_ = (-n) % tile_q
    mp_ = (-m) % tile_m
    q_pad = jnp.pad(queries, ((0, np_), (0, 0)))
    t_pad = jnp.pad(map_xyz, ((0, mp_), (0, 0)))
    pen = jnp.where(map_mask, 0.0, _BIG).astype(jnp.float32)
    pen = jnp.pad(pen, (0, mp_), constant_values=_BIG)[None, :]

    kern = functools.partial(_kernel, k=k, tm=tile_m)
    out_d, out_i = pl.pallas_call(
        kern,
        grid=((n + np_) // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full target
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full penalty
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + np_, k), jnp.float32),
            jax.ShapeDtypeStruct((n + np_, k), jnp.int32),
        ],
        interpret=interpret,
    )(q_pad, t_pad, pen)

    best_d = out_d[:n]
    best_i = out_i[:n]
    missing = (best_d >= _BIG * 0.5) | ~query_mask[:, None]
    best_d = jnp.where(missing, jnp.inf, jnp.maximum(best_d, 0.0))
    best_i = jnp.where(missing, 0, best_i)
    return best_d, best_i
