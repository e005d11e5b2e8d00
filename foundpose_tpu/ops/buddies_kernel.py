"""Fused cyclic-buddy Pallas kernel: distances, dual argmin, cycle distances.

Stage profiling (benchmarks/micro_buddies.py) showed the matching stage's
cost is NOT the distance matmul or the top-k — it is the index GATHERS that
compose the cycle (`o2q[q2o]`, `query_points[cycle_ids]`), which serialize
on TPU (~3.5 of the stage's ~7.8 ms/batch-64). This kernel keeps the [Q, F]
distance matrix in VMEM and eliminates every gather:

- Dual argmin via KEYED MIN: each distance is encoded as a sortable int32
  (IEEE bits of a non-negative f32 are monotone as an integer) whose low
  bits carry the lane/sublane index, so a plain min reduction returns the
  argmin in its low bits and ties break by lowest index — no variadic
  argmin reduce, no cross-lane index shuffles.
- The one-per-row / one-per-column min masks M1, M2 ARE the one-hot forms
  of q2o / o2q, so the cycle's landing positions compose as two tiny MXU
  matmuls: u2 = M1 @ (M2^T @ query_points) — gather-free.
- Outputs are the per-query cycle distances (invalid -> INVALID_SENTINEL)
  and q2o ids; ops/selection.py compacts them to the top-k slots outside
  (also gather-free).

Used by the approx_topk path of pose/corresp.py on TPU (round 1's buddies
kernel fused only the distance+argmin part — which XLA already handles
well — and lost end-to-end; the gathers it left in place were the actual
bottleneck).

The index tie-break perturbs distances by <= 2^bits ulps (bucketed ranking,
same contract as ops/selection.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foundpose_tpu.ops.selection import INVALID_SENTINEL

Array = jax.Array

_BIG = 1e30  # Python float: closed over by the kernel as a compile-time const


def _buddies_kernel(
    qf_ref, bf_ref, qmask_ref, bmask_ref, qpts_ref, cd_ref, q2o_ref,
    *, f_bits: int, q_bits: int,
):
    qf = qf_ref[0]  # [Q, D] compute dtype (bf16 on the fast path)
    bf = bf_ref[0, 0]  # [F, D]
    qm = qmask_ref[0]  # [Q, 1] f32, 1 = valid
    bm = bmask_ref[0, 0]  # [1, F] f32
    qpts = qpts_ref[...]  # [Q, 2] f32

    # Squared L2 distances, masked entries pushed to +BIG (additive — BIG
    # absorbs any real distance in f32). Norm rows/columns are built with
    # dot_generals against a ones vector so nothing is ever transposed.
    qf32 = qf.astype(jnp.float32)
    bf32 = bf.astype(jnp.float32)
    ones_d = jnp.ones((1, qf.shape[1]), jnp.float32)
    q2 = jax.lax.dot_general(
        qf32 * qf32, ones_d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, 1]
    b2 = jax.lax.dot_general(
        ones_d, bf32 * bf32, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, F]
    cross = jax.lax.dot_general(
        qf, bf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Q, F]
    d = jnp.maximum(q2 + b2 - 2.0 * cross, 0.0)
    d = d + (1.0 - qm) * _BIG + (1.0 - bm) * _BIG

    di = jax.lax.bitcast_convert_type(d, jnp.int32)  # monotone for d >= 0
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    key_r = (di & ~jnp.int32((1 << f_bits) - 1)) | lane
    key_c = (di & ~jnp.int32((1 << q_bits) - 1)) | sub
    rmin = jnp.min(key_r, axis=1, keepdims=True)  # [Q, 1]
    cmin = jnp.min(key_c, axis=0, keepdims=True)  # [1, F]
    m1 = (key_r == rmin).astype(jnp.float32)  # one-hot of q2o, [Q, F]
    m2 = (key_c == cmin).astype(jnp.float32)  # one-hot of o2q (per column)

    # Cycle landing positions: L[f] = qpts[o2q[f]]; u2[q] = L[q2o[q]].
    landing = jax.lax.dot_general(
        m2, qpts, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [F, 2]
    u2 = jax.lax.dot(m1, landing, preferred_element_type=jnp.float32)  # [Q, 2]
    diff = qpts - u2
    cd = jnp.sqrt(diff[:, 0:1] ** 2 + diff[:, 1:2] ** 2)  # [Q, 1]
    cd_ref[0, 0] = jnp.where(qm > 0, cd, INVALID_SENTINEL)

    iota_f = jax.lax.broadcasted_iota(
        jnp.int32, (bf.shape[0], 1), 0
    ).astype(jnp.float32)
    q2o_ref[0, 0] = jax.lax.dot(
        m1, iota_f, preferred_element_type=jnp.float32
    )  # [Q, 1] object ids, exact in f32


@functools.partial(jax.jit, static_argnames=("interpret",))
def cycle_distances_fused(
    query_feats: Array,
    query_mask: Array,
    query_points: Array,
    sel_feats: Array,
    sel_mask: Array,
    interpret: bool = False,
):
    """Cycle distances + q2o ids for all (crop, template) pairs.

    Args:
        query_feats: [B, Q, D]; query_mask: [B, Q] bool.
        query_points: [Q, 2] shared grid.
        sel_feats: [B, T', F, D] gathered template banks;
        sel_mask: [B, T', F] bool.

    Returns (cycle_dists [B, T', Q] f32 with INVALID_SENTINEL at masked
    queries, q2o [B, T', Q] int32).
    """
    b, q, dim = query_feats.shape
    _, tn, f, _ = sel_feats.shape
    f_bits = max(1, (f - 1).bit_length())
    q_bits = max(1, (q - 1).bit_length())

    qmask_col = query_mask.astype(jnp.float32)[..., None]  # [B, Q, 1]
    bmask_row = sel_mask.astype(jnp.float32)[:, :, None, :]  # [B, T', 1, F]

    cd, q2o_f = pl.pallas_call(
        functools.partial(_buddies_kernel, f_bits=f_bits, q_bits=q_bits),
        out_shape=(
            jax.ShapeDtypeStruct((b, tn, q, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, tn, q, 1), jnp.float32),
        ),
        grid=(b, tn),
        in_specs=[
            pl.BlockSpec((1, q, dim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f, dim), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, f), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, q, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(
        query_feats,
        sel_feats,
        qmask_col,
        bmask_row,
        query_points.astype(jnp.float32),
    )
    return cd[..., 0], q2o_f[..., 0].astype(jnp.int32)
