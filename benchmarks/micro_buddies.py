"""Microbench: cyclic-buddy substages on one TPU chip at LM-O scale.

Decomposes the matching stage (pipeline/inference.match_batch) into bank
gather / distance+argmin / cycle+top-k substages to locate device time.

Usage: python benchmarks/micro_buddies.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.ops.knn import pairwise_sqdist
    from foundpose_tpu.ops.sampling import grid_points
    from foundpose_tpu.utils.profiling import device_time_scan

    b, q, dim, t, fmax, top_n, top_k = 64, 900, 256, 798, 512, 5, 300
    inf = jnp.inf

    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    feats = jax.random.normal(keys[0], (b, q, dim), jnp.bfloat16)
    qmask = jax.random.uniform(keys[1], (b, q)) > 0.3
    bank = jax.random.normal(keys[2], (t, fmax, dim), jnp.bfloat16)
    bmask = jax.random.uniform(keys[3], (t, fmax)) > 0.3
    tids = jax.random.randint(keys[4], (b, top_n), 0, t)
    qpts = grid_points((420, 420), 14.0)

    def gather_only(feats, bank):
        sel = jnp.take(bank, tids, axis=0)  # [B, N, F, D]
        return sel.astype(jnp.float32).sum(axis=(2, 3))  # consume

    def dist_argmin(feats):
        sel = jnp.take(bank, tids, axis=0)
        selm = jnp.take(bmask, tids, axis=0)

        def pair(qf, qm, bf, bm):
            d = pairwise_sqdist(qf, bf)
            d = jnp.where(qm[:, None], d, inf)
            d = jnp.where(bm[None, :], d, inf)
            return jnp.argmin(d, axis=1), jnp.argmin(d, axis=0)

        q2o, o2q = jax.vmap(jax.vmap(pair, in_axes=(None, None, 0, 0)))(
            feats, qmask, sel, selm
        )
        return q2o.sum(), o2q.sum()

    def full(feats):
        sel = jnp.take(bank, tids, axis=0)
        selm = jnp.take(bmask, tids, axis=0)

        def pair(qf, qm, bf, bm):
            d = pairwise_sqdist(qf, bf)
            d = jnp.where(qm[:, None], d, inf)
            d = jnp.where(bm[None, :], d, inf)
            return jnp.argmin(d, axis=1), jnp.argmin(d, axis=0)

        q2o, o2q = jax.vmap(jax.vmap(pair, in_axes=(None, None, 0, 0)))(
            feats, qmask, sel, selm
        )

        def finish(q2o_i, o2q_i, qm):
            cycle_ids = o2q_i[q2o_i]
            cd = jnp.linalg.norm(qpts - qpts[cycle_ids], axis=-1)
            cd = jnp.where(qm, cd, inf)
            bb, qids = jax.lax.approx_min_k(cd, top_k, recall_target=0.95)
            return bb.sum() + qids.sum()

        return jax.vmap(jax.vmap(finish, in_axes=(0, 0, None)))(q2o, o2q, qmask)

    def no_topk(feats):
        """finish with the top-k selection replaced by a slice — isolates the
        cycle-gather cost from the approx_min_k cost."""
        sel = jnp.take(bank, tids, axis=0)
        selm = jnp.take(bmask, tids, axis=0)

        def pair(qf, qm, bf, bm):
            d = pairwise_sqdist(qf, bf)
            d = jnp.where(qm[:, None], d, inf)
            d = jnp.where(bm[None, :], d, inf)
            return jnp.argmin(d, axis=1), jnp.argmin(d, axis=0)

        q2o, o2q = jax.vmap(jax.vmap(pair, in_axes=(None, None, 0, 0)))(
            feats, qmask, sel, selm
        )

        def finish(q2o_i, o2q_i, qm):
            cycle_ids = o2q_i[q2o_i]
            cd = jnp.linalg.norm(qpts - qpts[cycle_ids], axis=-1)
            cd = jnp.where(qm, cd, inf)
            return cd[:top_k].sum() + q2o_i[:top_k].sum()

        return jax.vmap(jax.vmap(finish, in_axes=(0, 0, None)))(q2o, o2q, qmask)

    def topk_only(feats):
        cd = jnp.abs(feats[..., 0])  # [B, Q] stand-in cycle distances
        cds = jnp.tile(cd[:, None].astype(jnp.float32), (1, top_n, 1))

        def one(c):
            bb, qids = jax.lax.approx_min_k(c, top_k, recall_target=0.95)
            return bb.sum() + qids.sum()

        return jax.vmap(jax.vmap(one))(cds)

    from foundpose_tpu.pose import corresp as corresp_mod

    verts = jax.random.uniform(keys[4], (t, fmax, 3), jnp.float32, -0.05, 0.05)

    def real_match(feats):
        cors = corresp_mod.establish_correspondences_batch(
            qpts, feats, qmask, tids,
            jnp.ones(tids.shape, jnp.float32), bank, verts, bmask,
            top_k=top_k, approx_topk=True,
        )
        return sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(cors)
        )

    for name, fn, args in [
        ("bank_gather", gather_only, (feats, bank)),
        ("gather+dist+argmin", dist_argmin, (feats,)),
        ("no_topk(gathers only)", no_topk, (feats,)),
        ("approx_min_k only", topk_only, (feats,)),
        ("full_match_stage", full, (feats,)),
        ("real_match_batch", real_match, (feats,)),
    ]:
        sec = device_time_scan(fn, *args)
        print(f"{name:22s} {sec * 1e3:8.3f} ms/batch-{b}")


if __name__ == "__main__":
    main()
