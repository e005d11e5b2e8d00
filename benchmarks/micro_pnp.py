"""Microbench: RANSAC-PnP + selection substages on one TPU chip at LM-O scale.

Decomposes the solve stage (pipeline/inference.solve_batch) into hypothesis
sampling / DLT solve / scoring / LM / final-score substages.

Usage: python benchmarks/micro_pnp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.pipeline.inference import estimate_score
    from foundpose_tpu.pose import pnp as pnp_mod
    from foundpose_tpu.utils.profiling import device_time_scan

    b, top_n, k, h = 64, 5, 300, 400
    pairs = b * top_n

    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    c2d = jax.random.uniform(keys[0], (pairs, k, 2), jnp.float32, 0, 420)
    c3d = jax.random.uniform(keys[1], (pairs, k, 3), jnp.float32, -0.05, 0.05)
    valid = jax.random.uniform(keys[2], (pairs, k)) > 0.2
    ids = jax.random.randint(keys[3], (pairs, k), 0, 900)
    kf = jnp.tile(jnp.asarray([600.0, 600.0]), (pairs, 1))
    kc = jnp.tile(jnp.asarray([209.5, 209.5]), (pairs, 1))
    pkeys = jax.random.split(keys[4], pairs)

    def sampling_only(c2d, c3d):
        def one(v, key):
            vi = v.astype(jnp.int32)
            rank = jnp.cumsum(vi) - vi
            count = jnp.maximum(jnp.sum(vi), 1)
            u = jax.random.randint(key, (h, 6), 0, k) % count
            return jnp.sum(
                (u[:, :, None] == rank[None, None, :]) & v[None, None, :],
                axis=1,
            ).astype(jnp.float32).sum()

        return jax.vmap(one)(valid, pkeys)

    def dlt_only(c2d, c3d):
        def one(p2, p3, v, kf1, kc1, key):
            vi = v.astype(jnp.int32)
            rank = jnp.cumsum(vi) - vi
            count = jnp.maximum(jnp.sum(vi), 1)
            u = jax.random.randint(key, (h, 6), 0, k) % count
            counts = jnp.sum(
                (u[:, :, None] == rank[None, None, :]) & v[None, None, :],
                axis=1,
            ).astype(jnp.float32)
            rays = (p2 - kc1) / kf1
            rs, ts = pnp_mod._dlt_pose_many(
                p3, rays, validf=v.astype(jnp.float32), counts=counts
            )
            return rs.sum() + ts.sum()

        return jax.vmap(one)(c2d, c3d, valid, kf, kc, pkeys)

    def full_ransac(c2d, c3d):
        res = jax.vmap(
            lambda p2, p3, v, f, c, key: pnp_mod.ransac_pnp(
                p2, p3, v, f, c, key, num_hypotheses=h, refine_lm=True,
                lm_iters=10,
                # Pinned off so the micro isolates RANSAC+LM; the pipelines
                # run lo_refine on the winning template only, and leaving the
                # function default (2) here would fold two overdetermined DLT
                # refits into every recorded stage number.
                lo_iters=0,
            )
        )(c2d, c3d, valid, kf, kc, pkeys)
        return res.R.sum() + res.t.sum() + res.quality.sum()

    def ransac_no_lm(c2d, c3d):
        res = jax.vmap(
            lambda p2, p3, v, f, c, key: pnp_mod.ransac_pnp(
                p2, p3, v, f, c, key, num_hypotheses=h, refine_lm=False,
                lo_iters=0,
            )
        )(c2d, c3d, valid, kf, kc, pkeys)
        return res.R.sum() + res.t.sum() + res.quality.sum()

    def final_score(c2d, c3d):
        r = jnp.tile(jnp.eye(3), (b, 1, 1))
        t = jnp.tile(jnp.asarray([0.0, 0.0, 0.5]), (b, 1))
        return jax.vmap(
            lambda r1, t1, p2, i1, p3, v, f, c: estimate_score(
                r1, t1, p2, i1, p3, v, f, c, num_query_points=900
            )
        )(r, t, c2d[:b], ids[:b], c3d[:b], valid[:b], kf[:b], kc[:b])

    for name, fn in [
        ("hypothesis_sampling", sampling_only),
        ("sampling+dlt", dlt_only),
        ("ransac_no_lm", ransac_no_lm),
        ("ransac_full(+lm)", full_ransac),
        ("estimate_score(best)", final_score),
    ]:
        sec = device_time_scan(fn, c2d, c3d)
        print(f"{name:22s} {sec * 1e3:8.3f} ms/batch-{b}")


if __name__ == "__main__":
    main()
