"""Device cost of featuremetric refinement in the fused serving program.

Measures end-to-end crops/sec of the benched LM-O configuration with
refine_featuremetric OFF vs ON (8 LM iterations over dense PCA'd feature
residuals, pose/featuremetric.py) at batch 64 and 128 on one TPU chip,
using the same on-device lax.scan timing harness as bench.py (one
dispatch, checksummed carry, terminal scalar fetch).

Accuracy side of the trade: benchmarks/cross_parity.py --featuremetric
(artifact benchmarks/results/featuremetric_accuracy_r05.json).

Usage: python benchmarks/featuremetric_bench.py
Prints one JSON line with crops/sec off/on per batch + ms/batch deltas.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(step_config, vit_cfg, params, repre, batch, n_iters=8):
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.structs import PinholeCamera

    kc, km = jax.random.split(jax.random.PRNGKey(7))
    crops = jax.random.uniform(kc, (batch, 420, 420, 3), jnp.float32)
    inner = (jax.random.uniform(km, (batch, 260, 260)) > 0.4).astype(jnp.float32)
    masks = jnp.zeros((batch, 420, 420), jnp.float32)
    masks = masks.at[:, 80:340, 80:340].set(inner)
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (batch, 1)),
        c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (batch, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (batch, 1, 1)),
        width=420, height=420,
    )

    @jax.jit
    def run_n(p, c, m, cam, r, k):
        def body(carry, ki):
            c_in = c + (carry * 1e-30).astype(c.dtype)
            out = inference.pose_from_crops(
                p, vit_cfg, c_in, m, cam, r, ki, step_config
            )
            chk = jnp.float32(0.0)
            for leaf in jax.tree.leaves(out):
                chk = chk + jnp.sum(leaf.astype(jnp.float32)) * jnp.float32(1e-30)
            chk = jnp.where(jnp.isfinite(chk), chk, jnp.float32(0.0))
            return carry + chk, ()

        ks = jax.random.split(k, n_iters)
        final, _ = jax.lax.scan(body, jnp.float32(0.0), ks)
        return final

    _ = float(run_n(params, crops, masks, cameras, repre, jax.random.PRNGKey(0)))
    elapsed = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(
            run_n(params, crops, masks, cameras, repre, jax.random.PRNGKey(rep))
        )
        elapsed = min(elapsed, time.perf_counter() - t0)
    return batch * n_iters / elapsed, elapsed / n_iters


def main():
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.models import bench_weights, dinov2
    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from __graft_entry__ import _realistic_repre

    rng = np.random.default_rng(0)
    vit_cfg = dataclasses.replace(
        dinov2.parse_model_name(
            "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
        ),
        use_pallas_attention=True, approx_gelu=True, use_fused_block=True,
        softmax_stabilizer="capped",
    )
    params = jax.device_put(
        bench_weights.realistic_params(jax.random.PRNGKey(0), vit_cfg)
    )
    repre = _realistic_repre(rng, num_templates=798, fmax=512, feat_dim=256,
                             num_words=2048, raw_dim=384)
    repre = repre.cast_banks(jnp.bfloat16)

    base = dict(compute_dtype=jnp.bfloat16, approx_topk=True)
    report = {"metric": "featuremetric_device_cost", "refine_iters": 8}
    for batch in (64, 128):
        cps_off, sec_off = measure(
            inference.InferenceConfig(**base), vit_cfg, params, repre, batch
        )
        cps_on, sec_on = measure(
            inference.InferenceConfig(**base, refine_featuremetric=True),
            vit_cfg, params, repre, batch,
        )
        report[f"crops_per_sec_off_b{batch}"] = round(cps_off, 1)
        report[f"crops_per_sec_on_b{batch}"] = round(cps_on, 1)
        report[f"ms_per_batch_off_b{batch}"] = round(sec_off * 1e3, 2)
        report[f"ms_per_batch_on_b{batch}"] = round(sec_on * 1e3, 2)
        report[f"refine_ms_per_batch_b{batch}"] = round(
            (sec_on - sec_off) * 1e3, 2
        )
        print(
            f"[featuremetric-bench] b{batch}: off {cps_off:.1f} on "
            f"{cps_on:.1f} crops/sec (+{(sec_on - sec_off) * 1e3:.2f} "
            f"ms/batch)",
            file=sys.stderr,
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
