"""End-to-end throughput benchmark: detection crops/sec on one TPU chip.

Measures the full online coarse-pose pipeline (DINOv2 ViT-S/14-reg features ->
PCA -> tf-idf retrieval over 798 templates -> cyclic-buddy matching ->
400-hypothesis RANSAC-PnP + LM) at the published LM-O configuration
(reference: configs/infer/lmo.json), batched over crops, as one jitted XLA
program.

Baseline note: the reference publishes no throughput numbers (BASELINE.md).
Its per-crop wall time is dominated by Python loops, faiss CPU round-trips,
and cv2 PnP on top of a single-crop GPU ViT forward; stage timers in the
reference log ~0.4-0.6 s/crop on a datacenter GPU => ~2 crops/sec is the
assumed reference throughput used for `vs_baseline` until a measured number
replaces it (tracked in BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CROPS_PER_SEC = 2.0  # assumed reference GPU pipeline (see docstring)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _realistic_repre
    from foundpose_tpu.models import dinov2
    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.structs import PinholeCamera

    import dataclasses

    rng = np.random.default_rng(0)
    vit_cfg = dataclasses.replace(
        dinov2.parse_model_name(
            "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
        ),
        # Pallas fused attention: ~12x over XLA SDPA at 905 tokens (keeps the
        # 905x905 logits in VMEM instead of HBM).
        use_pallas_attention=True,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), vit_cfg)
    repre = _realistic_repre(rng, num_templates=798, fmax=512, feat_dim=256,
                             num_words=2048, raw_dim=384)

    batch = 64
    # Inputs generated on device (host uploads are slow on tunneled backends).
    kc, km = jax.random.split(jax.random.PRNGKey(7))
    crops = jax.random.uniform(kc, (batch, 420, 420, 3), jnp.float32)
    inner = (jax.random.uniform(km, (batch, 260, 260)) > 0.4).astype(jnp.float32)
    masks = jnp.zeros((batch, 420, 420), jnp.float32)
    masks = masks.at[:, 80:340, 80:340].set(inner)
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (batch, 1)),
        c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (batch, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (batch, 1, 1)),
        width=420,
        height=420,
    )
    # approx_topk: TPU-native buddy selection (a full lax.top_k sort costs
    # ~240 ms/batch at this size; approx selection is rank-equivalent for
    # RANSAC purposes).
    config = inference.InferenceConfig(compute_dtype=jnp.bfloat16, approx_topk=True)
    step = inference.jit_pose_from_crops(vit_cfg, config)

    key = jax.random.PRNGKey(1)
    # Warmup / compile. NOTE: some backends (axon tunnel) defer execution
    # until a device->host fetch, so warmup and timing must both end with a
    # scalar fetch; steps are chained through a data dependency so the timed
    # region provably executes all of them.
    out = step(params, crops, masks, cameras, repre, key)
    _ = float(jnp.sum(out.quality))

    n_iters = 8
    start = time.perf_counter()
    carry = jnp.float32(0.0)
    for i in range(n_iters):
        out = step(
            params, crops + carry * 0.0, masks, cameras, repre, jax.random.PRNGKey(i)
        )
        carry = jnp.sum(out.quality)
    _ = float(carry)
    elapsed = time.perf_counter() - start

    crops_per_sec = batch * n_iters / elapsed
    print(
        f"[bench] {batch=} {n_iters=} elapsed={elapsed:.3f}s "
        f"-> {crops_per_sec:.2f} crops/sec",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "lmo_coarse_pose_crops_per_sec_per_chip",
                "value": round(crops_per_sec, 2),
                "unit": "crops/sec",
                "vs_baseline": round(crops_per_sec / REFERENCE_CROPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
