"""Standalone ViT-stage device timing (batch 64, LM-O ViT-S config).

Times only the feature-extraction stage with profiling.device_time_scan so
fused-block kernel changes can be measured without recompiling the other
bench stages. Prints one line: vit_ms_per_batch.
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from foundpose_tpu.models import dinov2
    from foundpose_tpu.utils.profiling import device_time_scan, force_execution

    vit_cfg = dataclasses.replace(
        dinov2.parse_model_name(
            os.environ.get(
                "VIT_MODEL",
                "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1",
            )
        ),
        use_pallas_attention=True,
        approx_gelu=True,
        use_fused_block=os.environ.get("VIT_FUSED", "1") == "1",
        softmax_stabilizer=os.environ.get("VIT_STABILIZER", "capped"),
        fused_images_per_step=int(os.environ.get("VIT_IMG_PER_STEP", "1")),
        fused_paired_heads=os.environ.get("VIT_PAIRED", "0") == "1",
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), vit_cfg)
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    crops = jax.random.uniform(
        jax.random.PRNGKey(7), (batch, 420, 420, 3), jnp.float32
    )

    @jax.jit
    def vit_fn(c, p):
        images = dinov2.normalize_images(c).astype(jnp.bfloat16)
        o = dinov2.extract_facet(p, vit_cfg, images)
        return o["feature_maps"].astype(jnp.float32)

    force_execution(vit_fn(crops, params))
    t = device_time_scan(vit_fn, crops, params)
    print(f"vit_ms_per_batch={t * 1000:.2f} batch={batch} "
          f"fused={vit_cfg.use_fused_block}")


if __name__ == "__main__":
    main()
