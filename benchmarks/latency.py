"""Serving latency: time-to-pose at small batch through PoseEngine.

The round-3 numbers were all throughput at batch 64/128; an online consumer
asks first for end-to-end latency at batch 1/8/16 (the reference's primary
perf observable is per-instance wall time, scripts/infer.py:636-645). Two
numbers per batch size:

- device_ms_per_step: pure device time of the jitted pose step at that
  batch (scan-differenced, profiling.device_time_scan — what a locally
  attached production chip pays per batch), and the implied crops/sec.
- engine wall p50/p95 over >= 50 reps of PoseEngine.estimate — full image +
  boxes in, world poses out, fetch-terminated. On THIS host every program
  dispatch crosses the axon tunnel (~100 ms round trip each for the warp
  program, the step program, and the fetch); the tunnel's round-trip cost
  is measured separately (trivial-program reps) and reported next to the
  wall numbers instead of being silently folded in.

Prints one JSON line with all batches. Runs the shipped fast-path
configuration (configs/infer/lmo.json) on calibrated realistic-statistics
weights (models/bench_weights.py) and a structured 798-template bank.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (1, 8, 16)
REPS = int(os.environ.get("LAT_REPS", "50"))


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

    from __graft_entry__ import _realistic_repre
    from foundpose_tpu.engine import PoseEngine
    from foundpose_tpu.models import bench_weights, dinov2
    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.ops.warp import make_single_image_warp
    from foundpose_tpu.structs import PinholeCamera
    from foundpose_tpu.utils.profiling import device_time_scan, force_execution

    vit_cfg = None  # built by the engine below; shared with the raw step
    fast_overrides = dict(
        use_pallas_attention=True,
        approx_gelu=True,
        use_fused_block=True,
        softmax_stabilizer="capped",
    )
    config = inference.InferenceConfig(
        compute_dtype=jnp.bfloat16, approx_topk=True
    )
    repre = _realistic_repre(
        np.random.default_rng(0), num_templates=798, fmax=512, feat_dim=256,
        num_words=2048, raw_dim=384,
    ).cast_banks(jnp.bfloat16)

    # Tunnel program-dispatch round trip: time a trivial jitted fetch so the
    # engine wall numbers can be read net of this host's tunnel overhead.
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(jnp.float32(0.0)))
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        _ = float(trivial(jnp.float32(t0 % 1.0)))
        rtts.append(time.perf_counter() - t0)
    tunnel_ms = float(np.median(rtts) * 1e3)

    # One synthetic full image + detections (engine input format).
    img_rng = np.random.default_rng(3)
    image = (img_rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
    all_boxes = []
    for i in range(max(BATCHES)):
        x0 = 40 + (i % 4) * 140
        y0 = 40 + (i // 4) * 100
        all_boxes.append(np.array([x0, y0, x0 + 120, y0 + 90], np.float32))

    per_batch = {}
    for b in BATCHES:
        eng = PoseEngine(
            config=config, batch_size=b, extractor_overrides=fast_overrides
        )
        if vit_cfg is None:
            vit_cfg = eng.vit_cfg
            # device_put once: numpy params would be re-uploaded per call.
            params = jax.device_put(bench_weights.realistic_params(
                jax.random.PRNGKey(0), vit_cfg
            ))
        eng.vit_params = params
        eng.register_object(1, repre)
        boxes = all_boxes[:b]

        # Warm both programs (warp at batch b, step at batch b).
        for _ in range(2):
            out = eng.estimate(1, image, boxes, K)
        assert len(out) == b

        wall = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = eng.estimate(1, image, boxes, K)
            wall.append(time.perf_counter() - t0)
        wall_ms = np.asarray(wall) * 1e3

        # Pure device time of the pose step at this batch.
        kc, km = jax.random.split(jax.random.PRNGKey(7))
        crops = jax.random.uniform(kc, (b, 420, 420, 3), jnp.float32)
        inner = (jax.random.uniform(km, (b, 260, 260)) > 0.4).astype(
            jnp.float32
        )
        masks = jnp.zeros((b, 420, 420), jnp.float32)
        masks = masks.at[:, 80:340, 80:340].set(inner)
        cams = PinholeCamera(
            f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (b, 1)),
            c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (b, 1)),
            T_world_from_eye=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
            width=420,
            height=420,
        )
        keys = jax.random.PRNGKey(1)

        def step_fn(c, m, cam, r, k):
            return inference.pose_from_crops(
                params, vit_cfg, c, m, cam, r, k, config
            )

        dev_s = device_time_scan(step_fn, crops, masks, cams, repre, keys)

        # Pure device time of the FUSED serving program (what estimate()
        # actually dispatches since round 4): full image -> warp -> step ->
        # packed poses, ONE program. This is the true device time-to-pose.
        img_f, orig_cam, batched_cams, _ = eng._prepare_cams(image, boxes, K)
        mask_full = jnp.asarray(eng._mask_stack([None] * b, 480, 640))
        dst = jax.tree.map(jnp.asarray, batched_cams)
        warp = make_single_image_warp(tuple(config.crop_size))

        def fused_body(im, mk, oc, dc, r):
            cr, cm = warp(im, mk, oc, dc)
            out = inference.pose_from_crops(
                params, vit_cfg, cr, cm, dc, r, jax.random.PRNGKey(1), config
            )
            return PoseEngine._pack_outputs(out)

        fused_s = device_time_scan(
            fused_body, jnp.asarray(img_f), mask_full, orig_cam, dst, repre
        )
        per_batch[b] = {
            "device_ms_per_step": round(dev_s * 1e3, 2),
            "fused_device_ms_time_to_pose": round(fused_s * 1e3, 2),
            "device_crops_per_sec": round(b / dev_s, 2),
            "engine_wall_ms_p50": round(float(np.percentile(wall_ms, 50)), 1),
            "engine_wall_ms_p95": round(float(np.percentile(wall_ms, 95)), 1),
            "engine_wall_ms_min": round(float(wall_ms.min()), 1),
        }
        print(f"[latency] batch {b}: {per_batch[b]}", file=sys.stderr)

    print(json.dumps({
        "metric": "serving_latency_time_to_pose",
        "unit": "ms",
        "reps": REPS,
        "tunnel_dispatch_ms_median": round(tunnel_ms, 1),
        "note": (
            "engine wall includes this host's tunnel round trips (the "
            "fused serving path pays ONE dispatch + one fetch) plus "
            "single-core host prep; fused_device_ms_time_to_pose is the "
            "device time of the whole image->poses program a locally "
            "attached chip pays; device_ms_per_step is the crop-level "
            "pose step alone"
        ),
        "per_batch": per_batch,
    }))


if __name__ == "__main__":
    main()
