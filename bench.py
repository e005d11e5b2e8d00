"""End-to-end throughput benchmark: detection crops/sec on one TPU chip.

Measures the full online coarse-pose pipeline (DINOv2 ViT-S/14-reg features ->
PCA -> tf-idf retrieval over 798 templates -> cyclic-buddy matching ->
RANSAC-PnP + LM at the shipped 200-hypothesis + 2-LO budget, AR-gated vs the
reference's 400 by benchmarks/ransac_sweep.py) at the published LM-O
configuration (reference: configs/infer/lmo.json), batched over crops, as one
jitted XLA program. Also reports a per-stage device-time breakdown (each stage jitted
separately) and MFU from the compiled program's XLA cost analysis.

Baseline: the reference publishes no throughput numbers. The denominator is
MEASURED by benchmarks/reference_baseline.py — a faiss-free structural replica
of the reference per-instance loop (torch ViT-S forward, sklearn brute kNN in
place of faiss flat, sklearn PCA, cv2 solvePnPRansac+LM) — then adjusted IN
THE REFERENCE'S FAVOR for hardware it assumes but this host lacks (GPU ViT at
8 ms/crop, 8-core CPU with perfect BLAS scaling). Methodology + raw numbers:
BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured by benchmarks/reference_baseline.py on 2026-08-16 (see BASELINE.md):
# 0.412 crops/sec raw on this 1-core host; 18.85 crops/sec after
# reference-favoring hardware adjustment. We use the adjusted (higher) figure.
REFERENCE_CROPS_PER_SEC = 18.85

# Per-chip bf16 peaks by TPU generation (MFU denominator); unknown
# generations fail loudly rather than reporting MFU against the wrong peak.
_PEAKS = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}
_GEN = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
if _GEN not in _PEAKS:
    raise SystemExit(f"unknown TPU generation {_GEN!r}; add its bf16 peak to _PEAKS")
PEAK_FLOPS = _PEAKS[_GEN]


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the tunneled dev backend compiles at
    # ~5 min/program, so cache across runs (no-op if the backend rejects it).
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from __graft_entry__ import _realistic_repre
    from foundpose_tpu.models import dinov2
    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.structs import PinholeCamera
    from foundpose_tpu.utils.profiling import device_time_scan, force_execution

    rng = np.random.default_rng(0)
    # BENCH_EXTRACTOR switches the model family; the default is the
    # published LM-O ViT-S config. ViT-L (BASELINE.json config #3) uses the
    # reference's own ViT-L example DSL (utils/dinov2_utils.py:66):
    #   BENCH_EXTRACTOR="dinov2_version=vitl14_stride=14_facet=key_layer=18_norm=1"
    extractor_name = os.environ.get(
        "BENCH_EXTRACTOR",
        "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1",
    )
    vit_cfg = dataclasses.replace(
        dinov2.parse_model_name(extractor_name),
        # Pallas fused attention: ~12x over XLA SDPA at 905 tokens (keeps the
        # 905x905 logits in VMEM instead of HBM).
        use_pallas_attention=True,
        # tanh GELU: the exact erf between the MLP matmuls costs ~1 ms/layer;
        # max deviation 5e-4, below bf16 activation noise
        # (tests/test_dinov2.py::test_approx_gelu_feature_parity).
        approx_gelu=True,
        # Whole-block Pallas kernel: ViT 47 -> 28 ms/batch-64 (activations +
        # layer weights VMEM-resident; ops/vit_block.py).
        use_fused_block=True,
        # Drop the softmax max reduction (0.73 ms/layer = 28% of the fused
        # block); exact while attention logits < ~99 (DINOv2 runs +-30),
        # capped/floored beyond (see DinoV2Config.softmax_stabilizer).
        softmax_stabilizer="capped",
    )
    # Calibrated "realistic-statistics" weights (no pretrained checkpoint is
    # reachable here): per-layer q/k scaled so max |attention logit| = 30 —
    # the range pretrained DINOv2 runs in and the regime the capped
    # stabilizer's exactness window (< ~99) is claimed for — and layerscale
    # at a trained-model magnitude (models/bench_weights.py; parity at this
    # range re-verified in tests/test_bench_weights.py). Timed identically
    # to random init (same program, data-independent runtime); what changes
    # is that the stabilizer/bf16 paths are exercised honestly.
    from foundpose_tpu.models import bench_weights

    params_host = bench_weights.realistic_params(jax.random.PRNGKey(0), vit_cfg)
    # The window check runs at the BENCH shape (420 px -> ~905 tokens), not
    # the 154-px calibration probe: the max over ~50x more token pairs is
    # what the benched program actually sees, so a probe-size pass can't
    # vacuously cover the real regime.
    attn_logit_max = float(
        bench_weights.attention_logit_maxima(
            params_host, vit_cfg, probe_size=420, probe_batch=1
        ).max()
    )
    assert attn_logit_max < 99.0, attn_logit_max  # capped-stabilizer window
    # Commit the host-built weights to the device ONCE — numpy args are
    # re-uploaded on every dispatch (~85 MB/call over the tunnel, measured
    # 1730 -> 267 crops/sec when left as numpy).
    params = jax.device_put(params_host)
    repre = _realistic_repre(rng, num_templates=798, fmax=512, feat_dim=256,
                             num_words=2048, raw_dim=vit_cfg.embed_dim)
    # bf16 banks at rest: halves repre HBM + the matching stage's bank-gather
    # traffic (AR-level equivalence: tests/test_fastpath_ar.py).
    repre = repre.cast_banks(jnp.bfloat16)

    # Batch 128 re-measured consistently ahead of 64 in round 3 (1703/1719/
    # 1739 vs 1684/1623/1581 crops/sec across repeated sessions) after the
    # structured-bank + fused-block changes; earlier rounds had them neutral.
    batch = int(os.environ.get("BENCH_BATCH", "128"))
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
    # RANSAC purposes — AR-level equivalence tested in
    # tests/test_fastpath_ar.py).
    config = inference.InferenceConfig(
        compute_dtype=jnp.bfloat16, approx_topk=True,
        # Two-phase solve experiment knob (benchmarks/select_iter_sweep.py):
        # 0 = single-pass (default).
        pnp_select_iter=int(os.environ.get("BENCH_SELECT_ITER", "0")),
    )
    step = inference.jit_pose_from_crops(vit_cfg, config)

    key = jax.random.PRNGKey(1)
    n_iters = 8

    # The timed loop runs ON DEVICE: n_iters sequentially-dependent steps
    # inside one lax.scan program (each step's input is perturbed by the
    # previous step's checksummed outputs, so nothing can be elided), with a
    # single terminal scalar fetch. A Python-side loop would instead measure
    # the tunneled dev backend's ~100 ms/dispatch host round trip, which no
    # production serving path pays (steps there are dispatched asynchronously).
    @jax.jit
    def run_n(p, c, m, cam, r, k):
        def body(carry, ki):
            c_in = c + (carry * 1e-30).astype(c.dtype)
            out = inference.pose_from_crops(p, vit_cfg, c_in, m, cam, r, ki, config)
            chk = jnp.float32(0.0)
            for leaf in jax.tree.leaves(out):
                chk = chk + jnp.sum(leaf.astype(jnp.float32)) * jnp.float32(1e-30)
            chk = jnp.where(jnp.isfinite(chk), chk, jnp.float32(0.0))
            return carry + chk, ()

        ks = jax.random.split(k, n_iters)
        final, _ = jax.lax.scan(body, jnp.float32(0.0), ks)
        return final

    # Warmup / compile. NOTE: some backends (axon tunnel) defer execution
    # until a device->host fetch, so warmup and timing must both end with a
    # scalar fetch.
    _ = float(run_n(params, crops, masks, cameras, repre, key))

    elapsed = float("inf")
    for rep in range(3):
        start = time.perf_counter()
        _ = float(run_n(params, crops, masks, cameras, repre, jax.random.PRNGKey(rep)))
        elapsed = min(elapsed, time.perf_counter() - start)
    sec_per_step = elapsed / n_iters
    crops_per_sec = batch * n_iters / elapsed

    # ---- FLOPs & MFU --------------------------------------------------------
    # XLA cost_analysis does not count FLOPs inside Pallas custom calls (the
    # fused attention), so the honest count is analytic for the dominant
    # matmul stages + cost_analysis as a lower-bound cross-check.
    from foundpose_tpu.utils.flops import pipeline_flops_per_crop

    step_flops = (
        pipeline_flops_per_crop(
            vit_cfg,
            crop_px=config.crop_size[0],
            pca_in=repre.raw_projector.components.shape[1],
            pca_out=repre.raw_projector.components.shape[0],
            num_words=repre.word_centroids.shape[0],
            bank_fmax=repre.bank_feats.shape[1],
            top_n_templates=config.top_n_templates,
        )
        * batch
    )
    mfu = step_flops / sec_per_step / PEAK_FLOPS

    # ---- optional deep profile: per-stage timings + XLA cost analysis ------
    # Each extra XLA program costs ~5 min of remote compilation on the
    # tunneled dev backend, so the default bench compiles exactly ONE program
    # (run_n above). BENCH_STAGES=1 adds the per-stage breakdown (~9 more
    # programs; numbers recorded in README.md).
    ca_flops = None
    stage_ms = None
    device_crops_per_sec = None
    if os.environ.get("BENCH_STAGES") == "1":
        try:
            compiled = jax.jit(
                lambda p, c, m, cam, r, k: inference.pose_from_crops(
                    p, vit_cfg, c, m, cam, r, k, config
                )
            ).lower(params, crops, masks, cameras, repre, key).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            ca_flops = float(ca.get("flops", 0.0))
        except Exception as e:  # cost_analysis is backend-dependent
            print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

        @jax.jit
        def vit_fn(p, c):
            images = dinov2.normalize_images(c).astype(config.compute_dtype)
            o = dinov2.extract_facet(p, vit_cfg, images)
            return o["feature_maps"].astype(jnp.float32)

        @jax.jit
        def retrieve_fn(fmaps, m, r, keys):
            return inference.retrieve_batch(fmaps, m, r, keys, config)

        @jax.jit
        def match_fn(feats, valid, tids, tscores, r):
            return inference.match_batch(feats, valid, tids, tscores, r, config)

        @jax.jit
        def solve_fn(fmaps, valid, tids, tscores, cors, cam, r, keys):
            return inference.solve_batch(
                fmaps, valid, tids, tscores, cors, cam, r, keys, config
            )

        keys2 = jax.random.split(key, 2 * batch)
        sub_keys, crop_keys = keys2[:batch], keys2[batch:]
        fmaps = vit_fn(params, crops)
        feats_b, valid_b, tids_b, tscores_b = retrieve_fn(
            fmaps, masks, repre, sub_keys
        )
        cors_b = match_fn(feats_b, valid_b, tids_b, tscores_b, repre)
        force_execution((fmaps, feats_b, cors_b))

        # Pure device time per stage (scan-differenced: fixed dispatch costs
        # of the tunneled backend cancel; see profiling.device_time_scan).
        stages = {
            "vit": device_time_scan(lambda c, p: vit_fn(p, c), crops, params),
            "retrieval": device_time_scan(
                retrieve_fn, fmaps, masks, repre, sub_keys
            ),
            "buddies": device_time_scan(
                match_fn, feats_b, valid_b, tids_b, tscores_b, repre
            ),
            "pnp_select": device_time_scan(
                solve_fn, fmaps, valid_b, tids_b, tscores_b, cors_b, cameras,
                repre, crop_keys,
            ),
        }
        stage_ms = {k: round(v * 1000, 2) for k, v in stages.items()}
        device_crops_per_sec = round(batch / sum(stages.values()), 2)

    stage_note = (
        f"; device-only {device_crops_per_sec} crops/sec; "
        f"stage ms/batch: {stage_ms}; cost_analysis lower bound: {ca_flops}"
        if stage_ms is not None
        else ""
    )
    print(
        f"[bench] {batch=} {n_iters=} elapsed={elapsed:.3f}s "
        f"-> {crops_per_sec:.2f} crops/sec (scan-loop wall, one dispatch); "
        f"analytic flops/step={step_flops:.3g}; mfu={mfu:.4f}{stage_note}",
        file=sys.stderr,
    )
    result = {
        "metric": "lmo_coarse_pose_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 2),
        "unit": "crops/sec",
        "vs_baseline": round(crops_per_sec / REFERENCE_CROPS_PER_SEC, 2),
        "baseline_crops_per_sec": REFERENCE_CROPS_PER_SEC,
        "baseline_method": "measured replica, reference-favoring (BASELINE.md)",
        "batch": batch,
        "extractor": extractor_name,
        "mfu": round(mfu, 4),
        "flops_per_step_analytic": step_flops,
        "weight_source": (
            "calibrated random (bench_weights.realistic_params: per-layer "
            "max |attn logit| = 30, layerscale 0.1; no pretrained ckpt on "
            "this host)"
        ),
        "attn_logit_max": round(attn_logit_max, 2),
    }
    if stage_ms is not None:
        result["stage_ms_per_batch"] = stage_ms
        result["device_crops_per_sec"] = device_crops_per_sec
        result["flops_per_step_cost_analysis"] = ca_flops
    print(json.dumps(result))


if __name__ == "__main__":
    main()
