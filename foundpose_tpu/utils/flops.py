"""Analytic FLOP model of the online pipeline — single-sourced.

Used by bench.py (MFU denominator) and benchmarks/collective_forecast.py
(compute-vs-ICI boundedness); keeping one copy prevents the two perf
verdicts from skewing when the model family changes.

XLA cost_analysis cannot count FLOPs inside Pallas custom calls (the
fused attention/block kernels), so the dominant matmul stages are counted
analytically; cost_analysis serves as a lower-bound cross-check in bench.
"""

from __future__ import annotations


def vit_flops_per_crop(vit_cfg, crop_px: int) -> int:
    """2 * MACs of the truncated facet forward at `crop_px` input.

    Facet-aware: "token" runs blocks [0, layer]; q/k/v facets run
    [0, layer) plus one qkv projection (models/dinov2.extract_facet).
    """
    d = vit_cfg.embed_dim
    h = vit_cfg.mlp_hidden
    grid = crop_px // vit_cfg.patch_size
    n_tok = grid * grid + 1 + vit_cfg.num_register_tokens
    patch_macs = grid * grid * 3 * vit_cfg.patch_size**2 * d
    mlp_macs = 3 * d * h if vit_cfg.swiglu else 2 * d * h
    layer_macs = n_tok * (4 * d * d + mlp_macs) + 2 * n_tok * n_tok * d
    if vit_cfg.facet == "token":
        vit = patch_macs + (vit_cfg.layer + 1) * layer_macs
    else:
        vit = patch_macs + vit_cfg.layer * layer_macs + n_tok * 3 * d * d
    return 2 * vit


def pipeline_flops_per_crop(
    vit_cfg,
    crop_px: int,
    pca_in: int,
    pca_out: int,
    num_words: int,
    bank_fmax: int,
    top_n_templates: int,
) -> int:
    """2 * MACs of ViT + PCA/word retrieval + buddy distance matmuls."""
    grid = crop_px // vit_cfg.patch_size
    q = grid * grid
    retrieval = q * pca_in * pca_out + q * num_words * pca_out
    buddies = top_n_templates * 2 * q * bank_fmax * pca_out
    return vit_flops_per_crop(vit_cfg, crop_px) + 2 * (retrieval + buddies)
