"""Per-step collective traffic + multi-chip scaling forecast.

Real multi-chip hardware is absent in this environment; the dryrun proves
the sharded programs compile + execute, but not what they would cost. This
tool quantifies the part the dryrun can't: it lowers the actual sharded
steps at the published LM-O scale on a virtual 8-device mesh, parses every
collective op out of the lowered StableHLO (op, tensor shape, dtype,
replica-group size), converts each to ring-algorithm bytes-per-chip
(all_gather: (n-1)/n x payload; all_reduce: 2(n-1)/n x payload), and
projects compute-bound vs ICI-bound throughput for v5e-4 / v5e-8 slices.

Multiplicity: the tensor-parallel ViT's two psums per layer live inside the
lax.scan over layers, so they appear ONCE in the HLO while-body but execute
(layer+1) times. They are recognized by shape ([B_local, tokens, embed_dim])
and multiplied accordingly; every other collective in this design executes
once per step (the bank-axis top-n merge + bank fetch run outside any loop,
and the test suite HLO-asserts exactly 2 psums/layer for TP —
tests/test_sharding.py).

Assumed hardware constants (documented, adjustable):
  v5e bf16 peak        197 TFLOP/s /chip
  v5e ICI bandwidth    1600 Gbit/s = 200 GB/s aggregate bidi /chip
                       (~100 GB/s per direction; ring collectives on a 2D
                       torus can use multiple links, we conservatively
                       assume ONE direction's worth, 1e11 B/s)

Prints one JSON line; the table lands in docs/KERNELS.md.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

ICI_BYTES_PER_S = 1.0e11  # per chip, one direction (see module docstring)
PEAK_FLOPS = 197e12

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "ui32": 4,
                "i64": 8, "f64": 8, "i8": 1, "ui8": 1, "i1": 1}

_COLLECTIVE_RE = re.compile(
    r"\"?stablehlo\.(all_reduce|all_gather|reduce_scatter|collective_permute|"
    r"all_to_all)\"?"
)
_TENSOR_RE = re.compile(r"tensor<((?:[0-9]+x)*)([a-z][a-z0-9]*)>")
_GROUPS_RE = re.compile(r"replica_groups\s*=\s*dense<\[\[([^\]]*)\]")


def parse_collectives(mlir_text):
    """Extracts (op, out_shape, dtype, group_size) for every collective.

    Result types sit after the `->` of the op's function-type signature —
    for single-line ops (all_gather) on the op line itself, for
    region-carrying ops (all_reduce's reduction body) on the `}) : (...) ->`
    line that closes the region. The replica_groups dense<> attribute is a
    tensor type too, which is why the result is located via `->` rather
    than "last tensor<> on the line".
    """
    lines = mlir_text.splitlines()
    out, i = [], 0
    while i < len(lines):
        m = _COLLECTIVE_RE.search(lines[i])
        if not m:
            i += 1
            continue
        op = m.group(1)
        gm = _GROUPS_RE.search(lines[i])
        group = len(gm.group(1).split(",")) if gm else None
        j = i
        while j < len(lines) and "->" not in lines[j]:
            j += 1
        if j < len(lines):
            results = _TENSOR_RE.findall(lines[j].split("->", 1)[1])
            for dims_s, dtype in results:
                dims = [int(d) for d in dims_s.split("x") if d]
                out.append(
                    {"op": op, "shape": dims, "dtype": dtype, "group": group}
                )
        i = j + 1
    return out


def ring_bytes_per_chip(op, payload_bytes, n):
    if n is None or n <= 1:
        return 0.0
    if op == "all_gather":
        return (n - 1) / n * payload_bytes
    if op == "all_reduce":
        return 2.0 * (n - 1) / n * payload_bytes
    if op == "reduce_scatter":
        return (n - 1) / n * payload_bytes
    if op == "collective_permute":
        return payload_bytes
    if op == "all_to_all":
        return (n - 1) / n * payload_bytes
    return payload_bytes


def account(collectives, vit_layers, embed_dim):
    """Sums bytes/chip/step, multiplying in-scan ViT TP psums by layer count."""
    per_op = []
    total = 0.0
    for c in collectives:
        nbytes = _DTYPE_BYTES.get(c["dtype"], 4)
        for d in c["shape"]:
            nbytes *= d
        is_vit_psum = (
            c["op"] == "all_reduce"
            and len(c["shape"]) == 3
            and c["shape"][-1] == embed_dim
        )
        mult = vit_layers if is_vit_psum else 1
        moved = ring_bytes_per_chip(c["op"], nbytes, c["group"]) * mult
        total += moved
        per_op.append({**c, "multiplicity": mult,
                       "bytes_per_chip": round(moved)})
    return total, per_op


def main():
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _realistic_repre
    from foundpose_tpu.models import dinov2
    from foundpose_tpu.parallel import mesh as mesh_mod
    from foundpose_tpu.parallel.sharded_inference import (
        make_multi_object_mesh_step,
        make_object_mesh_step,
        prepare_mesh_vit_params,
    )
    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.repre import stack_repres
    from foundpose_tpu.structs import PinholeCamera

    assert len(jax.devices()) >= 8, "needs 8 virtual devices"

    # Published LM-O scale; bf16 fast-path config (the shipped default).
    vit_cfg = dinov2.parse_model_name(
        "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
    )
    config = inference.InferenceConfig(
        compute_dtype=jnp.bfloat16, approx_topk=True
    )
    rng = np.random.default_rng(0)
    repre = _realistic_repre(rng, num_templates=798, fmax=512, feat_dim=256,
                             num_words=2048, raw_dim=384).cast_banks(
        jnp.bfloat16
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), vit_cfg)
    batch = int(os.environ.get("FORECAST_BATCH", "64"))

    def inputs(mesh):
        shd = mesh_mod.crop_sharding(mesh)
        crops = jax.device_put(
            np.zeros((batch, 420, 420, 3), np.float32), shd
        )
        masks = jax.device_put(np.ones((batch, 420, 420), np.float32), shd)
        cams = PinholeCamera(
            f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (batch, 1)),
            c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (batch, 1)),
            T_world_from_eye=jnp.tile(jnp.eye(4)[None], (batch, 1, 1)),
            width=420, height=420,
        )
        return crops, masks, cams

    def vit_scan_layers(cfg):
        """Blocks inside the lax.scan (psum multiplicity for TP): the token
        facet runs blocks [0, layer]; q/k/v facets run [0, layer) plus one
        out-of-scan qkv matmul."""
        return cfg.layer + 1 if cfg.facet == "token" else cfg.layer

    from foundpose_tpu.utils.flops import pipeline_flops_per_crop

    def flops_per_crop_fn(cfg):
        """Per-crop FLOPs — the SAME single-sourced analytic model bench.py
        uses for MFU (foundpose_tpu/utils/flops.py), so the boundedness
        verdicts here cannot skew from the bench's numbers."""
        return pipeline_flops_per_crop(
            cfg, crop_px=420, pca_in=cfg.embed_dim, pca_out=256,
            num_words=2048, bank_fmax=512,
            top_n_templates=config.top_n_templates,
        )

    # ViT-L (BASELINE.json config #3): the reference's own ViT-L example DSL
    # (reference: utils/dinov2_utils.py:66) — layer-18 key facet. This is
    # the model the "TP is for big extractors" claim targets; its forecast
    # cases substantiate it with real lowered HLO.
    vitl_cfg = dinov2.parse_model_name(
        "dinov2_version=vitl14_stride=14_facet=key_layer=18_norm=1"
    )
    repre_l = _realistic_repre(rng, num_templates=798, fmax=512, feat_dim=256,
                               num_words=2048, raw_dim=vitl_cfg.embed_dim
                               ).cast_banks(jnp.bfloat16)
    params_l = dinov2.init_params(jax.random.PRNGKey(0), vitl_cfg)

    results = {}
    m22 = mesh_mod.make_mesh(shape=(4, 2))
    m222 = mesh_mod.make_mesh(shape=(2, 2, 2))
    repre_b = _realistic_repre(
        rng, num_templates=640, fmax=512, feat_dim=256, num_words=2048,
        raw_dim=384,
    ).cast_banks(jnp.bfloat16)
    cases = [
        ("data4_bank2", m22, vit_cfg, params,
         make_object_mesh_step(m22, vit_cfg, config, repre), False),
        ("data2_bank2_model2", m222, vit_cfg, params,
         make_object_mesh_step(m222, vit_cfg, config, repre), False),
        ("multi_object_data4_bank2", m22, vit_cfg, params,
         make_multi_object_mesh_step(
             m22, vit_cfg, config, stack_repres([repre, repre_b])
         )[0], True),
        ("vitl_data4_bank2", m22, vitl_cfg, params_l,
         make_object_mesh_step(m22, vitl_cfg, config, repre_l), False),
        ("vitl_data2_bank2_model2", m222, vitl_cfg, params_l,
         make_object_mesh_step(m222, vitl_cfg, config, repre_l), False),
    ]

    for name, mesh, cfg_c, params_c, stp, is_multi in cases:
        placed = prepare_mesh_vit_params(mesh, cfg_c, params_c)
        crops, masks, cams = inputs(mesh)
        key = jax.random.PRNGKey(0)
        if is_multi:
            obj_idx = jax.device_put(
                np.zeros(batch, np.int32), mesh_mod.crop_sharding(mesh)
            )
            lowered = stp.lower(placed, crops, masks, cams, obj_idx, key)
        else:
            lowered = stp.lower(placed, crops, masks, cams, key)
        text = lowered.as_text()
        cols = parse_collectives(text)
        total, per_op = account(cols, vit_scan_layers(cfg_c), cfg_c.embed_dim)

        n_chips = len(mesh.devices.ravel())
        step_flops = flops_per_crop_fn(cfg_c) * batch
        compute_s = step_flops / (PEAK_FLOPS * n_chips)
        ici_s = total / ICI_BYTES_PER_S
        bound = "ICI" if ici_s > compute_s else "compute"
        results[name] = {
            "n_collectives_in_hlo": len(per_op),
            "collective_bytes_per_chip_per_step": round(total),
            "ici_s_per_step": round(ici_s, 6),
            "compute_s_per_step_at_peak": round(compute_s, 6),
            "ici_over_compute": round(ici_s / compute_s, 4),
            "bound": bound,
            "per_op": per_op,
        }
        print(f"[forecast] {name}: {len(per_op)} collectives, "
              f"{total/1e6:.2f} MB/chip/step, ici/compute = "
              f"{ici_s/compute_s:.3f} ({bound}-bound)", file=sys.stderr)

    # Slice projections: ideal scaling discounted by the measured-at-peak
    # ici/compute ratio of the matching layout (both are per-step, so the
    # ratio is batch-invariant for fixed per-chip batch).
    print(json.dumps({
        "metric": "collective_traffic_forecast",
        "batch": batch,
        "flops_per_crop_vits": flops_per_crop_fn(vit_cfg),
        "flops_per_crop_vitl": flops_per_crop_fn(vitl_cfg),
        "assumptions": {
            "ici_bytes_per_s_per_chip": ICI_BYTES_PER_S,
            "peak_bf16_flops": PEAK_FLOPS,
            "ring_formulas": "AG (n-1)/n, AR 2(n-1)/n",
        },
        "cases": {k: {kk: vv for kk, vv in v.items() if kk != "per_op"}
                  for k, v in results.items()},
        "per_op": {k: v["per_op"] for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
