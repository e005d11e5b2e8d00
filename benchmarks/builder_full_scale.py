"""Offline builder throughput at the published LM-O scale, on this host.

Measures the full per-object OFFLINE path — template synthesis
(57 viewpoints x 14 in-plane rotations = 798 templates at 420x420, 4x SSAA)
followed by repre building (ViT-S/14-reg registration, PCA 384->256,
k-means 2048, tf-idf descriptors) — end-to-end with per-stage wall times.
The reference runs the same two stages per object
(reference: scripts/gen_templates.py:70, scripts/gen_repre.py:220); its
hot loops are one pyrender call and one torch ViT forward PER TEMPLATE,
sequentially, while this builder renders through the crop camera directly
and registers templates in batched jitted chunks.

Geometry is a synthetic icosphere (no BOP data ships in this environment)
and ViT weights are random — neither changes the arithmetic cost of any
stage.

Usage: python benchmarks/builder_full_scale.py [--viewpoints 57]
       [--rotations 14] [--out /tmp/builder_bench]
"""

import argparse
import json
import logging
import os
import re
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from foundpose_tpu.data.ply import Mesh, save_ply

OBJ_ID = 1

# Reference offline cost per object, measured by
# benchmarks/reference_offline_baseline.py on 2026-08-19 and adjusted IN THE
# REFERENCE'S FAVOR (granted GL render + GPU ViT + faiss-gpu k-means,
# CPU stages / 8; methodology in BASELINE.md §offline).
REF_GEN_TEMPLATES_S = 30.1  # adjusted_s_per_object, gen_templates stage
REF_GEN_REPRE_S = 11.3  # adjusted_s_per_object, gen_repre stage
# Same-host RAW measurements of the reference replica (no hardware grants):
# the apples-to-apples comparison on this 1-core dev host, where the
# adjusted numbers above instead grant the reference an 8-core CPU, a GL
# renderer, and a datacenter GPU it would need different hardware to have.
# (The replica's gen_templates figure EXCLUDES its unmeasurable GL render,
# i.e. it is still reference-favoring.)
REF_SAME_HOST_GEN_TEMPLATES_S = 209.2
REF_SAME_HOST_GEN_REPRE_S = 679.0


class _StageTimeCapture(logging.Handler):
    """Captures Timer.elapsed lines ("<stage>: 12.34567s") from the
    pipeline logger so the per-stage breakdown lands in the JSON verdict
    without changing the pipeline API. Restricted to the named top-level
    stages — the per-template render lines match the same shape and would
    bloat the verdict JSON with 798 entries."""

    _pat = re.compile(r"^(.*): ([0-9.]+)s$")
    _stages = frozenset({
        "Setup", "Template loading", "Feature registration", "PCA",
        "k-means", "tf-idf descriptors", "Artifact fetch", "Save",
    })

    def __init__(self):
        super().__init__()
        self.stages = {}

    def emit(self, record):
        m = self._pat.match(record.getMessage())
        if m and m.group(1) in self._stages:
            self.stages[m.group(1)] = float(m.group(2))


def make_icosphere(scale=40.0, subdivisions=2):
    """Subdivided icosahedron (mm units) with positional vertex colors."""
    phi = (1 + 5**0.5) / 2
    verts = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    for _ in range(subdivisions):
        new_faces = []
        edge_mid = {}
        vlist = list(verts)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                vlist.append((vlist[a] + vlist[b]) / 2.0)
                edge_mid[key] = len(vlist) - 1
            return edge_mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces, dtype=np.int64)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * scale
    colors = (verts - verts.min(0)) / (verts.max(0) - verts.min(0)) * 255.0
    return Mesh(
        vertices=verts.astype(np.float32),
        faces=faces.astype(np.int32),
        colors=colors.astype(np.uint8),
    )


def main():
    from foundpose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--viewpoints", type=int, default=57)
    ap.add_argument("--rotations", type=int, default=14)
    ap.add_argument("--out", default="/tmp/builder_bench")
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    from foundpose_tpu.pipeline import gen_repre as gen_repre_mod
    from foundpose_tpu.pipeline import gen_templates as gen_templates_mod

    out = args.out
    shutil.rmtree(out, ignore_errors=True)
    bop_root = os.path.join(out, "bop")
    models = os.path.join(bop_root, "demo", "models")
    os.makedirs(models)
    mesh = make_icosphere()
    save_ply(os.path.join(models, f"obj_{OBJ_ID:06d}.ply"), mesh)
    diameter = float(
        np.linalg.norm(mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0))
    )
    with open(os.path.join(models, "models_info.json"), "w") as f:
        json.dump({str(OBJ_ID): {"diameter": diameter}}, f)

    capture = _StageTimeCapture()
    logging.getLogger("foundpose_tpu").addHandler(capture)

    times = {}
    t0 = time.perf_counter()
    gen_templates_mod.synthesize_templates(
        gen_templates_mod.GenTemplatesOpts(
            object_dataset="demo",
            object_lids=[OBJ_ID],
            min_num_viewpoints=args.viewpoints,
            num_inplane_rotations=args.rotations,
            depth_range=(600.0, 1200.0),
            ssaa_factor=4.0,
            crop_size=(420, 420),
            bop_root=bop_root,
            output_dir=os.path.join(out, "templates"),
            overwrite=True,
        )
    )
    times["gen_templates_s"] = round(time.perf_counter() - t0, 2)

    tpl_dir = os.path.join(out, "templates", "demo", "v1", str(OBJ_ID))
    with open(os.path.join(tpl_dir, "metadata.json")) as f:
        num_templates = len(json.load(f))

    t0 = time.perf_counter()
    gen_repre_mod.generate_repre_from_list(
        gen_repre_mod.GenRepreOpts(
            object_dataset="demo",
            object_lids=[OBJ_ID],
            extractor_name=(
                "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
            ),
            apply_pca=True,
            pca_components=256,
            cluster_num=2048,
            batch_size=args.batch_size,
            use_pallas_attention=True,
            use_fused_block=True,
            approx_gelu=True,
            templates_dir=os.path.join(out, "templates"),
            output_dir=os.path.join(out, "repre"),
            overwrite=True,
        )
    )
    times["gen_repre_s"] = round(time.perf_counter() - t0, 2)
    times["num_templates"] = num_templates
    times["templates_per_s_end_to_end"] = round(
        num_templates / (times["gen_templates_s"] + times["gen_repre_s"]), 2
    )

    # Driver-style verdict line (one JSON object; VERDICT r3 directive 5):
    # per-stage rates + vs_baseline against the measured, reference-favoring
    # offline replica (BASELINE.md §offline).
    reg_s = capture.stages.get("Feature registration")
    result = {
        "metric": "offline_builder_templates_per_sec",
        "value": times["templates_per_s_end_to_end"],
        "unit": "templates/sec",
        "render_templates_per_s": round(
            num_templates / times["gen_templates_s"], 2
        ),
        "registration_templates_per_s": (
            round(num_templates / reg_s, 2) if reg_s else None
        ),
        "repre_build_s_per_object": times["gen_repre_s"],
        "gen_templates_s_per_object": times["gen_templates_s"],
        "gen_repre_stage_s": {
            k: round(v, 2) for k, v in capture.stages.items()
        },
        # Anything not under a stage timer (host-side array assembly,
        # weight upload materialization, logging) — nonzero here means a
        # stage is missing a timer or the link degraded mid-run.
        "gen_repre_untimed_s": round(
            times["gen_repre_s"] - sum(capture.stages.values()), 2
        ),
        "num_templates": num_templates,
    }
    total_s = times["gen_templates_s"] + times["gen_repre_s"]
    if REF_GEN_TEMPLATES_S and REF_GEN_REPRE_S:
        ref_total = REF_GEN_TEMPLATES_S + REF_GEN_REPRE_S
        result["vs_baseline"] = round(ref_total / total_s, 2)
        result["vs_baseline_gen_templates"] = round(
            REF_GEN_TEMPLATES_S / times["gen_templates_s"], 2
        )
        result["vs_baseline_gen_repre"] = round(
            REF_GEN_REPRE_S / times["gen_repre_s"], 2
        )
        result["baseline_s_per_object"] = {
            "gen_templates": REF_GEN_TEMPLATES_S,
            "gen_repre": REF_GEN_REPRE_S,
            "method": "measured replica, reference-favoring "
                      "(BASELINE.md section offline)",
        }
        # Same-host raw ratio (no hardware grants; see the constant's note).
        ref_same_host = REF_SAME_HOST_GEN_TEMPLATES_S + REF_SAME_HOST_GEN_REPRE_S
        result["vs_reference_same_host"] = round(ref_same_host / total_s, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
