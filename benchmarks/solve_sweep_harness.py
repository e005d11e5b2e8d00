"""Shared harness for AR-gated solve-budget sweeps on the cross-parity world.

One implementation of the world build, replica-oracle scoring, per-cell
pipeline run, and multi-seed admissibility gate — used by
lm_iters_sweep.py and select_iter_sweep.py (ransac_sweep.py predates this
and carries the round-4 2D grid). Keeping the harness single-sourced
means a gate or oracle fix cannot silently diverge between sweeps.
"""

import json
import sys
import time

import numpy as np

from cross_parity import CROP, ReferenceReplica, ar_recall, make_world, render_query


def run_sweep(
    metric: str,
    config_overrides_by_cell: dict,
    default_cell,
    crops: int = 200,
    seeds: int = 2,
    templates: int = 96,
    pick_rule=min,
):
    """Runs every cell on `seeds` worlds vs the full-budget replica oracle.

    `config_overrides_by_cell`: {cell_key: dict of InferenceConfig kwargs}.
    A cell is admissible when EVERY seed is within 1 pt of that seed's
    oracle AND of the default cell. Returns the report dict (also printed
    as one JSON line by the caller).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.structs import PinholeCamera
    from foundpose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    all_cells = {}
    oracle_ars = []
    for seed in range(seeds):
        rng = np.random.default_rng(seed)
        repre, obj_points, obj_feats, tpl_point_ids = make_world(
            rng, num_templates=templates, pts_per_template=200,
            feat_dim=64, num_words=512, n_points=2000,
        )
        fmaps, masks, rs_gt, ts_gt = [], [], [], []
        for i in range(crops):
            fmap, mask, r_gt, t_gt = render_query(
                rng, obj_points, obj_feats, tpl_point_ids,
                target_tpl=i % templates, pose_seed=3000 * (seed + 1) + i,
            )
            fmaps.append(fmap)
            masks.append(mask)
            rs_gt.append(r_gt)
            ts_gt.append(t_gt)

        bank_feats = [
            np.asarray(obj_feats[tpl_point_ids[t]], np.float32)
            for t in range(templates)
        ]
        bank_verts = [
            np.asarray(obj_points[tpl_point_ids[t]], np.float32)
            for t in range(templates)
        ]
        replica = ReferenceReplica(
            bank_feats, bank_verts, np.asarray(repre.word_centroids),
            top_n_templates=5, top_k_buddies=300, pnp_ransac_iter=400,
        )
        K = np.array(
            [[600.0, 0, 209.5], [0, 600.0, 209.5], [0, 0, 1]], np.float32
        )
        t0 = time.perf_counter()
        rep_out = [replica.infer_one(fmaps[i], masks[i], K)
                   for i in range(crops)]
        ar_rep, _ = ar_recall(
            [o.get("R", np.eye(3)) for o in rep_out],
            [o.get("t", np.zeros(3)) for o in rep_out],
            [o["success"] for o in rep_out], rs_gt, ts_gt,
        )
        oracle_ars.append(ar_rep)
        print(f"[sweep] seed {seed}: replica oracle AR={ar_rep:.3f} "
              f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)

        cameras = PinholeCamera(
            f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (crops, 1)),
            c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (crops, 1)),
            T_world_from_eye=jnp.tile(jnp.eye(4)[None], (crops, 1, 1)),
            width=CROP, height=CROP,
        )
        fmaps_j = jnp.asarray(np.stack(fmaps))
        masks_j = jnp.asarray(np.stack(masks))

        for cell, overrides in config_overrides_by_cell.items():
            out = inference.pose_from_features(
                fmaps_j, masks_j, cameras, repre, jax.random.PRNGKey(0),
                inference.InferenceConfig(
                    compute_dtype=jnp.bfloat16, approx_topk=True,
                    pnp_ransac_iter=200, pnp_lo_iters=2, **overrides,
                ),
            )
            ar, _ = ar_recall(
                np.asarray(out.R_m2c), np.asarray(out.t_m2c),
                np.asarray(out.success), rs_gt, ts_gt,
            )
            all_cells.setdefault(cell, []).append(ar)
            print(f"[sweep] seed {seed} {cell}: AR={ar:.3f} "
                  f"(delta vs replica {abs(ar - ar_rep):.3f})",
                  file=sys.stderr)

    default_ars = all_cells[default_cell]
    admissible = [
        cell for cell, ars in all_cells.items()
        if all(
            abs(a - o) <= 0.01 + 1e-9 and a >= d - 0.01 - 1e-9
            for a, o, d in zip(ars, oracle_ars, default_ars)
        )
    ]
    return {
        "metric": metric,
        "n_crops": crops,
        "seeds": seeds,
        "ar_replica_oracle": [round(a, 4) for a in oracle_ars],
        "cells": {str(cell): [round(a, 4) for a in ars]
                  for cell, ars in all_cells.items()},
        "gate": "all seeds: AR within 1 pt of replica AND of the default",
        "admissible": sorted(str(c) for c in admissible),
        "picked": str(pick_rule(admissible) if admissible else default_cell),
    }


def emit(report) -> int:
    print(json.dumps(report))
    return 0
