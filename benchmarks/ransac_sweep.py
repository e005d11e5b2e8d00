"""AR-gated RANSAC budget sweep on the cross-parity world.

The reference's 400 RANSAC iterations are cv2.solvePnPRansac's adaptive
budget cap, not a law (reference: utils/pnp_util.py:46-55, configs/infer/
lmo.json). Our solver adds LO-RANSAC refits of the running best hypothesis
(pose/pnp.lo_refine), which may make most of the 400 fixed hypotheses
redundant: each LO round re-estimates from the full inlier set, recovering
what extra random hypotheses would find.

Sweeps pnp_ransac_iter x pnp_lo_iters over the SAME synthetic world +
queries the cross-parity harness validates against (benchmarks/
cross_parity.py), scores each cell's AR against the independent replica
oracle (held at the full reference budget, 400 iters), and prints a
verdict: the cheapest cell whose AR stays within the 1-pt gate of BOTH the
replica and the current default cell.

Accuracy gate only — end-to-end crops/sec is measured separately by
bench.py at the adopted default (whole-bench numbers only, per the
docs/KERNELS.md lesson that stage-level wins routinely vanish end-to-end).
Runs on CPU (it is a determinism/accuracy harness, not a perf bench).
"""

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cross_parity import (  # noqa: E402
    CROP,
    ReferenceReplica,
    ar_recall,
    make_world,
    render_query,
)

RANSAC_ITERS = (100, 200, 400)
LO_ITERS = (1, 2)
DEFAULT_CELL = (400, 2)  # shipped default going into the sweep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crops", type=int, default=200)
    ap.add_argument("--templates", type=int, default=798)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from foundpose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.structs import PinholeCamera

    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    repre, obj_points, obj_feats, tpl_point_ids = make_world(
        rng, num_templates=args.templates
    )
    print(f"[sweep] world built in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    fmaps, masks, rs_gt, ts_gt = [], [], [], []
    for i in range(args.crops):
        fmap, mask, r_gt, t_gt = render_query(
            rng, obj_points, obj_feats, tpl_point_ids,
            target_tpl=i % args.templates, pose_seed=1000 + i,
        )
        fmaps.append(fmap)
        masks.append(mask)
        rs_gt.append(r_gt)
        ts_gt.append(t_gt)

    # Oracle: the independent numpy/sklearn/cv2 replica at the FULL
    # reference budget (the sweep must not move the yardstick).
    bank_feats = [
        np.asarray(obj_feats[tpl_point_ids[t]], np.float32)
        for t in range(args.templates)
    ]
    bank_verts = [
        np.asarray(obj_points[tpl_point_ids[t]], np.float32)
        for t in range(args.templates)
    ]
    replica = ReferenceReplica(
        bank_feats, bank_verts, np.asarray(repre.word_centroids),
        pnp_ransac_iter=400,
    )
    K = np.array([[600.0, 0, 209.5], [0, 600.0, 209.5], [0, 0, 1]], np.float32)
    t0 = time.perf_counter()
    rep_out = [replica.infer_one(fmaps[i], masks[i], K)
               for i in range(args.crops)]
    ar_rep, _ = ar_recall(
        [o.get("R", np.eye(3)) for o in rep_out],
        [o.get("t", np.zeros(3)) for o in rep_out],
        [o["success"] for o in rep_out], rs_gt, ts_gt,
    )
    print(f"[sweep] replica oracle AR={ar_rep:.3f} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (args.crops, 1)),
        c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (args.crops, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (args.crops, 1, 1)),
        width=CROP, height=CROP,
    )
    fmaps_j = jnp.asarray(np.stack(fmaps))
    masks_j = jnp.asarray(np.stack(masks))

    cells = {}
    for ri, lo in itertools.product(RANSAC_ITERS, LO_ITERS):
        t0 = time.perf_counter()
        # The shipped fast path (bf16 + approx_topk), only the solve budget
        # varies.
        out = inference.pose_from_features(
            fmaps_j, masks_j, cameras, repre, jax.random.PRNGKey(0),
            inference.InferenceConfig(
                compute_dtype=jnp.bfloat16, approx_topk=True,
                pnp_ransac_iter=ri, pnp_lo_iters=lo,
            ),
        )
        ar, _ = ar_recall(
            np.asarray(out.R_m2c), np.asarray(out.t_m2c),
            np.asarray(out.success), rs_gt, ts_gt,
        )
        cells[(ri, lo)] = ar
        print(f"[sweep] ransac={ri} lo={lo}: AR={ar:.3f} "
              f"(delta vs replica {abs(ar-ar_rep):.3f}) "
              f"[{time.perf_counter()-t0:.1f}s]", file=sys.stderr)

    ar_default = cells[DEFAULT_CELL]
    admissible = [
        (ri, lo) for (ri, lo), ar in cells.items()
        if abs(ar - ar_rep) <= 0.01 + 1e-9 and ar >= ar_default - 0.01 - 1e-9
    ]
    # Cheapest = fewest hypotheses, then fewest LO rounds.
    admissible.sort(key=lambda c: (c[0], c[1]))
    pick = admissible[0] if admissible else DEFAULT_CELL

    print(json.dumps({
        "metric": "ransac_budget_sweep",
        "n_crops": args.crops,
        "ar_replica_oracle": round(ar_rep, 4),
        "cells": {f"ransac{ri}_lo{lo}": round(ar, 4)
                  for (ri, lo), ar in cells.items()},
        "gate": "AR within 1 pt of replica AND of the 400x2 default",
        "admissible": [f"ransac{ri}_lo{lo}" for ri, lo in admissible],
        "picked": {"pnp_ransac_iter": pick[0], "pnp_lo_iters": pick[1]},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
