"""BOP19 Average Recall evaluation (MSSD / MSPD / VSD).

In-house evaluator for the reference's north-star metric
(reference README.md:173-181 reports BOP AR computed with the external
bop_toolkit evaluation server/scripts; neither is vendored here). Implements
the BOP19 protocol:

- Per (scene, image, object): estimates sorted by score; the top-n (n = #GT
  instances) are greedily matched to GT instances by lowest error.
- MSSD recall over thresholds {0.05..0.5} x object diameter.
- MSPD recall over thresholds {5..50} x r px, r = image_width / 640.
- VSD (optional, needs scene depth + the object mesh): visible surface
  discrepancy with tau in {0.05..0.5} x diameter and delta = 15 mm, rendered
  with the native rasterizer.
- AR = mean over thresholds; BOP AR = mean(AR_VSD, AR_MSSD, AR_MSPD).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Estimate:
    scene_id: int
    im_id: int
    obj_id: int
    score: float
    R: np.ndarray  # [3, 3] model -> camera
    t: np.ndarray  # [3]


@dataclasses.dataclass
class GroundTruth:
    scene_id: int
    im_id: int
    obj_id: int
    R: np.ndarray
    t: np.ndarray
    visib_fract: float = 1.0


def _mssd_np(r_est, t_est, r_gt, t_gt, pts, syms) -> float:
    pts_est = pts @ r_est.T + t_est
    best = np.inf
    for sr, st in syms:
        r_sym = r_gt @ sr
        t_sym = r_gt @ st + t_gt
        err = np.linalg.norm(pts @ r_sym.T + t_sym - pts_est, axis=1).max()
        best = min(best, err)
    return float(best)


def _mspd_np(r_est, t_est, r_gt, t_gt, k, pts, syms) -> float:
    def proj(r, t):
        cam = pts @ r.T + t
        uvw = cam @ k.T
        return uvw[:, :2] / uvw[:, 2:3]

    p_est = proj(r_est, t_est)
    best = np.inf
    for sr, st in syms:
        r_sym = r_gt @ sr
        t_sym = r_gt @ st + t_gt
        err = np.linalg.norm(proj(r_sym, t_sym) - p_est, axis=1).max()
        best = min(best, err)
    return float(best)


def _vsd_np(
    r_est, t_est, r_gt, t_gt, depth_test, k, renderer, obj_id, cam,
    diameter, taus, delta=15.0,
) -> List[float]:
    """VSD errors (one per tau). Renders est/GT depth with the rasterizer."""
    from foundpose_tpu.renderer.base import RenderType

    def render_depth(r, t):
        t_m2w = np.eye(4)
        t_m2w[:3, :3] = r
        t_m2w[:3, 3] = t
        out = renderer.render_object_model(
            obj_id, cam, T_model_to_world=np.asarray(cam.T_world_from_eye) @ t_m2w
        )
        return np.asarray(out[RenderType.DEPTH])

    d_est = render_depth(r_est, t_est)
    d_gt = render_depth(r_gt, t_gt)

    # Visibility masks (bop_toolkit: object visible where rendered depth is
    # within delta of the test depth, or test depth missing).
    def visib(d_render):
        present = d_render > 0
        test_ok = depth_test > 0
        return present & (~test_ok | (d_render < depth_test + delta))

    v_est = visib(d_est)
    v_gt = visib(d_gt)
    union = v_est | v_gt
    inter = v_est & v_gt
    n_union = union.sum()
    if n_union == 0:
        return [1.0] * len(taus)
    dist = np.abs(d_est - d_gt)
    errs = []
    for tau in taus:
        ok = inter & (dist < tau)
        errs.append(1.0 - ok.sum() / n_union)
    return errs


def evaluate_ar(
    estimates: Sequence[Estimate],
    gts: Sequence[GroundTruth],
    model_points: Dict[int, np.ndarray],
    diameters: Dict[int, float],
    symmetries: Dict[int, List[Tuple[np.ndarray, np.ndarray]]],
    intrinsics: Dict[Tuple[int, int], np.ndarray],
    image_width: int = 640,
    min_visib: float = 0.1,
    depth_images: Optional[Dict[Tuple[int, int], np.ndarray]] = None,
    renderer=None,
    cameras: Optional[Dict[Tuple[int, int], object]] = None,
) -> Dict[str, float]:
    """Returns {"ar_mssd", "ar_mspd", ["ar_vsd",] "bop_ar"}.

    VSD is evaluated only when depth_images + renderer + cameras are given.
    """
    mssd_taus = np.arange(0.05, 0.51, 0.05)
    mspd_taus = np.arange(5, 51, 5) * (image_width / 640.0)
    vsd_taus = np.arange(0.05, 0.51, 0.05)

    by_key_est: Dict[Tuple[int, int, int], List[Estimate]] = {}
    for e in estimates:
        by_key_est.setdefault((e.scene_id, e.im_id, e.obj_id), []).append(e)
    by_key_gt: Dict[Tuple[int, int, int], List[GroundTruth]] = {}
    for g in gts:
        if g.visib_fract < min_visib:
            continue
        by_key_gt.setdefault((g.scene_id, g.im_id, g.obj_id), []).append(g)

    mssd_hits = np.zeros(len(mssd_taus))
    mspd_hits = np.zeros(len(mspd_taus))
    vsd_hits = np.zeros(len(vsd_taus))
    total = 0
    do_vsd = depth_images is not None and renderer is not None and cameras is not None

    for key, gt_list in by_key_gt.items():
        scene_id, im_id, obj_id = key
        total += len(gt_list)
        ests = sorted(by_key_est.get(key, []), key=lambda e: -e.score)[: len(gt_list)]
        if not ests:
            continue
        pts = model_points[obj_id]
        dia = diameters[obj_id]
        syms = symmetries.get(obj_id, [(np.eye(3), np.zeros(3))])
        k = intrinsics[(scene_id, im_id)]

        # Greedy matching: each estimate claims its lowest-MSSD unmatched GT.
        claimed = set()
        for e in ests:
            errs = []
            for gi, g in enumerate(gt_list):
                if gi in claimed:
                    errs.append((np.inf, np.inf, gi))
                    continue
                em = _mssd_np(e.R, e.t, g.R, g.t, pts, syms)
                ep = _mspd_np(e.R, e.t, g.R, g.t, k, pts, syms)
                errs.append((em, ep, gi))
            em, ep, gi = min(errs, key=lambda x: x[0])
            if not np.isfinite(em):
                continue
            claimed.add(gi)
            mssd_hits += em < mssd_taus * dia
            mspd_hits += ep < mspd_taus
            if do_vsd:
                g = gt_list[gi]
                verrs = _vsd_np(
                    e.R, e.t, g.R, g.t, depth_images[(scene_id, im_id)], k,
                    renderer, obj_id, cameras[(scene_id, im_id)], dia,
                    taus=vsd_taus * dia,
                )
                vsd_hits += np.asarray(verrs) < 0.3

    if total == 0:
        return {"ar_mssd": 0.0, "ar_mspd": 0.0, "bop_ar": 0.0}
    out = {
        "ar_mssd": float(mssd_hits.mean() / total),
        "ar_mspd": float(mspd_hits.mean() / total),
    }
    if do_vsd:
        out["ar_vsd"] = float(vsd_hits.mean() / total)
        out["bop_ar"] = float(np.mean([out["ar_vsd"], out["ar_mssd"], out["ar_mspd"]]))
    else:
        out["bop_ar"] = float(np.mean([out["ar_mssd"], out["ar_mspd"]]))
    return out


def load_estimates_from_csv(path: str) -> List[Estimate]:
    """Reads a BOP19 submission CSV (as written by write_bop_submission)."""
    out = []
    with open(path) as f:
        header = f.readline()
        assert header.startswith("scene_id")
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 7:
                continue
            r = np.asarray([float(x) for x in parts[4].split()]).reshape(3, 3)
            t = np.asarray([float(x) for x in parts[5].split()])
            out.append(
                Estimate(
                    scene_id=int(parts[0]), im_id=int(parts[1]),
                    obj_id=int(parts[2]), score=float(parts[3]), R=r, t=t,
                )
            )
    return out
