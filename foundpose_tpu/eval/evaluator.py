"""Pose-estimate accumulation, scoring, and BOP-format result export.

Host-side re-design of the reference `EvaluatorPose`
(reference: utils/eval_util.py:26-590). Error kernels (MSSD/MSPD, inlier
ratios) run batched on-device via `eval/errors.py`; this module accumulates
per-estimate records and writes `estimated-poses.json` files with the same
field names as the reference (so `prepare_bop_submission` consumers are
interchangeable) plus the BOP19 submission CSV
(reference: scripts/prepare_bop_submission.py:64-99).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from foundpose_tpu.eval import errors as err_mod
from foundpose_tpu.structs import PinholeCamera


def _tolist(x):
    return np.asarray(x).tolist()


@dataclasses.dataclass
class PoseRecord:
    scene_id: int
    im_id: int
    obj_id: int
    inst_id: int
    hypothesis_id: int
    score: float
    R_m2c_orig: np.ndarray  # model -> original camera
    t_m2c_orig: np.ndarray
    time: Dict[str, float]
    mssd: Optional[float] = None
    mspd: Optional[float] = None
    rotation_err_deg: Optional[float] = None
    translation_err: Optional[float] = None
    inliers_est: Optional[int] = None
    inliers_gt: Optional[int] = None


class EvaluatorPose:
    """Accumulates pose estimates for one object across a test split."""

    def __init__(self, obj_ids: Sequence[int]):
        self.obj_ids = list(obj_ids)
        self.records: List[PoseRecord] = []
        self.detection_times: Dict[Tuple[int, int], float] = {}

    # -- updates -------------------------------------------------------------

    def update(
        self,
        scene_id: int,
        im_id: int,
        inst_id: int,
        hypothesis_id: int,
        obj_id: int,
        R_m2w: np.ndarray,
        t_m2w: np.ndarray,
        orig_camera_c2w: PinholeCamera,
        score: float,
        time_per_inst: Dict[str, float],
        R_gt_m2c: Optional[np.ndarray] = None,
        t_gt_m2c: Optional[np.ndarray] = None,
        model_pts: Optional[np.ndarray] = None,
        sym_r: Optional[np.ndarray] = None,
        sym_t: Optional[np.ndarray] = None,
        K: Optional[np.ndarray] = None,
    ) -> PoseRecord:
        """Registers one estimate; computes GT errors when GT is provided.

        The world-frame pose is re-expressed in the original camera (the frame
        BOP expects), reference: utils/eval_util.py:247-255.
        """
        t_w2oc = np.linalg.inv(np.asarray(orig_camera_c2w.T_world_from_eye))
        m2w = np.eye(4)
        m2w[:3, :3] = np.asarray(R_m2w)
        m2w[:3, 3] = np.asarray(t_m2w).flatten()
        m2oc = t_w2oc @ m2w
        r_est = m2oc[:3, :3]
        t_est = m2oc[:3, 3]

        rec = PoseRecord(
            scene_id=scene_id,
            im_id=im_id,
            obj_id=obj_id,
            inst_id=inst_id,
            hypothesis_id=hypothesis_id,
            score=float(score),
            R_m2c_orig=r_est,
            t_m2c_orig=t_est,
            time=dict(time_per_inst),
        )
        if R_gt_m2c is not None and model_pts is not None:
            sr = sym_r if sym_r is not None else np.eye(3)[None]
            st = sym_t if sym_t is not None else np.zeros((1, 3))
            rec.mssd = float(
                err_mod.mssd(
                    jnp.asarray(r_est, dtype=jnp.float32),
                    jnp.asarray(t_est, dtype=jnp.float32),
                    jnp.asarray(R_gt_m2c, dtype=jnp.float32),
                    jnp.asarray(np.asarray(t_gt_m2c).flatten(), dtype=jnp.float32),
                    jnp.asarray(model_pts, dtype=jnp.float32),
                    jnp.asarray(sr, dtype=jnp.float32),
                    jnp.asarray(st, dtype=jnp.float32),
                )[0]
            )
            if K is not None:
                rec.mspd = float(
                    err_mod.mspd(
                        jnp.asarray(r_est, dtype=jnp.float32),
                        jnp.asarray(t_est, dtype=jnp.float32),
                        jnp.asarray(R_gt_m2c, dtype=jnp.float32),
                        jnp.asarray(np.asarray(t_gt_m2c).flatten(), dtype=jnp.float32),
                        jnp.asarray(K, dtype=jnp.float32),
                        jnp.asarray(model_pts, dtype=jnp.float32),
                        jnp.asarray(sr, dtype=jnp.float32),
                        jnp.asarray(st, dtype=jnp.float32),
                    )[0]
                )
            rec.rotation_err_deg = float(
                err_mod.rotation_error_deg(
                    jnp.asarray(r_est, dtype=jnp.float32),
                    jnp.asarray(R_gt_m2c, dtype=jnp.float32),
                )
            )
            rec.translation_err = float(
                np.linalg.norm(t_est - np.asarray(t_gt_m2c).flatten())
            )
        self.records.append(rec)
        return rec

    # -- export ---------------------------------------------------------------

    def save_results_json(self, path: str) -> None:
        """Writes `estimated-poses.json` with reference-compatible fields
        (reference: utils/eval_util.py:302-355)."""
        out = []
        for rec in self.records:
            cnos_time = self.detection_times.get((rec.scene_id, rec.im_id), 0.0)
            item = {
                "scene_id": str(rec.scene_id),
                "img_id": str(rec.im_id),
                "obj_id": str(rec.obj_id),
                "inst_id": str(rec.inst_id),
                "hypothesis_id": str(rec.hypothesis_id),
                "score": str(rec.score),
                "R": _tolist(rec.R_m2c_orig),
                "t": _tolist(rec.t_m2c_orig.reshape(3, 1)),
                "time": rec.time,
                "cnos_time": cnos_time,
            }
            if rec.mssd is not None:
                item["mssd"] = rec.mssd
            if rec.mspd is not None:
                item["mspd"] = rec.mspd
            out.append(item)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f)

    def summary(self) -> Dict[str, float]:
        """Aggregate metric table (reference TSV tables: eval_util.py:400-516)."""
        recs = self.records
        out: Dict[str, float] = {"num_estimates": float(len(recs))}
        for field in ["mssd", "mspd", "rotation_err_deg", "translation_err", "score"]:
            vals = [getattr(r, field) for r in recs if getattr(r, field) is not None]
            if vals:
                out[f"{field}_mean"] = float(np.mean(vals))
                out[f"{field}_median"] = float(np.median(vals))
        return out

    def save_metrics_tsv(self, path: str) -> None:
        """Writes the per-object metric table as TSV
        (reference: utils/eval_util.py:400-516 tabulate tables)."""
        from tabulate import tabulate

        s = self.summary()
        rows = [[k, f"{v:.4f}"] for k, v in sorted(s.items())]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(tabulate(rows, headers=["metric", "value"], tablefmt="tsv"))


def write_bop_submission(
    output_path: str,
    per_object_results: Dict[int, List[Dict[str, Any]]],
    detection_times: Optional[Dict[Tuple[int, int], float]] = None,
) -> None:
    """Writes the BOP19 CSV `scene_id,im_id,obj_id,score,R,t,time`.

    Each object's entries come from its `estimated-poses.json` records. Total
    per-image time = pipeline stage times + detection time, matching the
    reference flattening (reference: scripts/prepare_bop_submission.py:33-99).
    """
    detection_times = detection_times or {}

    # Accumulate total runtime per image across all objects.
    run_time: Dict[Tuple[int, int], float] = {}
    for recs in per_object_results.values():
        for r in recs:
            key = (int(r["scene_id"]), int(r["img_id"]))
            t = sum(float(v) for v in r.get("time", {}).values())
            run_time[key] = run_time.get(key, 0.0) + t
    for key, cnos_t in detection_times.items():
        if key in run_time:
            run_time[key] += float(cnos_t)

    lines = ["scene_id,im_id,obj_id,score,R,t,time"]
    for obj_id in sorted(per_object_results):
        for r in per_object_results[obj_id]:
            key = (int(r["scene_id"]), int(r["img_id"]))
            rr = " ".join(map(str, np.asarray(r["R"], dtype=float).flatten().tolist()))
            tt = " ".join(map(str, np.asarray(r["t"], dtype=float).flatten().tolist()))
            lines.append(
                f'{r["scene_id"]},{r["img_id"]},{r["obj_id"]},{r["score"]},'
                f"{rr},{tt},{run_time.get(key, 0.0)}"
            )
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "wb") as f:
        f.write("\n".join(lines).encode("utf-8"))
