"""Inference result visualization: tile grids per estimate.

Re-design of the reference inference visualizer
(reference: utils/vis_util.py:127-687). Produces, per estimate: the input
crop with mask overlay, the estimated-pose contour overlay (rendered with the
native rasterizer), the best-matched template, confidence-colored
correspondence lines, and a PCA RGB rendering of the dense feature map.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from foundpose_tpu.vis import base as vb


def feature_map_pca_rgb(feature_map_hwc: np.ndarray) -> np.ndarray:
    """Dense feature map -> PCA-to-3 RGB visualization.

    (reference: utils/vis_util.py feature-map PCA vis)
    """
    h, w, d = feature_map_hwc.shape
    flat = feature_map_hwc.reshape(-1, d).astype(np.float64)
    flat = flat - flat.mean(axis=0)
    # Top-3 principal directions via SVD of the (small) covariance.
    cov = flat.T @ flat / max(len(flat) - 1, 1)
    _, vecs = np.linalg.eigh(cov)
    basis = vecs[:, -3:]
    proj = flat @ basis
    lo = np.percentile(proj, 2, axis=0)
    hi = np.percentile(proj, 98, axis=0)
    rgb = (proj - lo) / np.maximum(hi - lo, 1e-9)
    return vb.to_uint8(rgb.reshape(h, w, 3))


def vis_inference_results(
    crop_image: np.ndarray,
    crop_mask: np.ndarray,
    template_image: Optional[np.ndarray],
    corresp_2d: Optional[np.ndarray],
    corresp_template_2d: Optional[np.ndarray],
    corresp_scores: Optional[np.ndarray],
    est_mask: Optional[np.ndarray],
    feature_map: Optional[np.ndarray] = None,
    caption: str = "",
    max_corresp: int = 100,
) -> np.ndarray:
    """Builds the per-estimate tile grid. (reference: utils/vis_util.py:179-687)"""
    tiles: List[np.ndarray] = []
    base = vb.ensure_rgb(crop_image)
    tiles.append(vb.write_text(vb.overlay_mask(base, crop_mask), caption or "input"))
    if est_mask is not None:
        tiles.append(
            vb.write_text(vb.overlay_contour(base, est_mask), "estimated pose")
        )
    if (
        template_image is not None
        and corresp_2d is not None
        and corresp_template_2d is not None
    ):
        tiles.append(
            vb.write_text(
                vb.draw_matches(
                    base,
                    template_image,
                    corresp_2d,
                    corresp_template_2d,
                    corresp_scores,
                    max_draw=max_corresp,
                ),
                "matches",
            )
        )
    if feature_map is not None:
        import cv2

        fm = feature_map_pca_rgb(np.asarray(feature_map))
        fm = cv2.resize(fm, (base.shape[1], base.shape[0]),
                        interpolation=cv2.INTER_NEAREST)
        tiles.append(vb.write_text(fm, "features (PCA)"))
    return vb.build_grid(tiles, cols=2)


def render_pose_mask(
    renderer, obj_id: int, camera, R_m2c: np.ndarray, t_m2c: np.ndarray
) -> np.ndarray:
    """Renders the estimated pose's mask in the crop camera for overlays.

    (reference posed-mesh overlay: utils/render_vis_util.py:90-252)
    """
    from foundpose_tpu.renderer.base import RenderType

    t_m2w = np.eye(4)
    t_m2w[:3, :3] = np.asarray(R_m2c)
    t_m2w[:3, 3] = np.asarray(t_m2c).flatten()
    # The camera pytree may carry world extrinsics; rendering wants the object
    # placed via model->camera, so pass T_model_to_world = T_c2w @ m2c.
    t_c2w = np.asarray(camera.T_world_from_eye)
    out = renderer.render_object_model(
        obj_id, camera, T_model_to_world=t_c2w @ t_m2w
    )
    return np.asarray(out[RenderType.MASK])
