"""PoseEngine: persistent in-process serving API.

A deployment-facing layer with no reference counterpart (the reference only
ships batch CLIs): the engine holds the ViT parameters and any number of
object representations resident in HBM, compiles one fixed-shape step per
(object, batch-size) pair, and serves `estimate()` calls — full images with
detection boxes/masks in, world-frame poses out. Batches are padded to the
configured size so every call after the first reuses the compiled program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from foundpose_tpu import cameras as cam_mod
from foundpose_tpu.models import dinov2, weights as weights_mod
from foundpose_tpu.pipeline import inference
from foundpose_tpu.repre import ObjectRepre
from foundpose_tpu.structs import PinholeCamera


class PoseEngine:
    def __init__(
        self,
        extractor_name: str = (
            "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
        ),
        weights_path: Optional[str] = None,
        config: Optional[inference.InferenceConfig] = None,
        batch_size: int = 16,
        seed: int = 0,
    ):
        import jax

        self.vit_cfg = dinov2.parse_model_name(extractor_name)
        if weights_path:
            self.vit_params = weights_mod.load_checkpoint(weights_path, self.vit_cfg)
        else:
            self.vit_params = dinov2.init_params(jax.random.PRNGKey(seed), self.vit_cfg)
        self.config = config or inference.InferenceConfig()
        self.batch_size = batch_size
        self._repres: Dict[int, ObjectRepre] = {}
        self._step = inference.jit_pose_from_crops(self.vit_cfg, self.config)
        # Jitted batched crop warp, compiled once per source image shape.
        from foundpose_tpu.pipeline.infer import make_warp_fn

        self._warp_batch = make_warp_fn(self.config.crop_size)
        self._multi_cache = None
        self._counter = 0

    def register_object(self, obj_id: int, repre: ObjectRepre) -> None:
        self._repres[obj_id] = repre
        self._multi_cache = None  # invalidate the stacked multi-object step

    @property
    def object_ids(self) -> List[int]:
        return sorted(self._repres)

    def estimate(
        self,
        obj_id: int,
        image: np.ndarray,
        boxes_xyxy: Sequence[np.ndarray],
        K: np.ndarray,
        masks: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> List[Dict[str, Any]]:
        """Estimates poses for all detections of `obj_id` in one image.

        Args:
            image: [H, W, 3] uint8 or float RGB.
            boxes_xyxy: detection boxes in image coordinates.
            K: 3x3 intrinsics of the image.
            masks: optional per-detection modal masks [H, W].
        Returns:
            One dict per detection: {"success", "R_m2c", "t_m2c", "quality",
            "score", "best_template", "crop_camera"} — camera-frame poses
            (image camera == world here).
        """
        import jax
        import jax.numpy as jnp

        repre = self._repres[obj_id]
        h, w = image.shape[:2]
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        orig_cam = PinholeCamera.from_intrinsic_matrix(K, width=w, height=h)

        n = len(boxes_xyxy)
        crop_cams = []
        for box in boxes_xyxy:
            crop_box = cam_mod.calc_crop_box(jnp.asarray(box, dtype=jnp.float32))
            crop_cams.append(
                cam_mod.construct_crop_camera(
                    box=crop_box,
                    camera_c2w=orig_cam,
                    viewport_size=self.config.crop_size,
                    viewport_rel_pad=0.2,
                )
            )
        # One jitted batched warp for all detections of the image.
        dst_cams = jax.tree.map(lambda *x: jnp.stack(x), *crop_cams)
        src_cams = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), orig_cam
        )
        images = jnp.broadcast_to(jnp.asarray(img), (n,) + img.shape)
        mask_stack = jnp.asarray(
            np.stack(
                [
                    (masks[i] if masks is not None and masks[i] is not None
                     else np.ones((h, w))).astype(np.float32)
                    for i in range(n)
                ]
            )
        )
        crops, crop_masks = self._warp_batch(images, mask_stack, src_cams, dst_cams)

        # Pad to the engine batch size (fixed compiled shape) and dispatch ALL
        # chunks before fetching any: jax dispatch is asynchronous, so device
        # compute of chunk k+1 overlaps the host-side unpacking of chunk k.
        bs = self.batch_size
        dispatched = []
        for s in range(0, n, bs):
            chunk = list(range(s, min(s + bs, n)))
            pad = bs - len(chunk)
            idx = jnp.asarray(chunk + [chunk[-1]] * pad)
            batch_crops = crops[idx]
            batch_masks = crop_masks[idx]
            batch_cams = jax.tree.map(
                lambda *x: jnp.stack(x), *[crop_cams[i] for i in chunk]
            )
            batch_cams = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x] + [x[-1:]] * pad, axis=0
                ) if pad else x,
                batch_cams,
            )
            self._counter += 1
            out = self._step(
                self.vit_params, batch_crops, batch_masks, batch_cams, repre,
                jax.random.PRNGKey(self._counter),
            )
            dispatched.append((chunk, out))

        out_all: List[Dict[str, Any]] = []
        for chunk, out in dispatched:
            out_np = jax.tree.map(np.asarray, out)
            for j, i in enumerate(chunk):
                out_all.append(
                    {
                        "success": bool(out_np.success[j]),
                        "R_m2c": out_np.R_m2w[j],  # world == image camera
                        "t_m2c": out_np.t_m2w[j],
                        "quality": float(out_np.quality[j]),
                        "score": float(out_np.score[j]),
                        "best_template": int(out_np.best_template[j]),
                        "crop_camera": crop_cams[i],
                    }
                )
        return out_all

    def _multi_step(self):
        """Lazily builds (obj_id order, stacked repre, jitted mixed step)."""
        if self._multi_cache is None:
            from foundpose_tpu.pipeline.multi_object import (
                jit_pose_from_crops_multi,
            )
            from foundpose_tpu.repre import stack_repres

            order = self.object_ids
            multi = stack_repres([self._repres[o] for o in order])
            step = jit_pose_from_crops_multi(self.vit_cfg, self.config)
            self._multi_cache = (order, multi, step)
        return self._multi_cache

    def estimate_mixed(
        self,
        image: np.ndarray,
        detections: Sequence[Dict[str, Any]],
        K: np.ndarray,
    ) -> List[Dict[str, Any]]:
        """Estimates poses for detections of DIFFERENT objects in one image,
        sharing batches through the stacked multi-object step
        (pipeline/multi_object.py) — one compiled program serves every
        registered object.

        Args:
            detections: dicts with "obj_id", "box_xyxy", optional "mask".
        Returns:
            One dict per detection (same fields as estimate()).
        """
        import jax
        import jax.numpy as jnp

        order, multi, step = self._multi_step()
        obj_to_idx = {o: i for i, o in enumerate(order)}
        h, w = image.shape[:2]
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        orig_cam = PinholeCamera.from_intrinsic_matrix(K, width=w, height=h)

        n = len(detections)
        crop_cams = []
        for det in detections:
            crop_box = cam_mod.calc_crop_box(
                jnp.asarray(det["box_xyxy"], dtype=jnp.float32)
            )
            crop_cams.append(
                cam_mod.construct_crop_camera(
                    box=crop_box, camera_c2w=orig_cam,
                    viewport_size=self.config.crop_size, viewport_rel_pad=0.2,
                )
            )
        dst_cams = jax.tree.map(lambda *x: jnp.stack(x), *crop_cams)
        src_cams = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), orig_cam
        )
        images = jnp.broadcast_to(jnp.asarray(img), (n,) + img.shape)
        mask_stack = jnp.asarray(
            np.stack(
                [
                    np.asarray(
                        det.get("mask")
                        if det.get("mask") is not None
                        else np.ones((h, w))
                    ).astype(np.float32)
                    for det in detections
                ]
            )
        )
        crops, crop_masks = self._warp_batch(images, mask_stack, src_cams, dst_cams)

        bs = self.batch_size
        dispatched = []
        for s in range(0, n, bs):
            chunk = list(range(s, min(s + bs, n)))
            pad = bs - len(chunk)
            idx = jnp.asarray(chunk + [chunk[-1]] * pad)
            batch_cams = jax.tree.map(
                lambda *x: jnp.stack(x), *[crop_cams[i] for i in chunk]
            )
            batch_cams = jax.tree.map(
                lambda x: jnp.concatenate([x] + [x[-1:]] * pad, axis=0)
                if pad else x,
                batch_cams,
            )
            obj_idx = jnp.asarray(
                [obj_to_idx[detections[i]["obj_id"]] for i in chunk]
                + [0] * pad,
                dtype=jnp.int32,
            )
            self._counter += 1
            out = step(
                self.vit_params, crops[idx], crop_masks[idx], batch_cams,
                obj_idx, multi, jax.random.PRNGKey(self._counter),
            )
            dispatched.append((chunk, out))

        out_all: List[Dict[str, Any]] = []
        for chunk, out in dispatched:
            out_np = jax.tree.map(np.asarray, out)
            for j, i in enumerate(chunk):
                out_all.append(
                    {
                        "success": bool(out_np.success[j]),
                        "R_m2c": out_np.R_m2w[j],
                        "t_m2c": out_np.t_m2w[j],
                        "quality": float(out_np.quality[j]),
                        "score": float(out_np.score[j]),
                        "best_template": int(out_np.best_template[j]),
                        "crop_camera": crop_cams[i],
                    }
                )
        return out_all
