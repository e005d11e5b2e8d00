"""PoseEngine: persistent in-process serving API.

A deployment-facing layer with no reference counterpart (the reference only
ships batch CLIs): the engine holds the ViT parameters and any number of
object representations resident in HBM, compiles one fixed-shape step per
(object, batch-size) pair, and serves `estimate()` calls — full images with
detection boxes/masks in, world-frame poses out. Batches are padded to the
configured size so every call after the first reuses the compiled program;
chunks are all dispatched before any result is fetched, so device compute
overlaps host-side unpacking (jax dispatch is asynchronous).
"""

from __future__ import annotations

import collections
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from foundpose_tpu import cameras as cam_mod
from foundpose_tpu.models import dinov2, weights as weights_mod
from foundpose_tpu.pipeline import inference
from foundpose_tpu.repre import ObjectRepre
from foundpose_tpu.structs import PinholeCamera


def _make_single_image_warp(crop_size: Tuple[int, int]):
    """Jitted warp of ONE image into many crop cameras (single-sourced in
    ops/warp.make_single_image_warp; the infer CLI uses the same factory)."""
    from foundpose_tpu.ops.warp import make_single_image_warp

    return make_single_image_warp(crop_size)


# Bounded: jitted programs (and the executables they hold per input shape)
# are only released when their cache entry is evicted — the same HBM-leak
# reasoning as PoseEngine.max_cached_mesh_steps. 16 covers any realistic
# number of live (extractor, config, crop_size) serving combinations.
@functools.lru_cache(maxsize=16)
def _jit_fused_serve(vit_cfg, config, crop_size, no_masks, _interpret_token):
    """ONE jitted program for the whole serving call: full image in ->
    packed poses out (crop warp -> ViT -> retrieval -> PnP -> output pack).

    The chunked path dispatches ~5 separate device programs per call (warp,
    crop gather, pose step, output pack, PRNG key build) plus per-leaf
    uploads; each dispatch is a host round trip — ~31 ms over an RPC tunnel
    (benchmarks/latency.py), and nonzero even on PCIe. Fusing them collapses
    a batch<=batch_size `estimate()` to one dispatch + one fetch. The fused
    program recompiles per image resolution (serving cameras are fixed-res
    in practice); results are bit-identical to the chunked path, which
    remains for n > batch_size and mesh execution (tests/test_engine.py).

    With `no_masks` (every detection maskless — the common serving call),
    the all-ones mask stack is built ON DEVICE instead of uploaded: the
    host-built stack is batch_size full-resolution f32 images (~20 MB at
    16 x 480 x 640) shipped per call for purely constant content.
    """
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.ops.warp import make_single_image_warp

    warp = make_single_image_warp(crop_size)

    @jax.jit
    def fused(params, image, masks, src_cam, dst_cams, repre, counter):
        if no_masks:  # masks arrives as a placeholder scalar
            b = dst_cams.f.shape[0]
            masks = jnp.ones((b,) + image.shape[:2], jnp.float32)
        crops, crop_masks = warp(image, masks, src_cam, dst_cams)
        key = jax.random.PRNGKey(counter)
        out = inference.pose_from_crops(
            params, vit_cfg, crops, crop_masks, dst_cams, repre, key, config
        )
        return PoseEngine._pack_outputs(out)

    return fused


class PoseEngine:
    # Class defaults so engines assembled field-by-field (tests, embedders)
    # predate the mesh feature gracefully: no mesh unless one is configured.
    _mesh = None
    _mesh_params = None
    _mesh_steps = None
    # Bound on cached per-object sharded steps: each one pins its padded,
    # bank-sharded repre in device memory, so an unbounded cache leaks HBM
    # in serving processes that rotate through many objects.
    max_cached_mesh_steps = 8
    # Single-dispatch serving: estimate() calls with n <= batch_size on a
    # single chip run the fused image->poses program (_jit_fused_serve).
    # Off switches back to the chunked multi-dispatch path (used by the
    # equality test and as an escape hatch).
    fuse_single_call = True

    def __init__(
        self,
        extractor_name: str = (
            "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
        ),
        weights_path: Optional[str] = None,
        config: Optional[inference.InferenceConfig] = None,
        batch_size: int = 16,
        seed: int = 0,
        extractor_overrides: Optional[Dict[str, Any]] = None,
        mesh_shape: Optional[Tuple[int, ...]] = None,
    ):
        """extractor_overrides: DinoV2Config field overrides, e.g.
        {"use_pallas_attention": True, "use_fused_block": True,
        "approx_gelu": True} for the fastest TPU serving configuration.

        mesh_shape: serve from a multi-chip mesh — (data, bank) shards crops
        over `data` and every object's template bank over `bank`;
        (data, bank, model) additionally runs the ViT tensor-parallel
        (parallel/tp_vit.py). The engine batch size must be divisible by the
        data axis. Same semantics as the infer CLI's InferOpts.mesh_shape.
        """
        import dataclasses

        import jax

        self.vit_cfg = dinov2.parse_model_name(extractor_name)
        if extractor_overrides:
            self.vit_cfg = dataclasses.replace(self.vit_cfg, **extractor_overrides)
        if weights_path:
            self.vit_params = weights_mod.load_checkpoint(weights_path, self.vit_cfg)
        else:
            self.vit_params = dinov2.init_params(jax.random.PRNGKey(seed), self.vit_cfg)
        self.config = config or inference.InferenceConfig()
        self.batch_size = batch_size
        self._repres: Dict[int, ObjectRepre] = {}
        if mesh_shape:
            from foundpose_tpu.parallel import mesh as mesh_mod

            self._mesh = mesh_mod.make_mesh(shape=tuple(mesh_shape))
            data = self._mesh.shape[mesh_mod.DATA_AXIS]
            if batch_size % data:
                raise ValueError(
                    f"the data axis ({data}) of mesh_shape={mesh_shape} must "
                    f"divide batch_size={batch_size}"
                )
            self._step = None  # per-object mesh steps built lazily
        else:
            self._step = inference.jit_pose_from_crops(self.vit_cfg, self.config)
        self._warp_single = _make_single_image_warp(self.config.crop_size)
        self._multi_cache = None
        self._mesh_params = None
        self._mesh_steps = collections.OrderedDict()
        self._counter = 0

    def register_object(self, obj_id: int, repre: ObjectRepre) -> None:
        self._repres[obj_id] = repre
        self._multi_cache = None  # invalidate the stacked multi-object step
        if self._mesh_steps:
            self._mesh_steps.pop(obj_id, None)

    def unregister_object(self, obj_id: int) -> None:
        """Drops an object and releases its cached sharded step (and the
        device-resident repre baked into it)."""
        self._repres.pop(obj_id, None)
        self._multi_cache = None
        if self._mesh_steps:
            self._mesh_steps.pop(obj_id, None)

    def _get_mesh_params(self):
        """Mesh-placed ViT params, prepared once and shared by every
        per-object and mixed-object step (factored + model-split on a
        tensor-parallel mesh)."""
        from foundpose_tpu.parallel.sharded_inference import (
            prepare_mesh_vit_params,
        )

        if self._mesh_params is None:
            self._mesh_params = prepare_mesh_vit_params(
                self._mesh, self.vit_cfg, self.vit_params
            )
        return self._mesh_params

    def _mesh_object_step(self, obj_id: int):
        """Lazily builds + caches the sharded step for one object (the placed
        ViT params are shared across objects and prepared once). The cache is
        LRU-bounded by `max_cached_mesh_steps` because every cached step pins
        its bank-sharded repre in HBM."""
        from foundpose_tpu.parallel.sharded_inference import (
            make_object_mesh_step,
        )

        if self._mesh_steps is None:  # engines assembled field-by-field
            self._mesh_steps = collections.OrderedDict()
        steps = self._mesh_steps
        if obj_id in steps:
            steps.move_to_end(obj_id)
        else:
            steps[obj_id] = make_object_mesh_step(
                self._mesh, self.vit_cfg, self.config, self._repres[obj_id]
            )
            # Bound of < 1 behaves as 1: the step being returned must stay
            # cached (evicting it would KeyError below), so the smallest
            # meaningful cache holds exactly the current object.
            while len(steps) > max(1, self.max_cached_mesh_steps):
                steps.popitem(last=False)
        return steps[obj_id], self._get_mesh_params()

    @property
    def object_ids(self) -> List[int]:
        return sorted(self._repres)

    # -- shared prep / dispatch -----------------------------------------------

    def _prepare_cams(self, image, boxes_xyxy, K):
        """Host-side camera math for one image: normalized f32 image, the
        image camera, batched crop cameras (numpy leaves) + per-box views."""
        import jax
        import jax.numpy as jnp

        h, w = image.shape[:2]
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        # Crop-camera math runs BATCHED on the CPU backend: one vectorized
        # build_crop_cameras call whose op count is constant in the number
        # of boxes (the old per-box loop paid per-dispatch cost x N x ops;
        # parity test: tests/test_cameras.py).
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            orig_cam = PinholeCamera.from_intrinsic_matrix(
                K, width=w, height=h
            )
            batched_cams = jax.tree.map(
                np.asarray,
                cam_mod.build_crop_cameras(
                    orig_cam,
                    jnp.asarray(np.stack(boxes_xyxy), dtype=jnp.float32),
                    viewport_size=self.config.crop_size,
                    viewport_rel_pad=0.2,
                ),
            )
            orig_cam = jax.tree.map(np.asarray, orig_cam)
        crop_cams = [
            jax.tree.map(lambda a: a[i], batched_cams)
            for i in range(len(boxes_xyxy))
        ]
        return img, orig_cam, batched_cams, crop_cams

    @staticmethod
    def _mask_stack(masks, h, w):
        """Stacks per-detection masks (None -> all-ones). Bool/integer masks
        ship as uint8 (4x less host->device traffic than f32; the warp casts
        to f32 on device, so values are bit-identical); float masks keep f32
        so soft masks are not quantized."""
        arrs = [
            np.asarray(m) if m is not None else np.ones((h, w), np.uint8)
            for m in masks
        ]
        if all(a.dtype == np.bool_ or a.dtype.kind in "iu" for a in arrs):
            return np.stack([a.astype(np.uint8) for a in arrs])
        return np.stack([a.astype(np.float32) for a in arrs])

    def _prepare_crops(self, image, boxes_xyxy, masks, K):
        """Crop cameras + batched warped crops/masks for one image."""
        import jax
        import jax.numpy as jnp

        h, w = image.shape[:2]
        img, orig_cam, batched_cams, crop_cams = self._prepare_cams(
            image, boxes_xyxy, K
        )
        dst_cams = jax.tree.map(jnp.asarray, batched_cams)
        mask_stack = jnp.asarray(self._mask_stack(masks, h, w))
        crops, crop_masks = self._warp_single(
            jnp.asarray(img), mask_stack, orig_cam, dst_cams
        )
        return crop_cams, crops, crop_masks

    def _estimate_fused(self, repre, image, boxes_xyxy, masks, K):
        """Single-dispatch serving call: pads the detection set to the engine
        batch size ON THE HOST (cameras + masks; pads repeat the last
        detection, exactly what the chunked path's gather pads produce), then
        runs the ONE fused image->packed-poses program and fetches once.
        Bit-identical to the chunked path (tests/test_engine.py)."""
        import jax
        import jax.numpy as jnp

        h, w = image.shape[:2]
        n = len(boxes_xyxy)
        pad = self.batch_size - n
        img, orig_cam, batched_cams, crop_cams = self._prepare_cams(
            image, boxes_xyxy, K
        )
        padded_cams = jax.tree.map(
            lambda a: np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
            if pad
            else a,
            batched_cams,
        )
        no_masks = all(m is None for m in masks)
        if no_masks:
            # The all-ones stack is generated on device inside the fused
            # program — uploading batch_size full-res f32 ones (~20 MB at
            # 16 x 480 x 640) dominated small-n calls on slow links.
            mask_arg = np.float32(0.0)
        else:
            mask_arg = jnp.asarray(
                self._mask_stack(list(masks) + [masks[-1]] * pad, h, w)
            )

        fused = _jit_fused_serve(
            self.vit_cfg,
            self.config,
            tuple(self.config.crop_size),
            no_masks,
            inference.pallas_interpret_token(),
        )
        self._counter += 1
        packed = fused(
            self.vit_params,
            jnp.asarray(img),
            mask_arg,
            orig_cam,
            jax.tree.map(jnp.asarray, padded_cams),
            repre,
            np.uint32(self._counter),
        )
        p = np.asarray(packed)  # ONE transfer
        return [self._unpack_row(p, j, crop_cams[j]) for j in range(n)]

    # Packed-row layout (single source: _pack_outputs writes it,
    # _unpack_row reads it): [0]=success, [1]=quality, [2]=score,
    # [3]=best_template, [4:13]=R_m2w row-major, [13:16]=t_m2w.
    @staticmethod
    def _unpack_row(p, j, crop_cam) -> Dict[str, Any]:
        """Decodes row j of a fetched _pack_outputs array (world == image
        camera for engine calls, so R/t are reported as m2c)."""
        return {
            "success": bool(p[j, 0] > 0.5),
            "R_m2c": p[j, 4:13].reshape(3, 3),
            "t_m2c": p[j, 13:16],
            "quality": float(p[j, 1]),
            "score": float(p[j, 2]),
            "best_template": int(p[j, 3]),
            "crop_camera": crop_cam,
        }

    @staticmethod
    def _pack_outputs(out):
        """Packs the serving-consumed PoseOutputs fields into ONE [B, 16]
        f32 array (layout above _unpack_row) so unpacking costs a single
        device->host transfer. Per-leaf np.asarray fetches pay one transfer
        round trip EACH — ~16 x 31 ms per chunk on an RPC-attached chip
        (measured, benchmarks/latency.py); local PCIe deployments save the
        per-transfer syscalls too."""
        import jax.numpy as jnp

        b = out.R_m2w.shape[0]
        return jnp.concatenate(
            [
                out.success.astype(jnp.float32)[:, None],
                out.quality.astype(jnp.float32)[:, None],
                out.score.astype(jnp.float32)[:, None],
                out.best_template.astype(jnp.float32)[:, None],
                out.R_m2w.astype(jnp.float32).reshape(b, 9),
                out.t_m2w.astype(jnp.float32),
            ],
            axis=1,
        )

    def _dispatch_chunks(self, n, crop_cams, step_fn):
        """Pads index chunks to the engine batch size, dispatches every chunk
        (async), then fetches + unpacks. `step_fn(idx, chunk, batch_cams)`
        runs the compiled step for one padded chunk."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_packer", None) is None:
            self._packer = jax.jit(self._pack_outputs)

        bs = self.batch_size
        dispatched = []
        for s in range(0, n, bs):
            chunk = list(range(s, min(s + bs, n)))
            pad = bs - len(chunk)
            idx = jnp.asarray(chunk + [chunk[-1]] * pad)
            batch_cams = jax.tree.map(
                lambda *x: jnp.stack(x), *[crop_cams[i] for i in chunk]
            )
            if pad:
                batch_cams = jax.tree.map(
                    lambda x: jnp.concatenate([x] + [x[-1:]] * pad, axis=0),
                    batch_cams,
                )
            dispatched.append(
                (chunk, self._packer(step_fn(idx, chunk, batch_cams)))
            )

        out_all: List[Dict[str, Any]] = []
        for chunk, packed in dispatched:
            p = np.asarray(packed)  # ONE transfer per chunk
            out_all.extend(
                self._unpack_row(p, j, crop_cams[i])
                for j, i in enumerate(chunk)
            )
        return out_all

    # -- public API -------------------------------------------------------------

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

        if len(boxes_xyxy) == 0:
            return []
        repre = self._repres[obj_id]
        n = len(boxes_xyxy)
        mask_seq = masks if masks is not None else [None] * n
        if (
            self.fuse_single_call
            and self._mesh is None
            and n <= self.batch_size
        ):
            return self._estimate_fused(repre, image, boxes_xyxy, mask_seq, K)
        crop_cams, crops, crop_masks = self._prepare_crops(
            image, boxes_xyxy, mask_seq, K
        )

        if self._mesh is not None:
            from foundpose_tpu.parallel.mesh import crop_sharding

            mesh_step, mesh_params = self._mesh_object_step(obj_id)
            crop_shd = crop_sharding(self._mesh)

            def step_fn(idx, chunk, batch_cams):
                self._counter += 1
                return mesh_step(
                    mesh_params,
                    jax.device_put(crops[idx], crop_shd),
                    jax.device_put(crop_masks[idx], crop_shd),
                    batch_cams, jax.random.PRNGKey(self._counter),
                )
        else:
            def step_fn(idx, chunk, batch_cams):
                self._counter += 1
                return self._step(
                    self.vit_params, crops[idx], crop_masks[idx], batch_cams,
                    repre, jax.random.PRNGKey(self._counter),
                )

        return self._dispatch_chunks(n, crop_cams, step_fn)

    def _multi_step(self):
        """Lazily builds (obj_id order, stacked repre, jitted mixed step).
        On a mesh the stacked repre is bank-sharded and baked into the step
        (same wiring as the infer CLI's multi-object mesh path, single-sourced
        in sharded_inference.make_multi_object_mesh_step); a 3-axis mesh runs
        the ViT tensor-parallel on the mixed path too."""
        if self._multi_cache is None:
            from foundpose_tpu.repre import stack_repres

            order = self.object_ids
            multi = stack_repres([self._repres[o] for o in order])
            if self._mesh is not None:
                from foundpose_tpu.parallel.sharded_inference import (
                    make_multi_object_mesh_step,
                )

                step, multi = make_multi_object_mesh_step(
                    self._mesh, self.vit_cfg, self.config, multi
                )
            else:
                from foundpose_tpu.pipeline.multi_object import (
                    jit_pose_from_crops_multi,
                )

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

        if len(detections) == 0:
            return []
        order, multi, step = self._multi_step()
        obj_to_idx = {o: i for i, o in enumerate(order)}
        n = len(detections)
        crop_cams, crops, crop_masks = self._prepare_crops(
            image,
            [d["box_xyxy"] for d in detections],
            [d.get("mask") for d in detections],
            K,
        )

        if self._mesh is not None:
            from foundpose_tpu.parallel.mesh import crop_sharding

            crop_shd = crop_sharding(self._mesh)
            mesh_params = self._get_mesh_params()

            def step_fn(idx, chunk, batch_cams):
                pad = self.batch_size - len(chunk)
                obj_idx = jax.device_put(
                    np.asarray(
                        [obj_to_idx[detections[i]["obj_id"]] for i in chunk]
                        + [0] * pad,
                        dtype=np.int32,
                    ),
                    crop_shd,
                )
                self._counter += 1
                # The bank-sharded stacked repre is baked into the step; the
                # placed params are factored+model-split on a TP mesh and
                # identical to self.vit_params on a (data, bank) mesh.
                return step(
                    mesh_params,
                    jax.device_put(crops[idx], crop_shd),
                    jax.device_put(crop_masks[idx], crop_shd),
                    batch_cams, obj_idx, jax.random.PRNGKey(self._counter),
                )
        else:
            def step_fn(idx, chunk, batch_cams):
                pad = self.batch_size - len(chunk)
                obj_idx = jnp.asarray(
                    [obj_to_idx[detections[i]["obj_id"]] for i in chunk]
                    + [0] * pad,
                    dtype=jnp.int32,
                )
                self._counter += 1
                return step(
                    self.vit_params, crops[idx], crop_masks[idx], batch_cams,
                    obj_idx, multi, jax.random.PRNGKey(self._counter),
                )

        return self._dispatch_chunks(n, crop_cams, step_fn)
