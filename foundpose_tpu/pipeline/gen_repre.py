"""Object-representation build: batched feature registration + PCA + BoW.

Re-design of the reference repre builder
(reference: scripts/gen_repre.py:67-408). Instead of one ViT forward + one
feature registration per template in a Python loop (reference :107-217), all
templates are processed in batched jitted chunks on the TPU: feature
extraction, mask erosion, grid sampling, depth lifting and model-frame
registration are a single XLA program per chunk, and PCA / k-means / tf-idf
run as on-device kernels (ops/pca.py, ops/kmeans.py, ops/tfidf.py) instead of
sklearn/faiss CPU round-trips.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from foundpose_tpu import geometry
from foundpose_tpu.data import bop
from foundpose_tpu.models import dinov2, weights as weights_mod
from foundpose_tpu.parallel import host_shard
from foundpose_tpu.ops import morphology, sampling
from foundpose_tpu.ops.kmeans import kmeans
from foundpose_tpu.ops.pca import fit_pca, pca_transform
from foundpose_tpu.ops.tfidf import TfidfConfig, calc_template_tfidf_descriptors
from foundpose_tpu.repre import ObjectRepre, make_repre, save_repre
from foundpose_tpu.structs import PinholeCamera
from foundpose_tpu.utils import config as config_util
from foundpose_tpu.utils.logging_util import Timer, get_logger, log_heading
from foundpose_tpu.utils.profiling import force_execution

logger = get_logger()


@dataclasses.dataclass(frozen=True)
class TemplateDescOpts:
    """Nested template-descriptor options, exactly the reference's block
    (reference: utils/repre_util.py:24-31; consumed at
    scripts/gen_repre.py:314-343). The flat tfidf_* fields on GenRepreOpts
    remain the native spelling; when `template_desc_opts` is present (as
    in the reference's shipped configs) it takes precedence."""

    desc_type: str = "tfidf"
    tfidf_knn_metric: str = "l2"
    tfidf_knn_k: int = 3
    tfidf_soft_assign: bool = False
    tfidf_soft_sigma_squared: float = 10.0


@dataclasses.dataclass(frozen=True)
class GenRepreOpts:
    """(reference: scripts/gen_repre.py:37-64)"""

    version: str = "v1"
    templates_version: str = "v1"
    object_dataset: str = "lmo"
    object_lids: Optional[List[int]] = None

    extractor_name: str = (
        "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
    )
    grid_cell_size: float = 14.0
    weights_path: Optional[str] = None  # DINOv2 checkpoint (.pth); None = random

    apply_pca: bool = True
    pca_components: int = 256
    pca_whiten: bool = False
    max_num_feats_for_pca: int = 100000

    cluster_features: bool = True
    cluster_num: int = 2048

    tfidf_knn_k: int = 3
    tfidf_knn_metric: str = "l2"
    tfidf_soft_assign: bool = False
    tfidf_soft_sigma_squared: float = 10.0
    # The reference configs nest the tf-idf options (see TemplateDescOpts);
    # when given, it overrides the flat fields above.
    template_desc_opts: Optional[TemplateDescOpts] = None

    batch_size: int = 16
    use_pallas_attention: bool = False
    # Fused transformer-block Pallas kernel (ops/vit_block.py; ViT-S 47 ->
    # 28 ms/batch-64 on v5e) and tanh GELU (deviation 5e-4; see DinoV2Config).
    use_fused_block: bool = False
    approx_gelu: bool = False
    overwrite: bool = False
    # Skip objects whose repre.npz already exists (stage-level resume).
    resume: bool = False
    # Multi-host sharding by OBJECT (per-object artifact dirs don't collide);
    # shard_count=0 auto-resolves from the JAX distributed runtime.
    shard_index: int = 0
    shard_count: int = 1
    # Injection seam: DinoV2Config field replacements applied after
    # parse_model_name (e.g. {"embed_dim": 32, "depth": 2} for tiny test
    # ViTs) — tests configure through opts instead of monkey-patching
    # dinov2.parse_model_name.
    vit_overrides: Optional[Dict[str, Any]] = None

    templates_dir: str = ""
    output_dir: str = ""


def _load_one_template(item: dict, templates_dir: Optional[str]):
    """Loads one template's rgb/depth/mask + camera from a metadata entry.

    Accepts both our metadata and the reference's released format
    (reference consumption: scripts/gen_repre.py:100-135). When the stored
    paths don't exist (released artifacts carry absolute paths from another
    machine), they are rebased onto `templates_dir` by their trailing
    `<subdir>/<filename>` components.
    """
    from foundpose_tpu.pipeline.gen_templates import camera_from_json, load_depth_png

    def resolve(path: str) -> str:
        if os.path.exists(path) or templates_dir is None:
            return path
        tail = os.path.join(*path.replace("\\", "/").split("/")[-2:])
        return os.path.join(templates_dir, tail)

    import cv2

    # cv2's PNG decoder measured ~1.7x PIL's for the rgb templates (2.0 vs
    # 3.4 ms each; x798 x2 stages it is seconds of 1-core wall per object).
    bgr = cv2.imread(resolve(item["rgb_image_path"]), cv2.IMREAD_COLOR)
    if bgr is not None:
        img = np.ascontiguousarray(bgr[:, :, ::-1])
    else:  # non-PNG/odd formats: PIL handles everything
        img = np.asarray(Image.open(resolve(item["rgb_image_path"])).convert("RGB"))
    # Raw 16-bit PNG units (0.1 mm); the registration program converts to
    # f32 mm on device. rgb/depth/mask all stay in their narrowest dtype on
    # the host (uint8/uint16/uint8): the registration stage is host->device
    # LINK bound on tunneled dev backends (~35 MB/s measured) and the f32
    # template set was 2.9 GB/object; narrow dtypes cut that to ~0.7 GB.
    depth = np.asarray(Image.open(resolve(item["depth_map_path"]))).astype(
        np.uint16
    )
    # Templates written by our gen_templates record that their mask PNG is
    # exactly (depth > 0) ("mask_is_depth_positive"); for those the mask is
    # neither decoded nor uploaded — the registration program derives it
    # from the depth it already has. Reference-made templates (no flag)
    # keep the explicit mask.
    if item.get("mask_is_depth_positive"):
        mask = None
    else:
        mask = (
            np.asarray(Image.open(resolve(item["binary_mask_path"]))) > 0
        ).astype(np.uint8)
    cam = camera_from_json(item["cameras"])
    return (
        img,
        depth,
        mask,
        np.asarray(cam.f, dtype=np.float32),
        np.asarray(cam.c, dtype=np.float32),
        np.asarray(cam.T_world_from_eye, dtype=np.float32),
        (cam.width, cam.height),
    )


def load_template_arrays(
    metadata: List[dict], templates_dir: Optional[str] = None
) -> Tuple[np.ndarray, ...]:
    """Loads ALL template rgb/depth/mask images + cameras from metadata.

    This is also exactly what the builder does: generate_repre decodes the
    full template set up front and then registers it in batched chunks (a
    streamed decode-register loop measured 1.5-2x slower on the 1-core bench
    host — see the comment in generate_repre). This standalone loader serves
    tools/tests that want the arrays without the registration pass.

    Decoding runs on a thread pool (cv2/PIL PNG decode releases the GIL),
    in metadata order, so the stage scales with cores on production hosts
    — the same grant BASELINE.md §offline gives the reference's loops and
    the basis of benchmarks/offline_projection.py's /cores adjustment.
    """
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(os.cpu_count() or 1) as pool:
        loaded = list(
            pool.map(lambda item: _load_one_template(item, templates_dir),
                     metadata)
        )
    images, depths, masks, cam_f, cam_c, cam_t, whs = zip(*loaded)
    if all(m is None for m in masks):
        # Every template's mask is (depth > 0): skip the [T, H, W] stack and
        # let the registration program derive it on device (see
        # _load_one_template). Mixed metadata (merged with reference-made
        # templates) materializes the missing ones so one code path remains.
        masks_arr = None
    else:
        masks_arr = np.stack(
            [
                (d > 0).astype(np.uint8) if m is None else m
                for m, d in zip(masks, depths)
            ]
        )
    return (
        np.stack(images),
        np.stack(depths),
        masks_arr,
        np.stack(cam_f),
        np.stack(cam_c),
        np.stack(cam_t),
        whs[-1],
    )


def make_registration_fn(
    vit_cfg,
    grid_cell_size: float,
    crop_size: Tuple[int, int],
    mask_from_depth: bool = False,
):
    """Builds the jitted per-chunk feature-registration function.

    chunk: (images [B,H,W,3] uint8 or f32 in [0,1], depths [B,H,W] f32 mm or
    uint16 0.1mm-units, masks [B,H,W] any dtype — or None with
    mask_from_depth=True, where the mask is derived as depth > 0 on device
    (our gen_templates guarantees that identity, see "mask_is_depth_positive"),
    cam_f [B,2], cam_c [B,2], cam_t [B,4,4])
    -> (feats [B,Q,D], verts [B,Q,3], valid [B,Q]).
    (reference per-template equivalent: utils/feature_util.py:160-237)
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def register(params, images, depths, masks, cam_f, cam_c, cam_t):
        # uint8/uint16 templates convert on device (see _load_one_template).
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        if depths.dtype == jnp.uint16:
            depths = depths.astype(jnp.float32) / 10.0  # 0.1mm units -> mm
        if mask_from_depth:
            masks = (depths > 0).astype(jnp.float32)
        elif masks.dtype != jnp.float32:
            masks = masks.astype(jnp.float32)
        fmaps = dinov2.extract_facet(
            params, vit_cfg, dinov2.normalize_images(images)
        )["feature_maps"]

        def per_template(fmap, depth, mask, kf, kc, kt):
            eroded = morphology.erode(mask, 5, border="zero")
            points = sampling.grid_points(crop_size, grid_cell_size)
            valid = sampling.points_in_mask(points, eroded)
            feats = sampling.sample_grid_features(
                fmap, points, crop_size, grid_cell_size
            )
            pts_cam = sampling.lift_points_to_3d(points, depth, kf, kc)
            # world frame == model frame for templates (m2w identity).
            verts = geometry.transform_points(kt, pts_cam)
            return feats, verts, valid

        return jax.vmap(per_template)(fmaps, depths, masks, cam_f, cam_c, cam_t)

    return register


def generate_repre(
    opts: GenRepreOpts,
    metadata: List[dict],
    vit_params=None,
    output_dir: Optional[str] = None,
    templates_dir: Optional[str] = None,
) -> ObjectRepre:
    """Builds and (optionally) saves the repre for one object."""
    import jax
    import jax.numpy as jnp

    timer = Timer(logger=logger)
    timer.start()
    td = opts.template_desc_opts
    if td is not None and td.desc_type != "tfidf":
        # Fail fast, same contract as the reference
        # (scripts/gen_repre.py:343).
        raise ValueError(f"Unknown template descriptor type: {td.desc_type}")
    vit_cfg = dinov2.resolve_config(
        opts.extractor_name,
        use_pallas_attention=opts.use_pallas_attention,
        use_fused_block=opts.use_fused_block,
        approx_gelu=opts.approx_gelu,
        overrides=opts.vit_overrides,
    )
    if vit_params is None:
        if opts.weights_path:
            vit_params = weights_mod.load_checkpoint(opts.weights_path, vit_cfg)
        else:
            logger.warning("No DINOv2 weights_path given; using random init.")
            # See generate_repre_from_list: CPU init + one bulk transfer.
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                vit_params = dinov2.init_params(jax.random.PRNGKey(0), vit_cfg)
            vit_params = jax.device_put(vit_params)

    timer.elapsed("Setup")  # config + weights init/load (device programs)

    # All templates are decoded UP FRONT, then registered in batched chunks.
    # A streamed decode-register-decode loop was tried and measured 1.5-2x
    # SLOWER on the 1-core bench host (decode 290 s interleaved vs 110 s as
    # a tight loop — the tunneled device client's background threads compete
    # with PIL for the single core whenever device work is in flight), so
    # the two phases stay separate. Peak host memory is the full template
    # set (~2.5 GB at LM-O scale).
    timer.start()
    images, depths, masks, cam_f, cam_c, cam_t, (w, h) = load_template_arrays(
        metadata, templates_dir=templates_dir
    )
    timer.elapsed("Template loading")

    register = make_registration_fn(
        vit_cfg, opts.grid_cell_size, (w, h), mask_from_depth=masks is None
    )

    # Batched chunks (pad the last one to keep a single compiled shape).
    # Registration outputs STAY ON DEVICE: this host's tunneled chip moves
    # data at ~35 MB/s up and less down (measured 2026-08-19), so the
    # round-3 per-chunk np.asarray fetches (~22 MB/chunk, ~1.1 GB/object)
    # dominated the stage; with device-resident outputs the stage cost is
    # the INPUT upload, which is why rgb/depth ship as uint8/uint16 and the
    # mask is derived on device (see _load_one_template). All downstream
    # banks are built on padded [T*Q] arrays with a validity mask instead of
    # host-compacted data-dependent sizes, so every post-registration
    # program has a shape that is CONSTANT per dataset config and compiles
    # once (the compacted path recompiled PCA/k-means/tf-idf per object).
    num_t = len(images)
    bs = opts.batch_size
    feats_l, verts_l, valid_l = [], [], []
    timer.start()

    # Cameras are tiny ([T, 20] floats): pad + upload them ONCE; per-chunk
    # camera args are then device-side slices, not per-chunk host uploads
    # (3 of the 5 per-chunk transfers — and their tunnel RTTs — vanish).
    n_chunks = -(-num_t // bs)
    num_pad = n_chunks * bs

    def pad_host(a):
        if num_pad == num_t:
            return a
        return np.concatenate([a, np.repeat(a[-1:], num_pad - num_t, axis=0)])

    cam_f_dev = jnp.asarray(pad_host(cam_f))
    cam_c_dev = jnp.asarray(pad_host(cam_c))
    cam_t_dev = jnp.asarray(pad_host(cam_t))

    # Producer/consumer pipeline (round 5, after round 4 measured the stage
    # upload-bound at ~35 MB/s): a producer THREAD pads, uploads and
    # dispatches each chunk up to two chunks ahead (queue maxsize=2) while
    # the consumer forces completed chunks in order. Uploads are network IO
    # (the device client releases the GIL), so chunk k+1/k+2's transfers
    # ride the link while chunk k's force round-trip waits — the round-4
    # code overlapped only ONE upload with ONE force (the "one-chunk force
    # window"); this overlaps the whole stage. Forcing every chunk (rather
    # than none) stays essential: on the deferred-execution tunnel, letting
    # 50 chunk programs pile up unmaterialized makes the final
    # materialization superlinear in the deferred-graph size (measured:
    # 0.4 s/chunk forced per-chunk vs 15.7 s/chunk when all 50 defer to one
    # force — 785 s/object). On a locally attached chip the queue is an
    # ordinary double buffer.
    import queue as queue_mod
    import threading

    chunk_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)
    stop = threading.Event()  # consumer died: unblock + stop the producer

    def _put(item) -> bool:
        """Bounded put that aborts when the consumer has stopped — a plain
        blocking put would wedge the producer forever (maxsize=2) if the
        consumer raised mid-stage."""
        while not stop.is_set():
            try:
                chunk_q.put(item, timeout=0.5)
                return True
            except queue_mod.Full:
                continue
        return False

    def _produce():
        try:
            for s in range(0, num_t, bs):
                if stop.is_set():
                    return
                e = min(s + bs, num_t)
                pad = bs - (e - s)

                def pad0(a):
                    if pad == 0:
                        return a[s:e]
                    return np.concatenate(
                        [a[s:e], np.repeat(a[e - 1 : e], pad, axis=0)]
                    )

                f, v, m = register(
                    vit_params,
                    jnp.asarray(pad0(images)),
                    jnp.asarray(pad0(depths)),
                    None if masks is None else jnp.asarray(pad0(masks)),
                    cam_f_dev[s : s + bs],
                    cam_c_dev[s : s + bs],
                    cam_t_dev[s : s + bs],
                )
                if not _put((f, v, m, e - s)):
                    return
            _put(None)
        except BaseException as ex:  # surfaced in the consumer
            _put(ex)

    producer = threading.Thread(target=_produce, daemon=True)
    producer.start()
    try:
        while True:
            item = chunk_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            f, v, m, n = item
            force_execution(f)
            feats_l.append(f[:n])
            verts_l.append(v[:n])
            valid_l.append(m[:n])
    finally:
        stop.set()
        while True:  # drain so the producer's pending put unblocks
            try:
                chunk_q.get_nowait()
            except queue_mod.Empty:
                break
        producer.join(timeout=60)
    feats = jnp.concatenate(feats_l)  # [T, Q, D] (device)
    verts = jnp.concatenate(verts_l)  # [T, Q, 3]
    valid = jnp.concatenate(valid_l)  # [T, Q]
    num_q = feats.shape[1]
    flat_feats_dev = feats.reshape(-1, feats.shape[-1])  # [T*Q, D]
    mask_dev = valid.reshape(-1)
    tids_dev = jnp.repeat(jnp.arange(num_t, dtype=jnp.int32), num_q)
    # force_execution, not block_until_ready: on deferred-execution backends
    # (the axon tunnel) block_until_ready is a no-op on the client future and
    # the whole stage would silently execute inside the NEXT stage's timer.
    force_execution(flat_feats_dev)
    timer.elapsed("Feature registration")

    # The only mid-pipeline fetch: the [T*Q] validity mask (~1 MB), used for
    # the PCA subsample draw and the final compaction gather.
    flat_valid = np.asarray(mask_dev)
    flat_idx = np.nonzero(flat_valid)[0].astype(np.int32)
    n_valid = len(flat_idx)
    logger.info(f"Registered {n_valid} features over {num_t} templates.")

    # PCA projection (reference: scripts/gen_repre.py:272-286). The fit
    # subsample is drawn uniformly over VALID features, as before (the draw
    # itself differs from round 3's compacted-index draw; same distribution).
    projector = None
    if opts.apply_pca:
        timer.start()
        cap = min(opts.max_num_feats_for_pca, n_valid)
        rng = np.random.default_rng(0)
        sub = rng.choice(flat_idx, size=cap, replace=False)
        projector = fit_pca(
            flat_feats_dev[jnp.asarray(sub)],
            num_components=opts.pca_components,
            whiten=opts.pca_whiten,
        )
        pfeats = pca_transform(projector, flat_feats_dev)  # [T*Q, C] device
        force_execution(pfeats)
        timer.elapsed("PCA")
    else:
        pfeats = flat_feats_dev

    # Visual words (reference: scripts/gen_repre.py:289-311). k-means sees
    # the padded bank with a sample mask — padded rows contribute nothing.
    td = opts.template_desc_opts
    tfidf_cfg = TfidfConfig(
        knn_k=td.tfidf_knn_k if td else opts.tfidf_knn_k,
        metric=td.tfidf_knn_metric if td else opts.tfidf_knn_metric,
        soft_assign=td.tfidf_soft_assign if td else opts.tfidf_soft_assign,
        soft_sigma_squared=(
            td.tfidf_soft_sigma_squared if td else opts.tfidf_soft_sigma_squared
        ),
    )
    if opts.cluster_features:
        timer.start()
        km = kmeans(
            pfeats,
            num_clusters=min(opts.cluster_num, n_valid),
            key=jax.random.PRNGKey(0),
            sample_mask=mask_dev,
        )
        words = km.centroids
        force_execution(words)
        timer.elapsed("k-means")
    else:
        words = pfeats[jnp.asarray(flat_idx[: opts.cluster_num])]

    # tf-idf template descriptors (reference: scripts/gen_repre.py:313-346).
    # One jitted program: eagerly, the chunked word assignment issues ~50
    # ops whose deferred-graph materialization cost 44 s of the stage on the
    # tunneled backend (same pathology as the registration chunks); compiled
    # it is a single dispatch.
    timer.start()
    from functools import partial as _partial

    tfidf_fn = jax.jit(
        _partial(
            calc_template_tfidf_descriptors,
            num_templates=num_t,
            config=tfidf_cfg,
        )
    )
    descs, idfs = tfidf_fn(pfeats, tids_dev, words, feature_mask=mask_dev)
    force_execution((descs, idfs))
    timer.elapsed("tf-idf descriptors")

    # Final artifact fetch: ONE compaction gather on device per bank, then a
    # single download each (the 190 MB feature bank is the unavoidable cost
    # of persisting the artifact; on a PCIe-attached host it is ~0.1 s).
    timer.start()
    sel_dev = jnp.asarray(flat_idx)
    flat_feats = np.asarray(pfeats[sel_dev])
    flat_verts = np.asarray(verts.reshape(-1, 3)[sel_dev])
    flat_tids = (flat_idx // num_q).astype(np.int32)
    words = np.asarray(words, dtype=np.float32)
    idfs = np.asarray(idfs, dtype=np.float32)
    descs = np.asarray(descs, dtype=np.float32)
    timer.elapsed("Artifact fetch")

    cameras = PinholeCamera(
        f=np.asarray(cam_f, dtype=np.float32),
        c=np.asarray(cam_c, dtype=np.float32),
        T_world_from_eye=np.asarray(cam_t, dtype=np.float32),
        width=w,
        height=h,
    )
    # device=False: the builder's contract is the SAVED artifact — building
    # device copies of the ~430 MB banks here cost 10-25 untimed seconds of
    # upload per object on the tunneled link for data the CLI run then
    # discards (make_repre docstring). Serving callers load via load_repre
    # (device arrays) or device_put the result.
    repre = make_repre(
        device=False,
        feat_vectors=flat_feats.astype(np.float32),
        vertices=flat_verts.astype(np.float32),
        feat_to_template_ids=flat_tids,
        word_centroids=words,
        word_idfs=idfs,
        template_descs=descs,
        template_cameras=cameras,
        raw_projector=projector,
        tfidf_config=tfidf_cfg,
        extractor_name=opts.extractor_name,
    )
    if output_dir:
        timer.start()
        # device=False above means every repre leaf is already host numpy,
        # so the saver's np.asarray is a no-op (no ~430 MB device->host
        # re-download — the round-5 measured 30-45 s Save pathology).
        save_repre(repre, output_dir)
        timer.elapsed("Save")
        logger.info(f"Saved repre to {output_dir}")
    return repre


def generate_repre_from_list(opts: GenRepreOpts) -> None:
    """CLI driver over objects. (reference: scripts/gen_repre.py:380-398)"""
    import jax

    vit_cfg = dinov2.resolve_config(
        opts.extractor_name,
        use_pallas_attention=opts.use_pallas_attention,
        use_fused_block=opts.use_fused_block,
        approx_gelu=opts.approx_gelu,
        overrides=opts.vit_overrides,
    )
    if opts.weights_path:
        vit_params = weights_mod.load_checkpoint(opts.weights_path, vit_cfg)
    else:
        logger.warning("No DINOv2 weights_path given; using random init.")
        # Init on the CPU backend, then ONE bulk device transfer: eager
        # init on a tunneled device dispatches ~200 small programs at
        # ~0.1 s RTT each (measured as ~28 s of untimed builder wall,
        # benchmarks/results/offline_builder_r05.json).
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            vit_params = dinov2.init_params(jax.random.PRNGKey(0), vit_cfg)
        vit_params = jax.device_put(vit_params)

    # Default to every object of the dataset, matching gen_templates/infer.
    object_lids = opts.object_lids or bop.OBJECT_IDS.get(opts.object_dataset, [])
    object_lids = host_shard.shard_keys(
        object_lids, *host_shard.shard_of(opts)
    )
    for lid in object_lids:
        log_heading(logger, f"Building repre for object {lid}")
        templates_dir = os.path.join(
            opts.templates_dir, opts.object_dataset, opts.templates_version, str(lid)
        )
        with open(os.path.join(templates_dir, "metadata.json")) as f:
            metadata = json.load(f)
        output_dir = os.path.join(
            opts.output_dir, opts.object_dataset, opts.version, str(lid)
        )
        if os.path.exists(output_dir) and not opts.overwrite:
            if opts.resume and os.path.exists(os.path.join(output_dir, "repre.npz")):
                logger.info(f"Resume: repre exists for object {lid}, skipping.")
                continue
            raise ValueError(f"Output dir exists (overwrite=False): {output_dir}")
        os.makedirs(output_dir, exist_ok=True)
        config_util.save_opts(opts, os.path.join(output_dir, "config.json"))
        generate_repre(
            opts, metadata, vit_params=vit_params, output_dir=output_dir,
            templates_dir=templates_dir,
        )


def main() -> None:
    from foundpose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    opts = config_util.load_opts(GenRepreOpts)
    generate_repre_from_list(opts)


if __name__ == "__main__":
    main()
