"""Feature-based object representation: device-resident, padded, shardable.

TPU-native re-design of the reference `FeatureBasedObjectRepre`
(reference: utils/repre_util.py:34-223). Differences by design:

- All tensors are jnp arrays living in HBM; the matching path additionally
  keeps a padded per-template bank layout [T, Fmax, ...] with a validity mask,
  so ragged per-template feature sets never change shapes under jit (the
  reference instead builds 798 faiss CPU indices per object,
  scripts/infer.py:226-239).
- Serialization is framework-neutral .npz + json (instead of a torch pickle,
  reference: utils/repre_util.py:99-141); the reference's released LM-O
  `repre.pth` files can be imported directly for parity testing.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from foundpose_tpu.ops.pca import PCA
from foundpose_tpu.ops.tfidf import TfidfConfig
from foundpose_tpu.structs import PinholeCamera

Array = jax.Array


@struct.dataclass
class ObjectRepre:
    """Visual object features registered in 3D, plus retrieval structures."""

    # Flat per-feature arrays (possibly padded; see feat_mask).
    vertices: Array  # [F, 3] model-space 3D point per feature
    feat_vectors: Array  # [F, D]
    feat_to_template_ids: Array  # [F]
    feat_mask: Array  # [F] bool validity
    # Visual-word codebook + retrieval.
    word_centroids: Array  # [W, D]
    word_idfs: Array  # [W]
    template_descs: Array  # [T, W]
    # Padded per-template banks for the matching path.
    bank_feats: Array  # [T, Fmax, D]
    bank_vertices: Array  # [T, Fmax, 3]
    bank_mask: Array  # [T, Fmax] bool
    # Per-template cameras (batched pytree, model-space extrinsics =
    # T_world_from_eye with "world" == model frame).
    template_cameras: PinholeCamera
    # Raw-feature projector (PCA); identity if None.
    raw_projector: Optional[PCA] = None
    # Validity of template rows (used when stacking objects with different
    # template counts into one padded multi-object repre).
    template_mask: Optional[Array] = None  # [T] bool
    # Static metadata.
    tfidf_config: TfidfConfig = struct.field(pytree_node=False, default=TfidfConfig())
    extractor_name: str = struct.field(pytree_node=False, default="")
    # Optional template images for visualization (host-side numpy, not traced).
    templates: Optional[np.ndarray] = struct.field(pytree_node=False, default=None)

    @property
    def num_templates(self) -> int:
        return self.template_descs.shape[0]

    def cast_banks(self, dtype) -> "ObjectRepre":
        """Casts the heavy feature banks to `dtype` (e.g. bfloat16) AT REST:
        halves repre HBM footprint and the bank-gather traffic of the
        matching stage. Geometry (vertices, cameras) and the PCA projector
        stay f32 — pose math precision is unaffected; the pipeline's
        per-stage `astype(compute_dtype)` casts become no-ops."""

        def cast(x):
            return x.astype(dtype) if x is not None else None

        return self.replace(
            feat_vectors=cast(self.feat_vectors),
            word_centroids=cast(self.word_centroids),
            template_descs=cast(self.template_descs),
            bank_feats=cast(self.bank_feats),
        )


def build_padded_banks(
    feat_vectors: np.ndarray,
    vertices: np.ndarray,
    feat_to_template_ids: np.ndarray,
    num_templates: int,
    max_feats_per_template: Optional[int] = None,
    pad_multiple: int = 128,
):
    """Reorganizes flat feature arrays into padded [T, Fmax, ...] banks.

    Fmax is rounded up to `pad_multiple` for MXU-friendly tiling.
    """
    counts = np.bincount(feat_to_template_ids, minlength=num_templates)
    fmax = int(counts.max()) if max_feats_per_template is None else max_feats_per_template
    fmax = max(-(-fmax // pad_multiple) * pad_multiple, pad_multiple)
    d = feat_vectors.shape[1]
    bank_feats = np.zeros((num_templates, fmax, d), dtype=feat_vectors.dtype)
    bank_vertices = np.zeros((num_templates, fmax, 3), dtype=vertices.dtype)
    bank_mask = np.zeros((num_templates, fmax), dtype=bool)
    for t in range(num_templates):
        sel = np.nonzero(feat_to_template_ids == t)[0][:fmax]
        k = len(sel)
        bank_feats[t, :k] = feat_vectors[sel]
        bank_vertices[t, :k] = vertices[sel]
        bank_mask[t, :k] = True
    return bank_feats, bank_vertices, bank_mask


def make_repre(
    feat_vectors: np.ndarray,
    vertices: np.ndarray,
    feat_to_template_ids: np.ndarray,
    word_centroids: np.ndarray,
    word_idfs: np.ndarray,
    template_descs: np.ndarray,
    template_cameras: PinholeCamera,
    raw_projector: Optional[PCA] = None,
    tfidf_config: TfidfConfig = TfidfConfig(),
    extractor_name: str = "",
    templates: Optional[np.ndarray] = None,
    feat_mask: Optional[np.ndarray] = None,
    device: bool = True,
) -> ObjectRepre:
    """`device=False` keeps every leaf a host numpy array — for builders
    that only SAVE the repre (uploading ~430 MB of banks to a tunneled
    device, measured 10-25 s/object, would be pure waste there). Serving
    callers keep the default: numpy leaves re-upload on every jit
    dispatch (a measured pathology, see bench.py's device_put note)."""
    num_templates = template_descs.shape[0]
    bank_feats, bank_vertices, bank_mask = build_padded_banks(
        feat_vectors, vertices, feat_to_template_ids, num_templates
    )
    if feat_mask is None:
        feat_mask = np.ones(len(feat_vectors), dtype=bool)
    place = jnp.asarray if device else np.asarray
    return ObjectRepre(
        vertices=place(vertices),
        feat_vectors=place(feat_vectors),
        feat_to_template_ids=place(feat_to_template_ids),
        feat_mask=place(feat_mask),
        word_centroids=place(word_centroids),
        word_idfs=place(word_idfs),
        template_descs=place(template_descs),
        bank_feats=place(bank_feats),
        bank_vertices=place(bank_vertices),
        bank_mask=place(bank_mask),
        template_cameras=template_cameras,
        raw_projector=raw_projector,
        tfidf_config=tfidf_config,
        extractor_name=extractor_name,
        templates=templates,
    )


# ---------------------------------------------------------------------------
# Serialization (.npz + meta.json)
# ---------------------------------------------------------------------------


def save_repre(repre: ObjectRepre, repre_dir: str) -> None:
    """Saves to `<dir>/repre.npz` + `<dir>/repre_meta.json`.

    NOTE for device-resident repres: `np.asarray` below is a device->host
    fetch (~430 MB per object, 30-45 s on the tunneled dev link — the
    round-5 measured "Save" pathology). The builder avoids it by
    constructing its repre with make_repre(device=False), so its leaves
    are already host numpy when they reach this function.
    """
    os.makedirs(repre_dir, exist_ok=True)
    arrays = {
        "vertices": repre.vertices,
        "feat_vectors": repre.feat_vectors,
        "feat_to_template_ids": repre.feat_to_template_ids,
        "feat_mask": repre.feat_mask,
        "word_centroids": repre.word_centroids,
        "word_idfs": repre.word_idfs,
        "template_descs": repre.template_descs,
        "cam_f": repre.template_cameras.f,
        "cam_c": repre.template_cameras.c,
        "cam_T": repre.template_cameras.T_world_from_eye,
    }
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    if repre.raw_projector is not None:
        arrays["pca_mean"] = np.asarray(repre.raw_projector.mean)
        arrays["pca_components"] = np.asarray(repre.raw_projector.components)
        arrays["pca_variance"] = np.asarray(repre.raw_projector.explained_variance)
    if repre.templates is not None:
        arrays["templates"] = np.asarray(repre.templates)
    # Uncompressed on purpose: the payload is ~190 MB of f32 feature banks
    # that zlib shrinks <10% while costing ~60 s of single-core CPU per
    # object (measured, benchmarks/builder_full_scale.py); np.load reads
    # either format, so existing compressed artifacts stay loadable.
    np.savez(os.path.join(repre_dir, "repre.npz"), **arrays)
    meta = {
        "tfidf_config": repre.tfidf_config._asdict(),
        "extractor_name": repre.extractor_name,
        "cam_width": repre.template_cameras.width,
        "cam_height": repre.template_cameras.height,
        "pca_whiten": bool(repre.raw_projector.whiten)
        if repre.raw_projector is not None
        else None,
    }
    with open(os.path.join(repre_dir, "repre_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_repre(repre_dir: str) -> ObjectRepre:
    data = np.load(os.path.join(repre_dir, "repre.npz"))
    with open(os.path.join(repre_dir, "repre_meta.json")) as f:
        meta = json.load(f)
    cameras = PinholeCamera(
        f=jnp.asarray(data["cam_f"]),
        c=jnp.asarray(data["cam_c"]),
        T_world_from_eye=jnp.asarray(data["cam_T"]),
        width=int(meta["cam_width"]),
        height=int(meta["cam_height"]),
    )
    projector = None
    if "pca_mean" in data:
        projector = PCA(
            mean=jnp.asarray(data["pca_mean"]),
            components=jnp.asarray(data["pca_components"]),
            explained_variance=jnp.asarray(data["pca_variance"]),
            whiten=bool(meta.get("pca_whiten")),
        )
    return make_repre(
        feat_vectors=data["feat_vectors"],
        vertices=data["vertices"],
        feat_to_template_ids=data["feat_to_template_ids"],
        word_centroids=data["word_centroids"],
        word_idfs=data["word_idfs"],
        template_descs=data["template_descs"],
        template_cameras=cameras,
        raw_projector=projector,
        tfidf_config=TfidfConfig(**meta["tfidf_config"]),
        extractor_name=meta.get("extractor_name", ""),
        templates=data["templates"] if "templates" in data else None,
        feat_mask=data["feat_mask"],
    )


def stack_repres(repres) -> "ObjectRepre":
    """Stacks per-object representations into one multi-object repre with a
    leading object axis, padding ragged template counts / bank widths / flat
    feature counts. Enables mixed-object batches in one jitted step
    (design target, SURVEY.md §2.4; no reference counterpart).

    All repres must share the feature dim, word count, and tfidf config.
    """
    n_obj = len(repres)
    t_max = max(r.template_descs.shape[0] for r in repres)
    f_max = max(r.bank_feats.shape[1] for r in repres)
    flat_max = max(r.feat_vectors.shape[0] for r in repres)
    d = repres[0].feat_vectors.shape[1]
    w = repres[0].word_centroids.shape[0]

    def pad_to(a, shape):
        a = np.asarray(a)
        pads = [(0, s - a.shape[i]) for i, s in enumerate(shape)]
        return np.pad(a, pads)

    fields: Dict[str, list] = {k: [] for k in [
        "vertices", "feat_vectors", "feat_to_template_ids", "feat_mask",
        "word_centroids", "word_idfs", "template_descs", "bank_feats",
        "bank_vertices", "bank_mask", "template_mask", "cam_f", "cam_c", "cam_t",
    ]}
    for r in repres:
        t, fm, fl = (r.template_descs.shape[0], r.bank_feats.shape[1],
                     r.feat_vectors.shape[0])
        fields["vertices"].append(pad_to(r.vertices, (flat_max, 3)))
        fields["feat_vectors"].append(pad_to(r.feat_vectors, (flat_max, d)))
        fields["feat_to_template_ids"].append(
            pad_to(r.feat_to_template_ids, (flat_max,))
        )
        fields["feat_mask"].append(
            pad_to(np.asarray(r.feat_mask, dtype=bool), (flat_max,))
        )
        fields["word_centroids"].append(np.asarray(r.word_centroids))
        fields["word_idfs"].append(np.asarray(r.word_idfs))
        fields["template_descs"].append(pad_to(r.template_descs, (t_max, w)))
        fields["bank_feats"].append(pad_to(r.bank_feats, (t_max, f_max, d)))
        fields["bank_vertices"].append(pad_to(r.bank_vertices, (t_max, f_max, 3)))
        fields["bank_mask"].append(
            pad_to(np.asarray(r.bank_mask, dtype=bool), (t_max, f_max))
        )
        tm = np.zeros(t_max, dtype=bool)
        tm[:t] = True
        fields["template_mask"].append(tm)
        fields["cam_f"].append(pad_to(r.template_cameras.f, (t_max, 2)))
        fields["cam_c"].append(pad_to(r.template_cameras.c, (t_max, 2)))
        fields["cam_t"].append(pad_to(r.template_cameras.T_world_from_eye, (t_max, 4, 4)))

    cam = PinholeCamera(
        f=jnp.asarray(np.stack(fields["cam_f"])),
        c=jnp.asarray(np.stack(fields["cam_c"])),
        T_world_from_eye=jnp.asarray(np.stack(fields["cam_t"])),
        width=repres[0].template_cameras.width,
        height=repres[0].template_cameras.height,
    )
    proj = None
    if repres[0].raw_projector is not None:
        proj = jax.tree.map(
            lambda *x: jnp.stack([jnp.asarray(v) for v in x]),
            *[r.raw_projector for r in repres],
        )
    return ObjectRepre(
        vertices=jnp.asarray(np.stack(fields["vertices"])),
        feat_vectors=jnp.asarray(np.stack(fields["feat_vectors"])),
        feat_to_template_ids=jnp.asarray(np.stack(fields["feat_to_template_ids"])),
        feat_mask=jnp.asarray(np.stack(fields["feat_mask"])),
        word_centroids=jnp.asarray(np.stack(fields["word_centroids"])),
        word_idfs=jnp.asarray(np.stack(fields["word_idfs"])),
        template_descs=jnp.asarray(np.stack(fields["template_descs"])),
        bank_feats=jnp.asarray(np.stack(fields["bank_feats"])),
        bank_vertices=jnp.asarray(np.stack(fields["bank_vertices"])),
        bank_mask=jnp.asarray(np.stack(fields["bank_mask"])),
        template_cameras=cam,
        raw_projector=proj,
        tfidf_config=repres[0].tfidf_config,
        extractor_name=repres[0].extractor_name,
        template_mask=jnp.asarray(np.stack(fields["template_mask"])),
    )


def pad_templates(repre: ObjectRepre, multiple: int) -> ObjectRepre:
    """Pads the template axis up to a multiple of `multiple` so the
    template-major bank arrays shard evenly over the `bank` mesh axis
    (parallel/mesh.shard_repre + sharded_inference; shard_map needs even
    splits). Pad rows get template_mask=False, so retrieval masks them to
    -inf and they are never selected.

    Works on single-object ([T, ...]) and stacked multi-object ([O, T, ...])
    repres (template axis 0 / 1). Cameras are edge-replicated (never read
    for pad rows, but zero intrinsics would be a trap for host-side code).
    """
    axis = int(repre.template_descs.ndim) - 2  # 0 = single, 1 = multi
    t = repre.template_descs.shape[axis]
    t_pad = -(-t // multiple) * multiple

    def pad(a, mode="constant"):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, t_pad - t)
        return jnp.pad(jnp.asarray(a), pads, mode=mode)

    tmask = repre.template_mask
    if tmask is None:
        shape = repre.template_descs.shape[: axis + 1]
        tmask = jnp.ones(shape, dtype=bool)
    if t_pad == t:
        return repre if repre.template_mask is not None else repre.replace(
            template_mask=tmask
        )
    return repre.replace(
        template_descs=pad(repre.template_descs),
        bank_feats=pad(repre.bank_feats),
        bank_vertices=pad(repre.bank_vertices),
        bank_mask=pad(repre.bank_mask),
        template_mask=pad(tmask),  # zero-pads to False
        template_cameras=jax.tree.map(
            lambda a: pad(a, mode="edge"), repre.template_cameras
        ),
    )


def load_torch_repre(repre_path: str) -> ObjectRepre:
    """Imports a reference `repre.pth` (torch pickle) for parity testing.

    Field names follow the reference dataclass (utils/repre_util.py:34-83).
    """
    import torch

    obj = torch.load(repre_path, map_location="cpu", weights_only=False)

    def arr(x):
        return x.numpy() if hasattr(x, "numpy") else np.asarray(x)

    cams = obj["template_cameras_cam_from_model"]
    cam_f = np.stack([arr(c["f"]) for c in cams])
    cam_c = np.stack([arr(c["c"]) for c in cams])
    cam_t = np.stack([arr(c["T_world_from_eye"]) for c in cams])
    cameras = PinholeCamera(
        f=jnp.asarray(cam_f, dtype=jnp.float32),
        c=jnp.asarray(cam_c, dtype=jnp.float32),
        T_world_from_eye=jnp.asarray(cam_t, dtype=jnp.float32),
        width=int(cams[0]["width"]),
        height=int(cams[0]["height"]),
    )
    projector = None
    if obj.get("feat_raw_projectors"):
        p = obj["feat_raw_projectors"][0]
        projector = PCA(
            mean=jnp.asarray(arr(p["mean"])),
            components=jnp.asarray(arr(p["components"])),
            explained_variance=jnp.asarray(arr(p["explained_variances"])),
            whiten=bool(arr(p.get("whiten", np.asarray(False)))),
        )
    tdo = obj.get("template_desc_opts") or {}
    cfg = TfidfConfig(
        knn_k=int(tdo.get("tfidf_knn_k", 3)),
        metric=str(tdo.get("tfidf_knn_metric", "l2")),
        soft_assign=bool(tdo.get("tfidf_soft_assign", False)),
        soft_sigma_squared=float(tdo.get("tfidf_soft_sigma_squared", 10.0)),
    )
    feat_opts = obj.get("feat_opts") or {}
    return make_repre(
        feat_vectors=arr(obj["feat_vectors"]).astype(np.float32),
        vertices=arr(obj["vertices"]).astype(np.float32),
        feat_to_template_ids=arr(obj["feat_to_template_ids"]).astype(np.int32),
        word_centroids=arr(obj["feat_cluster_centroids"]).astype(np.float32),
        word_idfs=arr(obj["feat_cluster_idfs"]).astype(np.float32),
        template_descs=arr(obj["template_descs"]).astype(np.float32),
        template_cameras=cameras,
        raw_projector=projector,
        tfidf_config=cfg,
        extractor_name=str(feat_opts.get("extractor_name", "")),
        templates=arr(obj["templates"]) if "templates" in obj else None,
    )
