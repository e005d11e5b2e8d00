"""Device-mesh construction and sharding specs for the inference pipeline.

The reference has no parallelism at all (SURVEY.md §2.4: sequential Python
loops, single device). This module is a design-target component: crops are
data-parallel over the `data` axis, and the object's template/descriptor bank
is sharded over the `bank` axis so retrieval scales with devices and top-k
merges ride ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
BANK_AXIS = "bank"
MODEL_AXIS = "model"  # tensor-parallel ViT axis (parallel/tp_vit.py)


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a (data, bank) mesh — or (data, bank, model) for a 3-tuple
    shape — over the available devices.

    With no explicit shape, devices are split as evenly as possible with the
    bank axis at most 4 wide (the bank fetch collective is cheap; data
    parallelism over crops is the primary scaling axis, SURVEY.md §2.4).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        bank = 1
        for cand in (4, 2, 1):
            if n % cand == 0 and n // cand >= 1:
                bank = cand
                break
        shape = (n // bank, bank)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    axes = (DATA_AXIS, BANK_AXIS, MODEL_AXIS)[: len(shape)]
    arr = np.asarray(devices[:need]).reshape(shape)
    return Mesh(arr, axes)


def crop_sharding(mesh: Mesh) -> NamedSharding:
    """Batched crop tensors: sharded over the data axis (leading dim)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def bank_sharding(mesh: Mesh) -> NamedSharding:
    """Template-major arrays: sharded over the bank axis (leading dim)."""
    return NamedSharding(mesh, P(BANK_AXIS))


def shard_repre(repre, mesh: Mesh):
    """Places an ObjectRepre on the mesh: template-major arrays over `bank`,
    codebook and flat arrays replicated."""
    bank = bank_sharding(mesh)
    rep = replicated(mesh)

    def place(x, sharding):
        return jax.device_put(x, sharding) if x is not None else None

    return repre.replace(
        template_mask=place(repre.template_mask, bank),
        template_descs=place(repre.template_descs, bank),
        bank_feats=place(repre.bank_feats, bank),
        bank_vertices=place(repre.bank_vertices, bank),
        bank_mask=place(repre.bank_mask, bank),
        word_centroids=place(repre.word_centroids, rep),
        word_idfs=place(repre.word_idfs, rep),
        vertices=place(repre.vertices, rep),
        feat_vectors=place(repre.feat_vectors, rep),
        feat_to_template_ids=place(repre.feat_to_template_ids, rep),
        feat_mask=place(repre.feat_mask, rep),
    )


def shard_repre_multi(multi_repre, mesh: Mesh):
    """Places a stacked multi-object repre (repre.stack_repres) on the mesh:
    per-object template/bank arrays sharded over `bank` along the TEMPLATE
    axis (dim 1), codebooks and flat arrays replicated."""
    obj_bank = NamedSharding(mesh, P(None, BANK_AXIS))
    rep = replicated(mesh)

    def place(x, sharding):
        return jax.device_put(x, sharding) if x is not None else None

    return multi_repre.replace(
        template_descs=place(multi_repre.template_descs, obj_bank),
        template_mask=place(multi_repre.template_mask, obj_bank),
        bank_feats=place(multi_repre.bank_feats, obj_bank),
        bank_vertices=place(multi_repre.bank_vertices, obj_bank),
        bank_mask=place(multi_repre.bank_mask, obj_bank),
        word_centroids=place(multi_repre.word_centroids, rep),
        word_idfs=place(multi_repre.word_idfs, rep),
        vertices=place(multi_repre.vertices, rep),
        feat_vectors=place(multi_repre.feat_vectors, rep),
        feat_to_template_ids=place(multi_repre.feat_to_template_ids, rep),
        feat_mask=place(multi_repre.feat_mask, rep),
    )
