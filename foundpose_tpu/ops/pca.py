"""PCA as a jitted covariance + eigh, transform as a single matmul.

TPU-native replacement for the reference's sklearn PCA projector
(reference: utils/projector_util.py:45-88). Fit builds the DxD covariance on
the MXU and eigendecomposes it (D is the feature dim, e.g. 384/1024 — tiny);
transform is one matmul that XLA fuses into surrounding compute, eliminating
the reference's GPU->CPU->sklearn->GPU round trip
(reference call site: scripts/infer.py:507-520).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class PCA:
    """Fitted PCA parameters; a pytree that serializes into the object repre.

    `whiten` is static so `pca_transform` stays branch-free under jit.
    """

    mean: Array  # [D]
    components: Array  # [C, D] rows = principal axes (sklearn layout)
    explained_variance: Array  # [C]
    whiten: bool = struct.field(pytree_node=False, default=False)


@partial(jax.jit, static_argnames=("num_components", "whiten"))
def fit_pca(
    samples: Array,
    num_components: int,
    whiten: bool = False,
    sample_mask: Optional[Array] = None,
) -> PCA:
    """Fits PCA on [N, D] samples (optionally masked).

    Matches sklearn's estimator semantics: mean-centering, eigenvectors of the
    unbiased covariance, components sorted by decreasing variance. Component
    signs are arbitrary (as in sklearn); consumers must not rely on them.
    """
    n, d = samples.shape
    x = samples.astype(jnp.float32)
    if sample_mask is None:
        count = jnp.asarray(float(n))
        mean = jnp.mean(x, axis=0)
        xc = x - mean
    else:
        w = sample_mask.astype(jnp.float32)
        count = jnp.sum(w)
        mean = jnp.sum(x * w[:, None], axis=0) / count
        xc = (x - mean) * w[:, None]

    cov = (
        jnp.einsum("ni,nj->ij", xc, xc, precision=jax.lax.Precision.HIGHEST)
        / jnp.maximum(count - 1.0, 1.0)
    )
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    eigvals = eigvals[::-1][:num_components]
    components = eigvecs[:, ::-1][:, :num_components].T
    return PCA(
        mean=mean,
        components=components,
        explained_variance=jnp.maximum(eigvals, 0.0),
        whiten=whiten,
    )


def pca_transform(pca: PCA, x: Array) -> Array:
    """Projects [..., D] features to [..., C]. One matmul; jit/vmap-friendly."""
    out = jnp.einsum(
        "...d,cd->...c", x - pca.mean, pca.components, precision=jax.lax.Precision.HIGHEST
    )
    if pca.whiten:
        out = out / jnp.sqrt(jnp.maximum(pca.explained_variance, 1e-12))
    return out


def pca_inverse_transform(pca: PCA, y: Array) -> Array:
    """Maps [..., C] projections back to the original [..., D] space."""
    if pca.whiten:
        y = y * jnp.sqrt(jnp.maximum(pca.explained_variance, 1e-12))
    return jnp.einsum("...c,cd->...d", y, pca.components) + pca.mean
