"""Batched RANSAC-PnP with Levenberg–Marquardt refinement, fully inside jit.

TPU-native replacement for cv2.solvePnPRansac/solvePnPRefineLM
(reference: utils/pnp_util.py:20-84). Design:

- A fixed number of RANSAC hypotheses is drawn up-front (no adaptive early
  exit — data-dependent loop trip counts don't jit). Each hypothesis solves a
  6-point DLT in normalized camera coordinates: the 12x12 normal matrix's
  smallest eigenvector gives [R|t] up to scale, recovered with an SVD
  orthogonalization. All hypotheses solve as one vmapped batch of tiny
  eigendecompositions.
- Hypotheses are scored by masked inlier counting at the pixel reprojection
  threshold; the best one seeds a masked LM refinement on its inliers
  (fixed-iteration, damped Gauss-Newton with accept/reject, matching
  cv2.solvePnPRefineLM's behavior).
- Everything vmaps over templates and crops, so one jit call scores
  (crops x templates x hypotheses) poses on the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from foundpose_tpu import geometry

Array = jax.Array

_P = jax.lax.Precision.HIGHEST


def _score_kernel(pts4_ref, duv_ref, valid_ref, a_ref, counts_ref):
    """Inlier counts for all hypotheses of one correspondence set, in VMEM.

    The XLA formulation materializes [pairs, H, N, 3] camera-space points in
    HBM (hundreds of MB per batch — profiled as the scoring stage's cost);
    here the [N, H] projections live only in VMEM. The inlier test is
    division-free AND threshold-free: the caller folds f/thr into the x/y
    rows of A and 1/thr into duv, so with e = cam_xy' + duv'*cam_z a point
    is an inlier iff |e|^2 < cam_z^2 and cam_z > 0 — algebraically equal to
    the pixel-space threshold test for cam_z > 0 (the threshold stays a
    traced value; nothing here depends on it statically).
    """
    pts4 = pts4_ref[0]  # [N, 4] f32 homogeneous model points
    duv = duv_ref[0]  # [N, 2] f32 = (c - uv) / thr
    vmask = valid_ref[0]  # [N, 1] f32
    a = a_ref[0]  # [12, H] f32: rows = fx/thr*[Rx|tx], fy/thr*[Ry|ty], [Rz|tz]
    camx = jax.lax.dot(pts4, a[0:4], preferred_element_type=jnp.float32)
    camy = jax.lax.dot(pts4, a[4:8], preferred_element_type=jnp.float32)
    camz = jax.lax.dot(pts4, a[8:12], preferred_element_type=jnp.float32)
    ex = camx + duv[:, 0:1] * camz
    ey = camy + duv[:, 1:2] * camz
    inl = (ex * ex + ey * ey < camz * camz) & (camz > 0)
    counts_ref[0] = jnp.sum(
        jnp.where(inl, vmask, 0.0), axis=0, keepdims=True
    )  # [1, H]


@partial(jax.jit, static_argnames=("interpret",))
def score_hypotheses_fused(
    pts2d: Array,
    pts3d: Array,
    validf: Array,
    rs: Array,
    ts: Array,
    k_f: Array,
    k_c: Array,
    inlier_thresh: Array,
    interpret: bool = False,
) -> Array:
    """Masked inlier count per hypothesis ([H] f32) via the Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts3d.shape[0]
    h = rs.shape[0]
    pts4 = jnp.concatenate([pts3d, jnp.ones((n, 1), pts3d.dtype)], axis=1)
    thr = jnp.asarray(inlier_thresh, jnp.float32)
    duv = ((k_c - pts2d) / thr).astype(jnp.float32)  # [N, 2]
    a = jnp.concatenate([rs, ts[:, :, None]], axis=2)  # [H, 3, 4]
    a = jnp.concatenate(
        [a[:, 0] * (k_f[0] / thr), a[:, 1] * (k_f[1] / thr), a[:, 2]], axis=1
    )  # [H, 12] with focal/threshold folded in
    counts = pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1, h), jnp.float32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, n, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        pts4.astype(jnp.float32)[None],
        duv[None],
        validf.astype(jnp.float32)[:, None][None],
        a.T.astype(jnp.float32)[None],
    )
    return counts[0, 0]


class PnPResult(NamedTuple):
    success: Array  # [] bool
    R: Array  # [3, 3] model-to-camera rotation
    t: Array  # [3] model-to-camera translation
    inliers: Array  # [N] bool inlier mask
    quality: Array  # [] float inlier count (reference: pnp_util.py:77-79)


def _cholesky_unrolled(a: Array) -> Array:
    """Cholesky of a small PSD matrix [..., n, n], unrolled over columns.

    n is static and tiny (12), so the 12-step column loop becomes ~36 fused
    elementwise/batched ops — vastly faster on TPU than the batched
    LAPACK-style factorization when vmapped over 10^4+ RANSAC hypotheses.
    """
    n = a.shape[-1]
    l = jnp.zeros_like(a)
    for j in range(n):
        s = a[..., j:, j] - jnp.einsum(
            "...ik,...k->...i", l[..., j:, :j], l[..., j, :j]
        )
        d = jnp.sqrt(jnp.maximum(s[..., 0], 1e-30))
        l = l.at[..., j:, j].set(s / d[..., None])
    return l


def _cho_solve_unrolled(l: Array, b: Array) -> Array:
    """Solves (L L^T) x = b by unrolled forward/back substitution."""
    n = l.shape[-1]
    y = jnp.zeros_like(b)
    for i in range(n):
        s = b[..., i] - jnp.einsum("...k,...k->...", l[..., i, :i], y[..., :i])
        y = y.at[..., i].set(s / l[..., i, i])
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        s = y[..., i] - jnp.einsum(
            "...k,...k->...", l[..., i + 1 :, i], x[..., i + 1 :]
        )
        x = x.at[..., i].set(s / l[..., i, i])
    return x


def _smallest_eigvec_12(ata: Array, iters: int = 3) -> Array:
    """Eigenvector of the smallest eigenvalue of a 12x12 PSD matrix.

    Inverse iteration: factor (A + εI) once with the unrolled Cholesky, then a
    fixed number of triangular solves. Converges at ratio (λmin+ε)/(λ2+ε) per
    step, so 2-3 iterations suffice; this runs vmapped over
    (crops x templates x 400 hypotheses) and avoids batched QR-based `eigh`.
    """
    # Scale-normalize so the regularization is meaningful regardless of the
    # data's units, then add a tiny ridge for the (near-)singular exact case.
    ata = ata / jnp.maximum(jnp.trace(ata), 1e-30)
    eps = 1e-9
    m = ata + eps * jnp.eye(12, dtype=ata.dtype)
    l = _cholesky_unrolled(m)
    # Deterministic, unstructured init (avoids being orthogonal to the target).
    v0 = jnp.cos(jnp.arange(12, dtype=ata.dtype) * 0.7 + 0.3)
    v0 = v0 / jnp.linalg.norm(v0)

    def body(v, _):
        w = _cho_solve_unrolled(l, v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30), None

    v, _ = jax.lax.scan(body, v0, None, length=iters)
    return v


def _cholesky_unrolled_lane_major(a: Array) -> Array:
    """As _cholesky_unrolled, but for [n, n, ...] matrices (batch trailing).

    With the (huge) hypothesis batch in the trailing/lane dimension, every
    elementwise op runs at full lane utilization instead of the ~12/128 a
    [..., 12, 12] layout gets.
    """
    n = a.shape[0]
    l = jnp.zeros_like(a)
    for j in range(n):
        s = a[j:, j] - jnp.einsum("ik...,k...->i...", l[j:, :j], l[j, :j])
        d = jnp.sqrt(jnp.maximum(s[0], 1e-30))
        l = l.at[j:, j].set(s / d[None])
    return l


def _cho_solve_lane_major(l: Array, b: Array) -> Array:
    """Solves (L L^T) x = b for [n, ...] right-hand sides (batch trailing)."""
    n = l.shape[0]
    y = jnp.zeros_like(b)
    for i in range(n):
        s = b[i] - jnp.einsum("k...,k...->...", l[i, :i], y[:i])
        y = y.at[i].set(s / l[i, i])
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        s = y[i] - jnp.einsum("k...,k...->...", l[i + 1 :, i], x[i + 1 :])
        x = x.at[i].set(s / l[i, i])
    return x


def _inverse_3x3_lane_major(m: Array) -> Array:
    """Closed-form inverse for [3, 3, ...] matrices (batch trailing)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack(
        [
            jnp.stack([co_a, -(b * i - c * h), b * f - c * e]),
            jnp.stack([co_b, a * i - c * g, -(a * f - c * d)]),
            jnp.stack([co_c, -(a * h - b * g), a * e - b * d]),
        ]
    )
    return adj * inv_det[None, None]


def _polar_rotation_lane_major(m: Array, iters: int = 8) -> Array:
    """Newton polar iteration for [3, 3, ...] matrices (batch trailing)."""
    norm = jnp.sqrt(jnp.sum(m * m, axis=(0, 1), keepdims=True))
    x = m * (jnp.sqrt(3.0) / jnp.maximum(norm, 1e-30))

    def body(x, _):
        inv = _inverse_3x3_lane_major(x)
        x_inv_t = jnp.swapaxes(inv, 0, 1)
        return 0.5 * (x + x_inv_t), None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


def _dlt_pose_many(
    pts3d: Array,
    rays: Array,
    ids: Array | None = None,
    validf: Array | None = None,
    counts: Array | None = None,
) -> tuple[Array, Array]:
    """Solves all RANSAC minimal sets of one correspondence set at once.

    Lane-major variant of vmap(_dlt_pose): the H hypotheses live in the
    trailing dimension through the Cholesky/inverse-iteration/polar chains.

    TPU-native formulation with NO per-hypothesis gathers: profiling showed
    the [H, 6] index gathers (pts3d[ids], rays[ids]) dominate this stage on
    TPU (~13 ms/batch at the bench shapes — gathers bypass the MXU and run
    element-at-a-time). Instead:

    - Hartley normalization uses the GLOBAL (masked) statistics of the
      correspondence set rather than per-hypothesis 6-point statistics —
      the same conditioning role, but shared across hypotheses.
    - The DLT normal matrix A^T A = [[S,0,-Su],[0,S,-Sv],[-Su,-Sv,Sw]] with
      symmetric 4x4 blocks S=Σxx^T, Su=Σu·xx^T, Sv=Σv·xx^T, Sw=Σ(u²+v²)xx^T
      over each hypothesis's 6 sampled homogeneous points. The per-point
      weighted outer products form a [N, 64] feature table computed ONCE;
      per-hypothesis blocks are then `counts [H, N] @ features [N, 64]` —
      one MXU matmul replaces all gathers and per-hypothesis block builds
      (duplicate samples are counted, matching gather semantics).

    Args:
        pts3d: [N, 3]; rays: [N, 2] (normalized); ids: [H, 6] indices into
            valid rows; validf: [N] 0/1 mask for the global statistics
            (defaults to all-valid).
    Returns:
        (R [H, 3, 3], t [H, 3]).
    """
    n = pts3d.shape[0]
    h = ids.shape[0] if ids is not None else counts.shape[0]
    dtype = pts3d.dtype
    if validf is None:
        validf = jnp.ones((n,), dtype)

    # Global masked Hartley normalization.
    cnt = jnp.maximum(jnp.sum(validf), 1.0)
    mu = jnp.sum(pts3d * validf[:, None], axis=0) / cnt  # [3]
    spread = jnp.sum(jnp.linalg.norm(pts3d - mu, axis=1) * validf) / cnt
    s = jnp.sqrt(3.0) / jnp.maximum(spread, 1e-12)  # scalar
    xn = (pts3d - mu) * s

    xh = jnp.concatenate([xn, jnp.ones((n, 1), dtype)], axis=1)  # [N, 4]
    u = rays[:, 0]
    v = rays[:, 1]
    outer = (xh[:, :, None] * xh[:, None, :]).reshape(n, 16)  # [N, 16]
    feats = jnp.concatenate(
        [
            outer,
            outer * u[:, None],
            outer * v[:, None],
            outer * (u * u + v * v)[:, None],
        ],
        axis=1,
    )  # [N, 64]

    # Sample-count matrix (XLA fuses the compare+sum into one pass) and the
    # single block-building matmul, directly in lane-major [.., H] layout.
    # The caller may pass `counts` directly (ransac_pnp builds it without
    # ever materializing index arrays).
    if counts is None:
        iota = jnp.arange(n, dtype=ids.dtype)
        counts = jnp.sum((ids[:, :, None] == iota).astype(dtype), axis=1)
    blocks = jnp.einsum("hn,nf->fh", counts, feats, precision=_P)  # [64, H]
    S = blocks[0:16].reshape(4, 4, h)
    Su = blocks[16:32].reshape(4, 4, h)
    Sv = blocks[32:48].reshape(4, 4, h)
    Sw = blocks[48:64].reshape(4, 4, h)
    Z = jnp.zeros_like(S)
    # The blocks are symmetric, so -Su/-Sv serve as their own transposes.
    m = jnp.concatenate(
        [
            jnp.concatenate([S, Z, -Su], axis=1),
            jnp.concatenate([Z, S, -Sv], axis=1),
            jnp.concatenate([-Su, -Sv, Sw], axis=1),
        ],
        axis=0,
    )  # [12, 12, H]

    trace = 2.0 * (S[0, 0] + S[1, 1] + S[2, 2] + S[3, 3]) \
        + Sw[0, 0] + Sw[1, 1] + Sw[2, 2] + Sw[3, 3]
    m = m / jnp.maximum(trace, 1e-30)[None, None]
    m = m + 1e-9 * jnp.eye(12, dtype=m.dtype)[..., None]
    l = _cholesky_unrolled_lane_major(m)
    v0 = jnp.cos(jnp.arange(12, dtype=m.dtype) * 0.7 + 0.3)
    v0 = (v0 / jnp.linalg.norm(v0))[:, None] * jnp.ones((1, h), dtype=m.dtype)

    def body(vv, _):
        w = _cho_solve_lane_major(l, vv)
        return w / jnp.maximum(jnp.sqrt(jnp.sum(w * w, axis=0)), 1e-30)[None], None

    vec, _ = jax.lax.scan(body, v0, None, length=4)  # [12, H]

    p = vec.reshape(3, 4, h)
    r_raw = p[:, :3]  # [3, 3, H]
    det = (
        r_raw[0, 0] * (r_raw[1, 1] * r_raw[2, 2] - r_raw[1, 2] * r_raw[2, 1])
        - r_raw[0, 1] * (r_raw[1, 0] * r_raw[2, 2] - r_raw[1, 2] * r_raw[2, 0])
        + r_raw[0, 2] * (r_raw[1, 0] * r_raw[2, 1] - r_raw[1, 1] * r_raw[2, 0])
    )
    sign = jnp.where(det < 0, -1.0, 1.0)
    scale = sign / jnp.cbrt(jnp.abs(det) + 1e-30)
    rot = _polar_rotation_lane_major(r_raw * scale[None, None])  # [3, 3, H]
    t_n = p[:, 3] * scale[None]  # [3, H]
    # Undo the (global) normalization: t = t_n/s - R mu.
    r_mu = jnp.einsum("ij...,j->i...", rot, mu)  # [3, H]
    t = t_n / s - r_mu
    return jnp.moveaxis(rot, -1, 0), t.T


def _dlt_pose(pts3d: Array, rays: Array, solver: str = "power") -> tuple[Array, Array]:
    """[R|t] from >=6 correspondences via DLT in normalized coordinates.

    Args:
        pts3d: [M, 3] model points.
        rays: [M, 2] normalized image coordinates (K^-1 applied).
        solver: "power" (fast shifted power iteration) or "eigh" (exact).
    Returns:
        (R [3,3], t [3]).
    """
    m = pts3d.shape[0]
    # Hartley-style normalization of the 3D points (center + isotropic scale):
    # keeps the 12x12 normal matrix well-conditioned for mm-scale models.
    mu = jnp.mean(pts3d, axis=0)
    spread = jnp.mean(jnp.linalg.norm(pts3d - mu, axis=1))
    s = jnp.sqrt(3.0) / jnp.maximum(spread, 1e-12)
    xn = (pts3d - mu) * s

    ones = jnp.ones((m, 1), dtype=pts3d.dtype)
    zeros = jnp.zeros((m, 4), dtype=pts3d.dtype)
    xh = jnp.concatenate([xn, ones], axis=1)  # [M, 4]
    u = rays[:, 0:1]
    v = rays[:, 1:2]
    row_u = jnp.concatenate([xh, zeros, -u * xh], axis=1)  # [M, 12]
    row_v = jnp.concatenate([zeros, xh, -v * xh], axis=1)  # [M, 12]
    a = jnp.concatenate([row_u, row_v], axis=0)  # [2M, 12]
    ata = jnp.einsum("mi,mj->ij", a, a, precision=_P)
    if solver == "power":
        vec = _smallest_eigvec_12(ata)
    else:
        _, vecs = jnp.linalg.eigh(ata)
        vec = vecs[:, 0]
    p = vec.reshape(3, 4)

    r_raw = p[:, :3]
    det = jnp.linalg.det(r_raw)
    sign = jnp.where(det < 0, -1.0, 1.0)
    scale = sign / jnp.cbrt(jnp.abs(det) + 1e-30)
    # Polar (not SVD) orthogonalization: batches over 10^4+ RANSAC hypotheses
    # without serializing into tiny LAPACK kernels.
    r = geometry.polar_rotation(r_raw * scale)
    t_n = p[:, 3] * scale
    # Undo the normalization: x ~ R((X-mu)s) + t_n  =>  t = t_n/s - R mu.
    t = t_n / s - r @ mu
    return r, t


def _project(r: Array, t: Array, pts3d: Array, k_f: Array, k_c: Array) -> Array:
    """Pinhole projection of [N, 3] model points to pixels given [R|t]."""
    cam = jnp.einsum("ij,nj->ni", r, pts3d, precision=_P) + t
    z = jnp.where(jnp.abs(cam[:, 2:3]) < 1e-9, 1e-9, cam[:, 2:3])
    return cam[:, :2] / z * k_f + k_c


@partial(
    jax.jit,
    static_argnames=(
        "num_hypotheses", "refine_lm", "lm_iters", "use_fused_score", "lo_iters"
    ),
)
def ransac_pnp(
    coord_2d: Array,
    coord_3d: Array,
    valid: Array,
    k_f: Array,
    k_c: Array,
    key: Array,
    num_hypotheses: int = 400,
    inlier_thresh: float = 10.0,
    refine_lm: bool = True,
    lm_iters: int = 10,
    use_fused_score: Optional[bool] = None,
    lo_iters: int = 2,
) -> PnPResult:
    """RANSAC-PnP on one (masked) correspondence set.

    Args:
        coord_2d: [N, 2] pixel coordinates.
        coord_3d: [N, 3] model points.
        valid: [N] bool correspondence validity (padding excluded).
        k_f: [2] (fx, fy); k_c: [2] (cx, cy).
        key: PRNG key for hypothesis sampling.
        num_hypotheses: fixed RANSAC iteration count
            (reference config: 400, configs/infer/lmo.json:19).
        inlier_thresh: pixel reprojection threshold (reference: 10 px).
        lo_iters: local-optimization rounds (LO-RANSAC) applied to the best
            hypothesis — see `lo_refine` for the rationale and the measured
            cv2 gap it closes. The batched pipelines pass 0 here and run
            `lo_refine` on the winning template only.

    Matches the reference contract: quality = inlier count, success requires a
    non-degenerate solve with >= 6 inliers (reference: utils/pnp_util.py:46-79).
    """
    n = coord_2d.shape[0]
    dtype = jnp.float32
    pts2d = coord_2d.astype(dtype)
    pts3d = coord_3d.astype(dtype)
    validf = valid.astype(dtype)

    # Normalized image coordinates.
    rays = (pts2d - k_c) / k_f

    # --- hypothesis sampling: 6 uniform draws over VALID correspondences ---
    # Gather-free: each valid point's rank (exclusive prefix count) is its
    # position in the compacted valid ordering; a uniform draw in [0, count)
    # selects the point whose rank matches. The [H, 6] draws become the
    # per-point sample-count matrix [H, N] by direct comparison — no argsort,
    # no scatter, no index gathers (the gathers profiled at ~13 ms/batch on
    # TPU), and duplicate draws accumulate counts exactly like repeated
    # indices would.
    validi = valid.astype(jnp.int32)
    rank = jnp.cumsum(validi) - validi  # exclusive prefix sum
    count = jnp.maximum(jnp.sum(validi), 1)
    u = jax.random.randint(key, (num_hypotheses, 6), 0, n) % count  # [H, 6]
    # Accumulate the 6 draws as separate [H, N] compares instead of reducing
    # a broadcast [H, 6, N] — same result, but XLA fuses the 2D compares into
    # the accumulation without materializing the 3D intermediate.
    rank_valid = jnp.where(valid, rank, -1)[None, :]  # [1, N]
    counts = jnp.zeros((num_hypotheses, n), dtype)
    for j in range(6):
        counts = counts + (u[:, j : j + 1] == rank_valid).astype(dtype)

    # Lane-major batched DLT: hypotheses ride the lane dimension through the
    # Cholesky/polar chains (full lane utilization vs 12/128 for the naive
    # per-hypothesis vmap).
    rs, ts = _dlt_pose_many(
        pts3d, rays, validf=validf, counts=counts
    )  # [H,3,3], [H,3]
    # Degenerate minimal sets (collinear / duplicated points) can yield
    # non-finite solves; sanitize so they score zero instead of poisoning
    # argmax/LM (cv2 raises and the reference catches, pnp_util.py:56-63).
    finite = jnp.isfinite(rs).all(axis=(1, 2)) & jnp.isfinite(ts).all(axis=1)
    rs = jnp.where(finite[:, None, None], rs, jnp.eye(3, dtype=dtype))
    ts = jnp.where(finite[:, None], ts, jnp.asarray([0.0, 0.0, 1.0], dtype=dtype))

    # --- score all hypotheses by masked inlier count ------------------------
    if use_fused_score is None:
        # Trace-time platform check: the Pallas kernel needs a TPU (or
        # interpreter); CPU test meshes take the XLA path.
        use_fused_score = jax.local_devices()[0].platform == "tpu"
    if use_fused_score:
        # VMEM-fused scoring: the XLA path materializes [H, N, 3] camera
        # points in HBM per correspondence set (profiled at ~3.5 ms of the
        # solve stage's ~8.5 ms at batch 64; benchmarks/micro_pnp.py).
        counts = score_hypotheses_fused(
            pts2d, pts3d, validf, rs, ts, k_f, k_c, inlier_thresh
        )
        best = jnp.argmax(counts)
        r_best, t_best = rs[best], ts[best]
        # Inlier mask recomputed for the winner only (one [N] pass).
        proj = _project(r_best, t_best, pts3d, k_f, k_c)
        err2 = jnp.sum(jnp.square(proj - pts2d), axis=-1)
        cam_z = (
            jnp.einsum("ij,nj->ni", r_best, pts3d, precision=_P) + t_best
        )[:, 2]
        inliers = (err2 < inlier_thresh**2) & valid & (cam_z > 0)
        count = counts[best]
    else:
        def score_one(r, t):
            proj = _project(r, t, pts3d, k_f, k_c)
            err2 = jnp.sum(jnp.square(proj - pts2d), axis=-1)
            cam_z = (jnp.einsum("ij,nj->ni", r, pts3d, precision=_P) + t)[:, 2]
            inl = (err2 < inlier_thresh**2) & valid & (cam_z > 0)
            return jnp.sum(inl.astype(dtype)), inl

        counts, inlier_masks = jax.vmap(score_one)(rs, ts)
        best = jnp.argmax(counts)
        r_best, t_best = rs[best], ts[best]
        inliers = inlier_masks[best]
        count = counts[best]

    # --- local optimization (LO-RANSAC): refit on the full inlier set ------
    if lo_iters > 0:
        r_best, t_best, inliers, count = lo_refine(
            r_best, t_best, pts2d, pts3d, valid, k_f, k_c,
            inlier_thresh=inlier_thresh, iters=lo_iters,
            inliers=inliers, count=count,
        )

    # --- masked LM refinement on the best hypothesis's inliers -------------
    if refine_lm:
        r_ref, t_ref = refine_pose_lm(
            r_best, t_best, pts2d, pts3d, inliers, k_f, k_c, iters=lm_iters
        )
        # Keep the refinement only if it stayed finite (degenerate inlier sets
        # can blow up the normal equations).
        ok = jnp.isfinite(r_ref).all() & jnp.isfinite(t_ref).all()
        r_best = jnp.where(ok, r_ref, r_best)
        t_best = jnp.where(ok, t_ref, t_best)
        # Recompute the inlier set with the refined pose (cv2 keeps the RANSAC
        # inlier set; we keep it too for quality, refinement only sharpens R|t).

    success = count >= 6.0
    return PnPResult(success=success, R=r_best, t=t_best, inliers=inliers, quality=count)


def lo_refine(
    r: Array,
    t: Array,
    pts2d: Array,
    pts3d: Array,
    valid: Array,
    k_f: Array,
    k_c: Array,
    inlier_thresh: float = 10.0,
    iters: int = 2,
    inliers: Optional[Array] = None,
    count: Optional[Array] = None,
) -> tuple[Array, Array, Array, Array]:
    """Local optimization (LO-RANSAC): overdetermined DLT refits on the
    current pose's full inlier set.

    Round i fits on the inliers of a WIDENED threshold (annealed 2x -> 1x: a
    coarse 6-point model's true inliers scatter past the base threshold, so
    fitting on the widened set first pulls the model into the basin) and
    accepts by the BASE-threshold count, monotonically. cv2's
    SOLVEPNP_ITERATIVE minimal solver internally polishes each 6-point model,
    so its raw hypotheses are tighter than an algebraic 6-point DLT at the
    same iteration budget; the cross-implementation harness
    (benchmarks/cross_parity.py) measured the gap directly on outlier-heavy
    correspondence sets (AR 0.33 vs cv2's 1.0 at 400 iters) and two refit
    rounds — two overdetermined solves — close it. In the batched pipelines
    LO runs on the WINNING template only (selection agreement without LO was
    measured 1.0), same policy as LM (pipeline/inference.py).

    Returns (R, t, inliers, count); monotone in base-threshold inlier count
    relative to the passed-in pose (identity when iters=0).
    """
    dtype = jnp.float32
    pts2d = pts2d.astype(dtype)
    pts3d = pts3d.astype(dtype)
    validf = valid.astype(dtype)
    rays = (pts2d - k_c) / k_f

    def _count_inliers(rm, tv, thresh):
        proj = _project(rm, tv, pts3d, k_f, k_c)
        err2 = jnp.sum(jnp.square(proj - pts2d), axis=-1)
        cam_z = (jnp.einsum("ij,nj->ni", rm, pts3d, precision=_P) + tv)[:, 2]
        inl = (err2 < thresh**2) & valid & (cam_z > 0)
        return inl, jnp.sum(inl.astype(dtype))

    r_best, t_best = r, t
    if inliers is None or count is None:
        inliers, count = _count_inliers(r_best, t_best, inlier_thresh)

    for li in range(iters):
        widen = 2.0 if li == 0 else 1.0
        fit_mask, _ = _count_inliers(r_best, t_best, inlier_thresh * widen)
        r_lo, t_lo = _dlt_pose_many(
            pts3d, rays, validf=validf,
            counts=fit_mask.astype(dtype)[None, :],
        )
        r_lo, t_lo = r_lo[0], t_lo[0]
        finite_lo = jnp.isfinite(r_lo).all() & jnp.isfinite(t_lo).all()
        r_lo = jnp.where(finite_lo, r_lo, r_best)
        t_lo = jnp.where(finite_lo, t_lo, t_best)
        inl_lo, cnt_lo = _count_inliers(r_lo, t_lo, inlier_thresh)
        better = finite_lo & (cnt_lo >= count)
        r_best = jnp.where(better, r_lo, r_best)
        t_best = jnp.where(better, t_lo, t_best)
        inliers = jnp.where(better, inl_lo, inliers)
        count = jnp.where(better, cnt_lo, count)
    return r_best, t_best, inliers, count


def refine_pose_lm(
    r: Array,
    t: Array,
    pts2d: Array,
    pts3d: Array,
    weight_mask: Array,
    k_f: Array,
    k_c: Array,
    iters: int = 10,
) -> tuple[Array, Array]:
    """Damped Gauss-Newton (LM) on the reprojection error over masked points.

    Pose updates are LEFT-multiplied SE(3) increments (cam' = exp(dw) cam +
    dt), which makes the residual Jacobian closed-form — d cam/d dw =
    -[cam]_x, d cam/d dt = I — so each iteration is ONE projection pass plus
    a handful of elementwise ops, instead of the 6 extra forward evaluations
    `jacfwd` through the rodrigues chain costs. The 6x6 normal system solves
    with adaptive damping and accept/reject; converges to the same
    reprojection minimum as cv2.solvePnPRefineLM (reference:
    utils/pnp_util.py:66-74).
    """
    w = weight_mask.astype(jnp.float32)
    dtype = jnp.float32
    fx, fy = k_f[0], k_f[1]

    def cost_at(rot, tv):
        cam = jnp.einsum("ij,nj->ni", rot, pts3d, precision=_P) + tv
        z = jnp.where(jnp.abs(cam[:, 2]) < 1e-9, 1e-9, cam[:, 2])
        proj = cam[:, :2] / z[:, None] * k_f + k_c
        res = (proj - pts2d) * w[:, None]  # [N, 2]
        return cam, z, res, jnp.sum(res * res)

    def step(carry, _):
        rot, tv, lam = carry
        cam, z, res, cost = cost_at(rot, tv)
        iz = 1.0 / z
        a = cam[:, 0] * iz  # normalized image coords
        b = cam[:, 1] * iz
        # J = d(proj)/d(cam) @ [-[cam]_x | I], rows weighted like res, with
        # d(proj)/d(cam) = [[f/z, 0, -f x/z^2], [0, f/z, -f y/z^2]]:
        #   du/d(dw, dt) = fx * [-ab, 1+a^2, -b | 1/z, 0, -a/z]
        #   dv/d(dw, dt) = fy * [-(1+b^2), ab, a | 0, 1/z, -b/z]
        wfx = w * fx
        wfy = w * fy
        zero = jnp.zeros_like(a)
        ju = jnp.stack(
            [
                -wfx * a * b, wfx * (1.0 + a * a), -wfx * b,
                wfx * iz, zero, -wfx * a * iz,
            ],
            axis=1,
        )  # [N, 6]
        jv = jnp.stack(
            [
                -wfy * (1.0 + b * b), wfy * a * b, wfy * a,
                zero, wfy * iz, -wfy * b * iz,
            ],
            axis=1,
        )  # [N, 6]
        jtj = (
            jnp.einsum("ni,nj->ij", ju, ju, precision=_P)
            + jnp.einsum("ni,nj->ij", jv, jv, precision=_P)
        )
        jtr = jnp.einsum("ni,n->i", ju, res[:, 0], precision=_P) + jnp.einsum(
            "ni,n->i", jv, res[:, 1], precision=_P
        )

        # 6x6 SPD solve via the unrolled Cholesky (jnp.linalg.solve lowers to
        # pivoted LU, which serializes badly for tiny batched systems on TPU).
        damped = jtj + lam * jnp.eye(6, dtype=dtype)
        delta = _cho_solve_unrolled(_cholesky_unrolled(damped), jtr)
        dw, dt = -delta[:3], -delta[3:]
        dr = geometry.rodrigues(dw)
        rot_new = dr @ rot
        tv_new = dr @ tv + dt
        _, _, _, new_cost = cost_at(rot_new, tv_new)
        improved = new_cost < cost
        rot = jnp.where(improved, rot_new, rot)
        tv = jnp.where(improved, tv_new, tv)
        lam = jnp.clip(
            jnp.where(improved, lam * 0.3, lam * 3.0), 1e-9, 1e6
        )
        return (rot, tv, lam), None

    (rot, tv, _), _ = jax.lax.scan(
        step,
        (r.astype(dtype), t.astype(dtype), jnp.asarray(1e-3, dtype)),
        None,
        length=iters,
    )
    return rot, tv
