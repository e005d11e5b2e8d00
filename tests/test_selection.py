"""Sort-free smallest-k selection (ops/selection.py) and the compacted
buddy-selection path built on it."""

import jax
import jax.numpy as jnp
import numpy as np

from foundpose_tpu.ops.selection import (
    INVALID_SENTINEL,
    compact_smallest_k,
)


def test_compact_smallest_k_matches_sort(rng):
    q, k = 900, 300
    vals = rng.uniform(0, 600, size=(4, q)).astype(np.float32)
    onehot, sel = jax.jit(lambda v: compact_smallest_k(v, k))(jnp.asarray(vals))
    onehot, sel = np.asarray(onehot), np.asarray(sel)
    for row in range(4):
        assert sel[row].sum() == k
        assert onehot[row].sum() == k
        # One-hot columns each select exactly one element.
        assert (onehot[row].sum(axis=0) == 1.0).all()
        got = np.sort(onehot[row].T @ vals[row])
        exp = np.sort(vals[row])[:k]
        np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_compact_smallest_k_ties_take_lowest_indices():
    # 10 identical values; k=4 must take the 4 lowest indices (stable order,
    # matching lax.top_k's tie behavior).
    vals = jnp.full((10,), 7.25, jnp.float32)
    onehot, sel = compact_smallest_k(vals, 4)
    ids = np.nonzero(np.asarray(sel))[0]
    np.testing.assert_array_equal(ids, [0, 1, 2, 3])
    # Slots are index-ordered.
    np.testing.assert_array_equal(
        np.asarray(onehot).T @ np.arange(10.0, dtype=np.float32), [0, 1, 2, 3]
    )


def test_compact_smallest_k_fewer_valid_than_k():
    vals = jnp.asarray([1.0, INVALID_SENTINEL, 0.5, INVALID_SENTINEL, 2.0])
    onehot, sel = compact_smallest_k(vals, 4)
    comp = np.asarray(onehot).T @ np.asarray(vals)
    valid = comp < INVALID_SENTINEL * 0.5
    assert valid.sum() == 3
    np.testing.assert_allclose(np.sort(comp[valid]), [0.5, 1.0, 2.0])


def test_compact_buddies_matches_exact_path(rng):
    """The approx (compacted) batch path selects the same buddy multiset as
    the exact lax.top_k path and carries consistent channels."""
    from foundpose_tpu.pose import corresp

    b, tn, q, f, d, top_k = 2, 3, 100, 64, 8, 30
    qpts = jnp.asarray(rng.uniform(0, 400, size=(q, 2)).astype(np.float32))
    qf = jnp.asarray(rng.normal(size=(b, q, d)).astype(np.float32))
    qmask = jnp.asarray(rng.uniform(size=(b, q)) > 0.2)
    bank = jnp.asarray(rng.normal(size=(f, 32, d)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(f, 32, 3)).astype(np.float32))
    bmask = jnp.asarray(rng.uniform(size=(f, 32)) > 0.2)
    tids = jnp.asarray(rng.integers(0, f, size=(b, tn)), dtype=jnp.int32)
    tscores = jnp.ones((b, tn), jnp.float32)

    exact = corresp.establish_correspondences_batch(
        qpts, qf, qmask, tids, tscores, bank, verts, bmask,
        top_k=top_k, approx_topk=False,
    )
    approx = corresp.establish_correspondences_batch(
        qpts, qf, qmask, tids, tscores, bank, verts, bmask,
        top_k=top_k, approx_topk=True,
    )
    for i in range(b):
        for j in range(tn):
            ev, av = np.asarray(exact.valid[i, j]), np.asarray(approx.valid[i, j])
            assert ev.sum() == av.sum()
            # Same buddy set (query ids), order-independent.
            e_ids = set(np.asarray(exact.coord_2d_ids[i, j])[ev].tolist())
            a_ids = set(np.asarray(approx.coord_2d_ids[i, j])[av].tolist())
            assert e_ids == a_ids
            # Channels are consistent per id: rebuild (id -> dist/3d) maps.
            e_map = {
                int(qid): (
                    float(np.asarray(exact.cycle_dists[i, j])[s]),
                    np.asarray(exact.coord_3d[i, j])[s],
                    np.asarray(exact.coord_2d[i, j])[s],
                )
                for s, qid in enumerate(np.asarray(exact.coord_2d_ids[i, j]))
                if ev[s]
            }
            for s, qid in enumerate(np.asarray(approx.coord_2d_ids[i, j])):
                if not av[s]:
                    continue
                ed, e3, e2 = e_map[int(qid)]
                np.testing.assert_allclose(
                    float(np.asarray(approx.cycle_dists[i, j])[s]), ed,
                    rtol=1e-5, atol=1e-5,
                )
                np.testing.assert_allclose(
                    np.asarray(approx.coord_3d[i, j])[s], e3, rtol=1e-5,
                    atol=1e-6,
                )
                np.testing.assert_allclose(
                    np.asarray(approx.coord_2d[i, j])[s], e2, rtol=1e-6
                )


def test_buddies_kernel_matches_xla_approx_path(rng):
    """The fused Pallas buddies kernel (interpreter mode) produces the same
    correspondences as the XLA approx path."""
    from foundpose_tpu.pose import corresp

    b, tn, q, f, d, top_k = 2, 3, 64, 48, 16, 20
    qpts = jnp.asarray(rng.uniform(0, 400, size=(q, 2)).astype(np.float32))
    qf = jnp.asarray(rng.normal(size=(b, q, d)).astype(np.float32))
    qmask = jnp.asarray(rng.uniform(size=(b, q)) > 0.2)
    bank = jnp.asarray(rng.normal(size=(f, 32, d)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(f, 32, 3)).astype(np.float32))
    bmask = jnp.asarray(rng.uniform(size=(f, 32)) > 0.2)
    tids = jnp.asarray(rng.integers(0, f, size=(b, tn)), dtype=jnp.int32)
    tscores = jnp.ones((b, tn), jnp.float32)

    args = (qpts, qf, qmask, tids, tscores, bank, verts, bmask)
    xla = corresp.establish_correspondences_batch(
        *args, top_k=top_k, approx_topk=True, use_kernel=False
    )
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        fused = corresp.establish_correspondences_batch(
            *args, top_k=top_k, approx_topk=True, use_kernel=True
        )

    np.testing.assert_array_equal(
        np.asarray(fused.valid), np.asarray(xla.valid)
    )
    for i in range(b):
        for j in range(tn):
            v = np.asarray(xla.valid[i, j])
            np.testing.assert_array_equal(
                np.asarray(fused.coord_2d_ids[i, j])[v],
                np.asarray(xla.coord_2d_ids[i, j])[v],
            )
            np.testing.assert_array_equal(
                np.asarray(fused.nn_vertex_ids[i, j])[v],
                np.asarray(xla.nn_vertex_ids[i, j])[v],
            )
            np.testing.assert_allclose(
                np.asarray(fused.cycle_dists[i, j])[v],
                np.asarray(xla.cycle_dists[i, j])[v],
                rtol=1e-5, atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(fused.coord_3d[i, j])[v],
                np.asarray(xla.coord_3d[i, j])[v],
                rtol=1e-5, atol=1e-5,
            )
