import jax
import jax.numpy as jnp
import numpy as np

from foundpose_tpu.ops.buddies_kernel import dual_argmin


def test_dual_argmin_matches_jnp(rng):
    b, t, q, f, d = 2, 3, 70, 50, 16
    qf = rng.normal(size=(b, q, d)).astype(np.float32)
    bf = rng.normal(size=(b, t, f, d)).astype(np.float32)
    qm = rng.uniform(size=(b, q)) > 0.3
    bm = rng.uniform(size=(b, t, f)) > 0.3

    q2o, o2q = dual_argmin(
        jnp.asarray(qf), jnp.asarray(bf), jnp.asarray(qm), jnp.asarray(bm),
        interpret=True,
    )
    q2o, o2q = np.asarray(q2o), np.asarray(o2q)

    for bi in range(b):
        for ti in range(t):
            dist = ((qf[bi][:, None] - bf[bi, ti][None]) ** 2).sum(-1)
            dist = np.where(qm[bi][:, None] & bm[bi, ti][None], dist, np.inf)
            exp_q2o = dist.argmin(1)
            exp_o2q = dist.argmin(0)
            # Compare only where a valid minimum exists.
            row_ok = np.isfinite(dist.min(1))
            col_ok = np.isfinite(dist.min(0))
            np.testing.assert_array_equal(q2o[bi, ti][row_ok], exp_q2o[row_ok])
            np.testing.assert_array_equal(o2q[bi, ti][col_ok], exp_o2q[col_ok])
