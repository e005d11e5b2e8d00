import cv2
import jax
import jax.numpy as jnp
import numpy as np
from sklearn.decomposition import PCA as SkPCA

from foundpose_tpu.ops import kmeans as kmeans_mod
from foundpose_tpu.ops import knn, morphology, pca, sampling, tfidf


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------


def test_knn_l2_matches_numpy(rng):
    q = rng.normal(size=(33, 16)).astype(np.float32)
    bank = rng.normal(size=(121, 16)).astype(np.float32)
    d, ids = knn.knn_search(jnp.asarray(q), jnp.asarray(bank), k=5)
    full = ((q[:, None, :] - bank[None, :, :]) ** 2).sum(-1)
    exp_ids = np.argsort(full, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(ids), exp_ids)
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(full, exp_ids, 1), rtol=1e-4, atol=1e-4
    )


def test_knn_masked(rng):
    q = rng.normal(size=(7, 8)).astype(np.float32)
    bank = rng.normal(size=(40, 8)).astype(np.float32)
    mask = np.zeros(40, dtype=bool)
    mask[:10] = True
    _, ids = knn.knn_search(jnp.asarray(q), jnp.asarray(bank), k=3, bank_mask=jnp.asarray(mask))
    assert np.asarray(ids).max() < 10


def test_knn_tiled_matches_dense(rng):
    q = rng.normal(size=(50, 32)).astype(np.float32)
    bank = rng.normal(size=(5000, 32)).astype(np.float32)
    d1, i1 = knn.knn_search(jnp.asarray(q), jnp.asarray(bank), k=4)
    d2, i2 = knn.knn_search_tiled(jnp.asarray(q), jnp.asarray(bank), k=4, tile=768)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-4)


def test_knn_cosine(rng):
    q = rng.normal(size=(5, 12)).astype(np.float32)
    bank = rng.normal(size=(30, 12)).astype(np.float32)
    d, ids = knn.knn_search(jnp.asarray(q), jnp.asarray(bank), k=2, metric="cosine")
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    bn = bank / np.linalg.norm(bank, axis=1, keepdims=True)
    sims = qn @ bn.T
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.argmax(sims, axis=1))


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans_recovers_separated_clusters(rng):
    centers = np.array([[0, 0], [10, 10], [-10, 10], [10, -10]], dtype=np.float32)
    pts = np.concatenate(
        [c + 0.3 * rng.normal(size=(50, 2)).astype(np.float32) for c in centers]
    )
    res = kmeans_mod.kmeans(jnp.asarray(pts), 4, jax.random.PRNGKey(0), num_iters=25)
    got = np.sort(np.asarray(res.centroids), axis=0)
    exp = np.sort(centers, axis=0)
    np.testing.assert_allclose(got, exp, atol=0.3)
    # Assignments are consistent within each generated blob.
    a = np.asarray(res.assignments)
    for i in range(4):
        blob = a[i * 50 : (i + 1) * 50]
        assert (blob == blob[0]).all()
    assert np.asarray(res.distances).mean() < 0.5


def test_kmeans_masked_ignores_padding(rng):
    pts = np.concatenate(
        [
            np.array([[0.0, 0.0]]) + 0.1 * rng.normal(size=(30, 2)),
            np.array([[5.0, 5.0]]) + 0.1 * rng.normal(size=(30, 2)),
            np.full((40, 2), 1e6),  # padding rows
        ]
    ).astype(np.float32)
    mask = np.concatenate([np.ones(60, bool), np.zeros(40, bool)])
    res = kmeans_mod.kmeans(
        jnp.asarray(pts), 2, jax.random.PRNGKey(1), num_iters=20, sample_mask=jnp.asarray(mask)
    )
    c = np.sort(np.asarray(res.centroids), axis=0)
    np.testing.assert_allclose(c, [[0, 0], [5, 5]], atol=0.2)


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------


def test_pca_matches_sklearn(rng):
    x = rng.normal(size=(500, 24)).astype(np.float32) @ rng.normal(size=(24, 24)).astype(
        np.float32
    )
    ours = pca.fit_pca(jnp.asarray(x), num_components=8)
    sk = SkPCA(n_components=8).fit(x)
    np.testing.assert_allclose(np.asarray(ours.mean), sk.mean_, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ours.explained_variance), sk.explained_variance_, rtol=1e-3
    )
    # Components match up to sign.
    dots = np.abs(np.sum(np.asarray(ours.components) * sk.components_, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)
    # Transforms match up to per-component sign.
    y_ours = np.asarray(pca.pca_transform(ours, jnp.asarray(x[:10])))
    y_sk = sk.transform(x[:10])
    signs = np.sign(np.sum(np.asarray(ours.components) * sk.components_, axis=1))
    np.testing.assert_allclose(y_ours * signs, y_sk, atol=2e-2)


def test_pca_whiten_unit_variance(rng):
    x = rng.normal(size=(1000, 16)).astype(np.float32) * np.linspace(1, 10, 16).astype(
        np.float32
    )
    p = pca.fit_pca(jnp.asarray(x), num_components=4, whiten=True)
    y = np.asarray(pca.pca_transform(p, jnp.asarray(x)))
    np.testing.assert_allclose(y.std(axis=0), 1.0, atol=0.1)


def test_pca_inverse_roundtrip(rng):
    x = rng.normal(size=(200, 12)).astype(np.float32)
    p = pca.fit_pca(jnp.asarray(x), num_components=12)
    y = pca.pca_transform(p, jnp.asarray(x))
    back = np.asarray(pca.pca_inverse_transform(p, y))
    np.testing.assert_allclose(back, x, atol=1e-3)


# ---------------------------------------------------------------------------
# tf-idf
# ---------------------------------------------------------------------------


def reference_tfidf(word_ids, word_dists, idfs, soft, sigma2):
    """Literal numpy re-statement of the reference math (template_util.py:31-71)."""
    if soft:
        w = np.exp(-(word_dists**2) / (2 * sigma2))
    else:
        w = np.ones_like(word_dists)
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    tf = (w / word_ids.shape[0]).reshape(-1)
    idf = idfs[word_ids.reshape(-1)]
    desc = np.zeros(len(idfs), dtype=np.float64)
    np.add.at(desc, word_ids.reshape(-1), tf * idf)
    return desc


def test_calc_tfidf_matches_reference(rng):
    n, k, w = 50, 3, 32
    word_ids = rng.integers(0, w, size=(n, k))
    word_dists = np.abs(rng.normal(size=(n, k))).astype(np.float32)
    idfs = np.abs(rng.normal(size=w)).astype(np.float32)
    for soft in [False, True]:
        got = np.asarray(
            tfidf.calc_tfidf(
                jnp.asarray(word_ids),
                jnp.asarray(word_dists),
                jnp.asarray(idfs),
                soft_assign=soft,
                soft_sigma_squared=10.0,
            )
        )
        exp = reference_tfidf(word_ids, word_dists, idfs, soft, 10.0)
        np.testing.assert_allclose(got, exp, atol=1e-5)


def test_calc_tfidf_masked_equals_filtered(rng):
    n, k, w = 40, 3, 16
    word_ids = rng.integers(0, w, size=(n, k))
    word_dists = np.abs(rng.normal(size=(n, k))).astype(np.float32)
    idfs = np.abs(rng.normal(size=w)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.4
    got = np.asarray(
        tfidf.calc_tfidf(
            jnp.asarray(word_ids),
            jnp.asarray(word_dists),
            jnp.asarray(idfs),
            feature_mask=jnp.asarray(mask.astype(np.float32)),
        )
    )
    exp = reference_tfidf(word_ids[mask], word_dists[mask], idfs, False, 10.0)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_word_idfs(rng):
    # 3 templates, 4 words: word 0 in all, word 1 in one, word 3 in none.
    feat_words = np.array([0, 0, 1, 0, 2, 0, 2])
    feat_tpls = np.array([0, 0, 0, 1, 1, 2, 2])
    idfs = np.asarray(
        tfidf.calc_word_idfs(jnp.asarray(feat_words), jnp.asarray(feat_tpls), 4, 3)
    )
    np.testing.assert_allclose(idfs[0], np.log(3 / 3), atol=1e-6)
    np.testing.assert_allclose(idfs[1], np.log(3 / 1), atol=1e-6)
    np.testing.assert_allclose(idfs[2], np.log(3 / 2), atol=1e-6)
    # Unused words are clamped to the max finite idf (reference yields inf,
    # which would poison soft-assigned queries).
    np.testing.assert_allclose(idfs[3], np.log(3.0), atol=1e-6)


def test_tfidf_retrieval_finds_self(rng):
    """A query equal to one template's features must retrieve that template first."""
    t, per, d, w = 12, 30, 8, 16
    words = rng.normal(size=(w, d)).astype(np.float32)
    # Each template picks features near a distinct subset of words.
    feats = []
    tpl_ids = []
    for i in range(t):
        sel = rng.choice(w, size=4, replace=False)
        f = words[rng.choice(sel, size=per)] + 0.05 * rng.normal(size=(per, d)).astype(
            np.float32
        )
        feats.append(f)
        tpl_ids.append(np.full(per, i))
    feats = np.concatenate(feats).astype(np.float32)
    tpl_ids = np.concatenate(tpl_ids)

    cfg = tfidf.TfidfConfig(knn_k=3)
    descs, idfs = tfidf.calc_template_tfidf_descriptors(
        jnp.asarray(feats), jnp.asarray(tpl_ids), jnp.asarray(words), t, cfg
    )
    ids, scores = tfidf.tfidf_retrieve(
        jnp.asarray(feats[5 * per : 6 * per]),
        jnp.asarray(words),
        idfs,
        descs,
        top_n=3,
        config=cfg,
    )
    assert int(np.asarray(ids)[0]) == 5
    assert float(np.asarray(scores)[0]) > 0.99


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_grid_points_cell_centers():
    pts = np.asarray(sampling.grid_points((42, 28), 14.0))
    assert pts.shape == (6, 2)
    np.testing.assert_allclose(pts[0], [7.0, 7.0])
    np.testing.assert_allclose(pts[-1], [35.0, 21.0])


def test_sample_feature_map_matches_torch_grid_sample(rng):
    import torch
    import torch.nn.functional as F

    fm = rng.normal(size=(30, 30, 5)).astype(np.float32)
    pts = rng.uniform(10, 410, size=(64, 2)).astype(np.float32)
    got = np.asarray(
        sampling.sample_feature_map(jnp.asarray(fm), jnp.asarray(pts), (420, 420))
    )
    uv = 2.0 / np.array([420.0, 420.0]) * pts - 1.0
    t_fm = torch.from_numpy(fm).permute(2, 0, 1).unsqueeze(0)
    grid = torch.from_numpy(uv.astype(np.float32)).unsqueeze(0).unsqueeze(2)
    exp = F.grid_sample(t_fm, grid, align_corners=False)[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_points_in_mask():
    mask = np.zeros((10, 10), dtype=np.uint8)
    mask[4:8, 2:6] = 1
    pts = jnp.asarray([[2.6, 4.6], [0.2, 0.2], [9.4, 9.4], [5.0, 6.0]])
    valid = np.asarray(sampling.points_in_mask(pts, jnp.asarray(mask)))
    np.testing.assert_array_equal(valid, [True, False, False, True])


def test_subsample_points(rng):
    pts = jnp.asarray(rng.normal(size=(100, 2)).astype(np.float32))
    valid = jnp.ones(100, dtype=bool)
    out = np.asarray(sampling.subsample_points(pts, valid, 30, jax.random.PRNGKey(0)))
    assert out.sum() == 30


# ---------------------------------------------------------------------------
# morphology
# ---------------------------------------------------------------------------


def test_erosion_matches_cv2(rng):
    mask = (rng.uniform(size=(40, 50)) > 0.4).astype(np.uint8)
    for k in [3, 5]:
        got = np.asarray(morphology.erode(jnp.asarray(mask), k, border="replicate"))
        exp = cv2.erode(mask, np.ones((k, k), np.uint8))
        np.testing.assert_array_equal(got, exp)


def test_erosion_zero_border_matches_padded_cv2(rng):
    # kornia-style zero border == cv2 erosion of a zero-padded image.
    mask = (rng.uniform(size=(40, 50)) > 0.4).astype(np.uint8)
    for k in [3, 5]:
        got = np.asarray(morphology.erode(jnp.asarray(mask), k, border="zero"))
        pad = k // 2
        padded = np.pad(mask, pad)
        exp = cv2.erode(padded, np.ones((k, k), np.uint8))[pad:-pad, pad:-pad]
        np.testing.assert_array_equal(got, exp)


def test_opening_matches_cv2(rng):
    mask = (rng.uniform(size=(30, 30)) > 0.3).astype(np.uint8)
    got = np.asarray(morphology.opening(jnp.asarray(mask), 3))
    exp = cv2.morphologyEx(mask, cv2.MORPH_OPEN, np.ones((3, 3), np.uint8))
    np.testing.assert_array_equal(got, exp)


def test_radius_search(rng):
    q = rng.normal(size=(5, 4)).astype(np.float32)
    bank = np.concatenate([q + 0.01, rng.normal(size=(30, 4)).astype(np.float32) + 10])
    d, ids, valid = knn.radius_search(
        jnp.asarray(q), jnp.asarray(bank), radius=0.1, max_neighbors=3
    )
    v = np.asarray(valid)
    # Each query has exactly its offset twin within radius.
    assert (v.sum(axis=1) == 1).all()
    np.testing.assert_array_equal(np.asarray(ids)[np.arange(5), 0], np.arange(5))


def test_template_descs_scatter_matches_per_template_loop(rng):
    """Single-pass scatter implementation == literal per-template loop."""
    t, per, d, w = 6, 20, 8, 16
    feats = rng.normal(size=(t * per, d)).astype(np.float32)
    tids = np.repeat(np.arange(t), per).astype(np.int32)
    words = rng.normal(size=(w, d)).astype(np.float32)
    mask = (rng.uniform(size=t * per) > 0.3).astype(np.float32)
    for soft in [False, True]:
        cfg = tfidf.TfidfConfig(knn_k=3, soft_assign=soft, soft_sigma_squared=5.0)
        descs, idfs = tfidf.calc_template_tfidf_descriptors(
            jnp.asarray(feats), jnp.asarray(tids), jnp.asarray(words), t, cfg,
            feature_mask=jnp.asarray(mask),
        )
        # Literal per-template loop using calc_tfidf.
        ids, dists = tfidf.assign_words(jnp.asarray(feats), jnp.asarray(words), 3)
        for ti in range(t):
            m = jnp.asarray(((tids == ti) & (mask > 0)).astype(np.float32))
            exp = tfidf.calc_tfidf(
                ids, dists, idfs, soft_assign=soft, soft_sigma_squared=5.0,
                feature_mask=m,
            )
            np.testing.assert_allclose(
                np.asarray(descs[ti]), np.asarray(exp), atol=1e-5
            )


def test_sample_grid_features_aligned_matches_bilinear(rng):
    """The aligned reshape fast path == bilinear sampling at the default
    1-cell-per-texel configuration. (Not bit-identical: the bilinear path's
    f32 coordinate math lands ~1e-7 off-texel and interpolates by that
    epsilon; the reshape is the exact on-texel value.)"""
    fm = rng.normal(size=(30, 30, 16)).astype(np.float32)
    pts = sampling.grid_points((420, 420), 14.0)
    fast = sampling.sample_grid_features(jnp.asarray(fm), pts, (420, 420), 14.0)
    slow = sampling.sample_feature_map(jnp.asarray(fm), pts, (420, 420))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-4)


def test_sample_grid_features_misaligned_falls_back(rng):
    """A non-aligned grid (cell != image/fm ratio) takes the bilinear path."""
    fm = rng.normal(size=(30, 30, 8)).astype(np.float32)
    pts = sampling.grid_points((420, 420), 28.0)
    got = sampling.sample_grid_features(jnp.asarray(fm), pts, (420, 420), 28.0)
    exp = sampling.sample_feature_map(jnp.asarray(fm), pts, (420, 420))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))
    assert got.shape == (15 * 15, 8)
