"""Property tests for masked neighbor ops against numpy brute force.

The oracles re-derive the reference kernel contracts
(masked_ordered_ball_query_gpu.cu, masked_nearest_query_gpu.cu,
group_points_gpu.cu) independently in numpy.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.ops import (
    masked_ordered_ball_query,
    masked_nearest_query,
    group_features,
    group_xyz,
)


def brute_ball_query(q, s, qm, sm, radius, nsample):
    """Numpy oracle: true nsample nearest-within-radius, distance-sorted,
    padded by cycling real neighbors; zero mask for padding queries."""
    M, N = q.shape[0], s.shape[0]
    idx = np.zeros((M, nsample), dtype=np.int64)
    msk = np.zeros((M, nsample), dtype=np.float32)
    for j in range(M):
        d2 = np.sum((s - q[j]) ** 2, axis=1)
        cand = np.nonzero((sm > 0) & (d2 < radius ** 2))[0]
        cand = cand[np.argsort(d2[cand], kind="stable")]
        cnt = min(len(cand), nsample)
        if cnt == 0:
            continue
        for i in range(nsample):
            idx[j, i] = cand[i] if i < cnt else cand[i % cnt]
            msk[j, i] = 1.0 if (i < cnt and qm[j] > 0) else 0.0
    return idx, msk


@pytest.mark.parametrize("chunk", [None, 7])
def test_ball_query_matches_bruteforce(rng, chunk):
    B, N, M, K = 3, 60, 25, 8
    radius = 0.35
    s = rng.random((B, N, 3), dtype=np.float32)
    q = rng.random((B, M, 3), dtype=np.float32)
    # prefix-contiguous masks like the data pipeline produces
    sm = np.zeros((B, N), np.float32)
    qm = np.zeros((B, M), np.float32)
    for b in range(B):
        sm[b, : rng.integers(10, N + 1)] = 1
        qm[b, : rng.integers(5, M + 1)] = 1

    idx, msk = masked_ordered_ball_query(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm), jnp.asarray(sm),
        radius=radius, nsample=K, chunk_size=chunk)
    idx, msk = np.asarray(idx), np.asarray(msk)

    for b in range(B):
        ridx, rmsk = brute_ball_query(q[b], s[b], qm[b], sm[b], radius, K)
        np.testing.assert_array_equal(msk[b], rmsk)
        # valid slots: the *distances* must match the sorted bruteforce ones
        # (indices can differ on exact ties)
        for j in range(M):
            d_ours = np.sum((s[b][idx[b, j]] - q[b][j]) ** 2, axis=1)
            d_ref = np.sum((s[b][ridx[j]] - q[b][j]) ** 2, axis=1)
            np.testing.assert_allclose(d_ours, d_ref, rtol=1e-5, atol=1e-6)


def test_ball_query_sorted_and_cycled(rng):
    N, M, K = 40, 10, 6
    s = rng.random((1, N, 3), dtype=np.float32)
    q = s[:, :M]
    sm = np.ones((1, N), np.float32)
    qm = np.ones((1, M), np.float32)
    idx, msk = masked_ordered_ball_query(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm), jnp.asarray(sm),
        radius=0.05, nsample=K)
    idx, msk = np.asarray(idx), np.asarray(msk)
    for j in range(M):
        d = np.sum((s[0][idx[0, j]] - q[0, j]) ** 2, axis=1)
        cnt = int(msk[0, j].sum())
        assert cnt >= 1  # query is its own neighbor at distance 0
        assert np.all(np.diff(d[:cnt]) >= -1e-7)  # sorted ascending
        # padding slots cycle through the first real neighbors
        for i in range(cnt, K):
            assert idx[0, j, i] == idx[0, j, i % cnt]


def test_ball_query_no_neighbors_gives_zero(rng):
    s = np.array([[[10.0, 10.0, 10.0], [11, 11, 11]]], np.float32)
    q = np.zeros((1, 2, 3), np.float32)
    ones = np.ones((1, 2), np.float32)
    idx, msk = masked_ordered_ball_query(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(ones), jnp.asarray(ones),
        radius=0.5, nsample=4)
    assert np.all(np.asarray(idx) == 0)
    assert np.all(np.asarray(msk) == 0)


def test_nearest_query_matches_bruteforce(rng):
    B, N, M = 2, 50, 30
    s = rng.random((B, N, 3), dtype=np.float32)
    q = rng.random((B, M, 3), dtype=np.float32)
    sm = np.zeros((B, N), np.float32)
    sm[:, :35] = 1
    qm = np.ones((B, M), np.float32)
    qm[:, -3:] = 0
    idx, msk = masked_nearest_query(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm), jnp.asarray(sm))
    idx, msk = np.asarray(idx), np.asarray(msk)
    for b in range(B):
        d2 = np.sum((q[b][:, None] - s[b][None, :35]) ** 2, axis=2)
        np.testing.assert_array_equal(idx[b], d2.argmin(axis=1))
    np.testing.assert_array_equal(msk, qm)


def test_group_features_and_grad(rng):
    B, N, C, M, K = 2, 12, 5, 7, 3
    feats = rng.random((B, N, C), dtype=np.float32)
    idx = rng.integers(0, N, size=(B, M, K)).astype(np.int32)
    out = np.asarray(group_features(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(B):
        np.testing.assert_allclose(out[b], feats[b][idx[b]], rtol=1e-6)

    # gradient = scatter-add of upstream grads (group_points_grad semantics)
    def f(x):
        return jnp.sum(group_features(x, jnp.asarray(idx)) * 2.0)

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    expect = np.zeros_like(feats)
    for b in range(B):
        for m in range(M):
            for k in range(K):
                expect[b, idx[b, m, k]] += 2.0
    np.testing.assert_allclose(g, expect, rtol=1e-6)


def test_group_features_grad_large_support(rng):
    """The N > _ONEHOT_BWD_MAX_N backward branch (XLA scatter-add — the
    path every 15k-point config takes, ops/neighbors.py:191-199) must
    produce the same gradient as a dense oracle."""
    from deep3dpointclouddenoising_tpu.ops import neighbors as nb
    B, N, C, M, K = 2, nb._ONEHOT_BWD_MAX_N + 7, 4, 31, 5
    feats = rng.random((B, N, C), dtype=np.float32)
    up = rng.random((B, M, K, C), dtype=np.float32)
    idx = rng.integers(0, N, size=(B, M, K)).astype(np.int32)

    def f(x):
        return jnp.sum(group_features(x, jnp.asarray(idx)) * jnp.asarray(up))

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    expect = np.zeros_like(feats)
    for b in range(B):
        for m in range(M):
            for k in range(K):
                expect[b, idx[b, m, k]] += up[b, m, k]
    np.testing.assert_allclose(g, expect, rtol=1e-5, atol=1e-6)


def test_group_xyz_relative(rng):
    B, N, M, K = 1, 10, 4, 2
    s = rng.random((B, N, 3), dtype=np.float32)
    q = rng.random((B, M, 3), dtype=np.float32)
    idx = rng.integers(0, N, size=(B, M, K)).astype(np.int32)
    rel = np.asarray(group_xyz(jnp.asarray(s), jnp.asarray(q), jnp.asarray(idx)))
    for m in range(M):
        for k in range(K):
            np.testing.assert_allclose(rel[0, m, k], s[0, idx[0, m, k]] - q[0, m],
                                       rtol=1e-6, atol=1e-7)


def test_gather_rows_backward_large_support(rng):
    """Past the one-hot cutoff (support N > 2048) the gather backward runs
    the scatter-free sort+prefix-sum reduction — it must equal the
    scatter-add oracle exactly (same adds, different order)."""
    import jax
    import jax.numpy as jnp
    from deep3dpointclouddenoising_tpu.ops.neighbors import (
        _ONEHOT_BWD_MAX_N, group_features)

    B, N, C, M, K = 2, _ONEHOT_BWD_MAX_N + 700, 5, 64, 7
    feats = rng.standard_normal((B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, (B, M, K)).astype(np.int32)
    g = rng.standard_normal((B, M, K, C)).astype(np.float32)

    def loss(f):
        return jnp.sum(group_features(f, jnp.asarray(idx)) * g)

    got = jax.grad(loss)(jnp.asarray(feats))
    want = np.zeros((B, N, C), np.float64)
    for b in range(B):
        np.add.at(want[b], idx[b].reshape(-1), g[b].reshape(-1, C))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_segment_sums_sorted_matches_onehot(rng):
    """segment_sums_sorted must agree with the one-hot contraction on the
    small-N regime both paths can run."""
    import jax
    import jax.numpy as jnp
    from deep3dpointclouddenoising_tpu.ops.neighbors import \
        segment_sums_sorted

    T, N, C = 900, 300, 4
    keys = rng.integers(0, N, T).astype(np.int32)
    vals = rng.standard_normal((T, C)).astype(np.float32)
    w = np.ones(T, np.float32)
    sums, counts = jax.jit(
        lambda k, v, ww: segment_sums_sorted(k, v, ww, N))(keys, vals, w)
    onehot = jax.nn.one_hot(keys, N, dtype=jnp.float32)
    want = jnp.einsum("tn,tc->nc", onehot, jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(sums), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(counts)[:, 0],
                               np.bincount(keys, minlength=N), atol=1e-5)
