"""Golden tests: blocked sparse SpMM/SDDMM kernels vs dense oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from dstdgcn_tpu.kernels import sparse


def _pattern(rng, nb, density=0.4):
    mask = rng.rand(nb, nb) < density
    return mask


@pytest.fixture
def data(rng):
    n, v, r, c, block = 2, 32, 4, 16, 8
    nb = v // block
    mask_b = _pattern(rng, nb)
    rows, cols = sparse.active_blocks(mask_b)
    # element mask from (possibly row-fixed) block mask
    fixed = np.zeros((nb, nb), bool)
    fixed[rows, cols] = True
    mask = np.kron(fixed, np.ones((block, block))).astype(np.float32)
    q = jnp.asarray(rng.randn(n, v, r), jnp.float32)
    k = jnp.asarray(rng.randn(n, v, r), jnp.float32)
    w = jnp.asarray(rng.randn(r), jnp.float32)
    x = jnp.asarray(rng.randn(n, v, c), jnp.float32)
    adj = jnp.asarray(rng.randn(n, v, v), jnp.float32) * jnp.asarray(mask)
    return dict(q=q, k=k, w=w, x=x, adj=adj, mask=jnp.asarray(mask),
                rows=rows, cols=cols, block=block)


def test_active_blocks_covers_all_rows(rng):
    mask = np.zeros((4, 4), bool)
    mask[1, 2] = True
    rows, cols = sparse.active_blocks(mask)
    assert set(rows.tolist()) == {0, 1, 2, 3}
    assert np.all(np.diff(rows) >= 0)  # row-major sorted


def test_block_spmm_matches_dense(data):
    got = sparse.block_spmm(data["adj"], data["x"], data["rows"],
                            data["cols"], data["block"])
    want = sparse.spmm_dense(data["adj"], data["x"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_block_sddmm_matches_dense(data):
    got = np.asarray(
        sparse.block_sddmm(data["q"], data["k"], data["w"], data["rows"],
                           data["cols"], data["block"]))
    want = np.asarray(
        sparse.sddmm_dense(data["q"], data["k"], data["w"]))
    # inactive blocks are undefined by contract — compare active only
    sel = np.broadcast_to(np.asarray(data["mask"], bool), got.shape)
    np.testing.assert_allclose(got[sel], want[sel], rtol=1e-5, atol=1e-5)


def test_block_sddmm_spmm_matches_dense(data):
    got = sparse.block_sddmm_spmm(data["q"], data["k"], data["w"],
                                  data["x"], data["rows"], data["cols"],
                                  data["block"])
    want = sparse.sddmm_spmm_dense(data["q"], data["k"], data["w"],
                                   data["x"], data["mask"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_block_spmm_gradients_match_masked_dense():
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    n, v, c, block = 2, 256, 8, 128
    nb = v // block
    mask_b = np.array([[True, False], [True, True]])
    rows, cols = sparse.active_blocks(mask_b)
    mask = np.kron(mask_b.astype(np.float32), np.ones((block, block),
                                                      np.float32))
    adj = jnp.asarray(rng.randn(n, v, v), jnp.float32)
    x = jnp.asarray(rng.randn(n, v, c), jnp.float32)

    def f_sparse(adj, x):
        return jnp.sum(sparse.block_spmm(adj, x, rows, cols, block) ** 2)

    def f_dense(adj, x):
        return jnp.sum(sparse.spmm_dense(adj * mask, x) ** 2)

    gs = jax.grad(f_sparse, argnums=(0, 1))(adj, x)
    gd = jax.grad(f_dense, argnums=(0, 1))(adj, x)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_block_sddmm_spmm_gradients_match_masked_dense():
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    n, v, r, c, block = 2, 256, 3, 8, 128
    mask_b = np.array([[True, True], [False, True]])
    rows, cols = sparse.active_blocks(mask_b)
    mask = np.kron(mask_b.astype(np.float32), np.ones((block, block),
                                                      np.float32))
    q = jnp.asarray(rng.randn(n, v, r), jnp.float32)
    k = jnp.asarray(rng.randn(n, v, r), jnp.float32)
    w = jnp.asarray(rng.randn(r), jnp.float32)
    x = jnp.asarray(rng.randn(n, v, c), jnp.float32)

    def f_sparse(q, k, w, x):
        return jnp.sum(
            sparse.block_sddmm_spmm(q, k, w, x, rows, cols, block) ** 2)

    def f_dense(q, k, w, x):
        return jnp.sum(sparse.sddmm_spmm_dense(q, k, w, x, mask) ** 2)

    gs = jax.grad(f_sparse, argnums=(0, 1, 2, 3))(q, k, w, x)
    gd = jax.grad(f_dense, argnums=(0, 1, 2, 3))(q, k, w, x)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
