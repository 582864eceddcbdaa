import jax
import jax.numpy as jnp
import numpy as np

from geossl_tpu.ops import geometry


def _rand_batch(rng, b=3, n=8):
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    mask = np.ones((b, n), dtype=bool)
    mask[0, 5:] = False  # ragged
    mask[2, 2:] = False
    return jnp.asarray(pos), jnp.asarray(mask)


def test_pairwise_distances_match_numpy():
    rng = np.random.default_rng(0)
    pos, mask = _rand_batch(rng)
    dist, pmask = geometry.pairwise_distances(pos, mask)
    dist, pmask = np.asarray(dist), np.asarray(pmask)
    pos_np, mask_np = np.asarray(pos), np.asarray(mask)
    for b in range(pos.shape[0]):
        for i in range(pos.shape[1]):
            for j in range(pos.shape[1]):
                expect_valid = mask_np[b, i] and mask_np[b, j] and i != j
                assert pmask[b, i, j] == expect_valid
                if expect_valid:
                    np.testing.assert_allclose(
                        dist[b, i, j],
                        np.linalg.norm(pos_np[b, i] - pos_np[b, j]),
                        rtol=1e-5,
                    )
                else:
                    assert dist[b, i, j] == 0.0


def test_distance_gradients_finite_with_padding():
    """Padded/diagonal entries must not poison grads (double-where trick)."""
    rng = np.random.default_rng(1)
    pos, mask = _rand_batch(rng)

    def loss(p):
        d, m = geometry.pairwise_distances(p, mask)
        return jnp.sum(d)

    g = jax.grad(loss)(pos)
    assert np.all(np.isfinite(np.asarray(g)))
    # second order too (MD17 double backward)
    g2 = jax.grad(lambda p: jnp.sum(jax.grad(loss)(p) ** 2))(pos)
    assert np.all(np.isfinite(np.asarray(g2)))


def test_directions_unit_norm_and_antisymmetric():
    rng = np.random.default_rng(2)
    pos, mask = _rand_batch(rng)
    dist, direc, pmask = geometry.pairwise_directions(pos, mask)
    direc, pmask = np.asarray(direc), np.asarray(pmask)
    norms = np.linalg.norm(direc, axis=-1)
    np.testing.assert_allclose(norms[pmask], 1.0, rtol=1e-5)
    assert np.all(norms[~pmask] == 0.0)
    np.testing.assert_allclose(
        direc + np.swapaxes(direc, 1, 2), 0.0, atol=1e-6
    )


def test_masked_readout():
    x = jnp.ones((2, 4, 3))
    mask = jnp.array([[True, True, False, False], [True] * 4])
    mean = geometry.masked_segment_mean(x, mask)
    np.testing.assert_allclose(np.asarray(mean), 1.0, rtol=1e-6)
    s = geometry.masked_segment_sum(x, mask)
    np.testing.assert_allclose(np.asarray(s)[0], 2.0)
    np.testing.assert_allclose(np.asarray(s)[1], 4.0)
