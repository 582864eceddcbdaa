"""Property tests from the SURVEY §4 plan: SE(3) invariance of the DDM loss,
seeded determinism of the training step."""

import jax
import jax.numpy as jnp
import numpy as np

from geossl_tpu import objectives as obj
from geossl_tpu.models import SchNet
from geossl_tpu.objectives.ncsn import NCSNv3
from geossl_tpu.ops import geometry


def _setup(n=8, b=3, emb=16):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.integers(0, 9, size=(b, n)), jnp.int32)
    pos = jnp.asarray(
        np.cumsum(rng.normal(scale=0.8, size=(b, n, 3)), axis=1).astype(np.float32)
    )
    mask = jnp.ones((b, n), bool)
    model = SchNet(hidden_channels=emb, num_filters=emb, num_interactions=2,
                   num_gaussians=9, cutoff=6.0)
    head = NCSNv3(emb_dim=emb, num_noise_level=5)
    key = jax.random.PRNGKey(0)
    bp = model.init(key, z, pos, mask)["params"]
    _, node = model.apply({"params": bp}, z, pos, mask)
    dist, _ = geometry.pairwise_distances(pos, mask)
    sel = obj.pair_selection(mask, "combination")
    hp = head.init(key, key, node, dist, sel)["params"]
    return model, head, bp, hp, z, pos, mask, sel


def _ddm_loss(model, head, bp, hp, z, pos, mask, sel, key):
    """Single-head DDM-style loss: latents of view1 scored against view2's
    distances — deterministic given `key`."""
    k_view, k_h = jax.random.split(key)
    pos2 = obj.perturb_positions(k_view, pos, 0.0, 0.3)
    _, h1 = model.apply({"params": bp}, z, pos, mask)
    d2, _ = geometry.pairwise_distances(pos2, mask)
    return head.apply({"params": hp}, k_h, h1, d2, sel)


def test_ddm_loss_se3_invariant():
    """Rotating+translating the input geometry changes neither the latents
    nor the pair distances, so the DDM loss (same RNG) is invariant — up to
    the view noise, which is applied in the rotated frame; distances of the
    noised view differ, so we rotate AFTER fixing the noise by comparing the
    deterministic parts: latents and clean distances."""
    model, head, bp, hp, z, pos, mask, sel = _setup()
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pos_rot = pos @ jnp.asarray(q.T, jnp.float32) + 2.5

    _, h1 = model.apply({"params": bp}, z, pos, mask)
    _, h2 = model.apply({"params": bp}, z, pos_rot, mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=2e-4, atol=1e-5)

    d1, _ = geometry.pairwise_distances(pos, mask)
    d2, _ = geometry.pairwise_distances(pos_rot, mask)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-5)

    # full loss: equivariance holds when the SAME physical noise is applied —
    # i.e. view 2 of the rotated input is the rotated view 2. Draw the noise
    # once and rotate the noised geometry rather than re-drawing in the new
    # frame (per-key noise is frame-dependent by construction).
    key = jax.random.PRNGKey(3)
    k_view, k_h = jax.random.split(key)
    pos2 = obj.perturb_positions(k_view, pos, 0.0, 0.3)
    pos2_rot = pos2 @ jnp.asarray(q.T, jnp.float32) + 2.5

    def loss_for(p1, p2):
        _, h1 = model.apply({"params": bp}, z, p1, mask)
        d2, _ = geometry.pairwise_distances(p2, mask)
        return head.apply({"params": hp}, k_h, h1, d2, sel)

    l1 = loss_for(pos, pos2)
    l2 = loss_for(pos_rot, pos2_rot)
    np.testing.assert_allclose(float(l1), float(l2), rtol=5e-3)


def test_seeded_determinism():
    """Same seed -> bit-identical loss; different seed -> different loss."""
    model, head, bp, hp, z, pos, mask, sel = _setup()
    l_a = _ddm_loss(model, head, bp, hp, z, pos, mask, sel, jax.random.PRNGKey(7))
    l_b = _ddm_loss(model, head, bp, hp, z, pos, mask, sel, jax.random.PRNGKey(7))
    l_c = _ddm_loss(model, head, bp, hp, z, pos, mask, sel, jax.random.PRNGKey(8))
    assert float(l_a) == float(l_b)
    assert float(l_a) != float(l_c)


def test_driver_reproducibility():
    """Two identical pretrain runs produce identical loss trajectories."""
    from geossl_tpu.train import pretrain_geossl

    argv = [
        "--synthetic", "--synthetic_size", "32", "--epochs", "1",
        "--batch_size", "16", "--num_devices", "1",
        "--GeoSSL_option", "EBM_NCE", "--seed", "11",
    ]
    s1 = pretrain_geossl.main(argv)
    s2 = pretrain_geossl.main(argv)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
