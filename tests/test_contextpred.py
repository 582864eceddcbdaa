"""ContextPred objective (objectives/contextpred.py) — reconstruction of the
reference's dead do_ContextPred (examples/util.py:79-119)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geossl_tpu.objectives import (
    context_masks,
    contextpred_loss,
    hop_distances,
    sample_centers,
)


def _np_bfs(adj, start, max_hops):
    n = adj.shape[0]
    hops = np.full(n, max_hops + 1, np.int32)
    hops[start] = 0
    frontier = [start]
    for t in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in np.nonzero(adj[u])[0]:
                if hops[v] > max_hops:
                    nxt.append(v)
                    hops[v] = t
        frontier = nxt
    return hops


def test_hop_distances_match_bfs():
    rng = np.random.default_rng(0)
    B, N, H = 6, 17, 5
    adj = rng.random((B, N, N)) < 0.12
    adj = adj | adj.transpose(0, 2, 1)
    adj &= ~np.eye(N, dtype=bool)[None]
    centers = rng.integers(0, N, size=B)
    onehot = np.eye(N, dtype=np.float32)[centers]
    got = np.asarray(hop_distances(jnp.asarray(adj), jnp.asarray(onehot), H))
    for b in range(B):
        np.testing.assert_array_equal(got[b], _np_bfs(adj[b], centers[b], H))


def test_context_masks_partition():
    hops = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7]])
    nm = jnp.ones((1, 8), bool)
    sub, ctx, ov = context_masks(hops, nm, k=5, l1=4, l2=7)
    assert list(np.asarray(sub[0])) == [1, 1, 1, 1, 1, 1, 0, 0]
    assert list(np.asarray(ctx[0])) == [0, 0, 0, 0, 1, 1, 1, 1]
    assert list(np.asarray(ov[0])) == [0, 0, 0, 0, 1, 1, 0, 0]
    # padding never enters any set
    nm2 = nm.at[0, 6:].set(False)
    _, ctx2, _ = context_masks(hops, nm2, k=5, l1=4, l2=7)
    assert not np.asarray(ctx2[0, 6:]).any()


def test_sample_centers_real_atoms_only():
    nm = jnp.asarray([[True, True, False, False],
                      [False, False, False, False]])  # padded graph slot
    for s in range(20):
        oh = np.asarray(sample_centers(jax.random.PRNGKey(s), nm))
        assert oh.shape == (2, 4)
        assert oh[0, 2:].sum() == 0  # only real atoms of graph 0
        assert oh.sum(-1).tolist() == [1.0, 1.0]  # always a one-hot


def test_contextpred_loss_matches_reference_formula():
    """Re-derive the reference reduction (mean BCE(pos,1) + num_neg *
    mean BCE(all negs,0), cycle-shift negatives) in numpy and compare."""
    rng = np.random.default_rng(1)
    B, F, NEG = 5, 8, 2
    s = rng.normal(size=(B, F)).astype(np.float32)
    c = rng.normal(size=(B, F)).astype(np.float32)
    valid = np.ones(B, bool)

    def bce(logit, target):
        return np.log1p(np.exp(-np.abs(logit))) + np.maximum(logit, 0) \
            - logit * target

    pos = (s * c).sum(-1)
    negs = np.concatenate(
        [(s * np.roll(c, -(i + 1), axis=0)).sum(-1) for i in range(NEG)])
    want = bce(pos, 1.0).mean() + NEG * bce(negs, 0.0).mean()
    want_acc = ((pos > 0).sum() + (negs < 0).sum()) / (B + NEG * B)
    loss, acc = contextpred_loss(jnp.asarray(s), jnp.asarray(c),
                                 jnp.asarray(valid), NEG)
    assert np.isclose(float(loss), want, rtol=1e-5)
    assert np.isclose(float(acc), want_acc)


def test_contextpred_loss_ignores_invalid_graphs():
    rng = np.random.default_rng(2)
    B, F = 4, 8
    s = rng.normal(size=(B, F)).astype(np.float32)
    c = rng.normal(size=(B, F)).astype(np.float32)
    full = np.ones(B, bool)
    loss_full, _ = contextpred_loss(jnp.asarray(s), jnp.asarray(c),
                                    jnp.asarray(full), 1)
    # corrupt one graph's reprs but mark it invalid: loss must equal the
    # 3-graph computation, not see the garbage
    s2, c2 = s.copy(), c.copy()
    s2[1], c2[1] = 1e6, -1e6
    part = full.copy()
    part[1] = False
    loss_part, _ = contextpred_loss(jnp.asarray(s2), jnp.asarray(c2),
                                    jnp.asarray(part), 1)
    loss_ref, _ = contextpred_loss(
        jnp.asarray(np.delete(s, 1, 0)), jnp.asarray(np.delete(c, 1, 0)),
        jnp.asarray(np.ones(B - 1, bool)), 1)
    assert np.isfinite(float(loss_part))
    assert float(loss_part) != pytest.approx(float(loss_full))
    # NOTE: not exactly loss_ref (cycle shift wraps differently at B-1);
    # the invariant is finiteness + independence from the invalid row's
    # values
    s3, c3 = s.copy(), c.copy()
    s3[1], c3[1] = -7.0, 7.0
    loss_part2, _ = contextpred_loss(jnp.asarray(s3), jnp.asarray(c3),
                                     jnp.asarray(part), 1)
    assert float(loss_part) == pytest.approx(float(loss_part2))


def test_driver_smoke(tmp_path):
    """pretrain_baselines contextpred end-to-end on synthetic molecules:
    finite decreasing-ish loss, backbone checkpoint written and loadable
    by the fine-tune path (backbone-only, no context tower)."""
    from flax import serialization

    from geossl_tpu.train import pretrain_baselines

    out = tmp_path / "ctx"
    pretrain_baselines.main([
        "contextpred", "--platform", "cpu", "--synthetic",
        "--synthetic_size", "24", "--epochs", "2", "--batch_size", "8",
        "--num_devices", "1", "--seed", "5", "--context_hops", "2",
        "--context_csize", "2", "--output_model_dir", str(out),
    ])
    ckpt = serialization.msgpack_restore(
        (out / "model_final.ckpt").read_bytes())
    assert set(ckpt) == {"model"}  # backbone only — context tower not saved


def test_neg_samples_zero_rejected():
    """neg_samples=0 must raise an actionable error, not crash inside jit
    on an empty jnp.concatenate."""
    z = jnp.zeros((4, 8))
    with pytest.raises(ValueError, match="neg_samples"):
        contextpred_loss(z, z, jnp.ones((4,), bool), 0)
