"""Gradient accumulation (--grad_accum): k same-shape loader batches ->
one optimizer step via lax.scan (train/common.py accum_groups/scan_mean).

For the mean losses used by every driver, averaging microbatch gradients
over equal-size microbatches equals the full-batch gradient exactly — the
unit test pins that; driver smokes cover each step-family (plain, rng+aux,
double-backward forces, dual-tower, variables-carrying pretrain).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.train import common


def _fake_batch(n_graphs, n_max, seed=0):
    from geossl_tpu.data.batch import DenseMolBatch

    rng = np.random.default_rng(seed)
    at = rng.integers(0, 9, size=(n_graphs, n_max)).astype(np.int32)
    pos = rng.normal(scale=1.2, size=(n_graphs, n_max, 3)).astype(np.float32)
    mask = np.ones((n_graphs, n_max), bool)
    y = rng.normal(size=(n_graphs, 1)).astype(np.float32)
    return DenseMolBatch(
        atom_type=jnp.asarray(at), positions=jnp.asarray(pos),
        node_mask=jnp.asarray(mask), y=jnp.asarray(y),
        graph_mask=jnp.ones((n_graphs,), bool),
    )


class TestAccumGroups:
    def test_groups_of_k_and_partial_tail(self):
        batches = [_fake_batch(4, 8, seed=i) for i in range(5)]
        groups = list(common.accum_groups(iter(batches), 2))
        assert [k for _, k in groups] == [2, 2, 1]
        stacked, k = groups[0]
        assert stacked.atom_type.shape == (2, 4, 8)
        np.testing.assert_array_equal(stacked.positions[1],
                                      batches[1].positions)

    def test_shape_change_flushes(self):
        batches = [
            _fake_batch(4, 8, seed=0), _fake_batch(4, 16, seed=1),
            _fake_batch(4, 16, seed=2), _fake_batch(4, 16, seed=3),
        ]
        groups = list(common.accum_groups(iter(batches), 3))
        assert [k for _, k in groups] == [1, 3]
        assert groups[0][0].atom_type.shape == (1, 4, 8)
        assert groups[1][0].atom_type.shape == (3, 4, 16)


def test_scan_mean_grads_equal_full_batch():
    """mean-of-microbatch-grads == full-batch grad for a masked-mean loss
    through a real backbone (the LBA/QM9 step family)."""
    from geossl_tpu.config import ModelConfig, SchNetConfig

    cfg = ModelConfig(
        model_3d="schnet", emb_dim=16,
        schnet=SchNetConfig(hidden_channels=16, num_filters=16,
                            num_interactions=2, num_gaussians=8),
        use_pallas=False,
    )
    module, apply = common.make_backbone(cfg)
    full = _fake_batch(8, 12, seed=3)
    params = {
        "model": common.init_backbone(module, jax.random.PRNGKey(0), n_max=12),
    }

    def loss_fn(p, b):
        graph, _ = apply(p["model"], b.atom_type, b.positions, b.node_mask)
        per = (graph.sum(-1) - b.y[:, 0]) ** 2
        return common.graph_masked_mean(per, b.graph_mask)

    full_loss, full_grads = jax.value_and_grad(loss_fn)(params, full)

    halves = jax.tree_util.tree_map(
        lambda x: jnp.stack([x[:4], x[4:]]) if x.ndim else x, full
    )

    @jax.jit
    def accum(p, stacked):
        return common.scan_mean(
            lambda mb, i: jax.value_and_grad(loss_fn)(p, mb), stacked, 2
        )

    acc_loss, acc_grads = accum(params, halves)
    np.testing.assert_allclose(acc_loss, full_loss, rtol=1e-5)
    for a, f in zip(jax.tree_util.tree_leaves(acc_grads),
                    jax.tree_util.tree_leaves(full_grads)):
        np.testing.assert_allclose(a, f, rtol=2e-4, atol=1e-6)


def test_lba_driver_grad_accum(tmp_path):
    from geossl_tpu.train import finetune_lba

    best_mse, _ = finetune_lba.main([
        "--synthetic", "--synthetic_size", "40", "--epochs", "2",
        "--batch_size", "8", "--grad_accum", "2", "--num_devices", "1",
        "--bucket", "64", "--output_model_dir", str(tmp_path),
    ])
    assert np.isfinite(best_mse)
    assert os.path.exists(tmp_path / "state.ckpt")


def test_md17_driver_grad_accum():
    """Double-backward (force) loss under the accumulation scan."""
    from geossl_tpu.train import finetune_md17

    best_val_force, _ = finetune_md17.main([
        "--synthetic", "--synthetic_size", "30", "--epochs", "1",
        "--num_devices", "1", "--eval_batch_size", "16",
        "--grad_accum", "2",
    ])
    assert np.isfinite(best_val_force)


def test_pretrain_ddm_grad_accum_and_learns(tmp_path):
    from geossl_tpu.train import pretrain_geossl

    state = pretrain_geossl.main([
        "--synthetic", "--synthetic_size", "32", "--epochs", "2",
        "--batch_size", "8", "--grad_accum", "2", "--num_devices", "2",
        "--GeoSSL_option", "DDM", "--output_model_dir", str(tmp_path),
    ])
    assert int(state.step) == 4  # 4 loader batches / 2 = 2 optimizer steps x 2 epochs
    assert os.path.exists(tmp_path / "model_final.ckpt")


def test_pretrain_rr_grad_accum_carries_batch_stats(tmp_path):
    """RR's AutoEncoder batch_stats are sequential state inside the scan —
    they must change across an accumulated step, not be zeroed/averaged."""
    from geossl_tpu.train import pretrain_geossl

    state = pretrain_geossl.main([
        "--synthetic", "--synthetic_size", "16", "--epochs", "1",
        "--batch_size", "4", "--grad_accum", "2", "--num_devices", "1",
        "--GeoSSL_option", "RR",
    ])
    variables = state.params[1]
    means = jax.tree_util.tree_leaves(variables["AE_01"])
    assert any(float(jnp.abs(m).sum()) > 0 for m in means)


def test_steps_per_call_exclusive():
    from geossl_tpu.train import pretrain_geossl

    with pytest.raises(SystemExit):
        pretrain_geossl.main([
            "--synthetic", "--synthetic_size", "16", "--epochs", "1",
            "--batch_size", "8", "--grad_accum", "2", "--steps_per_call", "2",
        ])
