"""Serving surface (geossl_tpu/serve.py): checkpoint loading, bucketed
batched prediction aligned to input order, denormalization, dual towers,
forces, and the CLI."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geossl_tpu.config import ModelConfig
from geossl_tpu.data.bucketing import pack_batch
from geossl_tpu.data.store import MolRecord, MolStore


def _synthetic_store(m=17, n_lo=3, n_hi=60, seed=0):
    rng = np.random.default_rng(seed)
    recs = []
    for _ in range(m):
        n = int(rng.integers(n_lo, n_hi + 1))
        recs.append(MolRecord(
            atom_type=rng.integers(0, 9, n).astype(np.int32),
            positions=rng.normal(scale=2.0, size=(n, 3)).astype(np.float32),
            y=np.array([rng.normal()], np.float32),
        ))
    return MolStore.from_records(recs)


def _manual_params(cfg, seed=0):
    """Backbone + LinearHead params initialized directly (no training)."""
    from geossl_tpu.train import common
    from geossl_tpu.train.finetune_qm9 import LinearHead

    module, _ = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(seed)
    backbone = common.init_backbone(module, rng, n_max=64)
    head = LinearHead().init(rng, jnp.zeros((2, cfg.emb_dim)))["params"]
    return {"model": backbone, "graph_pred_linear": head}


def test_predict_bucketed_order_and_denorm():
    """Mixed-size store spans two buckets with partial chunks; predictions
    must align to input order and apply y_mean/y_std."""
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.finetune_qm9 import LinearHead

    cfg = ModelConfig()
    params = dict(_manual_params(cfg), y_mean=np.float32(2.5),
                  y_std=np.float32(3.0))
    store = _synthetic_store()
    pred = Predictor(cfg, params, batch_size=4, bucket_sizes=(32, 64))
    out = pred.predict(store)
    assert out.shape == (len(store),)

    # oracle: one molecule at a time, at the same bucket pad
    _, backbone_apply = common.make_backbone(cfg)
    head = LinearHead()
    for i in range(len(store)):
        r = store.get(i)
        n_pad = 32 if r.num_atoms <= 32 else 64
        b = pack_batch([r], n_pad)
        g, _ = backbone_apply(params["model"], b.atom_type, b.positions,
                              b.node_mask)
        expect = float(head.apply(
            {"params": params["graph_pred_linear"]}, g)[0]) * 3.0 + 2.5
        np.testing.assert_allclose(out[i], expect, rtol=2e-5, atol=1e-5)


def test_embed_and_headless_checkpoint(tmp_path):
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import checkpoints

    cfg = ModelConfig()
    params = _manual_params(cfg)
    backbone_only = {"model": params["model"]}
    path = str(tmp_path / "model_final.ckpt")
    checkpoints.save_checkpoint(path, backbone_only)
    pred = Predictor.from_checkpoint(path, cfg, batch_size=8)
    store = _synthetic_store(m=5)
    emb = pred.embed(store)
    assert emb.shape == (5, cfg.emb_dim) and np.isfinite(emb).all()
    with pytest.raises(ValueError, match="backbone-only"):
        pred.predict(store)


def test_predict_forces_matches_grad():
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.finetune_qm9 import LinearHead

    cfg = ModelConfig()
    params = _manual_params(cfg)
    store = _synthetic_store(m=3, n_lo=4, n_hi=10)
    pred = Predictor(cfg, params, batch_size=2, bucket_sizes=(32,))
    e, f = pred.predict_forces(store)
    assert e.shape == (3,) and f.shape == (int(store.offsets[-1]), 3)

    _, backbone_apply = common.make_backbone(cfg)
    head = LinearHead()
    r = store.get(1)
    b = pack_batch([r], 32)

    def energy(pos):
        g, _ = backbone_apply(params["model"], b.atom_type, pos, b.node_mask)
        return jnp.sum(head.apply({"params": params["graph_pred_linear"]}, g))

    expect_f = -np.asarray(jax.grad(energy)(b.positions))[0, : r.num_atoms]
    s, t = store.offsets[1], store.offsets[2]
    np.testing.assert_allclose(f[s:t], expect_f, rtol=2e-5, atol=1e-5)


def test_predict_pairs_dual_tower():
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.finetune_lep import DualHead

    cfg = ModelConfig()
    from geossl_tpu.train.common import init_backbone, make_backbone

    module, backbone_apply = make_backbone(cfg)
    rng = jax.random.PRNGKey(3)
    params = {
        "model": init_backbone(module, rng, n_max=32),
        "graph_pred_linear": DualHead().init(
            rng, jnp.zeros((2, cfg.emb_dim)), jnp.zeros((2, cfg.emb_dim))
        )["params"],
    }
    active = _synthetic_store(m=6, n_lo=4, n_hi=20, seed=1)
    inactive = _synthetic_store(m=6, n_lo=4, n_hi=20, seed=2)
    pred = Predictor(cfg, params, batch_size=4, bucket_sizes=(32,))
    probs = pred.predict_pairs(active, inactive)
    assert probs.shape == (6,)
    assert (probs > 0).all() and (probs < 1).all()

    ba = pack_batch([active.get(4)], 32)
    bi = pack_batch([inactive.get(4)], 32)
    ga, _ = backbone_apply(params["model"], ba.atom_type, ba.positions,
                           ba.node_mask)
    gi, _ = backbone_apply(params["model"], bi.atom_type, bi.positions,
                           bi.node_mask)
    logit = float(DualHead().apply(
        {"params": params["graph_pred_linear"]}, ga, gi)[0])
    np.testing.assert_allclose(probs[4], 1 / (1 + np.exp(-logit)),
                               rtol=2e-5, atol=1e-6)

    with pytest.raises(ValueError, match="lengths differ"):
        pred.predict_pairs(active, _synthetic_store(m=3))


def test_predict_on_mesh_matches_single_device():
    """SPMD serving (params replicated, batch sharded over a 4-device mesh)
    returns the single-device predictions."""
    from geossl_tpu.serve import Predictor

    cfg = ModelConfig()
    params = dict(_manual_params(cfg), y_mean=np.float32(0.5),
                  y_std=np.float32(1.5))
    store = _synthetic_store(m=11)
    single = Predictor(cfg, params, batch_size=6, bucket_sizes=(32, 64))
    meshed = Predictor(cfg, params, batch_size=6, bucket_sizes=(32, 64),
                       num_devices=4)
    assert meshed.batch_size == 8  # rounded up to the mesh
    np.testing.assert_allclose(meshed.predict(store), single.predict(store),
                               rtol=2e-5, atol=1e-6)


def test_qm9_driver_checkpoint_serves(tmp_path):
    """End-to-end: finetune_qm9 saves y_mean/y_std; serving reproduces the
    driver's own denormalized eval predictions."""
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import finetune_qm9

    out_dir = tmp_path / "run"
    finetune_qm9.main([
        "--synthetic", "--synthetic_size", "60", "--epochs", "1",
        "--batch_size", "12", "--num_devices", "1", "--task", "mu",
        "--output_model_dir", str(out_dir),
    ])
    pred = Predictor.from_checkpoint(str(out_dir / "model_final.ckpt"),
                                     batch_size=12)
    assert pred.y_std > 0 and np.isfinite(pred.y_mean)

    from geossl_tpu.data.qm9 import TARGET_FIELDS, load_qm9
    store = load_qm9(None, synthetic=True, synthetic_size=60)
    store.y = store.y[:, TARGET_FIELDS.index("mu"):
                      TARGET_FIELDS.index("mu") + 1]
    out = pred.predict(store)
    assert out.shape == (60,) and np.isfinite(out).all()
    # predictions should be in label units (denormalized): same order of
    # magnitude as the labels, not the z-scores
    assert abs(np.mean(out) - pred.y_mean) < 5 * pred.y_std


def test_serve_cli(tmp_path):
    from geossl_tpu import serve
    from geossl_tpu.train import checkpoints

    cfg = ModelConfig()
    params = dict(_manual_params(cfg), y_mean=np.float32(1.0),
                  y_std=np.float32(2.0))
    ckpt = str(tmp_path / "model.ckpt")
    checkpoints.save_checkpoint(ckpt, params)
    store = _synthetic_store(m=7)
    npz = str(tmp_path / "mols.npz")
    store.save(npz)
    out_csv = str(tmp_path / "preds.csv")
    serve.main(["--ckpt", ckpt, "--input", npz, "--output", out_csv,
                "--batch_size", "4"])
    lines = open(out_csv).read().strip().split("\n")
    assert len(lines) == 7
    vals = np.array([float(l.split(",")[1]) for l in lines])
    np.testing.assert_allclose(
        vals, serve.Predictor(cfg, params, batch_size=4).predict(store),
        rtol=1e-5, atol=1e-6)


def test_torch_pth_checkpoint_embeds(tmp_path):
    """A reference-format .pth backbone loads into the Predictor
    (backbone-only: embed works, predict raises)."""
    torch = pytest.importorskip("torch")
    from geossl_tpu.serve import Predictor
    from geossl_tpu.utils.torch_import import schnet_params_to_torch

    cfg = ModelConfig()
    params = _manual_params(cfg)
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in schnet_params_to_torch(params["model"]).items()}
    path = str(tmp_path / "model.pth")
    torch.save({"model": sd}, path)
    pred = Predictor.from_checkpoint(path, cfg)
    store = _synthetic_store(m=4)
    emb = pred.embed(store)
    assert emb.shape == (4, cfg.emb_dim) and np.isfinite(emb).all()


def test_predict_painn_uses_halving_head():
    """PaiNN serving applies the create_output_layers halving-MLP head (the
    reference's PaiNN graph_pred_linear), not SchNet's Linear."""
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.common import PaiNNHead

    cfg = ModelConfig(model_3d="painn")
    module, backbone_apply = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(5)
    params = {
        "model": common.init_backbone(module, rng, n_max=32),
        "graph_pred_linear": PaiNNHead(cfg.emb_dim).init(
            rng, jnp.zeros((2, cfg.emb_dim)))["params"],
    }
    store = _synthetic_store(m=4, n_lo=4, n_hi=12, seed=6)
    pred = Predictor(cfg, params, batch_size=4, bucket_sizes=(32,))
    out = pred.predict(store)
    assert out.shape == (4,) and np.isfinite(out).all()

    b = pack_batch([store.get(2)], 32)
    g, _ = backbone_apply(params["model"], b.atom_type, b.positions,
                          b.node_mask)
    expect = float(PaiNNHead(cfg.emb_dim).apply(
        {"params": params["graph_pred_linear"]}, g)[0])
    np.testing.assert_allclose(out[2], expect, rtol=2e-5, atol=1e-5)


def test_serve_cli_pairs_mode(tmp_path):
    from geossl_tpu import serve
    from geossl_tpu.train import checkpoints, common
    from geossl_tpu.train.common import DualHead

    cfg = ModelConfig()
    module, _ = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(9)
    params = {
        "model": common.init_backbone(module, rng, n_max=32),
        "graph_pred_linear": DualHead().init(
            rng, jnp.zeros((2, cfg.emb_dim)), jnp.zeros((2, cfg.emb_dim))
        )["params"],
    }
    ckpt = str(tmp_path / "model.ckpt")
    checkpoints.save_checkpoint(ckpt, params)
    active = _synthetic_store(m=5, n_lo=4, n_hi=20, seed=7)
    inactive = _synthetic_store(m=5, n_lo=4, n_hi=20, seed=8)
    pa, pi = str(tmp_path / "a.npz"), str(tmp_path / "i.npz")
    active.save(pa)
    inactive.save(pi)
    out_csv = str(tmp_path / "probs.csv")
    serve.main(["--ckpt", ckpt, "--input", pa, "--input_inactive", pi,
                "--mode", "pairs", "--output", out_csv, "--batch_size", "4"])
    lines = open(out_csv).read().strip().split("\n")
    assert len(lines) == 5
    vals = np.array([float(l.split(",")[1]) for l in lines])
    assert ((vals > 0) & (vals < 1)).all()


def test_predict_painn_fused_stack_matches_per_block():
    """With use_pallas the PaiNN Predictor routes N<=64 buckets through the
    whole-stack inference kernel (models/painn.fused_stack_apply, kexp9);
    predictions must match the per-block path exactly."""
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.common import PaiNNHead

    rng = jax.random.PRNGKey(5)
    cfg_fused = ModelConfig(model_3d="painn", use_pallas=True)
    cfg_plain = ModelConfig(model_3d="painn", use_pallas=False)
    module, _ = common.make_backbone(cfg_plain)
    params = {
        "model": common.init_backbone(module, rng, n_max=32),
        "graph_pred_linear": PaiNNHead(cfg_plain.emb_dim).init(
            rng, jnp.zeros((2, cfg_plain.emb_dim)))["params"],
    }
    store = _synthetic_store(m=6, n_lo=4, n_hi=30, seed=9)
    out_fused = Predictor(cfg_fused, params, batch_size=4,
                          bucket_sizes=(32,)).predict(store)
    out_plain = Predictor(cfg_plain, params, batch_size=4,
                          bucket_sizes=(32,)).predict(store)
    np.testing.assert_allclose(out_fused, out_plain, rtol=2e-5, atol=1e-5)


def test_predict_schnet_fused_stack_matches_per_block():
    """SchNet Predictor with use_pallas routes N<=64 buckets through the
    whole-stack kernel (kexp2 integration); predictions match per-block."""
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.finetune_qm9 import LinearHead

    rng = jax.random.PRNGKey(2)
    cfg_fused = ModelConfig(use_pallas=True)
    cfg_plain = ModelConfig(use_pallas=False)
    module, _ = common.make_backbone(cfg_plain)
    params = {
        "model": common.init_backbone(module, rng, n_max=32),
        "graph_pred_linear": LinearHead().init(
            rng, jnp.zeros((2, cfg_plain.emb_dim)))["params"],
    }
    store = _synthetic_store(m=6, n_lo=4, n_hi=30, seed=1)
    out_fused = Predictor(cfg_fused, params, batch_size=4,
                          bucket_sizes=(32,)).predict(store)
    out_plain = Predictor(cfg_plain, params, batch_size=4,
                          bucket_sizes=(32,)).predict(store)
    np.testing.assert_allclose(out_fused, out_plain, rtol=2e-5, atol=1e-5)


def test_serve_cli_usage_error_preserves_output(tmp_path):
    """--mode pairs without --input_inactive must error BEFORE opening
    --output: a usage mistake must not truncate an existing results file."""
    from geossl_tpu import serve
    from geossl_tpu.train import checkpoints

    cfg = ModelConfig()
    params = dict(_manual_params(cfg), y_mean=np.float32(0.0),
                  y_std=np.float32(1.0))
    ckpt = str(tmp_path / "model.ckpt")
    checkpoints.save_checkpoint(ckpt, params)
    store = _synthetic_store(m=3)
    npz = str(tmp_path / "mols.npz")
    store.save(npz)
    out_csv = tmp_path / "preds.csv"
    out_csv.write_text("precious\n")
    with pytest.raises(SystemExit):
        serve.main(["--ckpt", ckpt, "--input", npz, "--mode", "pairs",
                    "--output", str(out_csv), "--batch_size", "4"])
    assert out_csv.read_text() == "precious\n"
