"""Sealed serving artifacts (geossl_tpu/export.py): jax.export roundtrip
parity with the live Predictor, per-mode program coverage, metadata, and
the error surface (unsealed modes, backbone-only artifacts, bad versions).

The reference has no deployment format (SURVEY.md §5.4 — its transfer
contract is a torch .pth plus the full Geom3D package); the sealed artifact
is a designed-new subsystem, so these tests pin it against the live serving
path rather than a reference oracle."""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.config import ModelConfig, SchNetConfig
from geossl_tpu.data.store import MolRecord, MolStore
from geossl_tpu.export import SealedPredictor, seal
from geossl_tpu.serve import Predictor
from geossl_tpu.train import common


def _tiny_cfg():
    return ModelConfig(
        emb_dim=16,
        schnet=SchNetConfig(hidden_channels=16, num_filters=16,
                            num_interactions=2, num_gaussians=9),
    )


def _store(sizes=(5, 9, 17, 30, 12), seed=0):
    rng = np.random.default_rng(seed)
    recs = [
        MolRecord(
            atom_type=rng.integers(0, 9, n).astype(np.int32),
            positions=rng.normal(scale=1.5, size=(n, 3)).astype(np.float32),
        )
        for n in sizes
    ]
    return MolStore.from_records(recs)


def _scalar_predictor(cfg, y_mean=1.5, y_std=2.0):
    module, _ = common.make_backbone(cfg)
    z = jnp.zeros((2, 8), jnp.int32)
    pos = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 3)),
                      jnp.float32)
    m = jnp.ones((2, 8), bool)
    bp = module.init(jax.random.PRNGKey(0), z, pos, m)["params"]
    g, _ = module.apply({"params": bp}, z, pos, m)
    head = common.make_head(cfg.model_3d, cfg.emb_dim)
    hp = head.init(jax.random.PRNGKey(1), g)["params"]
    params = {"model": bp, "graph_pred_linear": hp,
              "y_mean": y_mean, "y_std": y_std}
    return Predictor(cfg, params, batch_size=4, bucket_sizes=(16, 32)), bp, g


def test_sealed_matches_live_predictor(tmp_path):
    """predict/embed/forces through the deserialized StableHLO programs
    must equal the live jitted Predictor (same params, same buckets,
    denormalization baked into the exported programs)."""
    cfg = _tiny_cfg()
    pred, _, _ = _scalar_predictor(cfg)
    store = _store()
    path = str(tmp_path / "m.sealed")
    sizes = seal(pred, path, modes=("predict", "embed", "forces"))
    assert sorted(sizes) == [
        "embed_16", "embed_32", "forces_16", "forces_32",
        "predict_16", "predict_32",
    ]

    sp = SealedPredictor.load(path)
    np.testing.assert_allclose(sp.predict(store), pred.predict(store),
                               rtol=1e-6)
    np.testing.assert_allclose(sp.embed(store), pred.embed(store), rtol=1e-6)
    e_live, f_live = pred.predict_forces(store)
    e_seal, f_seal = sp.predict_forces(store)
    np.testing.assert_allclose(e_seal, e_live, rtol=1e-6)
    np.testing.assert_allclose(f_seal, f_live, rtol=1e-5, atol=1e-6)


def test_sealed_pairs_dual_tower(tmp_path):
    """LEP dual-tower probabilities from a sealed artifact equal the live
    path; pair programs exist for every (bucket, bucket) combination of
    pair_buckets."""
    cfg = _tiny_cfg()
    _, bp, g = _scalar_predictor(cfg)
    dual = common.DualHead()
    dp = dual.init(jax.random.PRNGKey(2), g, g)["params"]
    pred = Predictor(cfg, {"model": bp, "graph_pred_linear": dp},
                     batch_size=4, bucket_sizes=(16, 32))
    store = _store()
    path = str(tmp_path / "lep.sealed")
    sizes = seal(pred, path, modes=("pairs",), pair_buckets=(16, 32))
    assert sorted(sizes) == [
        "pairs_16x16", "pairs_16x32", "pairs_32x16", "pairs_32x32",
    ]
    sp = SealedPredictor.load(path)
    np.testing.assert_allclose(sp.predict_pairs(store, store),
                               pred.predict_pairs(store, store), rtol=1e-6)


def test_sealed_metadata_and_unsealed_mode_error(tmp_path):
    cfg = _tiny_cfg()
    pred, _, _ = _scalar_predictor(cfg)
    path = str(tmp_path / "m.sealed")
    seal(pred, path, modes=("embed",))
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
    assert meta["model_3d"] == "schnet" and meta["emb_dim"] == 16
    assert meta["bucket_sizes"] == [16, 32] and meta["batch_size"] == 4
    assert meta["modes"] == ["embed"]

    sp = SealedPredictor.load(path)
    store = _store()
    assert sp.embed(store).shape == (len(store), cfg.emb_dim)
    with pytest.raises(ValueError, match="no program 'predict_"):
        sp.predict(store)


def test_backbone_only_artifact_embed_only(tmp_path):
    """A pretrain checkpoint (no head) seals embed-only; head-bearing modes
    are rejected both at seal time and at serve time."""
    cfg = _tiny_cfg()
    pred, bp, _ = _scalar_predictor(cfg)
    bare = Predictor(cfg, {"model": bp}, batch_size=4, bucket_sizes=(16, 32))
    with pytest.raises(ValueError, match="backbone-only"):
        seal(bare, str(tmp_path / "x.sealed"), modes=("predict", "embed"))
    path = str(tmp_path / "emb.sealed")
    seal(bare, path, modes=("embed",))
    sp = SealedPredictor.load(path)
    np.testing.assert_allclose(sp.embed(_store()), bare.embed(_store()),
                               rtol=1e-6)
    with pytest.raises(ValueError, match="backbone-only"):
        sp.predict(_store())


def test_seal_input_validation(tmp_path):
    cfg = _tiny_cfg()
    pred, _, _ = _scalar_predictor(cfg)
    with pytest.raises(ValueError, match="unknown modes"):
        seal(pred, str(tmp_path / "x"), modes=("predict", "telepathy"))
    with pytest.raises(ValueError, match="not in the predictor's"):
        seal(pred, str(tmp_path / "x"), modes=("pairs",), pair_buckets=(64,))


def test_format_version_guard(tmp_path):
    cfg = _tiny_cfg()
    pred, _, _ = _scalar_predictor(cfg)
    path = str(tmp_path / "m.sealed")
    seal(pred, path, modes=("embed",))
    with zipfile.ZipFile(path) as z:
        names = {n: z.read(n) for n in z.namelist()}
    meta = json.loads(names["meta.json"])
    meta["format_version"] = 999
    names["meta.json"] = json.dumps(meta)
    bad = str(tmp_path / "bad.sealed")
    with zipfile.ZipFile(bad, "w") as z:
        for n, blob in names.items():
            z.writestr(n, blob)
    with pytest.raises(ValueError, match="format_version"):
        SealedPredictor.load(bad)


def test_seal_cli_roundtrip(tmp_path):
    """python -m geossl_tpu.export --ckpt ... --out ... then load+predict."""
    from geossl_tpu import export as export_mod
    from geossl_tpu.train import checkpoints

    # the CLI reconstructs the published-default ModelConfig, so the sealed
    # checkpoint must be default-sized (like a real trained one)
    cfg = ModelConfig()
    pred, _, _ = _scalar_predictor(cfg)
    ckpt = str(tmp_path / "model.ckpt")
    checkpoints.save_checkpoint(ckpt, jax.device_get(pred.params))
    out = str(tmp_path / "cli.sealed")
    export_mod.main(["--ckpt", ckpt, "--out", out, "--modes", "embed",
                     "--batch_size", "4", "--bucket", "16", "32"])
    sp = SealedPredictor.load(out)
    assert sp.meta["modes"] == ["embed"]
    np.testing.assert_allclose(sp.embed(_store()), pred.embed(_store()),
                               rtol=1e-6)


def test_cli_seal_subcommand_listed():
    from geossl_tpu.__main__ import COMMANDS

    assert "seal" in COMMANDS


def test_seal_parser_use_pallas_tristate():
    """--use_pallas is a true tristate: explicit on, explicit OFF
    (--no-use_pallas, needed for dual-platform tpu+cpu artifacts), or
    None -> backend-conditional default."""
    from geossl_tpu.export import build_parser

    p = build_parser()
    base = ["--ckpt", "x", "--out", "y"]
    assert p.parse_args(base).use_pallas is None
    assert p.parse_args(base + ["--use_pallas"]).use_pallas is True
    assert p.parse_args(base + ["--no-use_pallas"]).use_pallas is False
