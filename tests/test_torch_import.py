"""Released-checkpoint import (utils/torch_import.py): reference-style torch
state_dicts -> flax param trees.

The torch side of each equality below consumes the RAW state_dict with
torch ``Linear`` semantics (``x @ W.T + b``), mirroring the reference
forward (``Geom3D/models/schnet.py:85-125`` / ``painn.py:216-269``) — so a
wrong key mapping OR a missing transpose in the converter breaks the test,
not just a model-math bug."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from geossl_tpu.utils.torch_import import (  # noqa: E402
    backbone_params_from_torch,
    painn_params_from_torch,
    schnet_params_from_torch,
)
from tests.reference_impls import radius_edges  # noqa: E402

EMB, NI, NG, CUTOFF = 16, 2, 9, 5.0
B, N = 3, 7


@pytest.fixture(autouse=True)
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _lin(rng, out_dim, in_dim):
    return rng.normal(size=(out_dim, in_dim)).astype(np.float64) * 0.3


def make_schnet_sd(rng):
    sd = {"embedding.weight": rng.normal(size=(9, EMB)) * 0.3,
          "lin1.weight": _lin(rng, EMB, EMB), "lin1.bias": rng.normal(size=EMB),
          "lin2.weight": _lin(rng, EMB, EMB), "lin2.bias": rng.normal(size=EMB)}
    for k in range(NI):
        p = f"interactions.{k}."
        sd[p + "mlp.0.weight"] = _lin(rng, EMB, NG)
        sd[p + "mlp.0.bias"] = rng.normal(size=EMB) * 0.1
        sd[p + "mlp.2.weight"] = _lin(rng, EMB, EMB)
        sd[p + "mlp.2.bias"] = rng.normal(size=EMB) * 0.1
        sd[p + "conv.lin1.weight"] = _lin(rng, EMB, EMB)
        sd[p + "conv.lin2.weight"] = _lin(rng, EMB, EMB)
        sd[p + "conv.lin2.bias"] = rng.normal(size=EMB) * 0.1
        sd[p + "lin.weight"] = _lin(rng, EMB, EMB)
        sd[p + "lin.bias"] = rng.normal(size=EMB) * 0.1
    return sd


def make_painn_sd(rng):
    sd = {"embedding.weight": rng.normal(size=(9, EMB)) * 0.3,
          "filter_net.weight": _lin(rng, NI * 3 * EMB, NG),
          "filter_net.bias": rng.normal(size=NI * 3 * EMB) * 0.1}
    sd["embedding.weight"][0] = 0.0  # padding_idx=0 row, as released
    for k in range(NI):
        i = f"interactions.{k}.interatomic_context_net."
        m = f"mixing.{k}."
        sd[i + "0.weight"] = _lin(rng, EMB, EMB)
        sd[i + "0.bias"] = rng.normal(size=EMB) * 0.1
        sd[i + "1.weight"] = _lin(rng, 3 * EMB, EMB)
        sd[i + "1.bias"] = rng.normal(size=3 * EMB) * 0.1
        sd[m + "mu_channel_mix.weight"] = _lin(rng, 2 * EMB, EMB)
        sd[m + "intraatomic_context_net.0.weight"] = _lin(rng, EMB, 2 * EMB)
        sd[m + "intraatomic_context_net.0.bias"] = rng.normal(size=EMB) * 0.1
        sd[m + "intraatomic_context_net.1.weight"] = _lin(rng, 3 * EMB, EMB)
        sd[m + "intraatomic_context_net.1.bias"] = rng.normal(size=3 * EMB) * 0.1
    return sd


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    z = rng.integers(0, 9, size=(B, N)).astype(np.int32)
    pos = (rng.normal(size=(B, N, 3)) * 1.2).astype(np.float64)
    return z, pos


def T(a):
    return torch.tensor(np.asarray(a, np.float64))


def ssp(x):
    return torch.nn.functional.softplus(x) - float(np.log(2.0))


def torch_schnet_from_sd(sd, z_b, pos_b):
    """Raw-state_dict SchNet forward (reference math, x @ W.T + b)."""
    outs = []
    for b in range(z_b.shape[0]):
        z = torch.tensor(z_b[b], dtype=torch.long)
        pos = T(pos_b[b])
        h = T(sd["embedding.weight"])[z]
        edges = radius_edges(np.asarray(pos_b[b]), CUTOFF)
        row, col = torch.tensor(edges[:, 0]), torch.tensor(edges[:, 1])
        d = (pos[row] - pos[col]).norm(dim=-1)
        off = torch.linspace(0.0, CUTOFF, NG, dtype=torch.float64)
        coeff = -0.5 / (off[1] - off[0]) ** 2
        rbf = torch.exp(coeff * (d.view(-1, 1) - off.view(1, -1)) ** 2)
        n = h.shape[0]
        for k in range(NI):
            p = f"interactions.{k}."
            w = ssp(rbf @ T(sd[p + "mlp.0.weight"]).T + T(sd[p + "mlp.0.bias"]))
            w = w @ T(sd[p + "mlp.2.weight"]).T + T(sd[p + "mlp.2.bias"])
            env = 0.5 * (torch.cos(d * torch.pi / CUTOFF) + 1.0)
            w = w * env.view(-1, 1)
            x = h @ T(sd[p + "conv.lin1.weight"]).T
            agg = torch.zeros((n, w.shape[1]), dtype=torch.float64).index_add(
                0, row, x[col] * w)
            x = agg @ T(sd[p + "conv.lin2.weight"]).T + T(sd[p + "conv.lin2.bias"])
            x = ssp(x)
            x = x @ T(sd[p + "lin.weight"]).T + T(sd[p + "lin.bias"])
            h = h + x
        h = ssp(h @ T(sd["lin1.weight"]).T + T(sd["lin1.bias"]))
        h = h @ T(sd["lin2.weight"]).T + T(sd["lin2.bias"])
        outs.append(h.mean(dim=0))
    return torch.stack(outs)


def torch_painn_from_sd(sd, z_b, pos_b):
    """Raw-state_dict PaiNN forward (reference math, x @ W.T + b)."""
    f = EMB
    offs = torch.linspace(0.0, CUTOFF, NG, dtype=torch.float64)
    width = (offs[1] - offs[0]).abs()
    outs = []
    for b in range(z_b.shape[0]):
        z = torch.tensor(z_b[b], dtype=torch.long)
        pos = T(pos_b[b])
        edges = radius_edges(np.asarray(pos_b[b]), CUTOFF)
        idx_i, idx_j = torch.tensor(edges[:, 0]), torch.tensor(edges[:, 1])
        r_ij = pos[idx_i] - pos[idx_j]
        d_ij = r_ij.norm(dim=1, keepdim=True)
        dir_ij = r_ij / d_ij
        phi = torch.exp(-0.5 / width**2 * (d_ij[..., None] - offs) ** 2)
        fcut = 0.5 * (torch.cos(d_ij * torch.pi / CUTOFF) + 1.0) * (d_ij < CUTOFF)
        filters = (phi @ T(sd["filter_net.weight"]).T
                   + T(sd["filter_net.bias"])) * fcut[..., None]
        filter_list = torch.split(filters, 3 * f, dim=-1)
        n = z.shape[0]
        q = T(sd["embedding.weight"])[z][:, None, :]
        mu = torch.zeros((n, 3, f), dtype=torch.float64)
        for k in range(NI):
            i = f"interactions.{k}.interatomic_context_net."
            m = f"mixing.{k}."
            x = torch.nn.functional.silu(
                q @ T(sd[i + "0.weight"]).T + T(sd[i + "0.bias"]))
            x = x @ T(sd[i + "1.weight"]).T + T(sd[i + "1.bias"])
            xe = filter_list[k] * x[idx_j]
            dq_e, dmur, dmumu = torch.split(xe, f, dim=-1)
            dq = torch.zeros((n, 1, f), dtype=torch.float64).index_add(
                0, idx_i, dq_e)
            dmu_e = dmur * dir_ij[..., None] + dmumu * mu[idx_j]
            dmu = torch.zeros((n, 3, f), dtype=torch.float64).index_add(
                0, idx_i, dmu_e)
            q, mu = q + dq, mu + dmu
            mu_mix = mu @ T(sd[m + "mu_channel_mix.weight"]).T
            mu_v, mu_w = torch.split(mu_mix, f, dim=-1)
            mu_vn = torch.sqrt((mu_v**2).sum(dim=-2, keepdim=True) + 1e-8)
            ctx = torch.cat([q, mu_vn], dim=-1)
            x = torch.nn.functional.silu(
                ctx @ T(sd[m + "intraatomic_context_net.0.weight"]).T
                + T(sd[m + "intraatomic_context_net.0.bias"]))
            x = (x @ T(sd[m + "intraatomic_context_net.1.weight"]).T
                 + T(sd[m + "intraatomic_context_net.1.bias"]))
            dq_i, dmu_g, dqmu = torch.split(x, f, dim=-1)
            q = q + dq_i + dqmu * (mu_v * mu_w).sum(dim=1, keepdim=True)
            mu = mu + dmu_g * mu_w
        outs.append(q[:, 0, :].sum(dim=0))
    return torch.stack(outs)


def test_schnet_import_matches_reference_forward():
    from geossl_tpu.models import SchNet

    rng = np.random.default_rng(0)
    sd = make_schnet_sd(rng)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float64), schnet_params_from_torch(sd))
    z, pos = make_batch()
    model = SchNet(hidden_channels=EMB, num_filters=EMB, num_interactions=NI,
                   num_gaussians=NG, cutoff=CUTOFF)
    ours, _ = model.apply({"params": params}, jnp.asarray(z),
                          jnp.asarray(pos), jnp.ones((B, N), bool))
    ref = torch_schnet_from_sd(sd, z, pos).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-8)


def test_painn_import_matches_reference_forward():
    from geossl_tpu.models import PaiNN
    from geossl_tpu.ops import geometry

    rng = np.random.default_rng(1)
    sd = make_painn_sd(rng)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float64), painn_params_from_torch(sd))
    z, pos = make_batch(seed=2)
    model = PaiNN(n_atom_basis=EMB, n_interactions=NI, n_rbf=NG,
                  cutoff=CUTOFF, readout="add")
    posj = jnp.asarray(pos)
    mask = jnp.ones((B, N), bool)
    dist, pm = geometry.pairwise_distances(posj, mask)
    adj = geometry.radius_adjacency(dist, pm, CUTOFF)
    ours, _ = model.apply({"params": params}, jnp.asarray(z), posj, mask, adj)
    ref = torch_painn_from_sd(sd, z, pos).numpy()
    # established PaiNN parity tolerance (test_training_parity uses 1e-5);
    # a mapping/transpose error would be O(1), not 1e-6
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-7)


def test_pth_file_roundtrip_and_autodetect(tmp_path):
    from geossl_tpu.train import checkpoints

    rng = np.random.default_rng(3)
    for maker, keyprobe in ((make_schnet_sd, "Embed_0"),
                            (make_painn_sd, "filter_kernel")):
        sd = {k: torch.tensor(v) for k, v in maker(rng).items()}
        path = tmp_path / "model.pth"
        torch.save(sd, str(path))
        tree = checkpoints.load_checkpoint(str(path))
        assert "model" in tree and keyprobe in tree["model"]
        direct = backbone_params_from_torch(sd)
        for a, b in zip(jax.tree_util.tree_leaves(tree["model"]),
                        jax.tree_util.tree_leaves(direct)):
            np.testing.assert_array_equal(a, b)


def test_wrapped_and_prefixed_state_dicts():
    rng = np.random.default_rng(4)
    sd = make_schnet_sd(rng)
    wrapped = {"model": {"module." + k: torch.tensor(v)
                         for k, v in sd.items()}}
    out = schnet_params_from_torch(wrapped)
    np.testing.assert_allclose(out["Embed_0"]["embedding"],
                               sd["embedding.weight"], rtol=1e-6)
    with pytest.raises(ValueError, match="neither"):
        backbone_params_from_torch({"foo.weight": np.zeros((2, 2))})


def test_painn_import_validates_filter_width():
    rng = np.random.default_rng(5)
    sd = make_painn_sd(rng)
    sd["filter_net.weight"] = sd["filter_net.weight"][: 3 * EMB + 1]
    with pytest.raises(ValueError, match="filter_net width"):
        painn_params_from_torch(sd)
    # shared-filters width (3F) is accepted
    sd["filter_net.weight"] = rng.normal(size=(3 * EMB, NG))
    sd["filter_net.bias"] = rng.normal(size=3 * EMB)
    out = painn_params_from_torch(sd)
    assert out["filter_kernel"].shape == (NG, 3 * EMB)


def test_finetune_checkpoint_head_drop_warns():
    import warnings

    rng = np.random.default_rng(6)
    wrapped = {"model": make_schnet_sd(rng),
               "graph_pred_linear": {"weight": np.zeros((1, EMB))}}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        schnet_params_from_torch(wrapped)
    assert any("graph_pred_linear" in str(x.message) for x in w)


def test_export_roundtrip_both_backbones(tmp_path):
    """params -> reference state_dict -> params is the identity, and the
    exported .pth reloads through the normal checkpoint path."""
    from geossl_tpu.utils.torch_import import save_torch_checkpoint
    from geossl_tpu.train import checkpoints

    rng = np.random.default_rng(7)
    for maker, from_torch in ((make_schnet_sd, schnet_params_from_torch),
                              (make_painn_sd, painn_params_from_torch)):
        params = from_torch(maker(rng))
        path = str(tmp_path / "export.pth")
        save_torch_checkpoint(path, {"model": params})
        back = checkpoints.load_checkpoint(path)["model"]
        la = jax.tree_util.tree_leaves_with_path(params)
        lb = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
        assert len(la) == len(lb)
        for k, v in la:
            np.testing.assert_array_equal(np.asarray(v, np.float32),
                                          lb[jax.tree_util.keystr(k)])


def test_head_import_linear_forward_parity():
    """torch Linear graph_pred_linear -> LinearHead params: same outputs."""
    from geossl_tpu.train.common import LinearHead
    from geossl_tpu.utils.torch_import import head_params_from_torch

    rng = np.random.default_rng(8)
    w = _lin(rng, 1, EMB)
    b = rng.normal(size=1).astype(np.float64)
    params = head_params_from_torch({"weight": w, "bias": b})
    x = rng.normal(size=(5, EMB)).astype(np.float64)
    ours = np.asarray(LinearHead().apply({"params": params}, jnp.asarray(x)))
    theirs = (x @ w.T + b)[:, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_head_import_painn_mlp_forward_parity():
    """torch create_output_layers() Sequential (silu halving MLP) ->
    PaiNNHead params: same outputs."""
    from geossl_tpu.train.common import PaiNNHead
    from geossl_tpu.utils.torch_import import head_params_from_torch

    rng = np.random.default_rng(9)
    w0 = _lin(rng, EMB // 2, EMB)
    b0 = rng.normal(size=EMB // 2).astype(np.float64)
    w1 = _lin(rng, 1, EMB // 2)
    b1 = rng.normal(size=1).astype(np.float64)
    params = head_params_from_torch(
        {"0.weight": w0, "0.bias": b0, "1.weight": w1, "1.bias": b1})
    x = rng.normal(size=(5, EMB)).astype(np.float64)
    ours = np.asarray(PaiNNHead(EMB).apply({"params": params}, jnp.asarray(x)))
    th = torch.nn.functional.silu(torch.tensor(x) @ torch.tensor(w0).T
                                  + torch.tensor(b0))
    th = (th @ torch.tensor(w1).T + torch.tensor(b1)).numpy()[:, 0]
    np.testing.assert_allclose(ours, th, rtol=1e-6)


def test_finetune_checkpoint_head_roundtrip(tmp_path):
    """Fine-tune tree (backbone + head) -> reference .pth (load_model
    wrapper layout) -> tree is the identity, for both head layouts."""
    from geossl_tpu.train.common import LinearHead, PaiNNHead
    from geossl_tpu.utils.torch_import import (
        load_torch_checkpoint, save_torch_checkpoint)

    rng = np.random.default_rng(10)
    key = jax.random.PRNGKey(0)
    heads = {
        "schnet": (make_schnet_sd, schnet_params_from_torch,
                   LinearHead().init(key, jnp.zeros((2, EMB)))["params"]),
        "painn": (make_painn_sd, painn_params_from_torch,
                  PaiNNHead(EMB).init(key, jnp.zeros((2, EMB)))["params"]),
    }
    for name, (maker, from_torch, head) in heads.items():
        tree = {"model": from_torch(maker(rng)), "graph_pred_linear": head}
        path = str(tmp_path / f"{name}.pth")
        save_torch_checkpoint(path, tree)
        raw = torch.load(path, weights_only=True)
        assert set(raw) == {"model", "graph_pred_linear"}  # load_model layout
        back = load_torch_checkpoint(path)
        la = jax.tree_util.tree_leaves_with_path(tree)
        lb = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
        assert len(la) == len(lb)
        for k, v in la:
            np.testing.assert_allclose(np.asarray(v, np.float32),
                                       lb[jax.tree_util.keystr(k)],
                                       rtol=1e-6, err_msg=f"{name}{k}")
