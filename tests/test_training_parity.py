"""Training-dynamics parity vs a PyTorch reimplementation (VERDICT r1 #4).

Forward parity (test_torch_parity.py) pins the backbone math; these tests pin
the *training* path the reference actually runs:

- NCSNv3 (DDM head) loss AND gradients vs a torch edge-list reimplementation
  of ``examples/NCSN.py:183-212`` under shared weights and injected noise,
- a multi-step Adam trajectory (SchNet+QM9 L1 regression, and the full
  SchNet+DDM cross-view objective of ``pretrain_GeoSSL.py:179-212``) vs a
  torch run from the same initialization.

Everything runs in float64 on both sides (jax_enable_x64 scoped to this
module) so agreement is to numerical noise, not luck. With no egress for the
real corpus, this is the strongest available accuracy evidence
(docs/VALIDATION.md).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from geossl_tpu.models.schnet import SchNet  # noqa: E402
from geossl_tpu.objectives import pair_selection, perturb_positions  # noqa: E402
from geossl_tpu.objectives.ncsn import NCSNv3, sigma_ladder  # noqa: E402
from geossl_tpu.ops import geometry  # noqa: E402
from tests.reference_impls import radius_edges  # noqa: E402

EMB, NL, ANNEAL = 16, 10, 2.0
CUTOFF, NI, NG = 5.0, 2, 9
B, N = 4, 8


@pytest.fixture(autouse=True)
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def f64(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float64)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def torch_tree(tree):
    def leaf(x):
        v = torch.tensor(np.asarray(x), dtype=torch.float64)
        v.requires_grad_(True)
        return v
    return jax.tree_util.tree_map(leaf, tree)


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    z = rng.integers(0, 9, size=(B, N)).astype(np.int32)
    pos = (rng.normal(size=(B, N, 3)) * 1.2).astype(np.float64)
    return z, pos


# ------------------------------------------------------------ torch models


def ssp(x):
    return torch.nn.functional.softplus(x) - float(np.log(2.0))


def torch_schnet(p, z_b, pos_b, readout="mean"):
    """Batched edge-list SchNet forward on torch params (keeps autograd).
    Mirrors ``Geom3D/models/schnet.py:85-125`` per graph."""
    reprs, nodes = [], []
    for b in range(z_b.shape[0]):
        z = torch.tensor(z_b[b], dtype=torch.long)
        pos = torch.tensor(pos_b[b], dtype=torch.float64)
        h = p["Embed_0"]["embedding"][z]
        edges = radius_edges(np.asarray(pos_b[b]), CUTOFF)
        row, col = torch.tensor(edges[:, 0]), torch.tensor(edges[:, 1])
        d = (pos[row] - pos[col]).norm(dim=-1)
        offset = torch.linspace(0.0, CUTOFF, NG, dtype=torch.float64)
        coeff = -0.5 / (offset[1] - offset[0]) ** 2
        rbf = torch.exp(coeff * (d.view(-1, 1) - offset.view(1, -1)) ** 2)
        n = h.shape[0]
        for k in range(NI):
            blk = p[f"InteractionBlock_{k}"]
            w = ssp(rbf @ blk["filter_w1"] + blk["filter_b1"])
            w = w @ blk["filter_w2"] + blk["filter_b2"]
            env = 0.5 * (torch.cos(d * torch.pi / CUTOFF) + 1.0)
            w = w * env.view(-1, 1)
            x = h @ blk["Dense_0"]["Dense_0"]["kernel"]
            msg = x[col] * w
            agg = torch.zeros((n, w.shape[1]), dtype=torch.float64)
            agg = agg.index_add(0, row, msg)
            x = agg @ blk["Dense_1"]["Dense_0"]["kernel"] + blk["Dense_1"]["Dense_0"]["bias"]
            x = ssp(x)
            x = x @ blk["Dense_2"]["Dense_0"]["kernel"] + blk["Dense_2"]["Dense_0"]["bias"]
            h = h + x
        h = h @ p["Dense_0"]["Dense_0"]["kernel"] + p["Dense_0"]["Dense_0"]["bias"]
        h = ssp(h)
        h = h @ p["Dense_1"]["Dense_0"]["kernel"] + p["Dense_1"]["Dense_0"]["bias"]
        reprs.append(h.mean(dim=0) if readout == "mean" else h.sum(dim=0))
        nodes.append(h)
    return torch.stack(reprs), torch.stack(nodes)


def torch_ncsn_loss(hp, node, pos_src, sigmas_b, noise):
    """Edge-list NCSN_version_03 (``NCSN.py:183-212``) with injected σ/ε.
    ``pos_src`` supplies the pair distances (the DDM cross term feeds the
    OTHER view's distances); pairs = unordered i<j ("combination")."""
    iu, ju = np.triu_indices(N, k=1)
    losses = []
    for b in range(node.shape[0]):
        pos = torch.tensor(pos_src[b], dtype=torch.float64)
        d = (pos[iu] - pos[ju]).norm(dim=-1)
        sig = torch.tensor(float(sigmas_b[b]), dtype=torch.float64)
        eps = torch.tensor(noise[b, iu, ju], dtype=torch.float64)
        pert = d + eps * sig
        target = -(pert - d) / sig**2
        demb = torch.relu(pert[:, None] @ hp["w_d1"] + hp["b_d1"])
        demb = demb @ hp["w_d2"] + hp["b_d2"]  # [P,1]
        u = node[b] @ hp["out0_h"]["kernel"]  # [N,emb]
        x = torch.relu(u[iu] + u[ju] + demb @ hp["w_od"] + hp["b_od"])
        x = torch.relu(x @ hp["w2"] + hp["b2"])
        score = (x @ hp["w3"] + hp["b3"])[:, 0] / sig
        losses.append((0.5 * (score - target) ** 2 * sig**ANNEAL).sum())
    return torch.stack(losses).mean()


# ------------------------------------------------------------ jax models


def jax_setup(seed=0):
    model = SchNet(hidden_channels=EMB, num_filters=EMB, num_interactions=NI,
                   num_gaussians=NG, cutoff=CUTOFF, node_class=9, readout="mean")
    head = NCSNv3(emb_dim=EMB, sigma_begin=10.0, sigma_end=0.01,
                  num_noise_level=NL, anneal_power=ANNEAL)
    z, pos = make_batch(seed)
    mask = jnp.ones((B, N), bool)
    k = jax.random.PRNGKey(0)
    mp = model.init(k, jnp.asarray(z), jnp.asarray(pos), mask)["params"]
    dist, _ = geometry.pairwise_distances(jnp.asarray(pos), mask)
    sel = pair_selection(mask, "combination")
    hp = head.init(jax.random.fold_in(k, 1), k, jnp.zeros((B, N, EMB)), dist, sel)["params"]
    return model, head, z, pos, mask, f64(mp), f64(hp), sel


def extract_ncsn_rng(key):
    """Replicate NCSNv3's internal RNG consumption (``objectives/ncsn.py:
    86-89``) so torch can be fed the identical σ levels and noise grid."""
    rng_sigma, rng_noise = jax.random.split(key)
    level = jax.random.randint(rng_sigma, (B,), 0, NL)
    sigmas = sigma_ladder(10.0, 0.01, NL)[np.asarray(level)].astype(np.float64)
    noise = np.asarray(jax.random.normal(rng_noise, (B, N, N), jnp.float64))
    return sigmas, noise


# ------------------------------------------------------------ tests


def test_ncsn_v3_loss_and_gradients_match_torch():
    model, head, z, pos, mask, mp, hp, sel = jax_setup()
    key = jax.random.PRNGKey(7)

    def loss_fn(params):
        _, node = model.apply({"params": params["model"]},
                              jnp.asarray(z), jnp.asarray(pos), mask)
        dist, _ = geometry.pairwise_distances(jnp.asarray(pos), mask)
        return head.apply({"params": params["head"]}, key, node, dist, sel)

    loss_j, grads_j = jax.value_and_grad(loss_fn)({"model": mp, "head": hp})

    pt = torch_tree({"model": mp, "head": hp})
    sigmas, noise = extract_ncsn_rng(key)
    _, node_t = torch_schnet(pt["model"], z, pos)
    loss_t = torch_ncsn_loss(pt["head"], node_t, pos, sigmas, noise)
    loss_t.backward()

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-9)
    flat_j = jax.tree_util.tree_leaves_with_path(grads_j)
    flat_t = jax.tree_util.tree_leaves(pt)
    assert len(flat_j) == len(flat_t)
    for (path, gj), pt_leaf in zip(flat_j, flat_t):
        gt = pt_leaf.grad
        assert gt is not None, path
        np.testing.assert_allclose(
            np.asarray(gj), gt.numpy(), rtol=1e-7, atol=1e-10,
            err_msg=jax.tree_util.keystr(path))


def _run_adam_pair(jax_loss, torch_loss, params_j, params_t, steps=4, lr=1e-3):
    """Run optax.adam and torch.optim.Adam side by side from shared init;
    return per-step losses and final params for both."""
    tx = optax.adam(lr)
    opt_state = tx.init(params_j)
    grad_fn = jax.jit(jax.value_and_grad(jax_loss))
    leaves_t = jax.tree_util.tree_leaves(params_t)
    opt_t = torch.optim.Adam(leaves_t, lr=lr)  # Adam as pretrain_GeoSSL.py:341
    losses_j, losses_t = [], []
    for s in range(steps):
        lj, gj = grad_fn(params_j, s)
        updates, opt_state = tx.update(gj, opt_state)
        params_j = optax.apply_updates(params_j, updates)
        losses_j.append(float(lj))

        opt_t.zero_grad()
        lt = torch_loss(params_t, s)
        lt.backward()
        opt_t.step()
        losses_t.append(float(lt))
    return losses_j, losses_t, params_j, params_t


def assert_trees_close(tree_j, tree_t, rtol, atol):
    flat_j = jax.tree_util.tree_leaves_with_path(tree_j)
    flat_t = jax.tree_util.tree_leaves(tree_t)
    for (path, xj), xt in zip(flat_j, flat_t):
        np.testing.assert_allclose(
            np.asarray(xj), xt.detach().numpy(), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path))


def test_adam_trajectory_schnet_qm9_matches_torch():
    """4 Adam steps of SchNet + linear head + L1 loss (finetune_qm9 recipe:
    ``examples/finetune_qm9.py:249-263``) track torch to float64 tolerance."""
    model, _, z, pos, mask, mp, _, _ = jax_setup(seed=2)
    rng = np.random.default_rng(3)
    y = rng.normal(size=(B,)).astype(np.float64)
    wh = rng.normal(size=(EMB, 1)) * 0.1
    params = {"model": mp, "head": {"w": jnp.asarray(wh), "b": jnp.zeros((1,))}}

    def jax_loss(p, step):
        g, _ = model.apply({"params": p["model"]},
                           jnp.asarray(z), jnp.asarray(pos), mask)
        pred = (g @ p["head"]["w"] + p["head"]["b"])[:, 0]
        return jnp.mean(jnp.abs(pred - jnp.asarray(y)))

    pt = torch_tree(params)

    def torch_loss(p, step):
        g, _ = torch_schnet(p["model"], z, pos)
        pred = (g @ p["head"]["w"] + p["head"]["b"])[:, 0]
        return (pred - torch.tensor(y)).abs().mean()

    lj, lt, pj, _ = _run_adam_pair(jax_loss, torch_loss, params, pt)
    np.testing.assert_allclose(lj, lt, rtol=1e-8)
    assert_trees_close(pj, pt, rtol=1e-6, atol=1e-9)
    assert lj[-1] < lj[0]  # it actually trains


def test_adam_trajectory_schnet_ddm_matches_torch():
    """4 Adam steps of the full GeoSSL-DDM objective (two NCSNv3 heads scored
    on the OTHER view's distances, ``pretrain_GeoSSL.py:179-212``)."""
    model, head, z, pos, mask, mp, hp1, sel = jax_setup(seed=4)
    hp2 = f64(head.init(jax.random.PRNGKey(9), jax.random.PRNGKey(0),
                        jnp.zeros((B, N, EMB)),
                        jnp.zeros((B, N, N)), sel)["params"])
    params = {"model": mp, "n1": hp1, "n2": hp2}
    base = jax.random.PRNGKey(11)

    def step_keys(step):
        k = jax.random.fold_in(base, step)
        return jax.random.split(k, 3)

    def jax_loss(p, step):
        k_view, k1, k2 = step_keys(step)
        pos1 = jnp.asarray(pos)
        pos2 = perturb_positions(k_view, pos1, 0.0, 0.3)
        _, h1 = model.apply({"params": p["model"]}, jnp.asarray(z), pos1, mask)
        _, h2 = model.apply({"params": p["model"]}, jnp.asarray(z), pos2, mask)
        d1, _ = geometry.pairwise_distances(pos1, mask)
        d2, _ = geometry.pairwise_distances(pos2, mask)
        l1 = head.apply({"params": p["n1"]}, k1, h1, d2, sel)
        l2 = head.apply({"params": p["n2"]}, k2, h2, d1, sel)
        return (l1 + l2) / 2

    pt = torch_tree(params)

    def torch_loss(p, step):
        k_view, k1, k2 = step_keys(step)
        pos2 = np.asarray(perturb_positions(k_view, jnp.asarray(pos), 0.0, 0.3),
                          np.float64)
        _, h1 = torch_schnet(p["model"], z, pos)
        _, h2 = torch_schnet(p["model"], z, pos2)
        s1, n1 = extract_ncsn_rng(k1)
        s2, n2 = extract_ncsn_rng(k2)
        l1 = torch_ncsn_loss(p["n1"], h1, pos2, s1, n1)
        l2 = torch_ncsn_loss(p["n2"], h2, pos, s2, n2)
        return (l1 + l2) / 2

    lj, lt, pj, _ = _run_adam_pair(jax_loss, torch_loss, params, pt)
    np.testing.assert_allclose(lj, lt, rtol=1e-7)
    assert_trees_close(pj, pt, rtol=1e-5, atol=1e-8)


# ------------------------------------------------------- PaiNN trajectory


def torch_painn(p, z_b, pos_b, readout="add", edges_pos=None):
    """Batched differentiable edge-list PaiNN forward on torch params
    (mirrors ``Geom3D/models/painn.py:216-269``; autograd-safe — no in-place
    ops on leaves). ``edges_pos`` supplies the positions used to build the
    radius graph (the reference caches the CLEAN geometry's
    ``radius_edge_index`` and reuses it for perturbed views,
    ``pretrain_GeoSSL.py:88-89``); distances/directions always come from
    ``pos_b``."""
    f = p["embedding"].shape[1]
    gate_row = torch.ones((p["embedding"].shape[0], 1), dtype=torch.float64)
    gate_row[0] = 0.0  # padding_idx=0: row 0 pinned at zero, no gradient
    emb = p["embedding"] * gate_row
    n_rbf = p["filter_kernel"].shape[0]
    offsets = torch.linspace(0.0, CUTOFF, n_rbf, dtype=torch.float64)
    width = (offsets[1] - offsets[0]).abs()
    reprs, nodes = [], []
    for b in range(z_b.shape[0]):
        z = torch.tensor(z_b[b], dtype=torch.long)
        pos = torch.tensor(pos_b[b], dtype=torch.float64)
        edges = radius_edges(
            pos_b[b] if edges_pos is None else edges_pos[b], CUTOFF)
        idx_i = torch.tensor(edges[:, 0])
        idx_j = torch.tensor(edges[:, 1])
        r_ij = pos[idx_i] - pos[idx_j]
        d_ij = r_ij.norm(dim=1, keepdim=True)
        dir_ij = r_ij / d_ij
        phi = torch.exp(-0.5 / width**2 * (d_ij[..., None] - offsets) ** 2)
        fcut = 0.5 * (torch.cos(d_ij * torch.pi / CUTOFF) + 1.0) * (d_ij < CUTOFF)
        filters = (phi @ p["filter_kernel"] + p["filter_bias"]) * fcut[..., None]
        filter_list = torch.split(filters, 3 * f, dim=-1)

        def dense(blk, x, bias=True):
            y = x @ blk["kernel"]
            if bias and "bias" in blk:
                y = y + blk["bias"]
            return y

        n = z.shape[0]
        q = emb[z][:, None, :]
        mu = torch.zeros((n, 3, f), dtype=torch.float64)
        for k in range(NI):
            blk = p[f"PaiNNInteraction_{k}"]
            mix = p[f"PaiNNMixing_{k}"]
            x = torch.nn.functional.silu(dense(blk["Dense_0"]["Dense_0"], q))
            x = dense(blk["Dense_1"]["Dense_0"], x)
            xe = filter_list[k] * x[idx_j]
            dq_e, dmur, dmumu = torch.split(xe, f, dim=-1)
            dq = torch.zeros((n, 1, f), dtype=torch.float64).index_add(
                0, idx_i, dq_e)
            dmu_e = dmur * dir_ij[..., None] + dmumu * mu[idx_j]
            dmu = torch.zeros((n, 3, f), dtype=torch.float64).index_add(
                0, idx_i, dmu_e)
            q, mu = q + dq, mu + dmu
            mu_mix = dense(mix["mu_channel_mix"]["Dense_0"], mu, bias=False)
            mu_v, mu_w = torch.split(mu_mix, f, dim=-1)
            mu_vn = torch.sqrt((mu_v**2).sum(dim=-2, keepdim=True) + 1e-8)
            ctx = torch.cat([q, mu_vn], dim=-1)
            x = torch.nn.functional.silu(dense(mix["Dense_0"]["Dense_0"], ctx))
            x = dense(mix["Dense_1"]["Dense_0"], x)
            dq_i, dmu_g, dqmu = torch.split(x, f, dim=-1)
            q = q + dq_i + dqmu * (mu_v * mu_w).sum(dim=1, keepdim=True)
            mu = mu + dmu_g * mu_w
        qf = q[:, 0, :]
        reprs.append(qf.sum(dim=0) if readout == "add" else qf.mean(dim=0))
        nodes.append(qf)
    return torch.stack(reprs), torch.stack(nodes)


def test_adam_trajectory_painn_qm9_matches_torch():
    """4 Adam steps of PaiNN + linear head + L1 loss track torch — pins the
    vector-feature training dynamics (zero-pad embedding gradient gating,
    shared filter_net slicing, mixing-block residuals) the forward-parity
    test alone cannot."""
    from geossl_tpu.models.painn import PaiNN

    model = PaiNN(n_atom_basis=EMB, n_interactions=NI, n_rbf=NG,
                  cutoff=CUTOFF, readout="add", max_z=9)
    z, pos = make_batch(seed=6)
    mask = jnp.ones((B, N), bool)
    mp = f64(model.init(jax.random.PRNGKey(0), jnp.asarray(z),
                        jnp.asarray(pos), mask)["params"])
    rng = np.random.default_rng(8)
    y = rng.normal(size=(B,)).astype(np.float64)
    wh = rng.normal(size=(EMB, 1)) * 0.1
    params = {"model": mp, "head": {"w": jnp.asarray(wh), "b": jnp.zeros((1,))}}

    def jax_loss(p, step):
        g, _ = model.apply({"params": p["model"]},
                           jnp.asarray(z), jnp.asarray(pos), mask)
        pred = (g @ p["head"]["w"] + p["head"]["b"])[:, 0]
        return jnp.mean(jnp.abs(pred - jnp.asarray(y)))

    pt = torch_tree(params)

    def torch_loss(p, step):
        g, _ = torch_painn(p["model"], z, pos)
        pred = (g @ p["head"]["w"] + p["head"]["b"])[:, 0]
        return (pred - torch.tensor(y)).abs().mean()

    lj, lt, pj, _ = _run_adam_pair(jax_loss, torch_loss, params, pt)
    np.testing.assert_allclose(lj, lt, rtol=1e-7)
    assert_trees_close(pj, pt, rtol=1e-5, atol=1e-7)
    assert lj[-1] < lj[0]


def test_adam_trajectory_painn_ddm_matches_torch():
    """4 Adam steps of PaiNN + the cross-view DDM objective. Pins the
    reference's clean-geometry radius-graph reuse: the perturbed view keeps
    the CLEAN positions' edge set while distances/directions come from the
    live (perturbed) positions (``pretrain_GeoSSL.py:88-89``,
    ``painn.py:216,230``)."""
    from geossl_tpu.models.painn import PaiNN

    model = PaiNN(n_atom_basis=EMB, n_interactions=NI, n_rbf=NG,
                  cutoff=CUTOFF, readout="add", max_z=9)
    head = NCSNv3(emb_dim=EMB, sigma_begin=10.0, sigma_end=0.01,
                  num_noise_level=NL, anneal_power=ANNEAL)
    z, pos = make_batch(seed=10)
    mask = jnp.ones((B, N), bool)
    k = jax.random.PRNGKey(0)
    mp = f64(model.init(k, jnp.asarray(z), jnp.asarray(pos), mask)["params"])
    dist0, _ = geometry.pairwise_distances(jnp.asarray(pos), mask)
    sel = pair_selection(mask, "combination")
    hp1 = f64(head.init(jax.random.fold_in(k, 1), k,
                        jnp.zeros((B, N, EMB)), dist0, sel)["params"])
    hp2 = f64(head.init(jax.random.fold_in(k, 2), k,
                        jnp.zeros((B, N, EMB)), dist0, sel)["params"])
    params = {"model": mp, "n1": hp1, "n2": hp2}
    base = jax.random.PRNGKey(13)

    def step_keys(step):
        return jax.random.split(jax.random.fold_in(base, step), 3)

    def jax_loss(p, step):
        k_view, k1, k2 = step_keys(step)
        pos1 = jnp.asarray(pos)
        pos2 = perturb_positions(k_view, pos1, 0.0, 0.3)
        # clean-geometry pair_mask reused for BOTH views (driver behavior)
        d_clean, pm = geometry.pairwise_distances(pos1, mask)
        pair_mask = geometry.radius_adjacency(d_clean, pm, CUTOFF)
        _, h1 = model.apply({"params": p["model"]}, jnp.asarray(z), pos1,
                            mask, pair_mask)
        _, h2 = model.apply({"params": p["model"]}, jnp.asarray(z), pos2,
                            mask, pair_mask)
        d1, _ = geometry.pairwise_distances(pos1, mask)
        d2, _ = geometry.pairwise_distances(pos2, mask)
        l1 = head.apply({"params": p["n1"]}, k1, h1, d2, sel)
        l2 = head.apply({"params": p["n2"]}, k2, h2, d1, sel)
        return (l1 + l2) / 2

    pt = torch_tree(params)

    def torch_loss(p, step):
        k_view, k1, k2 = step_keys(step)
        pos2 = np.asarray(
            perturb_positions(k_view, jnp.asarray(pos), 0.0, 0.3), np.float64)
        _, h1 = torch_painn(p["model"], z, pos)
        _, h2 = torch_painn(p["model"], z, pos2, edges_pos=pos)  # clean edges
        s1, n1 = extract_ncsn_rng(k1)
        s2, n2 = extract_ncsn_rng(k2)
        l1 = torch_ncsn_loss(p["n1"], h1, pos2, s1, n1)
        l2 = torch_ncsn_loss(p["n2"], h2, pos, s2, n2)
        return (l1 + l2) / 2

    lj, lt, pj, _ = _run_adam_pair(jax_loss, torch_loss, params, pt)
    np.testing.assert_allclose(lj, lt, rtol=1e-7)
    assert_trees_close(pj, pt, rtol=1e-5, atol=1e-7)


# ------------------------------------------------- contrastive loss parity


def test_contrastive_losses_match_torch():
    """dual InfoNCE (`pretrain_GeoSSL.py:141-176`), the EBM-NCE objective
    (`:103-138`, averaged), and do_CL's EBM_dot_prod variant (`util.py:48`,
    NOT averaged) — loss values and gradients vs literal torch
    reimplementations."""
    from geossl_tpu.objectives.contrastive import (
        do_cl, dual_infonce_loss, ebm_nce_loss)

    rng = np.random.default_rng(21)
    Bc, D, T = 6, 12, 0.1
    x = rng.normal(size=(Bc, D))
    y = rng.normal(size=(Bc, D))

    def torch_pair():
        xt = torch.tensor(x, dtype=torch.float64, requires_grad=True)
        yt = torch.tensor(y, dtype=torch.float64, requires_grad=True)
        return xt, yt

    def check(jax_fn, torch_fn):
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        lj, gj = jax.value_and_grad(
            lambda a, b: jax_fn(a, b)[0], argnums=(0, 1))(xj, yj)
        xt, yt = torch_pair()
        lt = torch_fn(xt, yt)
        lt.backward()
        np.testing.assert_allclose(float(lj), float(lt.detach()), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(gj[0]), xt.grad.numpy(),
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(gj[1]), yt.grad.numpy(),
                                   rtol=1e-10, atol=1e-14)

    # dual InfoNCE: CE over BxB dot-product logits / T, both directions
    ce = torch.nn.CrossEntropyLoss()
    labels = torch.arange(Bc)

    def t_dual_infonce(xt, yt):
        l1 = ce(xt @ yt.T / T, labels)
        l2 = ce(yt @ xt.T / T, labels)
        return (l1 + l2) / 2

    check(lambda a, b: dual_infonce_loss(a, b, T), t_dual_infonce)

    # EBM-NCE objective: BCE pos vs one cyclic-shift negative, averaged
    bce = torch.nn.BCEWithLogitsLoss()
    roll = list(range(1, Bc)) + [0]  # cycle_index(B, 1)

    def t_ebm_nce(xt, yt):
        pos = (xt * yt).sum(dim=1)
        neg = (xt * yt[roll]).sum(dim=1)
        return (bce(pos, torch.ones(Bc, dtype=torch.float64))
                + bce(neg, torch.zeros(Bc, dtype=torch.float64))) / 2

    check(lambda a, b: ebm_nce_loss(a, b), t_ebm_nce)

    # do_CL EBM_dot_prod: temperature-scaled, NO averaging (util.py:48)
    def t_do_cl_ebm(xt, yt):
        pos = (xt * yt).sum(dim=1) / T
        neg = (xt * yt[roll]).sum(dim=1) / T
        return (bce(pos, torch.ones(Bc, dtype=torch.float64))
                + bce(neg, torch.zeros(Bc, dtype=torch.float64)))

    check(lambda a, b: do_cl(a, b, "EBM_dot_prod", T), t_do_cl_ebm)


# ----------------------------------------------- baseline objective parity


def test_charge_and_infograph_losses_match_torch():
    """Masked-atom CE (`pretrain_ChargePrediction.py:64-81`) and do_InfoGraph
    (`pretrain_3DInfoGraph.py:19-76`) — loss values and gradients vs literal
    torch reimplementations on unpadded batches with shared masks."""
    from geossl_tpu.objectives.heads import charge_loss
    from geossl_tpu.objectives.infograph import (
        InfoGraphDiscriminator, infograph_loss)

    rng = np.random.default_rng(23)
    Bc, Nn, C, F = 3, 5, 9, 8

    # ---- charge: CE over masked atoms only
    logits = rng.normal(size=(Bc, Nn, C))
    target = rng.integers(0, C, size=(Bc, Nn))
    lmask = rng.random(size=(Bc, Nn)) < 0.4
    lmask[0, 0] = True  # at least one

    lj, gj = jax.value_and_grad(
        lambda lg: charge_loss(jnp.asarray(lg), jnp.asarray(target),
                               jnp.asarray(lmask))[0])(logits)
    lt_in = torch.tensor(logits, dtype=torch.float64, requires_grad=True)
    flat = lt_in.reshape(-1, C)[torch.tensor(lmask.reshape(-1))]
    tgt = torch.tensor(target.reshape(-1)[lmask.reshape(-1)], dtype=torch.long)
    lt = torch.nn.functional.cross_entropy(flat, tgt)  # :81
    lt.backward()
    np.testing.assert_allclose(float(lj), float(lt.detach()), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gj), lt_in.grad.numpy(),
                               rtol=1e-10, atol=1e-14)

    # ---- InfoGraph: bilinear node-vs-summary BCE, cycle-shift negatives
    node = rng.normal(size=(Bc, Nn, F))
    graph = rng.normal(size=(Bc, F))
    w = rng.normal(size=(F, F)) * 0.3
    disc = InfoGraphDiscriminator(hidden_dim=F)
    dp = {"weight": jnp.asarray(w)}
    nmask = jnp.ones((Bc, Nn), bool)

    lj, gj = jax.value_and_grad(
        lambda wj: infograph_loss(disc, {"weight": wj}, jnp.asarray(node),
                                  jnp.asarray(graph), nmask)[0])(jnp.asarray(w))
    wt = torch.tensor(w, dtype=torch.float64, requires_grad=True)
    node_t = torch.tensor(node.reshape(-1, F), dtype=torch.float64)
    summary = torch.sigmoid(torch.tensor(graph, dtype=torch.float64))
    roll = list(range(1, Bc)) + [0]
    pos_s = summary.repeat_interleave(Nn, dim=0)
    neg_s = summary[roll].repeat_interleave(Nn, dim=0)
    bce = torch.nn.BCEWithLogitsLoss()
    pos = (node_t * (pos_s @ wt)).sum(dim=1)
    neg = (node_t * (neg_s @ wt)).sum(dim=1)
    lt = bce(pos, torch.ones_like(pos)) + bce(neg, torch.zeros_like(neg))
    lt.backward()
    np.testing.assert_allclose(float(lj), float(lt.detach()), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gj), wt.grad.numpy(),
                               rtol=1e-10, atol=1e-14)
