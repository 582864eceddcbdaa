"""PyTorch numerics parity (SURVEY.md §4(c), BASELINE.md).

Re-implements the reference's SchNet/PaiNN forward math with torch tensors
(edge lists + index_add, exactly the reference's computational structure —
``Geom3D/models/schnet.py:85-125``, ``painn.py:216-269``), loads the SAME
weights as the JAX dense models, and requires agreement to float tolerance.
This exercises torch's own softplus/cos/exp kernels rather than numpy's, so
it is a genuine cross-framework check.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from geossl_tpu.models.painn import PaiNN  # noqa: E402
from geossl_tpu.models.schnet import SchNet  # noqa: E402
from tests.reference_impls import radius_edges  # noqa: E402


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def torch_schnet_forward(params, z, pos, cutoff, num_interactions, readout="mean"):
    z = torch.tensor(z, dtype=torch.long)
    pos = t(pos)
    emb = t(params["Embed_0"]["embedding"])
    h = emb[z]

    edges = radius_edges(np.asarray(pos), cutoff)
    row, col = torch.tensor(edges[:, 0]), torch.tensor(edges[:, 1])
    d = (pos[row] - pos[col]).norm(dim=-1)
    num_g = params["InteractionBlock_0"]["filter_w1"].shape[0]
    offset = torch.linspace(0.0, cutoff, num_g, dtype=torch.float64)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    rbf = torch.exp(coeff * (d.view(-1, 1) - offset.view(1, -1)) ** 2)

    def ssp(x):
        return torch.nn.functional.softplus(x) - float(np.log(2.0))

    n = h.shape[0]
    for k in range(num_interactions):
        blk = params[f"InteractionBlock_{k}"]
        w = ssp(rbf @ t(blk["filter_w1"]) + t(blk["filter_b1"]))
        w = w @ t(blk["filter_w2"]) + t(blk["filter_b2"])
        env = 0.5 * (torch.cos(d * torch.pi / cutoff) + 1.0)
        w = w * env.view(-1, 1)
        x = h @ t(blk["Dense_0"]["Dense_0"]["kernel"])  # lin1, no bias
        msg = x[col] * w
        agg = torch.zeros((n, w.shape[1]), dtype=torch.float64)
        agg.index_add_(0, row, msg)
        x = agg @ t(blk["Dense_1"]["Dense_0"]["kernel"]) + t(blk["Dense_1"]["Dense_0"]["bias"])
        x = ssp(x)
        x = x @ t(blk["Dense_2"]["Dense_0"]["kernel"]) + t(blk["Dense_2"]["Dense_0"]["bias"])
        h = h + x

    h = h @ t(params["Dense_0"]["Dense_0"]["kernel"]) + t(params["Dense_0"]["Dense_0"]["bias"])
    h = ssp(h)
    h = h @ t(params["Dense_1"]["Dense_0"]["kernel"]) + t(params["Dense_1"]["Dense_0"]["bias"])
    out = h.mean(dim=0) if readout == "mean" else h.sum(dim=0)
    return out.numpy(), h.numpy()


def test_schnet_matches_torch_reference_math():
    model = SchNet(hidden_channels=32, num_filters=32, num_interactions=3,
                   num_gaussians=17, cutoff=5.0, node_class=9, readout="mean")
    rng = np.random.default_rng(0)
    z = rng.integers(0, 9, size=(7,)).astype(np.int32)
    pos = (rng.normal(size=(7, 3)) * 1.5).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(z)[None], jnp.asarray(pos)[None],
        jnp.ones((1, 7), bool),
    )["params"]
    out_jax, node_jax = model.apply(
        {"params": params}, jnp.asarray(z)[None], jnp.asarray(pos)[None],
        jnp.ones((1, 7), bool),
    )
    out_t, node_t = torch_schnet_forward(params, z, pos, 5.0, 3)
    np.testing.assert_allclose(np.asarray(out_jax)[0], out_t, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(node_jax)[0], node_t, rtol=2e-4, atol=1e-5)


def torch_painn_forward(params, z, pos, edges, cutoff, n_interactions):
    z_t = torch.tensor(z, dtype=torch.long)
    pos = t(pos)
    emb = t(params["embedding"]).clone()
    emb[0] = 0.0  # padding_idx=0
    f = emb.shape[1]
    n = z_t.shape[0]
    idx_i = torch.tensor(edges[:, 0])
    idx_j = torch.tensor(edges[:, 1])
    r_ij = pos[idx_i] - pos[idx_j]
    d_ij = r_ij.norm(dim=1, keepdim=True)
    dir_ij = r_ij / d_ij

    n_rbf = params["filter_kernel"].shape[0]
    offsets = torch.linspace(0.0, cutoff, n_rbf, dtype=torch.float64)
    width = (offsets[1] - offsets[0]).abs()
    phi = torch.exp(-0.5 / width**2 * (d_ij[..., None] - offsets) ** 2)  # [E,1,R]
    fcut = 0.5 * (torch.cos(d_ij * torch.pi / cutoff) + 1.0) * (d_ij < cutoff)
    filters = (phi @ t(params["filter_kernel"]) + t(params["filter_bias"])) * fcut[..., None]
    filter_list = torch.split(filters, 3 * f, dim=-1)

    def dense(p, x, bias=True):
        y = x @ t(p["kernel"])
        if bias and "bias" in p:
            y = y + t(p["bias"])
        return y

    q = emb[z_t][:, None, :]
    mu = torch.zeros((n, 3, f), dtype=torch.float64)
    for k in range(n_interactions):
        blk = params[f"PaiNNInteraction_{k}"]
        mix = params[f"PaiNNMixing_{k}"]
        x = torch.nn.functional.silu(dense(blk["Dense_0"]["Dense_0"], q))
        x = dense(blk["Dense_1"]["Dense_0"], x)
        xe = filter_list[k] * x[idx_j]
        dq_e, dmur, dmumu = torch.split(xe, f, dim=-1)
        dq = torch.zeros((n, 1, f), dtype=torch.float64)
        dq.index_add_(0, idx_i, dq_e)
        dmu_e = dmur * dir_ij[..., None] + dmumu * mu[idx_j]
        dmu = torch.zeros((n, 3, f), dtype=torch.float64)
        dmu.index_add_(0, idx_i, dmu_e)
        q, mu = q + dq, mu + dmu
        mu_mix = dense(mix["mu_channel_mix"]["Dense_0"], mu, bias=False)
        mu_v, mu_w = torch.split(mu_mix, f, dim=-1)
        mu_vn = torch.sqrt((mu_v**2).sum(dim=-2, keepdim=True) + 1e-8)
        ctx = torch.cat([q, mu_vn], dim=-1)
        x = torch.nn.functional.silu(dense(mix["Dense_0"]["Dense_0"], ctx))
        x = dense(mix["Dense_1"]["Dense_0"], x)
        dq_i, dmu_g, dqmu = torch.split(x, f, dim=-1)
        dmu_i = dmu_g * mu_w
        dqmu = dqmu * (mu_v * mu_w).sum(dim=1, keepdim=True)
        q = q + dq_i + dqmu
        mu = mu + dmu_i
    q = q[:, 0, :]
    return q.sum(dim=0).numpy(), q.numpy()


def test_painn_matches_torch_reference_math():
    model = PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=9, cutoff=4.0,
                  readout="add", max_z=9)
    rng = np.random.default_rng(1)
    z = rng.integers(0, 9, size=(6,)).astype(np.int32)
    pos = (rng.normal(size=(6, 3)) * 1.2).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(z)[None], jnp.asarray(pos)[None],
        jnp.ones((1, 6), bool),
    )["params"]
    out_jax, node_jax = model.apply(
        {"params": params}, jnp.asarray(z)[None], jnp.asarray(pos)[None],
        jnp.ones((1, 6), bool),
    )
    edges = radius_edges(pos, 4.0)
    out_t, node_t = torch_painn_forward(params, z, pos, edges, 4.0, 2)
    np.testing.assert_allclose(np.asarray(out_jax)[0], out_t, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(node_jax)[0], node_t, rtol=2e-4, atol=1e-5)
