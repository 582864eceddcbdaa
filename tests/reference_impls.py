"""Independent NumPy edge-list implementations of the reference math.

These mirror the *formulas* of the PyTorch reference (cited per function) but
are written from scratch against ragged edge lists, exactly the layout the
reference uses. The dense padded JAX models must agree with these to float
tolerance on random inputs — that is the padding/ragged equivalence oracle
(SURVEY.md §4(d)) and, since the formulas are transcribed independently, a
numerics parity check.
"""

from __future__ import annotations

import numpy as np


def softplus(x):
    return np.logaddexp(0.0, x)


def ssp(x):
    return softplus(x) - np.log(2.0)


def radius_edges(pos: np.ndarray, cutoff: float):
    """All ordered pairs (i, j), i != j, with |pos_i - pos_j| < cutoff.
    Mirrors ``radius_graph(pos, r, loop=False)`` without the
    max_num_neighbors=32 truncation (see ops/geometry.py docstring)."""
    n = pos.shape[0]
    edges = []
    for i in range(n):
        for j in range(n):
            if i != j and np.linalg.norm(pos[i] - pos[j]) < cutoff:
                edges.append((i, j))
    return np.array(edges, dtype=np.int64).reshape(-1, 2)


def gaussian_smearing(d, start, stop, num_gaussians):
    """``Geom3D/models/schnet.py:198-207``."""
    offset = np.linspace(start, stop, num_gaussians)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    diff = d[..., None] - offset
    return np.exp(coeff * diff**2)


def schnet_forward(params, z, pos, cutoff, num_interactions, readout="mean"):
    """Edge-list SchNet forward for ONE molecule (``schnet.py:85-125``).

    ``params`` uses the flax parameter tree produced by
    ``geossl_tpu.models.SchNet.init`` so both implementations share weights.
    Returns (graph_repr [F], node_repr [N, F]).
    """

    def dense(p, x, bias=True):
        y = x @ np.asarray(p["kernel"])
        if bias and "bias" in p:
            y = y + np.asarray(p["bias"])
        return y

    emb = np.asarray(params["Embed_0"]["embedding"])
    h = emb[z]

    edges = radius_edges(pos, cutoff)
    row, col = edges[:, 0], edges[:, 1]
    # PyG convention: radius_graph returns edge_index with messages flowing
    # col -> row; edge_weight = |pos_row - pos_col| (schnet.py:92-93).
    d = np.linalg.norm(pos[row] - pos[col], axis=-1)
    num_g = params["InteractionBlock_0"]["filter_w1"].shape[0]
    rbf = gaussian_smearing(d, 0.0, cutoff, num_g)

    n = z.shape[0]
    for k in range(num_interactions):
        blk = params[f"InteractionBlock_{k}"]
        # filter MLP on edge attrs
        w = rbf @ np.asarray(blk["filter_w1"]) + np.asarray(blk["filter_b1"])
        w = ssp(w)
        w = w @ np.asarray(blk["filter_w2"]) + np.asarray(blk["filter_b2"])
        env = 0.5 * (np.cos(d * np.pi / cutoff) + 1.0)
        w = w * env[:, None]
        # CFConv: lin1 (no bias), message x_j * W, sum into row (dst), lin2
        x = dense(blk["Dense_0"]["Dense_0"], h, bias=False)
        msg = x[col] * w
        agg = np.zeros((n, w.shape[1]))
        np.add.at(agg, row, msg)
        x = dense(blk["Dense_1"]["Dense_0"], agg)
        x = ssp(x)
        x = dense(blk["Dense_2"]["Dense_0"], x)
        h = h + x

    h = dense(params["Dense_0"]["Dense_0"], h)
    h = ssp(h)
    h = dense(params["Dense_1"]["Dense_0"], h)

    if readout == "mean":
        out = h.mean(axis=0)
    else:
        out = h.sum(axis=0)
    return out, h


def painn_forward(params, z, pos, edges, cutoff, n_interactions, readout="add"):
    """Edge-list PaiNN forward for ONE molecule (``painn.py:216-269``).

    ``edges`` is the precomputed radius_edge_index as an [E, 2] array of
    (i, j) pairs — PaiNN takes it as input rather than rebuilding it
    (``painn.py:216,230``). Returns (graph_repr [F], node_repr [N, F]).
    """

    def dense(p, x, bias=True):
        y = x @ np.asarray(p["kernel"])
        if bias and "bias" in p:
            y = y + np.asarray(p["bias"])
        return y

    def silu(x):
        return x / (1.0 + np.exp(-x))

    emb = np.asarray(params["embedding"]).copy()
    emb[0] = 0.0  # padding_idx=0 semantics (painn.py:174)
    f = emb.shape[1]
    n = z.shape[0]

    idx_i, idx_j = edges[:, 0], edges[:, 1]
    r_ij = pos[idx_i] - pos[idx_j]
    d_ij = np.linalg.norm(r_ij, axis=-1, keepdims=True)  # [E, 1]
    dir_ij = r_ij / d_ij  # [E, 3]

    # GaussianRBF with per-basis widths (painn_utils.py:99-136)
    offsets = np.linspace(0.0, cutoff, params["filter_kernel"].shape[0])
    widths = np.abs(offsets[1] - offsets[0]) * np.ones_like(offsets)
    phi = np.exp(-0.5 / widths**2 * (d_ij[..., None] - offsets) ** 2)  # [E,1,R]
    fcut = 0.5 * (np.cos(d_ij * np.pi / cutoff) + 1.0) * (d_ij < cutoff)  # [E,1]

    filters = (
        phi @ np.asarray(params["filter_kernel"]) + np.asarray(params["filter_bias"])
    ) * fcut[..., None]
    # [E, 1, n_interactions * 3F] -> split per layer
    filter_list = np.split(filters, n_interactions, axis=-1)

    q = emb[z][:, None, :]  # [N, 1, F]
    mu = np.zeros((n, 3, f))

    for k in range(n_interactions):
        blk = params[f"PaiNNInteraction_{k}"]
        mix = params[f"PaiNNMixing_{k}"]
        # interaction (painn.py:14-66)
        x = dense(blk["Dense_0"]["Dense_0"], q)
        x = silu(x)
        x = dense(blk["Dense_1"]["Dense_0"], x)  # [N, 1, 3F]
        xj = x[idx_j]
        muj = mu[idx_j]
        xe = filter_list[k] * xj  # [E, 1, 3F]
        dq_e, dmuR, dmumu = np.split(xe, 3, axis=-1)
        dq = np.zeros((n, 1, f))
        np.add.at(dq, idx_i, dq_e)
        dmu_e = dmuR * dir_ij[:, :, None] + dmumu * muj  # [E, 3, F]
        dmu = np.zeros((n, 3, f))
        np.add.at(dmu, idx_i, dmu_e)
        q = q + dq
        mu = mu + dmu
        # mixing (painn.py:69-114)
        mu_mix = dense(mix["mu_channel_mix"]["Dense_0"], mu, bias=False)
        mu_v, mu_w = np.split(mu_mix, 2, axis=-1)
        mu_vn = np.sqrt(np.sum(mu_v**2, axis=-2, keepdims=True) + 1e-8)
        ctx = np.concatenate([q, mu_vn], axis=-1)
        x = dense(mix["Dense_0"]["Dense_0"], ctx)
        x = silu(x)
        x = dense(mix["Dense_1"]["Dense_0"], x)
        dq_intra, dmu_intra, dqmu_intra = np.split(x, 3, axis=-1)
        dmu_intra = dmu_intra * mu_w
        dqmu_intra = dqmu_intra * np.sum(mu_v * mu_w, axis=1, keepdims=True)
        q = q + dq_intra + dqmu_intra
        mu = mu + dmu_intra

    q = q[:, 0, :]
    out = q.sum(axis=0) if readout in ("add", "sum") else q.mean(axis=0)
    return out, q
