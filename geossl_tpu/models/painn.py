"""PaiNN — polarizable interaction neural network, dense TPU formulation.

Reference: ``Geom3D/models/painn.py:14-269`` + ``painn_utils.py`` (edge-list,
torch index_add). Dense layout: scalar features ``q [B,N,F]`` and vector
features ``mu [B,N,3,F]``; all edge quantities live on the ``[B,N,N]`` pair
grid and message aggregation is an einsum over the j axis.

Memory: the reference materializes ALL layers' filters at once
(``filter_net`` output ``[E, L·3F]``, ``painn.py:241-245``) — the dense
equivalent ``[B,N,N,L·3F]`` is ~10 GB for LBA-sized graphs. Here each
interaction block computes its own filter slice ``phi @ W_k`` inside a
rematerialized (``jax.checkpoint``) block, so only ``[B,N,N,R]`` (R=20) and
transient per-layer ``[B,N,N,3F]`` tensors exist; backward recomputes them.
Identical math — the filter_net kernel is just sliced per layer.

Behavioral parity notes:
* The reference takes a **precomputed** ``radius_edge_index`` built from the
  *clean* geometry and keeps using it for perturbed views
  (``painn.py:216,230``; ``pretrain_GeoSSL.py:88-89``) while distances and
  directions come from the live positions. Dense equivalent: the caller may
  pass ``pair_mask`` (clean-geometry adjacency); live positions always feed
  ``d_ij`` / ``dir_ij``. When ``pair_mask`` is None it is computed from the
  live positions.
* ``nn.Embedding(max_z, F, padding_idx=0)`` (``painn.py:174``) zero-inits row
  0 **and freezes its gradient** — with GeoSSL's index-coded atom types this
  pins the hydrogen embedding at zero. Reproduced faithfully
  (``zero_pad_embedding``), toggleable.
* The cosine cutoff's hard ``d < cutoff`` gate (``painn_utils.py:154``) is
  combined with the pair mask so padded pairs (d = 0) cannot leak.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from geossl_tpu.models.common import (
    Dense,
    cosine_cutoff,
    gaussian_rbf,
    normal_embed,
    xavier_uniform,
    zeros_init,
)
from geossl_tpu.ops import geometry


class PaiNNInteraction(nn.Module):
    """Inter-atomic message block (``painn.py:14-66``). Computes its own
    filter slice from the radial features so the full-depth filter tensor is
    never materialized. With ``use_pallas`` the whole RBF → filter → triple
    message-reduction chain runs as one fused kernel
    (``ops/painn_pallas.py``; supports second-order AD — the double-backward
    terms run through the XLA reference math)."""

    n_atom_basis: int
    cutoff: float = 5.0
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    # Occupancy-gated tiles ("auto"/True/False): skip pair tiles whose gate
    # block is all-zero — see ops/painn_pallas.painn_message.
    sparse: Any = "auto"
    # Pair-axis model parallelism: mesh axis name; the module must run inside
    # shard_map over that axis with replicated inputs — each device reduces
    # its j-stripe of the pair grid, full (dq, dmu) come back via one psum
    # (same scheme as schnet.InteractionBlock.pair_axis; with use_pallas the
    # stripes run the fused kernel on rectangular [B,N,N/D] grids).
    pair_axis: Optional[str] = None

    @nn.compact
    def __call__(self, q, mu, dist, gate, direction, wk, bk):
        """q [B,N,F]; mu [B,N,3,F]; dist/gate [B,N,N] (gate = cosine cutoff ×
        adjacency); direction [B,N,N,3]; wk [R,3F]; bk [3F]."""
        f = self.n_atom_basis
        x = Dense(f, activation=jax.nn.silu, dtype=self.dtype)(q)
        x = Dense(3 * f, dtype=self.dtype)(x)  # [B,N,F*3]

        if self.pair_axis is not None:
            from geossl_tpu.ops.painn_pallas import (
                painn_message_fused,
                painn_message_reference,
            )
            from geossl_tpu.ops.pallas_utils import sparse_auto
            from geossl_tpu.parallel.pair_parallel import local_stripe

            n = dist.shape[-1]
            j0, nloc = local_stripe(self.pair_axis, n)
            jslice = lambda a, ax: jax.lax.dynamic_slice_in_dim(a, j0, nloc, ax)

            b = q.shape[0]
            stripe_args = (
                jslice(dist, 2), jslice(gate.astype(jnp.float32), 2),
                jslice(direction[..., 0], 2), jslice(direction[..., 1], 2),
                jslice(direction[..., 2], 2),
                jslice(x.astype(jnp.float32), 1),
                jslice(mu.astype(jnp.float32), 1).reshape(b, nloc, 3 * f),
                wk.astype(jnp.float32), bk.astype(jnp.float32), self.cutoff,
            )
            if self.use_pallas:
                # fused rectangular-stripe kernel; gate on the full grid
                # size (the i axis keeps all N tiles)
                dq, dmu_flat = painn_message_fused(
                    *stripe_args, sparse_auto(n, self.sparse))
            else:
                dq, dmu_flat = painn_message_reference(*stripe_args)
            dq = jax.lax.psum(dq, self.pair_axis)
            dmu = jax.lax.psum(dmu_flat, self.pair_axis).reshape(
                b, n, 3, f)
            return q + dq.astype(q.dtype), mu + dmu.astype(mu.dtype)

        if self.use_pallas:
            from geossl_tpu.ops.painn_pallas import painn_message

            b, n = q.shape[:2]
            # symmetric=False: PaiNN's inputs qualify for the tile-skipping
            # symmetric kernel (dist/gate symmetric, dir antisymmetric), but
            # it measures SLOWER here (0.96x at N=512, docs/PERF.md) — the
            # per-tile cost is the elementwise D/M reductions, which the
            # mirrored-B emission nearly doubles, unlike CFConv where the
            # shared filter MLP dominates. Kept opt-in via ops.painn_pallas.
            dq, dmu_flat = painn_message(
                dist, gate.astype(jnp.float32),
                direction[..., 0], direction[..., 1], direction[..., 2],
                x.astype(jnp.float32),
                mu.astype(jnp.float32).reshape(b, n, 3 * f),
                wk.astype(jnp.float32), bk.astype(jnp.float32), self.cutoff,
                symmetric=False, sparse=self.sparse,
            )
            dmu = dmu_flat.reshape(b, n, 3, f)
            return q + dq.astype(q.dtype), mu + dmu.astype(mu.dtype)

        # XLA path: per-layer RBF (painn_utils.py:99-136; CSE/remat-cheap,
        # phi is only [B,N,N,R]) + gated filters + einsum reductions.
        num_r = wk.shape[0]
        offsets = jnp.linspace(0.0, self.cutoff, num_r, dtype=jnp.float32)
        widths = jnp.abs(offsets[1] - offsets[0]) * jnp.ones_like(offsets)
        phi = gaussian_rbf(dist, offsets, widths)
        if self.dtype is not None:
            phi = phi.astype(self.dtype)
        w = (phi @ wk.astype(phi.dtype) + bk.astype(phi.dtype)) * gate[..., None].astype(phi.dtype)
        dq_w, dmur_w, dmumu_w = jnp.split(w, 3, axis=-1)
        dq_x, dmur_x, dmumu_x = jnp.split(x, 3, axis=-1)
        # dq[b,i,f]   = Σ_j dq_w[b,i,j,f]   * dq_x[b,j,f]
        dq = jnp.einsum("bijf,bjf->bif", dq_w, dq_x)
        # dmu from the radial part: Σ_j (dmuR_w*dmuR_x)[b,i,j,f] ⊗ dir[b,i,j,c]
        dmu_r = jnp.einsum("bijf,bjf,bijc->bicf", dmur_w, dmur_x, direction)
        # dmu from neighbor vectors: Σ_j (dmumu_w*dmumu_x)[b,i,j,f] * mu[b,j,c,f]
        dmu_m = jnp.einsum("bijf,bjf,bjcf->bicf", dmumu_w, dmumu_x, mu)
        return q + dq, mu + dmu_r + dmu_m


class PaiNNMixing(nn.Module):
    """Intra-atomic mixing block (``painn.py:69-114``)."""

    n_atom_basis: int
    epsilon: float = 1e-8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, mu):
        f = self.n_atom_basis
        mu_mix = Dense(2 * f, use_bias=False, dtype=self.dtype, name="mu_channel_mix")(
            mu
        )  # [B,N,3,2F]
        mu_v, mu_w = jnp.split(mu_mix, 2, axis=-1)
        mu_vn = jnp.sqrt(jnp.sum(mu_v * mu_v, axis=-2) + self.epsilon)  # [B,N,F]
        ctx = jnp.concatenate([q, mu_vn], axis=-1)
        x = Dense(f, activation=jax.nn.silu, dtype=self.dtype)(ctx)
        x = Dense(3 * f, dtype=self.dtype)(x)
        dq_intra, dmu_gate, dqmu_intra = jnp.split(x, 3, axis=-1)
        dmu_intra = dmu_gate[:, :, None, :] * mu_w  # [B,N,3,F]
        vw = jnp.sum(mu_v * mu_w, axis=-2)  # [B,N,F] scalar product over xyz
        q = q + dq_intra + dqmu_intra * vw
        mu = mu + dmu_intra
        return q, mu


class PaiNN(nn.Module):
    """Dense-batch PaiNN (``painn.py:117-269``).

    ``__call__(atom_type, positions, node_mask, pair_mask=None)`` returns
    ``(graph_repr [B,F], node_repr [B,N,F])`` — the ``return_latent=True``
    contract (``painn.py:267-268``).
    """

    n_atom_basis: int = 128
    n_interactions: int = 3
    n_rbf: int = 20
    cutoff: float = 5.0
    readout: str = "add"
    # Checkpoint-parity knob for torch_cluster's max_num_neighbors=32
    # truncation (the reference's *Radius dataset wrappers inherit it,
    # ``datasets_3D_Radius.py:118-122``); None = full neighborhood. Only
    # applies when ``pair_mask`` is not supplied by the caller.
    max_neighbors: Optional[int] = None
    max_z: int = 9
    shared_interactions: bool = False
    shared_filters: bool = False
    epsilon: float = 1e-8
    zero_pad_embedding: bool = True
    remat: bool = True
    use_pallas: bool = False
    sparse: Any = "auto"  # occupancy-gated pair tiles (painn_message docstring)
    # Mesh axis name for pair-grid model parallelism (run the apply inside
    # shard_map; see PaiNNInteraction.pair_axis and parallel/pair_parallel).
    pair_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, atom_type, positions, node_mask, pair_mask=None):
        f = self.n_atom_basis

        emb = self.param("embedding", normal_embed, (self.max_z, f))
        if self.zero_pad_embedding:
            # padding_idx=0 semantics: row 0 is zero and receives no gradient.
            row_gate = jnp.concatenate(
                [jnp.zeros((1, 1), emb.dtype), jnp.ones((self.max_z - 1, 1), emb.dtype)]
            )
            emb = emb * row_gate
        q = emb[atom_type]  # [B,N,F]

        dist, direction, live_mask = geometry.pairwise_directions(
            positions.astype(jnp.float32), node_mask
        )
        if pair_mask is None:
            adj = geometry.radius_adjacency(
                dist, live_mask, self.cutoff, self.max_neighbors
            )
        else:
            adj = pair_mask & live_mask  # clean-geometry edges, padded excluded

        # gate = cosine cutoff (hard d<cutoff) × adjacency; the per-layer RBF
        # lives inside the interaction blocks (painn.py:236-245).
        gate = cosine_cutoff(dist, self.cutoff) * adj.astype(jnp.float32)

        # one shared filter_net Dense for all layers (painn.py:178-187),
        # kept as a single kernel and SLICED per layer inside the blocks.
        n_filter_out = 3 * f if self.shared_filters else self.n_interactions * 3 * f
        fk = self.param("filter_kernel", xavier_uniform, (self.n_rbf, n_filter_out))
        fb = self.param("filter_bias", zeros_init, (n_filter_out,))

        mu = jnp.zeros((*q.shape[:2], 3, f), q.dtype)

        # the fused kernel IS the memory optimization; remat only helps XLA
        use_remat = self.remat and not self.use_pallas
        interaction_cls = (
            nn.remat(PaiNNInteraction, prevent_cse=False)
            if use_remat
            else PaiNNInteraction
        )
        mk_inter = lambda name: interaction_cls(
            f, cutoff=self.cutoff, dtype=self.dtype,
            use_pallas=self.use_pallas, sparse=self.sparse,
            pair_axis=self.pair_axis, name=name,
        )
        if self.shared_interactions:
            interaction = mk_inter("PaiNNInteraction_shared")
            mixing = PaiNNMixing(f, self.epsilon, dtype=self.dtype, name="PaiNNMixing_shared")
            blocks = [(interaction, mixing)] * self.n_interactions
        else:
            blocks = [
                (
                    mk_inter(f"PaiNNInteraction_{k}"),
                    PaiNNMixing(f, self.epsilon, dtype=self.dtype, name=f"PaiNNMixing_{k}"),
                )
                for k in range(self.n_interactions)
            ]

        for k, (interaction, mixing) in enumerate(blocks):
            sl = slice(0, 3 * f) if self.shared_filters else slice(3 * f * k, 3 * f * (k + 1))
            q, mu = interaction(q, mu, dist, gate, direction, fk[:, sl], fb[sl])
            q, mu = mixing(q, mu)

        q = q.astype(jnp.float32)
        # Zero padded nodes before pooling (their q drifted via biases).
        out = geometry.readout(q, node_mask, self.readout)
        return out, q


def fused_stack_apply(module: PaiNN, params, atom_type, positions, node_mask,
                      pair_mask=None):
    """INFERENCE-ONLY whole-stack forward: identical math to
    ``module.apply`` but the full interaction+mixing chain runs as ONE
    Pallas program (``ops/painn_pallas.painn_stack_infer`` — kexp9: 1.23x
    over the per-block fused chain at the QM9/DDM shape). Serving uses
    this (serve.Predictor); training keeps the per-block custom-VJP path
    (the mega kernel has no VJP by design — experiments/README.md kexp9).

    Requires the default module configuration (no pair_axis/dtype
    override) and N <= ops.painn_pallas.STACK_MAX_N (= 128 since kexp10;
    VMEM residency); callers fall back to ``module.apply`` otherwise.
    """
    if module.pair_axis is not None or module.dtype is not None:
        raise ValueError("fused_stack_apply: default config only")
    if positions.dtype != jnp.float32:
        raise ValueError(
            f"fused_stack_apply: positions must be float32 (got "
            f"{positions.dtype}); use module.apply for the f64 parity path")

    emb = params["embedding"]
    if module.zero_pad_embedding:
        row_gate = jnp.concatenate(
            [jnp.zeros((1, 1), emb.dtype),
             jnp.ones((module.max_z - 1, 1), emb.dtype)])
        emb = emb * row_gate
    q0 = emb[atom_type].astype(jnp.float32)

    dist, direction, live_mask = geometry.pairwise_directions(
        positions.astype(jnp.float32), node_mask)
    if pair_mask is None:
        adj = geometry.radius_adjacency(
            dist, live_mask, module.cutoff, module.max_neighbors)
    else:
        adj = pair_mask & live_mask
    gate = cosine_cutoff(dist, module.cutoff) * adj.astype(jnp.float32)

    stacked = _stack_params(module, params)
    from geossl_tpu.ops.painn_pallas import painn_stack_infer

    q, _ = painn_stack_infer(
        dist, gate, direction[..., 0], direction[..., 1], direction[..., 2],
        q0, stacked, module.cutoff, epsilon=module.epsilon)
    out = geometry.readout(q, node_mask, module.readout)
    return out, q


def _stack_params(module: PaiNN, params):
    """The 11-tuple of per-layer weight stacks the whole-stack kernels
    consume (ops/painn_pallas.painn_stack_infer docstring). Differentiable:
    plain stack/slice of the flax tree, so gradients flow back to it."""
    f = module.n_atom_basis
    L = module.n_interactions

    def layer(name_fmt, k):
        return params[name_fmt.format(
            "shared" if module.shared_interactions else k)]

    fk, fb = params["filter_kernel"], params["filter_bias"]
    sl = lambda k: (slice(0, 3 * f) if module.shared_filters
                    else slice(3 * f * k, 3 * f * (k + 1)))
    # models.common.Dense wraps a flax Dense, adding one "Dense_0" level
    def dw(block, name, what):
        return block[name]["Dense_0"][what]

    inter = [layer("PaiNNInteraction_{}", k) for k in range(L)]
    mix = [layer("PaiNNMixing_{}", k) for k in range(L)]
    return tuple(
        jnp.stack(x).astype(jnp.float32) for x in (
            [dw(b, "Dense_0", "kernel") for b in inter],
            [dw(b, "Dense_0", "bias") for b in inter],
            [dw(b, "Dense_1", "kernel") for b in inter],
            [dw(b, "Dense_1", "bias") for b in inter],
            [fk[:, sl(k)] for k in range(L)],
            [fb[sl(k)] for k in range(L)],
            [dw(b, "mu_channel_mix", "kernel") for b in mix],
            [dw(b, "Dense_0", "kernel") for b in mix],
            [dw(b, "Dense_0", "bias") for b in mix],
            [dw(b, "Dense_1", "kernel") for b in mix],
            [dw(b, "Dense_1", "bias") for b in mix],
        )
    )


def stack_train_apply(module: PaiNN, params, atom_type, positions, node_mask,
                      pair_mask=None):
    """DIFFERENTIABLE whole-stack forward (kexp10): the interaction+mixing
    chain runs as the ONE-program stack kernel on the forward pass while the
    backward reuses the per-block machinery (ops/painn_pallas.
    painn_stack_train — the forward saves the block-boundary (q, mu) values
    it already holds in VMEM; no mega-VJP exists or is needed). Same
    contract and constraints as :func:`fused_stack_apply` (default config,
    N <= STACK_MAX_N = 128, f32); gradients flow to params AND positions."""
    if module.pair_axis is not None or module.dtype is not None:
        raise ValueError("stack_train_apply: default config only")
    if positions.dtype != jnp.float32:
        raise ValueError(
            f"stack_train_apply: positions must be float32 (got "
            f"{positions.dtype}); use module.apply for the f64 parity path")

    emb = params["embedding"]
    if module.zero_pad_embedding:
        row_gate = jnp.concatenate(
            [jnp.zeros((1, 1), emb.dtype),
             jnp.ones((module.max_z - 1, 1), emb.dtype)])
        emb = emb * row_gate
    q0 = emb[atom_type].astype(jnp.float32)

    dist, direction, live_mask = geometry.pairwise_directions(
        positions.astype(jnp.float32), node_mask)
    if pair_mask is None:
        adj = geometry.radius_adjacency(
            dist, live_mask, module.cutoff, module.max_neighbors)
    else:
        adj = pair_mask & live_mask
    gate = cosine_cutoff(dist, module.cutoff) * adj.astype(jnp.float32)

    stacked = _stack_params(module, params)
    from geossl_tpu.ops.painn_pallas import painn_stack_train

    q, _ = painn_stack_train(
        dist, gate, direction[..., 0], direction[..., 1], direction[..., 2],
        q0, stacked, module.cutoff, module.epsilon)
    out = geometry.readout(q, node_mask, module.readout)
    return out, q
