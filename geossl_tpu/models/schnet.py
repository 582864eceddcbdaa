"""SchNet — continuous-filter convolution GNN, dense TPU formulation.

Reference: ``Geom3D/models/schnet.py:16-216`` (PyG edge-list implementation).
This version operates on padded batches (``atom_type [B,N]``,
``positions [B,N,3]``, ``node_mask [B,N]``): the radius graph becomes a
boolean adjacency mask over the dense pairwise-distance matrix, and the
CFConv message aggregation becomes a masked contraction
``m[b,i,f] = Σ_j adj[b,i,j] · W[b,i,j,f] · x[b,j,f]`` — static shapes, fully
fusible, with the filter MLP (the FLOPs-heavy part) running as large
``[B·N·N, G] @ [G, F]`` matmuls on the MXU. With ``use_pallas=True`` the
whole RBF → filter-MLP → envelope → message-sum chain runs as one fused
Pallas kernel that never materializes ``[B,N,N,F]`` in HBM
(``ops/cfconv_pallas.py``; supports second-order AD, so MD17's force path
may run fused too).

Behavioral parity notes:
* The graph is recomputed from the *live* positions every forward, matching
  ``radius_graph`` inside ``forward`` (``schnet.py:91``) — this matters for
  GeoSSL's perturbed views and for MD17 forces.
* The reference inherits ``torch_cluster``'s ``max_num_neighbors=32``
  truncation; we keep full neighborhoods (see ``ops/geometry.py``).
* ``readout='mean'`` divides by the true atom count.
* Init: Xavier-uniform weights, zero biases. The reference leaves the second
  filter-layer bias at torch's default uniform init by accident
  (``schnet.py:157-158`` zeroes ``mlp[0]`` twice) — we use zeros, the
  evident intent.
* The reference's dipole branch (dead code for every runnable workload — it
  indexes an atomic-mass table by *index-coded* atom types, which would be
  incorrect with ``node_class=9``) is reconstructed with the evident PyG
  semantics: ``dipole_readout`` below uses TRUE masses for the index-coded
  vocab (``_ATOMIC_MASSES``) and the mass-weighted center of mass.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from geossl_tpu.models.common import (
    Dense,
    cosine_envelope,
    normal_embed,
    shifted_softplus,
    xavier_uniform,
    zeros_init,
)
from geossl_tpu.ops import geometry
from geossl_tpu.ops.cfconv_pallas import cfconv


class InteractionBlock(nn.Module):
    """Residual interaction block (``schnet.py:138-167``):
    CFConv -> shifted-softplus -> Linear. The filter network
    (Linear(G->F) -> ssp -> Linear(F->F), ``schnet.py:141-145``) lives here as
    explicit parameters so the fused kernel can consume them directly."""

    hidden_channels: int
    num_filters: int
    num_gaussians: int
    cutoff: float
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    filter_mxu: str = "f32"  # 'bf16': half-precision filter matmuls, f32 accum
    # True only when the caller guarantees dist AND adj are bitwise symmetric
    # (the plain radius adjacency is; a max_neighbors-truncated one is NOT) —
    # lets the fused kernel skip below-diagonal tiles.
    symmetric: bool = True
    # Occupancy-gated tiles ("auto"/True/False): skip pair tiles whose env
    # block is all-zero — see ops/cfconv_pallas.cfconv.
    sparse: Any = "auto"
    # Pair-axis model parallelism (SURVEY.md §5.7 extension point): when set
    # to a mesh axis name, the module must run inside shard_map over that
    # axis with replicated inputs — each device computes the message partial
    # sum for its j-stripe of the [B,N,N] pair grid and the full messages
    # come back via one psum over ICI. Scales the O(N²) pair FLOPs and the
    # per-device pair-grid footprint by the axis size, for graphs beyond
    # the single-chip sizes (one chip reaches N=8192 — docs/PERF.md). With
    # use_pallas the stripes run the fused kernel on rectangular [B,N,N/D]
    # grids. See parallel/pair_parallel.py.
    pair_axis: Optional[str] = None

    @nn.compact
    def __call__(self, h, dist, adj):
        w1 = self.param(
            "filter_w1", xavier_uniform, (self.num_gaussians, self.num_filters)
        )
        b1 = self.param("filter_b1", zeros_init, (self.num_filters,))
        w2 = self.param(
            "filter_w2", xavier_uniform, (self.num_filters, self.num_filters)
        )
        b2 = self.param("filter_b2", zeros_init, (self.num_filters,))

        env = cosine_envelope(dist, self.cutoff) * adj.astype(dist.dtype)
        # CFConv (``schnet.py:170-195``): lin1 (no bias), message = x_j * W,
        # segment-sum over incoming edges, lin2.
        x = Dense(self.num_filters, use_bias=False, dtype=self.dtype)(h)
        # bf16 operand precision for the filter matmuls (f32 accumulation);
        # implied by a bf16 model dtype or opted into standalone via
        # ``filter_mxu='bf16'``. Measured NEUTRAL on v5e at N=32 and N=512
        # (TPU matmuls already default to bf16 operands — docs/PERF.md);
        # kept for other hardware.
        mxu = (
            "bf16"
            if self.dtype == jnp.bfloat16 or self.filter_mxu == "bf16"
            else "f32"
        )
        xf = x.astype(jnp.promote_types(jnp.float32, x.dtype))
        if self.pair_axis is not None:
            m = self._pair_sharded_conv(dist, env, xf, w1, b1, w2, b2, mxu)
        else:
            m = cfconv(
                dist, env, xf,
                w1, b1, w2, b2, 0.0, self.cutoff, self.num_gaussians, mxu,
                symmetric=self.symmetric, use_pallas=self.use_pallas,
                sparse=self.sparse,
            )
        if self.dtype is not None:
            m = m.astype(self.dtype)
        x = Dense(self.hidden_channels, dtype=self.dtype)(m)
        x = shifted_softplus(x)
        x = Dense(self.hidden_channels, dtype=self.dtype)(x)
        return x

    def _pair_sharded_conv(self, dist, env, x, w1, b1, w2, b2, mxu):
        """CFConv with the j axis of the pair grid sharded over
        ``pair_axis``: local stripe contraction + one psum. Node tensors are
        replicated (they are O(N·F); the pair grid is the O(N²·F) term).
        With ``use_pallas`` each device runs the fused kernel on its
        rectangular [B, N, N/D] stripe (occupancy-gated; the symmetric
        variant does not apply — a stripe is not symmetric), so the
        per-device HBM footprint stays O(B·N·N/D) with no filter-tensor
        materialization; otherwise the XLA reference math runs per stripe."""
        from geossl_tpu.ops.cfconv_pallas import (
            cfconv_fused,
            cfconv_fused_reference,
        )
        from geossl_tpu.ops.pallas_utils import sparse_auto
        from geossl_tpu.parallel.pair_parallel import local_stripe

        j0, nloc = local_stripe(self.pair_axis, dist.shape[-1])
        dist_l = jax.lax.dynamic_slice_in_dim(dist, j0, nloc, axis=2)
        env_l = jax.lax.dynamic_slice_in_dim(env, j0, nloc, axis=2)
        x_l = jax.lax.dynamic_slice_in_dim(x, j0, nloc, axis=1)
        if self.use_pallas:
            # auto-gate on the full (unsharded) pair-grid size: the i axis
            # keeps all N tiles even when the local j stripe is one tile
            sp = sparse_auto(dist.shape[-2], self.sparse)
            m = cfconv_fused(
                dist_l, env_l, x_l, w1, b1, w2, b2, 0.0, self.cutoff,
                self.num_gaussians, mxu, sp,
            )
        else:
            m = cfconv_fused_reference(
                dist_l, env_l, x_l, w1, b1, w2, b2, 0.0, self.cutoff,
                self.num_gaussians, mxu,
            )
        return jax.lax.psum(m, self.pair_axis)


# True masses for the index-coded vocab (H C N O F P S Cl, ?=0) — shared by
# the module's dipole branch and fused_stack_apply so they cannot desync.
_ATOMIC_MASSES = (1.008, 12.011, 14.007, 15.999, 18.998, 30.974, 32.06,
                  35.45, 0.0)


def dipole_readout(q, atom_type, positions, node_mask):
    """Graph dipole magnitude from per-atom charges ``q [B,N,1]``:
    mass-weighted center of mass over REAL atoms, ``|| Σ_i q_i (pos_i−com) ||``
    (the PyG-SchNet semantics the reference's dead branch mangles — see the
    ``dipole`` field note below)."""
    q = q * node_mask[..., None]
    masses = jnp.asarray(_ATOMIC_MASSES, jnp.float32)
    m = masses[atom_type] * node_mask  # [B,N]
    pos = positions.astype(jnp.float32)
    com = jnp.sum(m[..., None] * pos, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1, keepdims=True), 1e-9)  # [B,3]
    mu = jnp.sum(q * (pos - com[:, None, :]), axis=1)  # [B,3]
    return jnp.sqrt(jnp.sum(mu * mu, axis=-1, keepdims=True) + 1e-18)


class SchNet(nn.Module):
    """Dense-batch SchNet (``schnet.py:16-135``).

    ``__call__(atom_type, positions, node_mask)`` returns
    ``(graph_repr [B, F], node_repr [B, N, F])`` — the reference's
    ``return_latent=True`` contract (``schnet.py:123-124``); callers that only
    want the pooled representation take element 0.
    """

    hidden_channels: int = 128
    num_filters: int = 128
    num_interactions: int = 6
    num_gaussians: int = 51
    cutoff: float = 10.0
    node_class: int = 9
    readout: str = "mean"
    # Checkpoint-parity knob for torch_cluster's max_num_neighbors=32
    # truncation (``schnet.py:91``): keep each atom's k nearest in-cutoff
    # neighbors. Default None = full neighborhood (the documented delta).
    max_neighbors: Optional[int] = None
    mean: Optional[float] = None
    std: Optional[float] = None
    atomref: Optional[jnp.ndarray] = None  # [node_class] per-type offsets
    # Dipole-moment readout (``schnet.py:103-118``), RECONSTRUCTED: the
    # reference's branch is dead code that cannot run — it indexes
    # ase.data.atomic_masses with the 9-way INDEX-coded types (``:47,105``:
    # mass[0] for carbon, mass[1]=hydrogen for nitrogen, ...) and broadcasts
    # ``h [N,hidden] * (pos-c) [N,3]`` which only types at hidden==3. This
    # implementation keeps the upstream PyG-SchNet semantics the reference
    # mangled: per-atom charges (Dense(1) on the latent), mass-weighted
    # center of mass over REAL atoms with TRUE masses for the vocab, graph
    # dipole = || Σ_i q_i (pos_i − com) ||. When on, mean/std/atomref are
    # bypassed exactly as the reference gates them.
    dipole: bool = False
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    filter_mxu: str = "f32"
    sparse: Any = "auto"  # occupancy-gated pair tiles (cfconv docstring)
    # Mesh axis name for pair-grid model parallelism (run the apply inside
    # shard_map; see InteractionBlock.pair_axis and parallel/pair_parallel).
    pair_axis: Optional[str] = None

    @nn.compact
    def __call__(self, atom_type, positions, node_mask):
        h = nn.Embed(
            self.node_class,
            self.hidden_channels,
            embedding_init=normal_embed,
            dtype=self.dtype,
        )(atom_type)

        # Geometry in at-least-f32 regardless of compute dtype (f64 passes
        # through untouched — the float64 torch-parity tests rely on it).
        geom_dtype = jnp.promote_types(jnp.float32, positions.dtype)
        dist, pair_mask = geometry.pairwise_distances(
            positions.astype(geom_dtype), node_mask
        )
        adj = geometry.radius_adjacency(
            dist, pair_mask, self.cutoff, self.max_neighbors
        )

        for _ in range(self.num_interactions):
            h = h + InteractionBlock(
                self.hidden_channels,
                self.num_filters,
                self.num_gaussians,
                self.cutoff,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                filter_mxu=self.filter_mxu,
                # k-nearest truncation breaks adjacency symmetry, so the
                # tile-skipping kernel path must be disabled with it
                symmetric=self.max_neighbors is None,
                sparse=self.sparse,
                pair_axis=self.pair_axis,
            )(h, dist, adj)

        h = Dense(self.hidden_channels, dtype=self.dtype)(h)
        h = shifted_softplus(h)
        h = Dense(self.hidden_channels, dtype=self.dtype)(h)

        if self.dipole:
            # per-atom partial charge from the latent (PyG lin2->1 analog)
            q = Dense(1, dtype=self.dtype)(h).astype(jnp.float32)
            out = dipole_readout(q, atom_type, positions, node_mask)
            return out, h.astype(jnp.float32)

        if self.mean is not None and self.std is not None:
            h = h * self.std + self.mean
        if self.atomref is not None:
            ref = self.param(
                "atomref",
                lambda _: jnp.asarray(self.atomref, jnp.float32).reshape(-1, 1),
            )
            h = h + ref[atom_type].astype(h.dtype)

        h = h.astype(jnp.promote_types(jnp.float32, h.dtype))
        out = geometry.readout(h, node_mask, self.readout)
        return out, h


def fused_stack_apply(module: SchNet, params, atom_type, positions,
                      node_mask):
    """INFERENCE-ONLY whole-stack forward: identical math to
    ``module.apply`` with the full interaction chain in ONE Pallas program
    (``ops/cfconv_pallas.schnet_stack_infer`` — kexp2; integrated round 4
    alongside PaiNN's). Serving routes N <= STACK_MAX_N (= 128 since
    kexp10) buckets here; training keeps
    the per-block custom-VJP path. Requires the default module config
    (no pair_axis/dtype/filter_mxu override; square feature width — the
    stack kernel keeps h resident at one width; f32 positions — the f64
    parity contract belongs to module.apply)."""
    if (module.pair_axis is not None or module.dtype is not None
            or module.filter_mxu != "f32"
            or module.num_filters != module.hidden_channels):
        raise ValueError("fused_stack_apply: default config only")
    if positions.dtype != jnp.float32:
        raise ValueError(
            f"fused_stack_apply: positions must be float32 (got "
            f"{positions.dtype}); use module.apply for the f64 parity path")
    L = module.num_interactions

    h = params["Embed_0"]["embedding"][atom_type].astype(jnp.float32)
    dist, pair_mask = geometry.pairwise_distances(
        positions.astype(jnp.float32), node_mask)
    adj = geometry.radius_adjacency(
        dist, pair_mask, module.cutoff, module.max_neighbors)
    # env is identical for every block: computed ONCE here (the per-block
    # path recomputes it inside each InteractionBlock)
    env = cosine_envelope(dist, module.cutoff) * adj.astype(dist.dtype)

    blocks = [params[f"InteractionBlock_{k}"] for k in range(L)]
    stacked = tuple(
        jnp.stack(x).astype(jnp.float32) for x in (
            [b["Dense_0"]["Dense_0"]["kernel"] for b in blocks],   # lin1
            [b["filter_w1"] for b in blocks],
            [b["filter_b1"] for b in blocks],
            [b["filter_w2"] for b in blocks],
            [b["filter_b2"] for b in blocks],
            [b["Dense_1"]["Dense_0"]["kernel"] for b in blocks],
            [b["Dense_1"]["Dense_0"]["bias"] for b in blocks],
            [b["Dense_2"]["Dense_0"]["kernel"] for b in blocks],
            [b["Dense_2"]["Dense_0"]["bias"] for b in blocks],
        )
    )
    from geossl_tpu.ops.cfconv_pallas import schnet_stack_infer

    h = schnet_stack_infer(dist, env, h, stacked, 0.0, module.cutoff,
                           module.num_gaussians)

    h = h @ params["Dense_0"]["Dense_0"]["kernel"] \
        + params["Dense_0"]["Dense_0"]["bias"]
    h = shifted_softplus(h)
    h = h @ params["Dense_1"]["Dense_0"]["kernel"] \
        + params["Dense_1"]["Dense_0"]["bias"]

    if module.dipole:
        q = (h @ params["Dense_2"]["Dense_0"]["kernel"]
             + params["Dense_2"]["Dense_0"]["bias"]).astype(jnp.float32)
        out = dipole_readout(q, atom_type, positions, node_mask)
        return out, h.astype(jnp.float32)

    if module.mean is not None and module.std is not None:
        h = h * module.std + module.mean
    if module.atomref is not None:
        h = h + params["atomref"][atom_type].astype(h.dtype)

    h = h.astype(jnp.float32)
    out = geometry.readout(h, node_mask, module.readout)
    return out, h
