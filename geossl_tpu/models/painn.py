"""PaiNN — polarizable interaction neural network, dense TPU formulation.

Reference: ``Geom3D/models/painn.py:14-269`` + ``painn_utils.py`` (edge-list,
torch index_add). Dense layout: scalar features ``q [B,N,F]`` and vector
features ``mu [B,N,3,F]``; all edge quantities live on the ``[B,N,N]`` pair
grid and message aggregation is an einsum over the j axis.

Behavioral parity notes:
* The reference takes a **precomputed** ``radius_edge_index`` built from the
  *clean* geometry and keeps using it for perturbed views
  (``painn.py:216,230``; ``pretrain_GeoSSL.py:88-89``) while distances and
  directions come from the live positions. Dense equivalent: the caller may
  pass ``pair_mask`` (clean-geometry adjacency); live positions always feed
  ``d_ij`` / ``dir_ij``. When ``pair_mask`` is None it is computed from the
  live positions (the fine-tune drivers' precomputed-radius behavior on
  unperturbed data is identical either way).
* ``nn.Embedding(max_z, F, padding_idx=0)`` (``painn.py:174``) zero-inits row
  0 **and freezes its gradient** — with GeoSSL's index-coded atom types this
  pins the hydrogen embedding at zero. Reproduced faithfully
  (``zero_pad_embedding``), toggleable.
* The cosine cutoff's hard ``d < cutoff`` gate (``painn_utils.py:154``) is
  combined with the pair mask so padded pairs (d = 0) cannot leak.
* ``dir_ij = (pos_i - pos_j)/d_ij`` with safe masked division.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from geossl_tpu.models.common import (
    Dense,
    cosine_cutoff,
    gaussian_rbf,
    normal_embed,
)
from geossl_tpu.ops import geometry


class PaiNNInteraction(nn.Module):
    """Inter-atomic message block (``painn.py:14-66``)."""

    n_atom_basis: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, mu, w, direction, adj):
        """q [B,N,F]; mu [B,N,3,F]; w [B,N,N,3F] (filters, already gated);
        direction [B,N,N,3]; adj [B,N,N] float mask."""
        f = self.n_atom_basis
        x = Dense(f, activation=jax.nn.silu, dtype=self.dtype)(q)
        x = Dense(3 * f, dtype=self.dtype)(x)  # [B,N,F*3]
        # Gate filters by adjacency so padded pairs contribute nothing.
        w = w * adj[..., None]
        # xe[b,i,j,:] = w[b,i,j,:] * x[b,j,:]
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
    max_z: int = 9
    shared_interactions: bool = False
    shared_filters: bool = False
    epsilon: float = 1e-8
    zero_pad_embedding: bool = True
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
            adj = geometry.radius_adjacency(dist, live_mask, self.cutoff)
        else:
            adj = pair_mask & live_mask  # clean-geometry edges, padded excluded
        adjf = adj.astype(jnp.float32)

        # Radial features (painn.py:236-245): Gaussian RBF with per-basis
        # widths, cosine cutoff with hard gate, one shared filter_net Dense
        # emitting all layers' filters at once.
        offsets = jnp.linspace(0.0, self.cutoff, self.n_rbf, dtype=jnp.float32)
        widths = jnp.abs(offsets[1] - offsets[0]) * jnp.ones_like(offsets)
        phi = gaussian_rbf(dist, offsets, widths)  # [B,N,N,R]
        fcut = cosine_cutoff(dist, self.cutoff)  # [B,N,N]
        if self.dtype is not None:
            phi = phi.astype(self.dtype)
        n_filter_out = 3 * f if self.shared_filters else self.n_interactions * 3 * f
        filters = Dense(n_filter_out, dtype=self.dtype, name="filter_net")(phi)
        filters = filters * fcut[..., None].astype(filters.dtype)
        if self.shared_filters:
            filter_list = [filters] * self.n_interactions
        else:
            filter_list = jnp.split(filters, self.n_interactions, axis=-1)

        mu = jnp.zeros((*q.shape[:2], 3, f), q.dtype)

        if self.shared_interactions:
            interaction = PaiNNInteraction(f, dtype=self.dtype, name="PaiNNInteraction_shared")
            mixing = PaiNNMixing(f, self.epsilon, dtype=self.dtype, name="PaiNNMixing_shared")
            blocks = [(interaction, mixing)] * self.n_interactions
        else:
            blocks = [
                (
                    PaiNNInteraction(f, dtype=self.dtype, name=f"PaiNNInteraction_{k}"),
                    PaiNNMixing(f, self.epsilon, dtype=self.dtype, name=f"PaiNNMixing_{k}"),
                )
                for k in range(self.n_interactions)
            ]

        for k, (interaction, mixing) in enumerate(blocks):
            q, mu = interaction(q, mu, filter_list[k], direction, adjf)
            q, mu = mixing(q, mu)

        q = q.astype(jnp.float32)
        # Zero padded nodes before pooling (their q drifted via biases).
        out = geometry.readout(q, node_mask, self.readout)
        return out, q
