"""NCSN denoising-score-matching heads on pairwise distances — the GeoSSL-DDM
objective (annealed denoising distance matching).

Reference: ``examples/NCSN.py:46-220``. Three variants; ``NCSN_version_03``
is the one the DDM driver instantiates (``pretrain_GeoSSL.py:19,323-330``).
Shared recipe (v3, ``NCSN.py:183-212``):

1. per-graph noise level σ_g sampled uniformly from a geometric ladder
   exp(linspace(log σ_begin, log σ_end, L)) (non-trainable),
2. perturb pair distances d' = d + ε·σ, ε ~ N(0, 1),
3. target score  −(d' − d)/σ² = −ε/σ,
4. predicted score  MLP([h_i + h_j, demb(d')]) / σ,
5. loss  ½(score − target)²·σ^anneal, summed per graph over selected pairs,
   mean over graphs.

Dense formulation: all pair quantities live on the ``[B, N, N]`` grid with a
selection mask from ``objectives.pairs`` (the reference's O(N²)
``super_edge_index`` — "symmetry" = unordered pairs, each perturbed once).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from geossl_tpu.models.common import MLP, gaussian_smearing


def sigma_ladder(
    sigma_begin: float, sigma_end: float, num_noise_level: int
) -> np.ndarray:
    """Geometric σ schedule (``NCSN.py:178-179``)."""
    return np.exp(
        np.linspace(math.log(sigma_begin), math.log(sigma_end), num_noise_level)
    ).astype(np.float32)


class _NCSNBase(nn.Module):
    emb_dim: int = 128
    sigma_begin: float = 10.0
    sigma_end: float = 0.01
    num_noise_level: int = 50
    anneal_power: float = 2.0

    def _sample_sigmas(self, rng, batch_size, dtype=jnp.float32):
        sigmas = jnp.asarray(
            sigma_ladder(self.sigma_begin, self.sigma_end, self.num_noise_level),
            dtype,
        )
        level = jax.random.randint(rng, (batch_size,), 0, self.num_noise_level)
        return sigmas[level]  # [B]

    def _loss(self, scores, target, sel_mask, used_sigmas, graph_mask):
        """½(score−target)²·σ^anneal → per-graph sum → mean over graphs
        (``NCSN.py:208-212``)."""
        per_pair = 0.5 * (scores - target) ** 2 * used_sigmas**self.anneal_power
        per_pair = per_pair * sel_mask.astype(per_pair.dtype)
        per_graph = jnp.sum(per_pair, axis=(1, 2))
        if graph_mask is None:
            return jnp.mean(per_graph)
        gm = graph_mask.astype(per_graph.dtype)
        return jnp.sum(per_graph * gm) / jnp.maximum(jnp.sum(gm), 1.0)


class NCSNv3(_NCSNBase):
    """``NCSN_version_03`` (``NCSN.py:168-220``) — the DDM head.

    ``__call__(rng, node_feat [B,N,F], dist [B,N,N], sel_mask [B,N,N],
    graph_mask [B] | None) -> scalar loss``.

    The output MLP's first layer distributes over the reference's
    concat([h_i + h_j, demb]): (h_i+h_j)·W_h + demb·w_d + b with W_h applied
    PER NODE — identical math, no [B,N,N,F] tensor. With ``use_pallas`` the
    whole per-pair chain (perturbation, distance MLP, output MLP, annealed
    loss) runs as one fused kernel (``ops/ncsn_pallas.py``; first-order AD).
    """

    use_pallas: bool = False

    @nn.compact
    def __call__(self, rng, node_feat, dist, sel_mask, graph_mask=None,
                 sigmas=None, noise=None):
        """``sigmas [B]`` / ``noise [B,N,N]``, when given, replace the
        internal draws (``rng`` may then be None) — the cross-framework
        overlays (experiments/cross_framework_overlay.py) inject one shared
        numpy noise stream into both arms so loss curves are comparable
        step-by-step."""
        b = node_feat.shape[0]
        emb = self.emb_dim
        # σ/ε follow dist's dtype (≥f32) so the float64 parity path is exact
        ddtype = jnp.promote_types(jnp.float32, dist.dtype)
        if (sigmas is None) != (noise is None):
            raise ValueError("supply sigmas and noise together")
        if sigmas is None:
            rng_sigma, rng_noise = jax.random.split(rng)
            used_g = self._sample_sigmas(rng_sigma, b, ddtype)  # [B]
            noise = jax.random.normal(rng_noise, dist.shape, ddtype)
        else:
            used_g = jnp.asarray(sigmas, ddtype)
            noise = jnp.asarray(noise, ddtype)
        used = used_g[:, None, None]

        glorot = nn.initializers.glorot_uniform()
        zeros = nn.initializers.zeros
        # input_distance_mlp MLP(1 -> emb -> 1) (``NCSN.py:175``)
        w_d1 = self.param("w_d1", glorot, (1, emb))
        b_d1 = self.param("b_d1", zeros, (emb,))
        w_d2 = self.param("w_d2", glorot, (emb, 1))
        b_d2 = self.param("b_d2", zeros, (1,))
        # output MLP (``NCSN.py:176``): first layer factored into per-node
        # W_h (out0_h Dense) + per-pair w_od on demb. The reference draws the
        # whole (1+emb, emb) matrix from ONE Xavier-uniform fan, i.e. bound
        # sqrt(6/(fan_in + fan_out)) = sqrt(6/(1+2*emb)) — initialize both
        # factored pieces with exactly that bound so freshly-initialized
        # training matches the reference statistically, not just given
        # shared parameters.
        bound = float(np.sqrt(6.0 / (1 + 2 * emb)))

        def concat_xavier(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w_od = self.param("w_od", concat_xavier, (1, emb))
        b_od = self.param("b_od", zeros, (emb,))
        w2 = self.param("w2", glorot, (emb, emb // 2))
        b2 = self.param("b2", zeros, (emb // 2,))
        w3 = self.param("w3", glorot, (emb // 2, 1))
        b3 = self.param("b3", zeros, (1,))

        u = nn.Dense(
            emb, use_bias=False, kernel_init=concat_xavier, name="out0_h"
        )(node_feat)  # [B,N,emb]

        if self.use_pallas:
            from geossl_tpu.ops.ncsn_pallas import ncsn_score_loss

            rows = ncsn_score_loss(
                dist.astype(jnp.float32), noise,
                sel_mask.astype(jnp.float32), used_g[:, None],
                u.astype(jnp.float32),
                w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3,
                float(self.anneal_power),
            )
            per_graph = jnp.sum(rows, axis=1)
            if graph_mask is None:
                return jnp.mean(per_graph)
            gm = graph_mask.astype(per_graph.dtype)
            return jnp.sum(per_graph * gm) / jnp.maximum(jnp.sum(gm), 1.0)

        perturbed = dist + noise * used
        target = -(perturbed - dist) / used**2
        demb = jax.nn.relu(perturbed[..., None] * w_d1[0] + b_d1) @ w_d2 + b_d2
        d_term = demb @ w_od + b_od  # [B,N,N,emb]
        x = jax.nn.relu(u[:, :, None, :] + u[:, None, :, :] + d_term)
        x = jax.nn.relu(x @ w2 + b2)
        scores = (x @ w3 + b3)[..., 0]
        scores = scores / used  # f_θ,σ = f_θ / σ (``NCSN.py:205``)
        return self._loss(scores, target, sel_mask, used, graph_mask)


class NCSNv1(_NCSNBase):
    """``NCSN_version_01`` (``NCSN.py:46-95``): features = h_i ⊙ h_j."""

    @nn.compact
    def __call__(self, rng, node_feat, dist, sel_mask, graph_mask=None):
        b = node_feat.shape[0]
        rng_sigma, rng_noise = jax.random.split(rng)
        used = self._sample_sigmas(rng_sigma, b)[:, None, None]
        noise = jax.random.normal(rng_noise, dist.shape, dist.dtype)
        perturbed = dist + noise * used
        target = -(perturbed - dist) / used**2
        hprod = node_feat[:, :, None, :] * node_feat[:, None, :, :]
        scores = MLP([self.emb_dim, self.emb_dim // 2, 1])(hprod)[..., 0]
        scores = scores / used
        return self._loss(scores, target, sel_mask, used, graph_mask)


class NCSNv2(_NCSNBase):
    """``NCSN_version_02`` (``NCSN.py:110-166``): Gaussian-smeared perturbed
    distance (51 gaussians over [0, 10]) embedded to emb_dim."""

    @nn.compact
    def __call__(self, rng, node_feat, dist, sel_mask, graph_mask=None):
        b = node_feat.shape[0]
        rng_sigma, rng_noise = jax.random.split(rng)
        used = self._sample_sigmas(rng_sigma, b)[:, None, None]
        noise = jax.random.normal(rng_noise, dist.shape, dist.dtype)
        perturbed = dist + noise * used
        target = -(perturbed - dist) / used**2
        rbf = gaussian_smearing(perturbed, 0.0, 10.0, 51)  # NCSN.py:117-119
        demb = MLP([self.emb_dim, self.emb_dim])(rbf)
        # first output layer factored over the concat (see NCSNv3)
        u = nn.Dense(
            self.emb_dim, use_bias=False,
            kernel_init=nn.initializers.glorot_uniform(), name="out0_h",
        )(node_feat)
        d_term = nn.Dense(
            self.emb_dim, kernel_init=nn.initializers.glorot_uniform(),
            bias_init=nn.initializers.zeros, name="out0_d",
        )(demb)
        x = jax.nn.relu(u[:, :, None, :] + u[:, None, :, :] + d_term)
        scores = MLP([self.emb_dim // 2, 1])(x)[..., 0]
        scores = scores / used
        return self._loss(scores, target, sel_mask, used, graph_mask)
