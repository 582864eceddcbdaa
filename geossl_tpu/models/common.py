"""Shared model building blocks: RBF expansions, cutoff envelopes,
activations, and MLPs with reference-matching initialization.

Reference counterparts:
* ``GaussianSmearing``        — ``Geom3D/models/schnet.py:198-207``
* ``ShiftedSoftplus``         — ``Geom3D/models/schnet.py:210-216``
* ``GaussianRBF`` / cutoffs   — ``Geom3D/models/painn_utils.py:99-177``
* ``Dense`` / ``build_mlp``   — ``Geom3D/models/painn_utils.py:9-70``
* ``MultiLayerPerceptron``    — ``examples/NCSN.py:9-43``

Initialization matches PyTorch semantics: Xavier-uniform weights, zero
biases, N(0,1) embeddings (``schnet.py:74-83``).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

xavier_uniform = nn.initializers.glorot_uniform()
zeros_init = nn.initializers.zeros
normal_embed = nn.initializers.normal(stddev=1.0)


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x) - log(2) (``schnet.py:210-216``)."""
    return jax.nn.softplus(x) - math.log(2.0)


def gaussian_smearing(
    dist: jnp.ndarray, start: float, stop: float, num_gaussians: int
) -> jnp.ndarray:
    """RBF expansion exp(-0.5/Δ² (d - μ_k)²) with μ_k = linspace(start, stop)
    (``schnet.py:198-207``). Appends a trailing axis of size num_gaussians."""
    offset = jnp.linspace(start, stop, num_gaussians, dtype=dist.dtype)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    diff = dist[..., None] - offset
    return jnp.exp(coeff * diff * diff)


def gaussian_rbf(
    dist: jnp.ndarray, offsets: jnp.ndarray, widths: jnp.ndarray
) -> jnp.ndarray:
    """PaiNN-style Gaussian RBF with per-basis widths
    (``painn_utils.py:99-103``)."""
    coeff = -0.5 / (widths * widths)
    diff = dist[..., None] - offsets
    return jnp.exp(coeff * diff * diff)


def cosine_cutoff(dist: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Behler cosine cutoff with hard (d < cutoff) gate
    (``painn_utils.py:139-155``)."""
    env = 0.5 * (jnp.cos(dist * jnp.pi / cutoff) + 1.0)
    return env * (dist < cutoff).astype(dist.dtype)


def cosine_envelope(dist: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """SchNet's CFConv envelope — *no* hard gate; the reference applies it to
    edges already selected by the radius graph (``schnet.py:186``). Callers
    must mask by adjacency separately."""
    return 0.5 * (jnp.cos(dist * jnp.pi / cutoff) + 1.0)


class Dense(nn.Module):
    """Linear layer with Xavier-uniform weights / zero bias and optional
    activation (``painn_utils.py:9-35``)."""

    features: int
    use_bias: bool = True
    activation: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform,
            bias_init=zeros_init,
            dtype=self.dtype,
        )(x)
        if self.activation is not None:
            y = self.activation(y)
        return y


class MLP(nn.Module):
    """Generic MLP: activation after every layer except the last
    (``NCSN.py:9-43``: relu default). Xavier/zeros init."""

    hidden_dims: Sequence[int]
    activation: Callable = jax.nn.relu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, dim in enumerate(self.hidden_dims):
            x = nn.Dense(
                dim,
                kernel_init=xavier_uniform,
                bias_init=zeros_init,
                dtype=self.dtype,
            )(x)
            if i < len(self.hidden_dims) - 1:
                x = self.activation(x)
        return x


def halving_mlp_dims(n_in: int, n_out: int, n_layers: int = 2) -> list[int]:
    """Hidden-layer plan of PaiNN's ``build_mlp`` with n_hidden=None
    (``painn_utils.py:38-70``): widths halve from n_in, floored at n_out."""
    c = n_in
    dims = []
    for _ in range(n_layers):
        dims.append(c)
        c = max(n_out, c // 2)
    dims.append(n_out)
    return dims[1:]  # first entry is the input width


class HalvingMLP(nn.Module):
    """PaiNN output head: ``build_mlp`` with halving widths, silu activations
    on all but the final layer (``painn_utils.py:38-70``)."""

    n_in: int
    n_out: int
    n_layers: int = 2
    activation: Callable = jax.nn.silu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dims = halving_mlp_dims(self.n_in, self.n_out, self.n_layers)
        for i, dim in enumerate(dims):
            act = self.activation if i < len(dims) - 1 else None
            x = Dense(dim, activation=act, dtype=self.dtype)(x)
        return x
