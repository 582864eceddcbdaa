"""Dense pairwise geometry ops with autodiff-safe masking.

These replace the reference's ``torch_cluster.radius_graph`` neighbor search
(``Geom3D/models/schnet.py:91``) and per-edge distance gathers
(``pretrain_GeoSSL.py:199-205``) with dense ``[B, N, N]`` tensors. All ops are
second-order differentiable w.r.t. positions (required for MD17 forces,
``examples/finetune_md17.py:46``): masked entries are decoupled from the
computation graph via the double-``where`` trick so no NaN/Inf leaks into
gradients.
"""

from __future__ import annotations

import jax.numpy as jnp


def pair_mask_from_nodes(node_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, N] bool -> [B, N, N] bool, True for (real i, real j, i != j)."""
    m = node_mask[:, :, None] & node_mask[:, None, :]
    n = node_mask.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return m & ~eye


def pairwise_distances(
    positions: jnp.ndarray, node_mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense pairwise distances.

    Returns ``(dist [B,N,N], pair_mask [B,N,N])``. Masked entries (padding and
    the diagonal) hold 0.0 and receive zero gradient: ``sqrt`` is evaluated on
    a safe input so neither the forward nor any-order backward produces
    non-finite values.
    """
    mask = pair_mask_from_nodes(node_mask)
    diff = positions[:, :, None, :] - positions[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2_safe = jnp.where(mask, d2, 1.0)
    dist = jnp.where(mask, jnp.sqrt(d2_safe), 0.0)
    return dist, mask


def pairwise_directions(
    positions: jnp.ndarray, node_mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unit direction vectors r_ij / |r_ij| (PaiNN, ``painn.py:236-237``).

    Returns ``(dist [B,N,N], dir [B,N,N,3], pair_mask)``; masked directions
    are 0 with zero gradient. Convention matches the reference:
    ``dir[i, j] = (pos_i - pos_j) / d_ij`` (message from j into i).
    """
    mask = pair_mask_from_nodes(node_mask)
    diff = positions[:, :, None, :] - positions[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2_safe = jnp.where(mask, d2, 1.0)
    dist = jnp.where(mask, jnp.sqrt(d2_safe), 0.0)
    inv = jnp.where(mask, 1.0 / jnp.sqrt(d2_safe), 0.0)
    direction = diff * inv[..., None]
    return dist, direction, mask


def radius_adjacency(
    dist: jnp.ndarray,
    pair_mask: jnp.ndarray,
    cutoff: float,
    max_neighbors: "int | None" = None,
) -> jnp.ndarray:
    """Neighbor mask equivalent to ``radius_graph(pos, r, loop=False)``.

    ``max_neighbors`` is the checkpoint-parity knob for ``torch_cluster``'s
    default ``max_num_neighbors=32`` (``schnet.py:91``), which *silently
    truncates* neighborhoods for graphs denser than 32 neighbors (only
    LBA/LEP ever hit this). The default (None) keeps the full neighborhood
    within the cutoff — strictly more information, and the documented delta
    of the dense build. With ``max_neighbors=k`` each atom keeps its k
    NEAREST in-cutoff neighbors (ties broken by lower atom index via stable
    argsort) — deterministic, unlike torch_cluster's arbitrary scan-order
    truncation, but the same neighborhood *size* so reference checkpoints
    see reference-equivalent connectivity. Truncation is per *receiving*
    atom i (axis -1 sums over sources j), matching per-node truncation of
    incoming edges. Note the result is generally ASYMMETRIC — callers that
    exploit adjacency symmetry (the tile-skipping CFConv) must not when
    this knob is set.
    """
    adj = pair_mask & (dist < cutoff)
    if max_neighbors is None or max_neighbors >= adj.shape[-1]:
        return adj
    if max_neighbors <= 0:
        # a 0/negative cap would silently produce edgeless graphs ("no cap"
        # is spelled None); fail loudly instead
        raise ValueError(
            f"max_neighbors must be positive or None, got {max_neighbors}")
    masked = jnp.where(adj, dist, jnp.inf)
    order = jnp.argsort(masked, axis=-1)  # ascending, stable
    ranks = jnp.argsort(order, axis=-1)  # rank of j among i's neighbors
    return adj & (ranks < max_neighbors)


def masked_segment_mean(
    x: jnp.ndarray, node_mask: jnp.ndarray, eps: float = 0.0
) -> jnp.ndarray:
    """Graph readout 'mean' over real atoms: [B,N,F],[B,N] -> [B,F].

    Divides by the true atom count (not N_max) — the padded-batch analog of
    ``scatter(h, batch, reduce="mean")`` (``schnet.py:115``).
    """
    m = node_mask.astype(x.dtype)[..., None]
    total = jnp.sum(x * m, axis=1)
    count = jnp.sum(m, axis=1)
    return total / jnp.maximum(count, 1.0)


def masked_segment_sum(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Graph readout 'add': [B,N,F],[B,N] -> [B,F]."""
    m = node_mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1)


def readout(x: jnp.ndarray, node_mask: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind in ("add", "sum"):
        return masked_segment_sum(x, node_mask)
    if kind == "mean":
        return masked_segment_mean(x, node_mask)
    raise ValueError(f"unknown readout {kind!r}")
