"""Dense equivalents of the reference's AtomTuple pair machinery.

The reference materializes O(N²) ``super_edge_index`` lists per graph
(``Geom3D/dataloaders/dataloaders_AtomTuple.py:9-37``): ``permutations``
(all ordered pairs) or ``combinations`` (all unordered pairs), optionally
subsampled. Dense equivalent: boolean selection masks over the ``[B, N, N]``
pair grid — the full pair set is already implicit in the distance matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geossl_tpu.ops.geometry import pair_mask_from_nodes


def exact_count_subsample(
    rng: jax.Array, mask: jnp.ndarray, ratio: float, per_graph: bool = True
) -> jnp.ndarray:
    """Keep exactly ``floor(M·ratio)`` of the True entries of ``mask``.

    Matches ``np.random.choice(M, int(M·ratio), replace=False)`` in
    distribution (the reference's subsampling everywhere —
    ``dataloaders_AtomTuple.py:26-29``, ``pretrain_ChargePrediction.py:66-68``)
    with static shapes: draw i.i.d. uniforms on the selected entries and keep
    those at or below the k-th order statistic. ``per_graph=True`` treats the
    leading axis as independent graphs (per-graph M and k); ``False`` samples
    over the whole batch, the charge-masking semantics.
    """
    u = jax.random.uniform(rng, mask.shape, jnp.float32)
    u = jnp.where(mask, u, jnp.inf)
    lead = mask.shape[0] if per_graph else 1
    flat = u.reshape(lead, -1)
    m = jnp.sum(mask.reshape(lead, -1), axis=1)
    k = jnp.floor(m * ratio).astype(jnp.int32)
    order = jnp.sort(flat, axis=1)
    thr = jnp.take_along_axis(order, jnp.maximum(k - 1, 0)[:, None], axis=1)
    keep = (flat <= thr) & (k[:, None] > 0)
    return keep.reshape(mask.shape) & mask


def pair_selection(
    node_mask: jnp.ndarray,
    option: str = "permutation",
    ratio: float = 1.0,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """[B, N] node mask -> [B, N, N] pair-selection mask.

    ``option='permutation'`` selects every ordered pair (i != j);
    ``option='combination'`` selects each unordered pair once (i < j), the
    "symmetry" noise mode (``pretrain_GeoSSL.py:289-295``). ``ratio < 1``
    subsamples exactly ``int(M·ratio)`` pairs per graph without replacement
    (``dataloaders_AtomTuple.py:26-29`` semantics, static shapes).
    """
    mask = pair_mask_from_nodes(node_mask)
    if option == "combination":
        n = node_mask.shape[-1]
        iu = jnp.triu(jnp.ones((n, n), bool), k=1)
        mask = mask & iu
    elif option != "permutation":
        raise ValueError(f"unknown pair option {option!r}")
    if ratio < 1.0:
        if rng is None:
            raise ValueError("ratio < 1 requires an rng key")
        mask = exact_count_subsample(rng, mask, ratio, per_graph=True)
    return mask


def graph_pair_counts(sel_mask: jnp.ndarray) -> jnp.ndarray:
    """Number of selected pairs per graph, [B]."""
    return jnp.sum(sel_mask.astype(jnp.int32), axis=(1, 2))
