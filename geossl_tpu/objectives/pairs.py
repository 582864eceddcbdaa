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
    subsamples pairs i.i.d. Bernoulli(ratio) — the reference samples exactly
    ``int(M·ratio)`` without replacement per graph
    (``dataloaders_AtomTuple.py:26-29``); Bernoulli matches in expectation
    and keeps shapes static.
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
        keep = jax.random.bernoulli(rng, ratio, mask.shape)
        mask = mask & keep
    return mask


def graph_pair_counts(sel_mask: jnp.ndarray) -> jnp.ndarray:
    """Number of selected pairs per graph, [B]."""
    return jnp.sum(sel_mask.astype(jnp.int32), axis=(1, 2))
