"""CFConv message aggregation — the SchNet hot kernel.

Reference: ``Geom3D/models/schnet.py:170-195`` — PyG ``MessagePassing`` with
``message = x_j * W`` and ``aggr="add"`` over ragged edge lists
(torch_scatter CUDA segment sums). Dense TPU form:

    m[b, i, f] = Σ_j  env[b, i, j] · w[b, i, j, f] · x[b, j, f]

Two execution paths:
* ``use_pallas=False`` — a plain einsum; XLA fuses the envelope multiply into
  the contraction. Materializes ``w`` ([B,N,N,F]) in HBM, which is fine for
  small buckets (N ≤ 64) and lets autodiff derive arbitrary-order gradients
  (needed for MD17's double backward).
* ``use_pallas=True`` — fused Pallas kernel (``ops/cfconv_pallas.py``) that
  tiles over j-blocks and never materializes the [N,N,F] tensor in HBM; used
  for the large-N buckets (LBA/LEP, N up to 512).
"""

from __future__ import annotations

import jax.numpy as jnp


def cfconv_aggregate(
    w: jnp.ndarray,  # [B, N, N, F] filter values
    env: jnp.ndarray,  # [B, N, N] cosine envelope × adjacency (0 for non-edges)
    x: jnp.ndarray,  # [B, N, F] source-node features (post lin1)
    use_pallas: bool = False,
) -> jnp.ndarray:
    if use_pallas:
        from geossl_tpu.ops.cfconv_pallas import cfconv_pallas

        return cfconv_pallas(w, env, x)
    # einsum path: weight each message by the envelope and reduce over j.
    return jnp.einsum(
        "bijf,bij,bjf->bif", w, env, x, preferred_element_type=jnp.float32
    ).astype(x.dtype)
