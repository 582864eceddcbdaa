"""geossl_tpu — a TPU-native (JAX/XLA/Pallas) geometric self-supervised
learning framework with the capabilities of chao1224/GeoSSL.

Design principles (see SURVEY.md §7):

* **Dense, padded, size-bucketed batches.** Molecules are batched as
  ``atom_type [B, N]``, ``positions [B, N, 3]``, ``node_mask [B, N]`` with N
  drawn from a small set of static bucket sizes, instead of the reference's
  ragged PyG edge lists (``Geom3D/dataloaders/*``). Neighbor structure is a
  boolean mask over the dense ``[B, N, N]`` pairwise-distance matrix, so the
  message-passing contraction maps onto the MXU and XLA sees static shapes.
* **Pure-function training.** Each workload is a single jitted
  ``train_step(params, opt_state, batch, rng)``; MD17 forces are
  ``-jax.grad`` of the energy (double-backward handled by JAX autodiff).
* **SPMD data parallelism** over a ``jax.sharding.Mesh`` — batch sharded on
  the ``data`` axis, parameters replicated, XLA inserts the grad all-reduce.
* **Native host runtime.** The hot host-side paths (padded-batch packing,
  radius-neighbor preprocessing, BFS subgraph masking) have C++
  implementations in ``geossl_tpu/native`` with NumPy fallbacks.
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml

from geossl_tpu import config  # noqa: F401
