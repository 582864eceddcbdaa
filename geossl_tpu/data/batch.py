"""Dense padded molecular batches — the core data-layout contract.

The reference concatenates variable-size graphs into one ragged mega-graph
with offset edge lists (``Geom3D/dataloaders/dataloaders_AtomTuple.py:40-78``).
That layout is hostile to XLA (dynamic shapes, gather/scatter). Here a batch
is a dense, padded pytree:

* ``atom_type   [B, N] int32``  — index-coded atom types (vocabulary of 9,
  ``Geom3D/datasets/datasets_utils.py:14-48``); padded entries are 0 but must
  be gated by ``node_mask``.
* ``positions   [B, N, 3] f32``
* ``node_mask   [B, N] bool``   — True for real atoms.

All pairwise structure (radius graphs, the GeoSSL all-pairs
``super_edge_index``) becomes boolean masks over the dense ``[B, N, N]``
distance matrix, so nothing in the model ever sees a ragged shape.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DenseMolBatch:
    """A padded batch of molecules (single-tower tasks)."""

    atom_type: jnp.ndarray  # [B, N] int32
    positions: jnp.ndarray  # [B, N, 3] float
    node_mask: jnp.ndarray  # [B, N] bool
    # Optional labels / extras (None when absent):
    y: Optional[jnp.ndarray] = None  # [B] or [B, T] float
    forces: Optional[jnp.ndarray] = None  # [B, N, 3] float (MD17)
    chirality: Optional[jnp.ndarray] = None  # [B, N] int32
    # Clean-geometry adjacency for PaiNN: the reference caches
    # radius_edge_index from *unperturbed* positions and keeps using it for
    # perturbed views (pretrain_GeoSSL.py:88-89). When set, PaiNN uses this
    # mask instead of recomputing one from live positions.
    pair_mask: Optional[jnp.ndarray] = None  # [B, N, N] bool
    # True for real graphs; False for padding slots in a partial batch.
    graph_mask: Optional[jnp.ndarray] = None  # [B] bool

    @property
    def batch_size(self) -> int:
        return self.atom_type.shape[0]

    @property
    def max_atoms(self) -> int:
        return self.atom_type.shape[1]

    def num_atoms(self) -> jnp.ndarray:
        """True atom count per molecule, [B] int32."""
        return jnp.sum(self.node_mask.astype(jnp.int32), axis=1)


@struct.dataclass
class DualMolBatch:
    """A padded batch of (active, inactive) structure pairs for LEP
    (reference ``Geom3D/dataloaders/dataloaders_LEP.py:6-68``)."""

    active: DenseMolBatch
    inactive: DenseMolBatch
    y: jnp.ndarray  # [B] float binary labels


def pad_molecule(atom_type: np.ndarray, positions: np.ndarray, n_max: int):
    """Pad a single molecule's arrays to ``n_max`` atoms. Returns numpy."""
    n = atom_type.shape[0]
    if n > n_max:
        raise ValueError(f"molecule with {n} atoms does not fit bucket {n_max}")
    at = np.zeros((n_max,), dtype=np.int32)
    at[:n] = atom_type
    pos = np.zeros((n_max, 3), dtype=np.float32)
    pos[:n] = positions
    mask = np.zeros((n_max,), dtype=bool)
    mask[:n] = True
    return at, pos, mask


def stack_batch(
    atom_types, positions_list, n_max: int, ys=None, forces_list=None
) -> DenseMolBatch:
    """Host-side collate: pad each molecule to ``n_max`` and stack.

    NumPy in, NumPy out (wrapped in DenseMolBatch); `jax.device_put` happens
    in the loader so the arrays can be sharded on the way in.
    """
    b = len(atom_types)
    at = np.zeros((b, n_max), dtype=np.int32)
    pos = np.zeros((b, n_max, 3), dtype=np.float32)
    mask = np.zeros((b, n_max), dtype=bool)
    for i, (a, p) in enumerate(zip(atom_types, positions_list)):
        n = a.shape[0]
        at[i, :n] = a
        pos[i, :n] = p
        mask[i, :n] = True
    y = None
    if ys is not None:
        y = np.asarray(ys, dtype=np.float32)
    forces = None
    if forces_list is not None:
        forces = np.zeros((b, n_max, 3), dtype=np.float32)
        for i, f in enumerate(forces_list):
            forces[i, : f.shape[0]] = f
    return DenseMolBatch(
        atom_type=at, positions=pos, node_mask=mask, y=y, forces=forces
    )
