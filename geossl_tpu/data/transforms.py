"""Per-sample data transforms.

* ``random_rotation_transform`` — the reference's optional QM9 rotation
  augmentation (``--use_rotation_transform``, applied in
  ``MoleculeDatasetQM9.get``, ``datasets_QM9.py:139-140``): a uniform random
  3D rotation of the conformer.
* ``compose`` — chain loader transforms (e.g. BFS masking + rotation).
"""

from __future__ import annotations

import numpy as np

from geossl_tpu.data.store import MolRecord


def random_rotation_matrix(rng: np.random.Generator) -> np.ndarray:
    """Uniform random rotation via QR of a Gaussian matrix (Haar measure up
    to sign fix)."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def random_rotation_transform(record: MolRecord, rng: np.random.Generator) -> MolRecord:
    rot = random_rotation_matrix(rng).astype(np.float32)
    out = MolRecord(
        atom_type=record.atom_type,
        positions=record.positions @ rot.T,
        chirality=record.chirality,
        bond_index=record.bond_index,
        y=record.y,
        forces=None if record.forces is None else record.forces @ rot.T,
    )
    return out


def compose(*transforms):
    def transform(record: MolRecord, rng: np.random.Generator) -> MolRecord:
        for t in transforms:
            record = t(record, rng)
        return record

    return transform


def morton_order(positions: np.ndarray, bits: int = 10) -> np.ndarray:
    """Atom permutation sorting by 3D Morton (Z-order) code of the quantized
    coordinates. Space-filling order makes spatially-near atoms index-near,
    which concentrates in-cutoff pairs into few [ti, tj] tiles of the dense
    pair grid — raising the fraction of all-zero tiles the occupancy-gated
    Pallas kernels skip (ops/pallas_utils.tile_occupancy). Purely an
    implementation-layer reordering: SchNet/PaiNN are permutation-equivariant
    and the readouts permutation-invariant, so outputs change only by f32
    summation order. The reference's edge-list formulation
    (torch_cluster.radius_graph) is order-free, so there is nothing to match."""
    if positions.size == 0:
        return np.zeros(0, np.int64)
    p = positions - positions.min(axis=0)
    extent = float(p.max())
    scale = (2**bits - 1) / max(extent, 1e-9)
    q = (p * scale).astype(np.uint64)
    code = np.zeros(len(q), np.uint64)
    for b in range(bits):
        for axis in range(3):
            code |= ((q[:, axis] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                3 * b + axis)
    return np.argsort(code, kind="stable")


def spatial_sort_transform(record: MolRecord,
                           rng: np.random.Generator | None = None) -> MolRecord:
    """Reorder a record's atoms along the Morton curve (see
    :func:`morton_order`). ``rng`` is accepted for loader-transform interface
    uniformity and unused."""
    order = morton_order(record.positions)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    return MolRecord(
        atom_type=record.atom_type[order],
        positions=record.positions[order],
        chirality=None if record.chirality is None else record.chirality[order],
        bond_index=None if record.bond_index is None
        else inv[record.bond_index],
        y=record.y,
        forces=None if record.forces is None else record.forces[order],
    )


def spatial_sort_store(store):
    """Morton-sort every molecule of a :class:`MolStore` once, up front
    (cheaper than a per-epoch loader transform, and keeps the native C++
    packing fast path). Used by the Atom3D drivers (``--spatial_sort``),
    where N>=448 pair grids + occupancy-gated kernels make tile locality
    worth a one-time O(sum N log N) pass."""
    from geossl_tpu.data.store import MolStore

    if len(store) == 0:
        return store
    return MolStore.from_records(
        [spatial_sort_transform(store.get(i)) for i in range(len(store))]
    )
