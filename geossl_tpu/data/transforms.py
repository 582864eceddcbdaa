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
