"""MolStore — the cached on-disk dataset format.

Replaces PyG ``InMemoryDataset``'s collated ``.pt`` tensor store
(``Geom3D/datasets/datasets_3D.py:69-80``): one ``.npz`` holding every
molecule's arrays concatenated along the atom/bond axis plus offset tables.
``get(i)`` slices per-molecule views; everything is plain NumPy, so the host
loader stays allocation-light and the file is mmap-friendly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class MolRecord:
    atom_type: np.ndarray  # [N] int32
    positions: np.ndarray  # [N, 3] f32
    chirality: Optional[np.ndarray] = None  # [N] int32
    bond_index: Optional[np.ndarray] = None  # [2, E] int32
    y: Optional[np.ndarray] = None  # [T] f32
    forces: Optional[np.ndarray] = None  # [N, 3] f32

    @property
    def num_atoms(self) -> int:
        return int(self.atom_type.shape[0])


class MolStore:
    """A list of molecules backed by flat arrays."""

    def __init__(
        self,
        atom_type: np.ndarray,
        positions: np.ndarray,
        offsets: np.ndarray,  # [M+1]
        chirality: Optional[np.ndarray] = None,
        bond_index: Optional[np.ndarray] = None,  # [2, sumE]
        bond_offsets: Optional[np.ndarray] = None,  # [M+1]
        y: Optional[np.ndarray] = None,  # [M, T]
        forces: Optional[np.ndarray] = None,  # [sumN, 3]
    ):
        self.atom_type = atom_type
        self.positions = positions
        self.offsets = offsets
        self.chirality = chirality
        self.bond_index = bond_index
        self.bond_offsets = bond_offsets
        self.y = y
        self.forces = forces

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def num_atoms(self) -> np.ndarray:
        return np.diff(self.offsets)

    def get(self, i: int) -> MolRecord:
        s, e = self.offsets[i], self.offsets[i + 1]
        bond = None
        if self.bond_index is not None:
            bs, be = self.bond_offsets[i], self.bond_offsets[i + 1]
            bond = self.bond_index[:, bs:be]
        return MolRecord(
            atom_type=self.atom_type[s:e],
            positions=self.positions[s:e],
            chirality=None if self.chirality is None else self.chirality[s:e],
            bond_index=bond,
            y=None if self.y is None else self.y[i],
            forces=None if self.forces is None else self.forces[s:e],
        )

    def __getitem__(self, i: int) -> MolRecord:
        return self.get(i)

    def head(self, k: int) -> "MolStore":
        """First ``k`` molecules as a new store — the reference's subset
        semantics (``datasets_Molecule3D.py:128-135``: head subsets of the
        full scan order via ``np.arange(sample_size)``). Views, not copies;
        ``save`` writes only the sliced ranges, so a saved head cache is
        byte-identical to one built directly with ``limit=k``."""
        if not 0 < k <= len(self):
            raise ValueError(f"head: k={k} out of range (1..{len(self)})")
        a_end = self.offsets[k]
        bond_index = bond_offsets = None
        if self.bond_index is not None:
            bond_offsets = self.bond_offsets[: k + 1]
            bond_index = self.bond_index[:, : self.bond_offsets[k]]
        return MolStore(
            atom_type=self.atom_type[:a_end],
            positions=self.positions[:a_end],
            offsets=self.offsets[: k + 1],
            chirality=(None if self.chirality is None
                       else self.chirality[:a_end]),
            bond_index=bond_index,
            bond_offsets=bond_offsets,
            y=None if self.y is None else self.y[:k],
            forces=None if self.forces is None else self.forces[:a_end],
        )

    # -- construction / io ---------------------------------------------------

    @staticmethod
    def from_records(records: List[MolRecord]) -> "MolStore":
        offsets = np.zeros(len(records) + 1, np.int64)
        for i, r in enumerate(records):
            offsets[i + 1] = offsets[i] + r.num_atoms
        atom_type = np.concatenate([r.atom_type for r in records]).astype(np.int32)
        positions = np.concatenate([r.positions for r in records]).astype(np.float32)
        chirality = None
        if records[0].chirality is not None:
            chirality = np.concatenate([r.chirality for r in records]).astype(np.int32)
        bond_index = bond_offsets = None
        if records[0].bond_index is not None:
            bond_offsets = np.zeros(len(records) + 1, np.int64)
            for i, r in enumerate(records):
                bond_offsets[i + 1] = bond_offsets[i] + r.bond_index.shape[1]
            bond_index = np.concatenate(
                [r.bond_index for r in records], axis=1
            ).astype(np.int32)
        y = None
        if records[0].y is not None:
            y = np.stack([np.atleast_1d(r.y) for r in records]).astype(np.float32)
        forces = None
        if records[0].forces is not None:
            forces = np.concatenate([r.forces for r in records]).astype(np.float32)
        return MolStore(
            atom_type, positions, offsets, chirality, bond_index, bond_offsets, y, forces
        )

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        arrays = dict(
            atom_type=self.atom_type, positions=self.positions, offsets=self.offsets
        )
        for name in ("chirality", "bond_index", "bond_offsets", "y", "forces"):
            v = getattr(self, name)
            if v is not None:
                arrays[name] = v
        np.savez(path, **arrays)

    @staticmethod
    def load(path: str) -> "MolStore":
        z = np.load(path, allow_pickle=False)
        def opt(k):
            return z[k] if k in z.files else None
        return MolStore(
            atom_type=z["atom_type"],
            positions=z["positions"],
            offsets=z["offsets"],
            chirality=opt("chirality"),
            bond_index=opt("bond_index"),
            bond_offsets=opt("bond_offsets"),
            y=opt("y"),
            forces=opt("forces"),
        )

    def select(self, indices) -> "MolStore":
        """Subset store (used by the split functions). Vectorized gather —
        the QM9 splits select ~110k molecules at driver startup."""
        idx = np.asarray(indices, np.int64)

        def flat_gather(flat, offsets):
            lens = offsets[idx + 1] - offsets[idx]
            new_offsets = np.zeros(len(idx) + 1, np.int64)
            np.cumsum(lens, out=new_offsets[1:])
            # absolute element positions: start_i + (0..len_i-1) per record
            starts = np.repeat(offsets[idx], lens)
            within = np.arange(new_offsets[-1]) - np.repeat(new_offsets[:-1], lens)
            return flat[starts + within], new_offsets

        atom_type, offsets = flat_gather(self.atom_type, self.offsets)
        positions, _ = flat_gather(self.positions, self.offsets)
        chirality = None
        if self.chirality is not None:
            chirality, _ = flat_gather(self.chirality, self.offsets)
        forces = None
        if self.forces is not None:
            forces, _ = flat_gather(self.forces, self.offsets)
        bond_index = bond_offsets = None
        if self.bond_index is not None:
            bond_t, bond_offsets = flat_gather(self.bond_index.T, self.bond_offsets)
            bond_index = np.ascontiguousarray(bond_t.T)
        y = None if self.y is None else self.y[idx]
        return MolStore(
            atom_type, positions, offsets, chirality, bond_index, bond_offsets,
            y, forces,
        )
