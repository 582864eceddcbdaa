"""Atom3D LBA (ligand binding affinity) dataset builder.

Reference: ``Geom3D/datasets/datasets_LBA.py:23-295`` +
``PDBBind_utils.py:16-49``. Pipeline: PDBBind refined-set protein PDBs +
ligand SDFs → pocket = residues within 6 Å of the ligand → TransformLBA
(replace rare elements with Cu, drop H, select pocket environment within
``dist`` of any ligand atom, cap at ``maxnum`` atoms by ligand-distance) →
merged pocket+ligand graph with y = logKd.

The geometric transform is implemented here on plain numpy arrays
(`transform_lba`) so it is testable without Bio.PDB/atom3d; the full PDB
parsing path is gated on those optional dependencies plus pre-downloaded raw
files (no egress in this environment). ``load_lba(synthetic=True)`` provides
the stand-in.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from geossl_tpu.data.featurize import atomic_number_to_index
from geossl_tpu.data.store import MolRecord, MolStore

# atom3d's element → atomic number map (subset; rare elements replaced by Cu)
ELEMENT_Z = {
    "H": 1, "C": 6, "N": 7, "O": 8, "F": 9, "P": 15, "S": 16, "Cl": 17,
    "Cu": 29,
}
KEEP_ELEMENTS = ["H", "C", "N", "O", "F", "S", "P", "Cl"]


def replace_rare_elements(elements: List[str]) -> List[str]:
    """Rare elements → Cu (``datasets_LBA.py:41-52``)."""
    out = []
    for e in elements:
        if e == "CL":
            e = "Cl"
        out.append(e if e in KEEP_ELEMENTS else "Cu")
    return out


def drop_hydrogen(
    elements: List[str], coords: np.ndarray
) -> Tuple[List[str], np.ndarray]:
    keep = [i for i, e in enumerate(elements) if e != "H"]
    return [elements[i] for i in keep], coords[keep]


def select_env_by_dist(
    pocket_coords: np.ndarray, ligand_coords: np.ndarray, dist: float
) -> np.ndarray:
    """Indices of pocket atoms within ``dist`` of any ligand atom
    (``datasets_LBA.py:54-65``)."""
    d = np.linalg.norm(
        pocket_coords[:, None, :] - ligand_coords[None, :, :], axis=-1
    )
    return np.where((d <= dist).any(axis=1))[0]


def select_env_by_num(
    pocket_coords: np.ndarray, ligand_coords: np.ndarray, maxnum: int
) -> np.ndarray:
    """Cap the pocket at ``maxnum - n_ligand`` atoms nearest to the ligand,
    sorted back into original order (``datasets_LBA.py:66-84``)."""
    num = int(max(1, maxnum - len(ligand_coords)))
    d = np.linalg.norm(
        pocket_coords[:, None, :] - ligand_coords[None, :, :], axis=-1
    )
    dmin = d.min(axis=1)
    idx = np.argsort(dmin, kind="stable")[:num]
    return np.sort(idx)


def transform_lba(
    pocket_elements: List[str],
    pocket_coords: np.ndarray,
    ligand_elements: List[str],
    ligand_coords: np.ndarray,
    dist: float = 6.0,
    maxnum: int = 500,
) -> MolRecord:
    """Full TransformLBA + merge + index coding (``datasets_LBA.py:86-270``)."""
    pocket_elements = replace_rare_elements(pocket_elements)
    ligand_elements = replace_rare_elements(ligand_elements)
    pocket_elements, pocket_coords = drop_hydrogen(pocket_elements, pocket_coords)
    ligand_elements, ligand_coords = drop_hydrogen(ligand_elements, ligand_coords)
    env = select_env_by_dist(pocket_coords, ligand_coords, dist)
    pocket_elements = [pocket_elements[i] for i in env]
    pocket_coords = pocket_coords[env]
    env = select_env_by_num(pocket_coords, ligand_coords, maxnum)
    pocket_elements = [pocket_elements[i] for i in env]
    pocket_coords = pocket_coords[env]

    elements = pocket_elements + list(ligand_elements)
    coords = np.concatenate([pocket_coords, ligand_coords]).astype(np.float32)
    atom_type = np.asarray(
        [atomic_number_to_index(ELEMENT_Z.get(e, -1)) for e in elements], np.int32
    )
    return MolRecord(atom_type=atom_type, positions=coords)


def load_lba(
    root: str = "",
    year: int = 2020,
    dist: float = 6.0,
    maxnum: int = 500,
    synthetic: bool = False,
    synthetic_size: int = 64,
) -> MolStore:
    if synthetic:
        from geossl_tpu.data.synthetic import synthetic_lba

        return synthetic_lba(synthetic_size)
    cache = os.path.join(root, "processed", f"lba_{year}_store.npz")
    if os.path.exists(cache):
        return MolStore.load(cache)
    raise FileNotFoundError(
        "LBA raw PDBBind files not found (and Bio.PDB parsing requires "
        "pre-downloaded data; this environment has no egress). Use "
        "synthetic=True for the stand-in."
    )
