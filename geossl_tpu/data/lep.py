"""Atom3D LEP (ligand efficacy prediction) dataset builder.

Reference: ``Geom3D/datasets/datasets_LEP.py:16-292``. Each item is a PAIR of
structures — the same ligand bound to active and inactive protein
conformations — with a binary label (A/I → 1/0, ``datasets_LEP.py:209``).
The transform selects the environment within ``dist`` of ligand chain 'L'
and caps at ``maxnum`` atoms (``datasets_LEP.py:100-115``), with optional
hydrogen dropping (``--LEP_droph``).

The geometric selection reuses the LBA numpy helpers. The LMDB parsing path
requires the ``atom3d`` package + pre-downloaded raw data (gated);
``load_lep(synthetic=True)`` provides the stand-in.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from geossl_tpu.data.featurize import atomic_number_to_index
from geossl_tpu.data.lba import (
    ELEMENT_Z,
    drop_hydrogen,
    replace_rare_elements,
    select_env_by_dist,
    select_env_by_num,
)
from geossl_tpu.data.store import MolRecord, MolStore


def transform_lep_structure(
    elements: List[str],
    coords: np.ndarray,
    is_ligand: np.ndarray,  # bool per atom: chain 'L'
    dist: float = 6.0,
    maxnum: int = 400,
    droph: bool = False,
) -> MolRecord:
    """Environment selection around the ligand chain (``datasets_LEP.py:100-115``)."""
    elements = replace_rare_elements(elements)
    lig_idx = np.where(is_ligand)[0]
    prot_idx = np.where(~is_ligand)[0]
    lig_elements = [elements[i] for i in lig_idx]
    lig_coords = coords[lig_idx]
    prot_elements = [elements[i] for i in prot_idx]
    prot_coords = coords[prot_idx]
    if droph:
        lig_elements, lig_coords = drop_hydrogen(lig_elements, lig_coords)
        prot_elements, prot_coords = drop_hydrogen(prot_elements, prot_coords)
    env = select_env_by_dist(prot_coords, lig_coords, dist)
    prot_elements = [prot_elements[i] for i in env]
    prot_coords = prot_coords[env]
    env = select_env_by_num(prot_coords, lig_coords, maxnum)
    prot_elements = [prot_elements[i] for i in env]
    prot_coords = prot_coords[env]

    merged = prot_elements + lig_elements
    coords = np.concatenate([prot_coords, lig_coords]).astype(np.float32)
    atom_type = np.asarray(
        [atomic_number_to_index(ELEMENT_Z.get(e, -1)) for e in merged], np.int32
    )
    return MolRecord(atom_type=atom_type, positions=coords)


def load_lep(
    root: str = "",
    split_dir: str = "train",
    dist: float = 6.0,
    maxnum: int = 400,
    droph: bool = False,
    synthetic: bool = False,
    synthetic_size: int = 48,
) -> Tuple[MolStore, MolStore, np.ndarray]:
    """Returns (active_store, inactive_store, labels). LEP ships pre-split
    by protein into train/val/test LMDB directories (``datasets_LEP.py:180``)."""
    if synthetic:
        from geossl_tpu.data.synthetic import synthetic_lep

        return synthetic_lep(synthetic_size)
    cache_a = os.path.join(root, "processed", f"lep_{split_dir}_active.npz")
    cache_i = os.path.join(root, "processed", f"lep_{split_dir}_inactive.npz")
    cache_y = os.path.join(root, "processed", f"lep_{split_dir}_labels.npy")
    if os.path.exists(cache_a):
        return MolStore.load(cache_a), MolStore.load(cache_i), np.load(cache_y)
    raise FileNotFoundError(
        "LEP raw LMDB files not found (atom3d parsing requires pre-downloaded "
        "data; this environment has no egress). Use synthetic=True."
    )
