"""Featurization: chemistry files -> index-coded numpy arrays.

Reference: ``Geom3D/datasets/datasets_utils.py:14-176``. The vocabulary is
index-coded: atom type = index into ``ATOMIC_NUM_LIST`` (9 classes, index 8 =
"unknown", which doubles as the charge-prediction mask token); chirality has
4 classes; bonds 4 types; bond dirs 4.

RDKit is an optional dependency — import is deferred so the rest of the
framework works without it (featurization is an offline preprocessing step).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Tuple

import numpy as np

# {'H':1,'C':6,'N':7,'O':8,'F':9,'P':15,'S':16,'Cl':17} + unknown
ATOMIC_NUM_LIST = [1, 6, 7, 8, 9, 15, 16, 17, "unknown"]
NODE_CLASS = len(ATOMIC_NUM_LIST)  # 9
EDGE_CLASS = 4
UNKNOWN_INDEX = NODE_CLASS - 1  # 8: unknown atom == mask token


def atomic_number_to_index(z: int) -> int:
    """Map a true atomic number to the 9-way index code."""
    try:
        return ATOMIC_NUM_LIST.index(z)
    except ValueError:
        return UNKNOWN_INDEX


def _mol_features(mol) -> Tuple[dict, Dict[int, int]]:
    """Shared atom/bond featurization (no conformer access)."""
    from rdkit import Chem  # deferred

    chirality_list = [
        Chem.rdchem.ChiralType.CHI_UNSPECIFIED,
        Chem.rdchem.ChiralType.CHI_TETRAHEDRAL_CW,
        Chem.rdchem.ChiralType.CHI_TETRAHEDRAL_CCW,
        Chem.rdchem.ChiralType.CHI_OTHER,
    ]
    bond_list = [
        Chem.rdchem.BondType.SINGLE,
        Chem.rdchem.BondType.DOUBLE,
        Chem.rdchem.BondType.TRIPLE,
        Chem.rdchem.BondType.AROMATIC,
    ]
    bond_dir_list = [
        Chem.rdchem.BondDir.NONE,
        Chem.rdchem.BondDir.ENDUPRIGHT,
        Chem.rdchem.BondDir.ENDDOWNRIGHT,
        Chem.rdchem.BondDir.EITHERDOUBLE,
    ]

    atom_types, chirality = [], []
    atom_count: Dict[int, int] = defaultdict(int)
    for atom in mol.GetAtoms():
        z = atom.GetAtomicNum()
        atom_count[z] += 1
        atom_types.append(atomic_number_to_index(z))
        chirality.append(chirality_list.index(atom.GetChiralTag()))

    edges, edge_attrs = [], []
    for bond in mol.GetBonds():
        i, j = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        bt = bond_list.index(bond.GetBondType())
        bd = bond.GetBondDir()
        bd = bond_dir_list.index(bd) if bd in bond_dir_list else 0
        edges += [(i, j), (j, i)]
        edge_attrs += [(bt, bd), (bt, bd)]

    bond_index = (
        np.asarray(edges, dtype=np.int32).T.reshape(2, -1)
        if edges
        else np.zeros((2, 0), np.int32)
    )
    bond_attr = (
        np.asarray(edge_attrs, dtype=np.int32).reshape(-1, 2)
        if edge_attrs
        else np.zeros((0, 2), np.int32)
    )
    return (
        dict(
            atom_type=np.asarray(atom_types, dtype=np.int32),
            chirality=np.asarray(chirality, dtype=np.int32),
            bond_index=bond_index,
            bond_attr=bond_attr,
        ),
        dict(atom_count),
    )


def mol_to_arrays(mol) -> Tuple[dict, Dict[int, int]]:
    """RDKit mol -> dict of numpy arrays + per-element atom counts.

    Mirrors ``mol_to_graph_data_obj_simple_3D`` (``datasets_utils.py:112-176``):
    ``atom_type [N]`` (index-coded), ``chirality [N]``, ``positions [N,3]``
    from conformer 0, ``bond_index [2, 2E]`` (both directions),
    ``bond_attr [2E, 2]`` (type idx, dir idx).
    """
    arrays, counts = _mol_features(mol)
    conformer = mol.GetConformers()[0]
    arrays["positions"] = np.asarray(conformer.GetPositions(), dtype=np.float32)
    return arrays, counts


def mol_to_arrays_2d(mol) -> Tuple[dict, Dict[int, int]]:
    """2D variant (``mol_to_graph_data_obj_simple_2D``,
    ``datasets_utils.py:55-109``): identical atom/bond index coding, no
    conformer — the same arrays as :func:`mol_to_arrays` minus
    ``positions``. Dead code in the reference (only its 2D SSL leftovers
    consumed it); provided for API-surface parity."""
    return _mol_features(mol)


def mol_to_arrays_mmff(mol, num_conformers: int) -> Tuple[dict, Dict[int, int]]:
    """MMFF variant (``mol_to_graph_data_obj_MMFF_3D``,
    ``datasets_utils.py:179-251``, dead code): positions come from the
    lowest-MMFF-energy conformer of ``num_conformers`` embeddings (H atoms
    added for the optimization, removed after), falling back to RDKit 2D
    coordinates when embedding fails or the molecule exceeds 100 atoms —
    the reference's exact fallback chain. Requires RDKit; also returns the
    chosen conformer's MMFF energy under key ``"mmff_energy"``."""
    from rdkit import Chem  # deferred
    from rdkit.Chem import AllChem

    try:
        if len(mol.GetAtoms()) > 100:  # the reference's sider guard (:182)
            raise ValueError("too many atoms for MMFF embedding")
        molh = Chem.AddHs(mol)
        AllChem.EmbedMultipleConfs(molh, num_conformers)
        opt = AllChem.MMFFOptimizeMoleculeConfs(molh)
        picked = Chem.RemoveHs(molh)
        energies = [e for _, e in opt]
        index = int(np.argmin(energies))
        energy = float(energies[index])
        conformer = picked.GetConformer(id=index)
    except Exception:
        # copy first: Compute2DCoords writes conformer 0 in place, and the
        # caller's molecule must keep its original geometry
        picked = Chem.Mol(mol)
        AllChem.Compute2DCoords(picked)
        energy = 0.0
        conformer = picked.GetConformer()

    arrays, counts = mol_to_arrays_with_conformer(picked, conformer)
    arrays["mmff_energy"] = np.float32(energy)
    return arrays, counts


def mol_to_arrays_with_conformer(mol, conformer) -> Tuple[dict, Dict[int, int]]:
    """:func:`mol_to_arrays` with an explicit conformer (helper for the
    MMFF path, whose chosen conformer is not index 0)."""
    arrays, counts = _mol_features(mol)
    arrays["positions"] = np.asarray(conformer.GetPositions(), np.float32)
    return arrays, counts


def sdf_block_to_arrays(block: str) -> Tuple[dict, Dict[int, int]]:
    """No-RDKit fallback of ``mol_to_arrays`` from a raw SDF molecule block
    (``structio.parse_sdf_mol``). Atom types/positions/bond topology are
    identical to the RDKit path; bond orders stay as written in the file
    (kekulized, no aromaticity perception) and chirality tags are
    unspecified — neither is consumed by any runnable workload (models embed
    ``atom_type`` only; BFS masking uses topology)."""
    from collections import defaultdict

    from geossl_tpu.data.structio import SYMBOL_TO_Z, parse_sdf_mol

    elements, positions, bonds = parse_sdf_mol(block)
    atom_count: Dict[int, int] = defaultdict(int)
    atom_types = []
    for e in elements:
        z = SYMBOL_TO_Z.get(e, -1)
        atom_count[z] += 1
        atom_types.append(atomic_number_to_index(z))

    edges, edge_attrs = [], []
    for i, j, order in bonds:
        bt = min(max(int(order), 1), 4) - 1  # 1/2/3/4(arom) -> 0/1/2/3
        edges += [(i, j), (j, i)]
        edge_attrs += [(bt, 0), (bt, 0)]
    bond_index = (
        np.asarray(edges, dtype=np.int32).T.reshape(2, -1)
        if edges else np.zeros((2, 0), np.int32)
    )
    bond_attr = (
        np.asarray(edge_attrs, dtype=np.int32).reshape(-1, 2)
        if edge_attrs else np.zeros((0, 2), np.int32)
    )
    return (
        dict(
            atom_type=np.asarray(atom_types, dtype=np.int32),
            chirality=np.zeros(len(atom_types), np.int32),
            positions=positions,
            bond_index=bond_index,
            bond_attr=bond_attr,
        ),
        dict(atom_count),
    )
