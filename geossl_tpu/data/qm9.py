"""QM9 dataset builder.

Reference: ``Geom3D/datasets/datasets_QM9.py:15-297``. Raw inputs (must be
pre-downloaded into ``<root>/raw`` — this environment has no egress):
``gdb9.sdf``, ``gdb9.sdf.csv``, ``uncharacterized.txt``, ``qm9.csv``,
``atomref.txt``. Processing:

* 12 targets + derived ``gap_02 = lumo - homo`` (13 columns),
* per-atom thermochemical energies subtracted from zpve/u0/u298/h298/g298/cv,
* hartree→eV conversion for energy-like targets,
* 3054 uncharacterized molecules and invalid-SMILES rows skipped.

Cached as a ``MolStore`` npz. ``load_qm9(root, synthetic=...)`` falls back to
the synthetic stand-in when raw files are absent.
"""

from __future__ import annotations

import os
import numpy as np

from geossl_tpu.data.featurize import mol_to_arrays
from geossl_tpu.data.store import MolRecord, MolStore

TARGET_FIELDS = [
    "mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
    "u0", "u298", "h298", "g298", "cv", "gap_02",
]
HARTREE2EV = 27.211386245988  # CODATA hartree-electron volt relationship
CONVERSION = {
    "mu": 1.0, "alpha": 1.0, "homo": HARTREE2EV, "lumo": HARTREE2EV,
    "gap": HARTREE2EV, "gap_02": HARTREE2EV, "r2": 1.0, "zpve": HARTREE2EV,
    "u0": HARTREE2EV, "u298": HARTREE2EV, "h298": HARTREE2EV,
    "g298": HARTREE2EV, "cv": 1.0,
}
ATOM_DICT = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9}
# thermo-corrected target columns (datasets_QM9.py:180-181)
THERMO_TARGETS = [6, 7, 8, 9, 10, 11]


def _read_thermo(path: str):
    """Parse atomref.txt (``datasets_QM9.py:177-201``)."""
    therm = {t: {} for t in THERMO_TARGETS}
    with open(path) as f:
        for line in f:
            split = line.split()
            if not split or split[0] not in ATOM_DICT:
                continue
            for target, val in zip(THERMO_TARGETS, split[1:]):
                therm[target][ATOM_DICT[split[0]]] = float(val)
    return therm


def build_qm9(root: str, calculate_thermo: bool = True) -> MolStore:
    """Featurize raw QM9 into a MolStore (one-time, CPU, rdkit)."""
    import pandas as pd
    from rdkit import Chem
    from rdkit.Chem import AllChem

    raw = os.path.join(root, "raw")
    therm = _read_thermo(os.path.join(raw, "atomref.txt"))

    df = pd.read_csv(os.path.join(raw, "gdb9.sdf.csv"))
    df = df[TARGET_FIELDS[:-1]]
    df["gap_02"] = df["lumo"] - df["homo"]
    target = df.to_numpy(dtype=np.float64)

    with open(os.path.join(raw, "uncharacterized.txt")) as f:
        skip = set(int(x.split()[0]) - 1 for x in f.read().split("\n")[9:-2])

    smiles_list = pd.read_csv(os.path.join(raw, "qm9.csv"))["smiles"].tolist()
    suppl = Chem.SDMolSupplier(
        os.path.join(raw, "gdb9.sdf"), removeHs=False, sanitize=False
    )

    records = []
    for i, mol in enumerate(suppl):
        if i in skip:
            continue
        arrays, atom_count = mol_to_arrays(mol)
        y = target[i].copy()
        if calculate_thermo:
            for atom, count in atom_count.items():
                if atom not in ATOM_DICT.values():
                    continue
                for tid, sub in therm.items():
                    y[tid] -= sub[atom] * count
        for k, col in enumerate(TARGET_FIELDS):
            y[k] *= CONVERSION[col]
        if AllChem.MolFromSmiles(smiles_list[i]) is None:
            continue
        records.append(
            MolRecord(
                atom_type=arrays["atom_type"],
                positions=arrays["positions"],
                chirality=arrays["chirality"],
                bond_index=arrays["bond_index"],
                y=y.astype(np.float32),
            )
        )
    return MolStore.from_records(records)


def load_qm9(root: str, synthetic: bool = False, synthetic_size: int = 256) -> MolStore:
    """Load the cached store, building from raw files if needed; with
    ``synthetic=True`` (or when no raw data exists) return the stand-in."""
    if synthetic:
        from geossl_tpu.data.synthetic import synthetic_qm9

        return synthetic_qm9(synthetic_size)
    cache = os.path.join(root, "processed", "qm9_store.npz")
    if os.path.exists(cache):
        return MolStore.load(cache)
    raw = os.path.join(root, "raw", "gdb9.sdf")
    if not os.path.exists(raw):
        raise FileNotFoundError(
            f"QM9 raw files not found under {root}/raw (no network egress to "
            "download). Use synthetic=True for the stand-in dataset."
        )
    store = build_qm9(root)
    store.save(cache)
    return store
