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


def _corrected_target(y, atom_count, therm, calculate_thermo):
    """Thermochemical subtraction + hartree->eV (``datasets_QM9.py:180-214``).
    ``atom_count`` maps TRUE atomic number -> count; non-HCNOF entries are
    ignored exactly like the reference."""
    y = y.copy()
    if calculate_thermo:
        for atom, count in atom_count.items():
            if atom not in ATOM_DICT.values():
                continue
            for tid, sub in therm.items():
                y[tid] -= sub[atom] * count
    for k, col in enumerate(TARGET_FIELDS):
        y[k] *= CONVERSION[col]
    return y


def _iter_qm9_arrays(raw: str, skip=frozenset()):
    """Yield ``(arrays, atom_count_by_z)`` per gdb9.sdf molecule (``(None,
    None)`` for indices in ``skip`` and unparseable entries, keeping the
    index aligned with the target CSV). RDKit when available (the
    reference's ``sanitize=False`` supplier); otherwise the native shard
    scanner — with byte-span re-parse of any block it rejects, exactly like
    ``molecule3d._build_molecule3d_native`` — or the per-block parser. QM9
    is pure HCNOF, all inside the 9-way vocab, so the index code inverts
    losslessly to atomic numbers for the thermo correction."""
    from geossl_tpu.data.featurize import ATOMIC_NUM_LIST, sdf_block_to_arrays

    path = os.path.join(raw, "gdb9.sdf")
    try:
        from rdkit import Chem
    except ImportError:
        pass
    else:
        suppl = Chem.SDMolSupplier(path, removeHs=False, sanitize=False)
        for i, mol in enumerate(suppl):
            if i in skip or mol is None:  # don't featurize skipped rows
                yield None, None
                continue
            yield mol_to_arrays(mol)
        return

    from geossl_tpu.native import packing

    def counts_from_indices(atom_type):
        bc = np.bincount(atom_type, minlength=9)
        return {ATOMIC_NUM_LIST[i]: int(c)
                for i, c in enumerate(bc[:8]) if c}

    def parse_block(block):
        try:
            arrays, _ = sdf_block_to_arrays(block)
        except (ValueError, IndexError):
            return None, None
        return arrays, counts_from_indices(arrays["atom_type"])

    if packing.available():
        ok, at, pos, aoff, bidx, _bt, boff, byte_off = (
            packing.scan_sdf_file(path))
        with open(path, "rb") as fh:
            for k in range(len(ok)):
                if k in skip:
                    yield None, None
                    continue
                if not ok[k]:
                    # rescue Python-parseable blocks the fast scanner
                    # rejected (V3000, exponent coords, ...)
                    fh.seek(byte_off[k])
                    text = fh.read(byte_off[k + 1] - byte_off[k]).decode(
                        errors="replace")
                    block = "".join(
                        line for line in text.splitlines(keepends=True)
                        if not line.startswith("$$$$"))
                    yield parse_block(block)
                    continue
                s, e = aoff[k], aoff[k + 1]
                bs, be = boff[k], boff[k + 1]
                atom_type = at[s:e]
                yield (
                    dict(
                        atom_type=atom_type,
                        positions=pos[s:e],
                        chirality=np.zeros(e - s, np.int32),
                        bond_index=np.ascontiguousarray(bidx[:, bs:be]),
                    ),
                    counts_from_indices(atom_type),
                )
        return

    from geossl_tpu.data.structio import iter_sdf_blocks

    for i, block in enumerate(iter_sdf_blocks(path)):
        if i in skip:
            yield None, None
            continue
        yield parse_block(block)


def build_qm9(root: str, calculate_thermo: bool = True,
              smiles_drop_file: str | None = None) -> MolStore:
    """Featurize raw QM9 into a MolStore (one-time, CPU).

    Without RDKit the invalid-SMILES row filter
    (``AllChem.MolFromSmiles(...) is None``, ``datasets_QM9.py:225``) cannot
    run — the handful of molecules it would drop are kept, which also
    shifts dataset indices (and so split membership) relative to a
    reference-built cache. Both paths therefore REPORT the delta: with
    RDKit the exact dropped count is printed; without it, pass
    ``smiles_drop_file`` (one 0-based raw-row index per line, computed once
    on any RDKit machine via
    ``[i for i, s in enumerate(smiles) if MolFromSmiles(s) is None]``) to
    reproduce the reference membership bit-exactly. The
    uncharacterized-3054 skip list, thermo corrections and unit conversions
    apply identically on every path."""
    import pandas as pd

    try:
        from rdkit.Chem import AllChem
    except ImportError:
        AllChem = None

    raw = os.path.join(root, "raw")
    therm = _read_thermo(os.path.join(raw, "atomref.txt"))

    df = pd.read_csv(os.path.join(raw, "gdb9.sdf.csv"))
    df = df[TARGET_FIELDS[:-1]]
    df["gap_02"] = df["lumo"] - df["homo"]
    target = df.to_numpy(dtype=np.float64)

    with open(os.path.join(raw, "uncharacterized.txt")) as f:
        skip = set(int(x.split()[0]) - 1 for x in f.read().split("\n")[9:-2])

    smiles_list = pd.read_csv(os.path.join(raw, "qm9.csv"))["smiles"].tolist()
    drop = set()
    if smiles_drop_file:
        with open(smiles_drop_file) as f:
            drop = {int(line) for line in f.read().split() if line.strip()}

    records = []
    dropped = 0
    for i, (arrays, atom_count) in enumerate(_iter_qm9_arrays(raw, skip)):
        if arrays is None:
            continue
        y = _corrected_target(target[i], atom_count, therm, calculate_thermo)
        if i in drop or (AllChem is not None
                         and AllChem.MolFromSmiles(smiles_list[i]) is None):
            dropped += 1
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
    if AllChem is None and not smiles_drop_file:
        print(f"qm9: {len(records)} molecules; invalid-SMILES filter "
              "UNAVAILABLE (no RDKit, no --smiles_drop_file) — rows the "
              "reference would drop are kept; indices/splits may shift "
              "by that handful (data/qm9.py docstring)")
    else:
        print(f"qm9: {len(records)} molecules; invalid-SMILES rows "
              f"dropped: {dropped}")
    return MolStore.from_records(records)


def load_qm9(root: str, synthetic: bool = False, synthetic_size: int = 256,
             smiles_drop_file: str | None = None) -> MolStore:
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
    store = build_qm9(root, smiles_drop_file=smiles_drop_file)
    store.save(cache)
    return store
