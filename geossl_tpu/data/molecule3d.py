"""Molecule3D pretraining corpus builder.

Reference: ``Geom3D/datasets/datasets_Molecule3D.py:18-175``. Raw inputs:
four SDF shards (``combined_mols_0_to_1000000.sdf`` …) + ``properties.csv``
(3.9M molecules). Featurizes every molecule, attaches the property row as
``y``, and writes the full cache plus 1M / 2M head subsets — training uses
the 1M subset (``submit_pretrain_GeoSSL_DDM.sh:14``).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from geossl_tpu.data.featurize import mol_to_arrays
from geossl_tpu.data.store import MolRecord, MolStore

SDF_SHARDS = [
    "combined_mols_0_to_1000000.sdf",
    "combined_mols_1000000_to_2000000.sdf",
    "combined_mols_2000000_to_3000000.sdf",
    "combined_mols_3000000_to_3899647.sdf",
]


def _iter_mol_arrays(path: str):
    """Yield featurized array-dicts (or None for unparseable molecules) from
    one SDF shard — RDKit when available (the reference's sanitizing parse,
    ``datasets_Molecule3D.py:61-75``), else the dependency-free reader
    (``featurize.sdf_block_to_arrays``; same atom types / positions / bond
    topology, which is all any runnable workload consumes)."""
    try:
        from rdkit import Chem
    except ImportError:
        from geossl_tpu.data.featurize import sdf_block_to_arrays
        from geossl_tpu.data.structio import iter_sdf_blocks

        for block in iter_sdf_blocks(path):
            try:
                yield sdf_block_to_arrays(block)[0]
            except (ValueError, IndexError):
                yield None
        return
    suppl = Chem.SDMolSupplier(path, removeHs=False, sanitize=True)
    for mol in suppl:
        yield None if mol is None else mol_to_arrays(mol)[0]


def _build_molecule3d_native(raw: str, prop_np: np.ndarray,
                             limit: Optional[int]) -> MolStore:
    """Corpus build via the C++ shard scanner (``geossl_native.cpp
    scan_sdf_file``): one mmap'd pass per shard, no per-molecule Python.
    Produces the same store as the per-block Python path (equality-tested);
    unparseable blocks are skipped with their properties row, exactly like
    the reference's ``mol is None`` skip (``datasets_Molecule3D.py:66-70``).
    """
    from geossl_tpu.data.featurize import sdf_block_to_arrays
    from geossl_tpu.native import packing

    atom_chunks, pos_chunks, bond_chunks = [], [], []
    len_chunks, bond_len_chunks, y_chunks = [], [], []
    base = 0  # global molecule index (all blocks, parsed or not)
    total_ok = 0
    for shard in SDF_SHARDS:
        path = os.path.join(raw, shard)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"Molecule3D shard {shard} missing under {raw}; all shards "
                "are required to keep property rows aligned"
            )
        ok, atom_type, pos, aoff, bond_index, _btype, boff, byte_off = (
            packing.scan_sdf_file(path)
        )
        # Blocks the fast scanner rejected may still be Python-parseable
        # (V3000, exponent-format coordinates, ...): re-parse exactly those
        # from their byte spans so the native build keeps every molecule the
        # per-block Python path keeps.
        rescued = {}
        bad_idx = np.flatnonzero(~ok)
        if len(bad_idx):
            with open(path, "rb") as f:  # byte offsets need binary seeks
                for k in bad_idx:
                    f.seek(byte_off[k])
                    text = f.read(byte_off[k + 1] - byte_off[k]).decode(
                        errors="replace")
                    block = "".join(
                        line for line in text.splitlines(keepends=True)
                        if not line.startswith("$$$$")
                    )
                    try:
                        rescued[int(k)] = sdf_block_to_arrays(block)[0]
                    except (ValueError, IndexError):
                        pass
        if rescued:
            # splice the rescued arrays into the shard-local flat layout
            ok = ok.copy()
            parts_a, parts_p, parts_b = [], [], []
            new_lens = np.diff(aoff).copy()
            new_blens = np.diff(boff).copy()
            for k in sorted(rescued):
                ok[k] = True
                new_lens[k] = rescued[k]["atom_type"].shape[0]
                new_blens[k] = rescued[k]["bond_index"].shape[1]
            for k in range(len(ok)):
                if k in rescued:
                    parts_a.append(rescued[k]["atom_type"])
                    parts_p.append(rescued[k]["positions"])
                    parts_b.append(rescued[k]["bond_index"])
                else:
                    s, e = aoff[k], aoff[k + 1]
                    bs, be = boff[k], boff[k + 1]
                    parts_a.append(atom_type[s:e])
                    parts_p.append(pos[s:e])
                    parts_b.append(bond_index[:, bs:be])
            atom_type = np.concatenate(parts_a)
            pos = np.concatenate(parts_p)
            bond_index = np.concatenate(parts_b, axis=1)
            aoff = np.zeros(len(ok) + 1, np.int64)
            np.cumsum(new_lens, out=aoff[1:])
            boff = np.zeros(len(ok) + 1, np.int64)
            np.cumsum(new_blens, out=boff[1:])
        lens = np.diff(aoff)
        blens = np.diff(boff)
        ok_idx = np.flatnonzero(ok)
        if limit is not None and total_ok + len(ok_idx) > limit:
            ok_idx = ok_idx[: limit - total_ok]
            a_end = int(aoff[ok_idx[-1] + 1]) if len(ok_idx) else 0
            b_end = int(boff[ok_idx[-1] + 1]) if len(ok_idx) else 0
            atom_type, pos = atom_type[:a_end], pos[:a_end]
            bond_index = bond_index[:, :b_end]
        atom_chunks.append(atom_type)
        pos_chunks.append(pos)
        bond_chunks.append(bond_index)
        len_chunks.append(lens[ok_idx])
        bond_len_chunks.append(blens[ok_idx])
        y_chunks.append(prop_np[base + ok_idx])
        base += len(ok)
        total_ok += len(ok_idx)
        if limit is not None and total_ok >= limit:
            break
    lens = np.concatenate(len_chunks)
    offsets = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    bond_lens = np.concatenate(bond_len_chunks)
    bond_offsets = np.zeros(len(bond_lens) + 1, np.int64)
    np.cumsum(bond_lens, out=bond_offsets[1:])
    atom_type = np.concatenate(atom_chunks)
    return MolStore(
        atom_type=atom_type,
        positions=np.concatenate(pos_chunks),
        offsets=offsets,
        chirality=np.zeros_like(atom_type),  # no-RDKit path: unspecified
        bond_index=np.concatenate(bond_chunks, axis=1),
        bond_offsets=bond_offsets,
        y=np.concatenate(y_chunks),
    )


def build_molecule3d(root: str, limit: Optional[int] = None) -> MolStore:
    import pandas as pd

    raw = os.path.join(root, "raw")
    props = pd.read_csv(os.path.join(raw, "properties.csv"))
    # The reference drops the leading id column: ``data.y =
    # target_df.iloc[abs_idx, 1:]`` (datasets_Molecule3D.py:154). Keeping it
    # would shift every target index by one (pretrain_Supervised's
    # task_id=6 would silently train on the wrong property).
    prop_np = props.to_numpy(dtype=np.float32)[:, 1:]

    # Without RDKit the per-block featurization is exactly what the C++
    # scanner computes — use the one-pass native build when available
    # (~100x the pure-Python rate; see docs/PERF.md).
    try:
        import rdkit  # noqa: F401
    except ImportError:
        from geossl_tpu.native import packing

        if packing.available():
            return _build_molecule3d_native(raw, prop_np, limit)

    records: List[MolRecord] = []
    idx = 0
    for shard in SDF_SHARDS:
        path = os.path.join(raw, shard)
        if not os.path.exists(path):
            # properties.csv rows are indexed by global molecule order; a
            # missing shard would silently misalign every later label
            raise FileNotFoundError(
                f"Molecule3D shard {shard} missing under {raw}; all shards "
                "are required to keep property rows aligned"
            )
        for arrays in _iter_mol_arrays(path):
            if arrays is None:
                idx += 1
                continue
            records.append(
                MolRecord(
                    atom_type=arrays["atom_type"],
                    positions=arrays["positions"],
                    chirality=arrays["chirality"],
                    bond_index=arrays["bond_index"],
                    y=prop_np[idx],
                )
            )
            idx += 1
            if limit is not None and len(records) >= limit:
                return MolStore.from_records(records)
    return MolStore.from_records(records)


def process_molecule3d(root: str,
                       subsets: "tuple[int, ...]" = (1_000_000, 2_000_000),
                       ) -> "MolStore":
    """The reference's full ``process()`` (``datasets_Molecule3D.py:61-149``):
    ONE scan of the raw SDF shards building the full corpus cache, then the
    head subsets (the reference writes 1M and 2M via
    ``np.arange(sample_size)`` over the full list) — each subset cache is
    byte-identical to a direct ``limit=k`` build because subsets are heads
    of the same scan order (``MolStore.head``). Returns the full store.
    Idempotent: existing caches are left untouched."""
    full_cache = os.path.join(root, "processed", "molecule3d_store.npz")
    if os.path.exists(full_cache):
        store = MolStore.load(full_cache)
    else:
        store = build_molecule3d(root, limit=None)
        store.save(full_cache)
    for k in subsets:
        path = os.path.join(root, "processed", f"molecule3d_{k}_store.npz")
        if os.path.exists(path):
            continue
        if k > len(store):
            raise ValueError(
                f"subset {k} exceeds the corpus size {len(store)}")
        store.head(k).save(path)
    return store


def load_molecule3d(
    root: str,
    subset: Optional[int] = 1_000_000,
    synthetic: bool = False,
    synthetic_size: int = 512,
    synthetic_max_atoms: int = 29,
) -> MolStore:
    """Load the (optionally size-limited) corpus; e.g. subset=1_000_000
    reproduces ``Molecule3D_1000000``."""
    if synthetic:
        from geossl_tpu.data.synthetic import synthetic_molecule3d

        return synthetic_molecule3d(synthetic_size,
                                    max_atoms=synthetic_max_atoms)
    tag = f"_{subset}" if subset else ""
    cache = os.path.join(root, "processed", f"molecule3d{tag}_store.npz")
    if os.path.exists(cache):
        return MolStore.load(cache)
    if not os.path.exists(os.path.join(root, "raw", "properties.csv")):
        raise FileNotFoundError(
            f"Molecule3D raw files not found under {root}/raw (no network "
            "egress). Use synthetic=True for the stand-in."
        )
    store = build_molecule3d(root, limit=subset)
    store.save(cache)
    return store
