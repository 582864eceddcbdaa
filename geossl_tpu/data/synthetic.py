"""Synthetic molecular datasets for tests and benchmarks.

The environment has no network egress, so the real dataset downloads (QM9,
MD17, Molecule3D, Atom3D) cannot run here; builders gate on raw files being
present. This module generates deterministic random "molecules" with QM9-like
statistics (sizes, element frequencies, bond trees) plus geometry-derived
labels so that training can demonstrably reduce loss.
"""

from __future__ import annotations

import numpy as np

from geossl_tpu.data.store import MolRecord, MolStore


def _random_molecule(rng: np.random.Generator, n_atoms: int) -> MolRecord:
    # QM9-like element distribution over the 9-way index code
    # (H, C, N, O, F dominate; indices 0,1,2,3,4).
    probs = np.array([0.5, 0.33, 0.06, 0.08, 0.01, 0.005, 0.005, 0.005, 0.005])
    probs = probs / probs.sum()
    atom_type = rng.choice(9, size=n_atoms, p=probs).astype(np.int32)
    # grow positions as a random walk so distances look bond-like (~1.5 Å)
    steps = rng.normal(scale=0.9, size=(n_atoms, 3))
    steps[0] = 0
    positions = np.cumsum(steps, axis=0).astype(np.float32)
    positions += rng.normal(scale=0.2, size=(n_atoms, 3)).astype(np.float32)
    # spanning-tree bonds (chain with random reattachment), both directions
    edges = []
    for i in range(1, n_atoms):
        j = int(rng.integers(0, i))
        edges += [(i, j), (j, i)]
    bond_index = (
        np.asarray(edges, np.int32).T.reshape(2, -1) if edges else np.zeros((2, 0), np.int32)
    )
    chirality = np.zeros(n_atoms, np.int32)
    return MolRecord(
        atom_type=atom_type,
        positions=positions,
        chirality=chirality,
        bond_index=bond_index,
    )


def _geometry_label(rec: MolRecord) -> float:
    """A smooth SE(3)-invariant function of the geometry — learnable target."""
    pos = rec.positions
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    n = pos.shape[0]
    if n < 2:
        return 0.0
    iu = np.triu_indices(n, 1)
    return float(np.mean(np.exp(-d[iu] / 3.0)) * 10.0 + 0.1 * n)


def synthetic_qm9(
    num_molecules: int = 256, seed: int = 0, num_targets: int = 13,
    min_atoms: int = 3, max_atoms: int = 29,
) -> MolStore:
    """QM9 stand-in: sizes 3..29, 13 target columns (12 + gap_02)."""
    rng = np.random.default_rng(seed)
    records = []
    for _ in range(num_molecules):
        n = int(rng.integers(min_atoms, max_atoms + 1))
        rec = _random_molecule(rng, n)
        base = _geometry_label(rec)
        scales = 1.0 + np.arange(num_targets) * 0.5
        rec.y = (base * scales + rng.normal(scale=0.01, size=num_targets)).astype(
            np.float32
        )
        records.append(rec)
    return MolStore.from_records(records)


_INDEX_TO_SYMBOL = ["H", "C", "N", "O", "F", "P", "S", "Cl", "Zn"]


def write_synthetic_molecule3d_raw(
    root: str, num_molecules: int, seed: int = 0,
    min_atoms: int = 4, max_atoms: int = 50, num_props: int = 8,
    bad_every: int = 0,
) -> None:
    """Write a synthetic Molecule3D RAW tree (four V2000 SDF shards +
    ``properties.csv``) under ``root/raw`` — the corpus-scale ingestion
    rehearsal input for ``build_molecule3d`` (real downloads are impossible
    here). Molecules are split across the four shard files like the real
    corpus; ``bad_every`` > 0 injects an unparseable block every that many
    molecules (property-row alignment exercise). Index 8 atoms are written
    as Zn (a not-in-vocab element, round-tripping to the unknown token)."""
    import os

    from geossl_tpu.data.molecule3d import SDF_SHARDS

    rng = np.random.default_rng(seed)
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    per_shard = [num_molecules // 4] * 4
    per_shard[3] += num_molecules - sum(per_shard)
    props = []
    mol_id = 0
    for shard, count in zip(SDF_SHARDS, per_shard):
        with open(os.path.join(raw, shard), "w") as f:
            for _ in range(count):
                props.append(rng.normal(size=num_props).astype(np.float32))
                if bad_every and mol_id % bad_every == bad_every - 1:
                    f.write("malformed block\n$$$$\n")
                    mol_id += 1
                    continue
                n = int(rng.integers(min_atoms, max_atoms + 1))
                rec = _random_molecule(rng, n)
                f.write(f"mol{mol_id}\n  synthetic\n\n")
                n_bonds = rec.bond_index.shape[1] // 2
                f.write(f"{n:3d}{n_bonds:3d}  0  0  0  0  0  0  0  0999 "
                        "V2000\n")
                for t, (x, y, z) in zip(rec.atom_type, rec.positions):
                    f.write(f"{x:10.4f}{y:10.4f}{z:10.4f} "
                            f"{_INDEX_TO_SYMBOL[t]:<3s} 0  0  0  0  0  0\n")
                for e in range(0, rec.bond_index.shape[1], 2):
                    i, j = rec.bond_index[0, e], rec.bond_index[1, e]
                    order = int(rng.integers(1, 4))
                    f.write(f"{i + 1:3d}{j + 1:3d}{order:3d}  0\n")
                f.write("M  END\n$$$$\n")
                mol_id += 1
    with open(os.path.join(raw, "properties.csv"), "w") as f:
        # leading cid column like the real corpus; build_molecule3d drops it
        # (datasets_Molecule3D.py:154 semantics)
        f.write(",".join(["cid"] + [f"p{i}" for i in range(num_props)]) + "\n")
        for k, row in enumerate(props):
            f.write(",".join([str(k)] + [f"{v:.6f}" for v in row]) + "\n")


def synthetic_md17(
    num_frames: int = 128, n_atoms: int = 21, seed: int = 0
) -> MolStore:
    """MD17 stand-in: one molecule, many frames, energy + forces.

    Energy = Σ_pairs exp(-d/2); forces = −∂E/∂pos computed analytically so the
    −jax.grad training target is consistent with the label generator.
    """
    rng = np.random.default_rng(seed)
    template = _random_molecule(rng, n_atoms)
    records = []
    for _ in range(num_frames):
        pos = template.positions + rng.normal(scale=0.1, size=(n_atoms, 3)).astype(
            np.float32
        )
        diff = pos[:, None] - pos[None, :]
        d = np.linalg.norm(diff, axis=-1)
        np.fill_diagonal(d, 1.0)
        e_pair = np.exp(-d / 2.0)
        np.fill_diagonal(e_pair, 0.0)
        energy = 0.5 * float(e_pair.sum())
        # dE/dpos_i = Σ_j (-1/2) exp(-d/2) * (pos_i - pos_j)/d
        coef = -0.5 * e_pair / d
        grad = (coef[..., None] * diff).sum(axis=1)
        records.append(
            MolRecord(
                atom_type=template.atom_type.copy(),
                positions=pos,
                chirality=template.chirality.copy(),
                bond_index=template.bond_index.copy(),
                y=np.asarray([energy], np.float32),
                forces=(-grad).astype(np.float32),
            )
        )
    return MolStore.from_records(records)


def synthetic_molecule3d(
    num_molecules: int = 512, seed: int = 1, max_atoms: int = 29
) -> MolStore:
    """Molecule3D pretraining-corpus stand-in (one property column set,
    task_id=6 used by pretrain_Supervised). ``max_atoms`` > 32 makes the
    corpus span multiple padding buckets (the real Molecule3D does)."""
    return synthetic_qm9(num_molecules, seed=seed, num_targets=8,
                         max_atoms=max_atoms)


def synthetic_lba(num_complexes: int = 64, seed: int = 2, max_atoms: int = 400) -> MolStore:
    """LBA stand-in: large pocket+ligand complexes with logKd-like labels."""
    rng = np.random.default_rng(seed)
    records = []
    lo = min(120, max(2, max_atoms // 2))
    for _ in range(num_complexes):
        n = int(rng.integers(lo, max_atoms + 1))
        rec = _random_molecule(rng, n)
        rec.positions *= 2.0  # protein-scale spread
        rec.y = np.asarray([_geometry_label(rec)], np.float32)
        records.append(rec)
    return MolStore.from_records(records)


def synthetic_lep(num_pairs: int = 48, seed: int = 3, max_atoms: int = 300):
    """LEP stand-in: (active, inactive) structure pairs + binary label.
    Returns (active_store, inactive_store, labels)."""
    rng = np.random.default_rng(seed)
    act, inact, labels = [], [], []
    lo = min(80, max(2, max_atoms // 2))
    for _ in range(num_pairs):
        n = int(rng.integers(lo, max_atoms + 1))
        a = _random_molecule(rng, n)
        a.positions *= 2.0
        # balanced labels, encoded in the geometry: actives (label 1) keep a
        # compact inactive conformation; inactives get a strongly spread one
        label = float(rng.integers(0, 2))
        spread = 0.2 if label > 0 else 2.0
        b = MolRecord(
            atom_type=a.atom_type.copy(),
            positions=(
                a.positions + rng.normal(scale=spread, size=a.positions.shape)
            ).astype(np.float32),
            chirality=a.chirality.copy(),
            bond_index=a.bond_index.copy(),
        )
        a.y = np.asarray([label], np.float32)
        b.y = np.asarray([label], np.float32)
        act.append(a)
        inact.append(b)
        labels.append(label)
    return (
        MolStore.from_records(act),
        MolStore.from_records(inact),
        np.asarray(labels, np.float32),
    )
