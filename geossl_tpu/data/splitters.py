"""Dataset split functions.

Reference: ``examples/splitters.py``. Index-based: every function returns
(train_idx, valid_idx, test_idx) numpy arrays over the store.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

Split = Tuple[np.ndarray, np.ndarray, np.ndarray]


def qm9_random_customized_01(num_mols: int, seed: int = 0) -> Split:
    """The split used for all published QM9 results
    (``splitters.py:253-306``): np.random.permutation with 110k train / 10k
    valid / rest test. For smaller (synthetic) datasets the 110k/10k budget
    scales proportionally to QM9's 130831 molecules."""
    rng = np.random.RandomState(seed)
    all_idx = rng.permutation(num_mols)
    n_full = 133885 - 3054
    if num_mols >= n_full:
        n_train, n_valid = 110000, 10000
    else:
        n_train = int(num_mols * 110000 / n_full)
        n_valid = int(num_mols * 10000 / n_full)
        n_train, n_valid = max(n_train, 1), max(n_valid, 1)
    return (
        all_idx[:n_train],
        all_idx[n_train : n_train + n_valid],
        all_idx[n_train + n_valid :],
    )


def qm9_random_customized_02(num_mols: int, seed: int = 0) -> Split:
    """100k train / 10% test / rest valid (``splitters.py:309-358``)."""
    rng = np.random.RandomState(seed)
    all_idx = rng.permutation(num_mols)
    n_full = 133885 - 3054
    if num_mols >= n_full:
        n_train, n_test = 100000, int(0.1 * n_full)
    else:
        n_train = int(num_mols * 100000 / n_full)
        n_test = int(0.1 * num_mols)
        n_train = max(n_train, 1)
    n_valid = num_mols - n_train - n_test
    return (
        all_idx[:n_train],
        all_idx[n_train : n_train + n_valid],
        all_idx[n_train + n_valid :],
    )


def random_split(
    num_mols: int,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    seed: int = 42,
) -> Split:
    """``splitters.py:188-250``."""
    assert abs(frac_train + frac_valid + frac_test - 1.0) < 1e-6
    rng = np.random.RandomState(seed)
    all_idx = rng.permutation(num_mols)
    n_train = int(frac_train * num_mols)
    n_valid = int(frac_valid * num_mols)
    return (
        all_idx[:n_train],
        all_idx[n_train : n_train + n_valid],
        all_idx[n_train + n_valid :],
    )


def md17_split(
    num_frames: int, train_size: int = 1000, valid_size: int = 1000, seed: int = 42
) -> Split:
    """sklearn-style shuffled 1000/1000/rest (``datasets_MD17.py:78-82``,
    sizes fixed at ``finetune_md17.py:171``)."""
    rng = np.random.RandomState(seed)
    ids = rng.permutation(num_frames)
    if num_frames <= train_size + valid_size:
        # proportional fallback for small synthetic sets
        train_size = max(1, int(num_frames * 0.4))
        valid_size = max(1, int(num_frames * 0.3))
    return (
        ids[:train_size],
        ids[train_size : train_size + valid_size],
        ids[train_size + valid_size :],
    )


def generate_scaffold(smiles: str, include_chirality: bool = True) -> str:
    """Bemis-Murcko scaffold of a SMILES (``splitters.py:12-25``; rdkit)."""
    from rdkit.Chem.Scaffolds import MurckoScaffold

    return MurckoScaffold.MurckoScaffoldSmiles(
        smiles=smiles, includeChirality=include_chirality
    )


def scaffold_split(
    smiles_list,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
) -> Split:
    """Deterministic Bemis-Murcko scaffold split (``splitters.py:28-115``):
    scaffold groups sorted largest-first, filled train -> valid -> test.
    Requires rdkit (deferred import)."""
    assert abs(frac_train + frac_valid + frac_test - 1.0) < 1e-6
    all_scaffolds: dict = {}
    for i, smiles in enumerate(smiles_list):
        all_scaffolds.setdefault(generate_scaffold(smiles), []).append(i)
    scaffold_sets = [
        sorted(v)
        for _, v in sorted(
            all_scaffolds.items(), key=lambda x: (len(x[1]), sorted(x[1])[0]),
            reverse=True,
        )
    ]
    n = len(smiles_list)
    train_cutoff, valid_cutoff = frac_train * n, (frac_train + frac_valid) * n
    train_idx, valid_idx, test_idx = [], [], []
    for group in scaffold_sets:
        if len(train_idx) + len(group) > train_cutoff:
            if len(train_idx) + len(valid_idx) + len(group) > valid_cutoff:
                test_idx.extend(group)
            else:
                valid_idx.extend(group)
        else:
            train_idx.extend(group)
    return (
        np.asarray(train_idx, np.int64),
        np.asarray(valid_idx, np.int64),
        np.asarray(test_idx, np.int64),
    )


def random_scaffold_split(
    smiles_list,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    seed: int = 0,
) -> Split:
    """Scaffold split with randomly permuted scaffold groups
    (``splitters.py:118-185``)."""
    rng = np.random.RandomState(seed)
    all_scaffolds: dict = {}
    for i, smiles in enumerate(smiles_list):
        all_scaffolds.setdefault(generate_scaffold(smiles), []).append(i)
    groups = list(all_scaffolds.values())
    perm = rng.permutation(len(groups))
    n = len(smiles_list)
    n_train, n_valid = int(frac_train * n), int(frac_valid * n)
    train_idx, valid_idx, test_idx = [], [], []
    for gi in perm:
        group = groups[gi]
        if len(train_idx) + len(group) <= n_train:
            train_idx.extend(group)
        elif len(valid_idx) + len(group) <= n_valid:
            valid_idx.extend(group)
        else:
            test_idx.extend(group)
    return (
        np.asarray(train_idx, np.int64),
        np.asarray(valid_idx, np.int64),
        np.asarray(test_idx, np.int64),
    )


def atom3d_lba_split(data_root: str, year: int = 2020) -> Split:
    """Sequence-identity-30 split from downloaded index files
    (``splitters.py:361-388``): maps pdb ids in ``targets/{train,val,test}.txt``
    through ``pdb_id2data_id_{year}.json``."""
    json_file = os.path.join(data_root, "processed", f"pdb_id2data_id_{year}.json")
    with open(json_file) as f:
        pdb_id2data_id = json.load(f)

    def load(mode: str) -> np.ndarray:
        path = os.path.join(data_root, "processed", "targets", f"{mode}.txt")
        with open(path) as f:
            ids = [line.strip() for line in f if line.strip()]
        return np.asarray([pdb_id2data_id[i] for i in ids], np.int64)

    return load("train"), load("val"), load("test")


def kmer_identity_neighbors(sequences, cutoff: float, k: int = 6):
    """No-BLAST sequence-similarity backend for :func:`identity_split`.

    ``sequences[i]`` is the list of chain sequences of complex i. Two
    complexes are neighbors when any chain pair's k-mer containment
    (|kmers(a) ∩ kmers(b)| / min(|a|,|b|)) reaches ``cutoff`` — a standard
    alignment-free stand-in for BLAST percent identity (the reference
    shells out to a BLAST db the raw release ships precomputed;
    ``PDBBind_utils.py:146-147``). Returns ``find_similar(i) -> set``.
    """
    kmer_sets = []
    for chains in sequences:
        kmer_sets.append([
            {c[j:j + k] for j in range(max(len(c) - k + 1, 0))} or {c}
            for c in chains
        ])

    # Inverted index (kmer -> complex ids containing it): find_similar then
    # only scores candidates sharing >=1 k-mer instead of every complex —
    # O(n·chains²) per query would be ~O(n³) at PDBBind scale inside
    # identity_split's greedy loop.
    posting: dict = {}
    for idx, chains in enumerate(kmer_sets):
        for a in chains:
            for km in a:
                posting.setdefault(km, set()).add(idx)

    def find_similar(i: int):
        out = {i}
        if cutoff <= 0:  # degenerate: everything matches
            return set(range(len(kmer_sets)))
        candidates = set()
        for a in kmer_sets[i]:
            for km in a:
                candidates |= posting[km]
        for j in candidates:
            if j == i:
                continue
            hit = False
            for a in kmer_sets[i]:
                for b in kmer_sets[j]:
                    denom = min(len(a), len(b))
                    if denom and len(a & b) / denom >= cutoff:
                        hit = True
                        break
                if hit:
                    break
            if hit:
                out.add(j)
        return out

    return find_similar


def identity_split(n: int, find_similar, val_split: float = 0.1,
                   test_split: float = 0.1, min_fam_in_split: int = 5,
                   seed: int | None = None) -> Split:
    """Greedy family-based identity split (``PDBBind_utils.py:137-190`` —
    commented out of the reference's runnable path, which consumes the
    downloaded index files via :func:`atom3d_lba_split` instead).

    Repeatedly draws a random not-yet-assigned complex, pulls its whole
    similarity family (``find_similar(i)``, e.g. from
    :func:`kmer_identity_neighbors` or a real BLAST wrapper), and assigns
    up to ``ceil(split_size / min_fam_in_split)`` of it to the split so
    each split holds at least ``min_fam_in_split`` families — the
    reference's exact loop, val first, then test, remainder = train.

    Reference quirk preserved: family members beyond the per-family cap
    are removed from ``to_use`` but never assigned to any split — they are
    DROPPED from the dataset (``_create_identity_split`` adds only
    ``found[:max_fam_size]`` to the split yet retires all of ``found``),
    so the three index sets need not cover ``range(n)``.
    """
    import math

    rng = np.random.default_rng(seed)
    # boolean availability vector: np.flatnonzero(available) IS
    # sorted(to_use), so draws are identical to the original set-based loop
    # without the O(n log n) re-sort per draw
    available = np.ones(n, bool)

    def create(split_size: float):
        split = set()
        used = set(np.flatnonzero(~available).tolist())
        while len(split) < split_size and available.any():
            i = int(rng.choice(np.flatnonzero(available)))
            found = set(find_similar(i)) - used
            max_fam_size = int(math.ceil(split_size / min_fam_in_split))
            split.update(sorted(found)[:max_fam_size])
            available[list(found)] = False
            used.update(found)
        return split

    val = create(n * val_split)
    test = create(n * test_split)
    train = set(np.flatnonzero(available).tolist())
    return (np.asarray(sorted(train), np.int64),
            np.asarray(sorted(val), np.int64),
            np.asarray(sorted(test), np.int64))
