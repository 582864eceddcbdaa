"""Dataset split functions.

Reference: ``examples/splitters.py``. Index-based: every function returns
(train_idx, valid_idx, test_idx) numpy arrays over the store.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

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
