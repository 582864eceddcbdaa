"""Bucketed host-side batch loader.

Replaces the reference's PyG ``DataLoader`` + ragged concat-collate
(``Geom3D/dataloaders/*``) with fixed-shape padded batches: every batch is
``[batch_size, n_max]`` for a static bucket size ``n_max``, so each
(batch_size, n_max) pair compiles exactly once under jit.

Partial final batches are padded with empty graph slots and flagged via
``graph_mask`` — losses and metrics must honour it.

The hot packing loop has a C++ implementation (``geossl_tpu/native``) with
this NumPy path as fallback; ``pack_batch`` dispatches automatically.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from geossl_tpu.data.batch import DenseMolBatch
from geossl_tpu.data.store import MolRecord, MolStore


def pick_bucket(n: int, bucket_sizes: Sequence[int]) -> int:
    for b in bucket_sizes:
        if n <= b:
            return b
    raise ValueError(f"molecule with {n} atoms exceeds largest bucket {bucket_sizes[-1]}")


def assign_buckets(sizes: np.ndarray, bucket_sizes: Sequence[int]) -> np.ndarray:
    """Vectorized pick_bucket over an array of atom counts. Oversized
    entries fail loudly with the full size histogram so the fix (--bucket
    ladder) is obvious from the message."""
    ladder = np.asarray(sorted(bucket_sizes))
    slot = np.searchsorted(ladder, sizes)
    if (slot >= len(ladder)).any():
        edges = np.concatenate([[0], ladder, [int(sizes.max())]])
        hist, _ = np.histogram(sizes, bins=edges)
        bands = ", ".join(f"≤{int(e)}: {int(c)}" for e, c in zip(edges[1:], hist))
        raise ValueError(
            f"{int((slot >= len(ladder)).sum())} molecules exceed the "
            f"largest bucket {int(ladder[-1])} (max {int(sizes.max())} "
            f"atoms; size histogram {bands}). Extend the bucket ladder, "
            f"e.g. --bucket {' '.join(str(int(b)) for b in ladder)} "
            f"{int(2 ** np.ceil(np.log2(sizes.max())))}"
        )
    return ladder[slot]


def bucket_chunks(bucket_of, batch_size, rng, shuffle, drop_last=False):
    """Per-bucket index chunks, with the epoch's batch ORDER shuffled ACROSS
    buckets — matching the reference DataLoader's uniform molecule shuffle in
    training-order distribution (a bucket-major order would train on all
    small molecules first every epoch)."""
    chunks = []
    for bucket in np.unique(bucket_of):
        idx = np.where(bucket_of == bucket)[0]
        if shuffle:
            idx = rng.permutation(idx)
        for s in range(0, len(idx), batch_size):
            chunk = idx[s : s + batch_size]
            if len(chunk) < batch_size and drop_last:
                continue
            chunks.append((int(bucket), chunk))
    if shuffle and len(chunks) > 1:
        chunks = [chunks[i] for i in rng.permutation(len(chunks))]
    return chunks


def find_native_packer():
    """The C++ fast-path packer, or None when the extension is unavailable."""
    try:
        from geossl_tpu.native import packing as native_packing

        return native_packing if native_packing.available() else None
    except ImportError:
        return None


def pack_batch(
    records: Sequence[MolRecord],
    n_max: int,
    batch_size: Optional[int] = None,
    with_forces: bool = False,
) -> DenseMolBatch:
    """Pad a list of molecules into one DenseMolBatch (NumPy).

    ``batch_size > len(records)`` adds empty graph slots (graph_mask False).
    """
    b = batch_size or len(records)
    m = len(records)
    assert m <= b
    atom_type = np.zeros((b, n_max), np.int32)
    positions = np.zeros((b, n_max, 3), np.float32)
    node_mask = np.zeros((b, n_max), bool)
    graph_mask = np.zeros((b,), bool)
    ys = None
    forces = np.zeros((b, n_max, 3), np.float32) if with_forces else None
    for i, r in enumerate(records):
        n = r.num_atoms
        atom_type[i, :n] = r.atom_type
        positions[i, :n] = r.positions
        node_mask[i, :n] = True
        graph_mask[i] = True
        if r.y is not None:
            if ys is None:
                ys = np.zeros((b, np.atleast_1d(r.y).shape[0]), np.float32)
            ys[i] = np.atleast_1d(r.y)
        if with_forces and r.forces is not None:
            forces[i, :n] = r.forces
    return DenseMolBatch(
        atom_type=atom_type,
        positions=positions,
        node_mask=node_mask,
        y=ys,
        forces=forces,
        graph_mask=graph_mask,
    )


class BucketedLoader:
    """Iterate a MolStore as padded batches.

    Molecules are grouped into the smallest bucket that fits, batches are
    same-bucket (one compiled program per bucket shape), and the epoch's
    batch ORDER is shuffled across buckets — matching the reference
    DataLoader's uniform molecule shuffle in training-order distribution
    while keeping shapes static. QM9/MD17 fit one bucket (≤32 atoms);
    Molecule3D spans several; LBA/LEP ≤ 512 after env capping.
    """

    def __init__(
        self,
        store: MolStore,
        batch_size: int,
        bucket_sizes: Sequence[int] = (32, 64, 128, 256, 512),
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        with_forces: bool = False,
        transform: Optional[Callable[[MolRecord, np.random.Generator], MolRecord]] = None,
    ):
        self.store = store
        self.batch_size = batch_size
        self.bucket_sizes = tuple(sorted(bucket_sizes))
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.with_forces = with_forces
        self.transform = transform
        self._bucket_of = assign_buckets(store.num_atoms(), self.bucket_sizes)
        self._epoch = 0
        # native fast path: pack straight from the store's flat arrays when
        # the transform is absent or is the BFS mask (fused in C++)
        self._native = None
        self._bfs_ratio = getattr(transform, "bfs_mask_ratio", None)
        if (transform is None or self._bfs_ratio is not None) and not with_forces:
            native = find_native_packer()
            if native is not None and (
                self._bfs_ratio is None or store.bond_index is not None
            ):
                self._native = native

    def __len__(self) -> int:
        total = 0
        for b in np.unique(self._bucket_of):
            cnt = int((self._bucket_of == b).sum())
            total += cnt // self.batch_size if self.drop_last else -(-cnt // self.batch_size)
        return total

    def epoch(self, epoch: Optional[int] = None) -> Iterator[DenseMolBatch]:
        """Yield one epoch of batches; deterministic per (seed, epoch)."""
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        rng = np.random.default_rng((self.seed, epoch))
        chunks = bucket_chunks(
            self._bucket_of, self.batch_size, rng, self.shuffle, self.drop_last
        )
        for bucket, chunk in chunks:
            if self._native is not None:
                if self._bfs_ratio is not None:
                    at, pos, nm, gm, y = self._native.pack_batch_bfs_from_store(
                        self.store, chunk, bucket, self.batch_size,
                        self._bfs_ratio, rng,
                    )
                else:
                    at, pos, nm, gm, y = self._native.pack_batch_from_store(
                        self.store, chunk, bucket, self.batch_size
                    )
                yield DenseMolBatch(
                    atom_type=at, positions=pos, node_mask=nm,
                    y=y, graph_mask=gm,
                )
                continue
            records = [self.store.get(int(i)) for i in chunk]
            if self.transform is not None:
                records = [self.transform(r, rng) for r in records]
            yield pack_batch(records, bucket, self.batch_size, self.with_forces)

    def __iter__(self) -> Iterator[DenseMolBatch]:
        return self.epoch()
