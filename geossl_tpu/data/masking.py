"""BFS subgraph masking — GeoSSL's atom-masking augmentation.

Reference: ``Geom3D/datasets/datasets_3D.py:24-67``. Keep a random BFS tree
of ``ceil(N·(1-mask_ratio))`` nodes over the *bond* graph (2D connectivity),
restarting from a random unvisited node when the frontier empties; drop
everything else and relabel. Runs host-side per sample (sequential,
data-dependent — a poor fit for the device); the C++ native implementation
(``geossl_tpu/native``) accelerates it, with this NumPy version as fallback
and correctness oracle.
"""

from __future__ import annotations

import numpy as np

from geossl_tpu.data.store import MolRecord


def bfs_subgraph_indices(
    rng: np.random.Generator,
    num_nodes: int,
    bond_index: np.ndarray,  # [2, E]
    mask_ratio: float,
) -> np.ndarray:
    """Return the sorted kept-node indices (reference ``subgraph`` :24-44)."""
    sub_num = int(num_nodes * (1 - mask_ratio))
    neighbors = [[] for _ in range(num_nodes)]
    if bond_index is not None and bond_index.size:
        for k in range(bond_index.shape[1]):
            neighbors[int(bond_index[0, k])].append(int(bond_index[1, k]))

    idx_sub = [int(rng.integers(num_nodes))]
    in_sub = np.zeros(num_nodes, bool)
    in_sub[idx_sub[0]] = True
    idx_neigh = set(n for n in neighbors[idx_sub[0]] if not in_sub[n])

    # reference loop: `while len(idx_sub) <= sub_num` — keeps sub_num+1 nodes
    while len(idx_sub) <= sub_num:
        if len(idx_neigh) == 0:
            remaining = np.where(~in_sub)[0]
            if len(remaining) == 0:
                break
            idx_neigh = {int(rng.choice(remaining))}
        sample = int(rng.choice(sorted(idx_neigh)))
        idx_sub.append(sample)
        in_sub[sample] = True
        idx_neigh = (idx_neigh | set(neighbors[sample])) - set(idx_sub)

    keep = np.array(sorted(idx_sub), dtype=np.int64)
    return keep


def apply_bfs_mask(
    record: MolRecord, rng: np.random.Generator, mask_ratio: float
) -> MolRecord:
    """Keep the BFS-sampled induced subgraph (relabeled)."""
    if mask_ratio <= 0 or record.num_atoms <= 1:
        return record
    try:
        from geossl_tpu.native import packing as native

        if native.available():
            keep = native.bfs_subgraph_indices(
                rng, record.num_atoms, record.bond_index, mask_ratio
            )
        else:
            keep = bfs_subgraph_indices(
                rng, record.num_atoms, record.bond_index, mask_ratio
            )
    except ImportError:
        keep = bfs_subgraph_indices(
            rng, record.num_atoms, record.bond_index, mask_ratio
        )

    relabel = -np.ones(record.num_atoms, np.int64)
    relabel[keep] = np.arange(len(keep))
    bond = None
    if record.bond_index is not None and record.bond_index.size:
        src, dst = record.bond_index
        ok = (relabel[src] >= 0) & (relabel[dst] >= 0)
        bond = np.stack([relabel[src[ok]], relabel[dst[ok]]]).astype(np.int32)
    elif record.bond_index is not None:
        bond = record.bond_index
    return MolRecord(
        atom_type=record.atom_type[keep],
        positions=record.positions[keep],
        chirality=None if record.chirality is None else record.chirality[keep],
        bond_index=bond,
        y=record.y,
        forces=None if record.forces is None else record.forces[keep],
    )


def make_bfs_transform(mask_ratio: float):
    """Loader transform applying BFS masking (pretrain_GeoSSL.py:296).

    The returned callable carries ``bfs_mask_ratio`` so BucketedLoader can
    dispatch to the fused native BFS+pack fast path (geossl_native.cpp) —
    the per-record Python path is ~5x slower than the TPU step it feeds."""

    def transform(record: MolRecord, rng: np.random.Generator) -> MolRecord:
        return apply_bfs_mask(record, rng, mask_ratio)

    transform.bfs_mask_ratio = mask_ratio
    return transform
