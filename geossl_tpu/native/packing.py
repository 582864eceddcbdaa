"""ctypes bindings for the C++ host runtime (built on demand, cached).

``available()`` is False (and every wrapper raises) when no C++ toolchain is
present — callers fall back to the NumPy implementations. Set
``GEOSSL_NO_NATIVE=1`` to force the fallback paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "geossl_native.cpp")
_SO = os.path.join(_HERE, "libgeossl_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GEOSSL_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64, i32, f32, u8, u64, dbl = (
            ctypes.c_int64, ctypes.c_int32, ctypes.c_float, ctypes.c_uint8,
            ctypes.c_uint64, ctypes.c_double,
        )
        P = ctypes.POINTER
        lib.pack_batch.argtypes = [
            P(i32), P(f32), P(i64), P(f32), i64, P(i64), i64, i64, i64,
            P(i32), P(f32), P(u8), P(u8), P(f32),
        ]
        lib.pack_batch.restype = None
        lib.pack_batch_bfs.argtypes = [
            P(i32), P(f32), P(i64), P(i32), P(i32), P(i64), P(f32), i64,
            P(i64), i64, i64, i64, dbl, u64,
            P(i32), P(f32), P(u8), P(u8), P(f32),
        ]
        lib.pack_batch_bfs.restype = None
        lib.bfs_subgraph.argtypes = [i64, P(i32), P(i32), i64, dbl, u64, P(i64)]
        lib.bfs_subgraph.restype = i64
        lib.radius_edges.argtypes = [P(f32), i64, dbl, P(i32), P(i32), i64]
        lib.radius_edges.restype = i64
        lib.scan_sdf_file.argtypes = [
            ctypes.c_char_p, P(i32), P(f32), i64, P(i32), P(i32), P(i32),
            i64, P(i64), P(i64), P(i64), P(u8), i64,
        ]
        lib.scan_sdf_file.restype = i64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _check_bounds(store, indices: np.ndarray, n_max: int, batch_size: int):
    """The C side memcpys n atoms into n_max-wide rows with no bound check
    (a mis-bucketed molecule would corrupt adjacent rows / the heap where
    the NumPy path raises); validate here, once per call, O(batch)."""
    if len(indices) > batch_size:
        raise ValueError(
            f"pack: {len(indices)} molecules > batch_size {batch_size}")
    sizes = store.offsets[indices + 1] - store.offsets[indices]
    if len(sizes) and int(sizes.max()) > n_max:
        raise ValueError(
            f"pack: molecule with {int(sizes.max())} atoms exceeds the "
            f"n_max={n_max} bucket (bad bucket assignment upstream)")


def pack_batch_from_store(store, indices: np.ndarray, n_max: int, batch_size: int):
    """Pack molecules straight from a MolStore's flat arrays.
    Returns (atom [B,N], pos [B,N,3], node_mask [B,N], graph_mask [B], y or None)."""
    lib = _load()
    assert lib is not None
    indices = np.ascontiguousarray(indices, np.int64)
    _check_bounds(store, indices, n_max, batch_size)
    atom = np.empty((batch_size, n_max), np.int32)
    pos = np.empty((batch_size, n_max, 3), np.float32)
    node_mask = np.empty((batch_size, n_max), np.uint8)
    graph_mask = np.empty((batch_size,), np.uint8)
    y_flat = store.y
    y_dim = 0 if y_flat is None else int(np.atleast_2d(y_flat).shape[1])
    out_y = np.empty((batch_size, y_dim), np.float32) if y_dim else None
    null_f32 = ctypes.POINTER(ctypes.c_float)()
    lib.pack_batch(
        _ptr(np.ascontiguousarray(store.atom_type), ctypes.c_int32),
        _ptr(np.ascontiguousarray(store.positions), ctypes.c_float),
        _ptr(np.ascontiguousarray(store.offsets, ), ctypes.c_int64),
        _ptr(np.ascontiguousarray(y_flat, np.float32), ctypes.c_float) if y_dim else null_f32,
        y_dim,
        _ptr(indices, ctypes.c_int64),
        len(indices), batch_size, n_max,
        _ptr(atom, ctypes.c_int32), _ptr(pos, ctypes.c_float),
        _ptr(node_mask, ctypes.c_uint8), _ptr(graph_mask, ctypes.c_uint8),
        _ptr(out_y, ctypes.c_float) if y_dim else null_f32,
    )
    return atom, pos, node_mask.astype(bool), graph_mask.astype(bool), out_y


def pack_batch_bfs_from_store(store, indices: np.ndarray, n_max: int,
                              batch_size: int, mask_ratio: float,
                              rng: np.random.Generator):
    """Fused BFS-mask + pack straight from MolStore flat arrays — the GeoSSL
    pretraining hot path (see geossl_native.cpp)."""
    lib = _load()
    assert lib is not None
    assert store.bond_index is not None and store.bond_offsets is not None
    indices = np.ascontiguousarray(indices, np.int64)
    _check_bounds(store, indices, n_max, batch_size)
    atom = np.empty((batch_size, n_max), np.int32)
    pos = np.empty((batch_size, n_max, 3), np.float32)
    node_mask = np.empty((batch_size, n_max), np.uint8)
    graph_mask = np.empty((batch_size,), np.uint8)
    y_flat = store.y
    y_dim = 0 if y_flat is None else int(np.atleast_2d(y_flat).shape[1])
    out_y = np.empty((batch_size, y_dim), np.float32) if y_dim else None
    null_f32 = ctypes.POINTER(ctypes.c_float)()
    seed = int(rng.integers(0, 2**63 - 1))
    bond = np.ascontiguousarray(store.bond_index, np.int32)
    lib.pack_batch_bfs(
        _ptr(np.ascontiguousarray(store.atom_type), ctypes.c_int32),
        _ptr(np.ascontiguousarray(store.positions), ctypes.c_float),
        _ptr(np.ascontiguousarray(store.offsets), ctypes.c_int64),
        _ptr(bond[0], ctypes.c_int32), _ptr(bond[1], ctypes.c_int32),
        _ptr(np.ascontiguousarray(store.bond_offsets), ctypes.c_int64),
        _ptr(np.ascontiguousarray(y_flat, np.float32), ctypes.c_float) if y_dim else null_f32,
        y_dim,
        _ptr(indices, ctypes.c_int64), len(indices), batch_size, n_max,
        float(mask_ratio), seed,
        _ptr(atom, ctypes.c_int32), _ptr(pos, ctypes.c_float),
        _ptr(node_mask, ctypes.c_uint8), _ptr(graph_mask, ctypes.c_uint8),
        _ptr(out_y, ctypes.c_float) if y_dim else null_f32,
    )
    return atom, pos, node_mask.astype(bool), graph_mask.astype(bool), out_y


def bfs_subgraph_indices(rng: np.random.Generator, num_nodes: int,
                         bond_index: np.ndarray, mask_ratio: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    seed = int(rng.integers(0, 2**63 - 1))
    if bond_index is None or bond_index.size == 0:
        src = np.zeros(0, np.int32)
        dst = np.zeros(0, np.int32)
    else:
        src = np.ascontiguousarray(bond_index[0], np.int32)
        dst = np.ascontiguousarray(bond_index[1], np.int32)
    out = np.empty(num_nodes, np.int64)
    n = lib.bfs_subgraph(
        num_nodes, _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
        len(src), float(mask_ratio), seed, _ptr(out, ctypes.c_int64),
    )
    return out[:n]


def radius_edges(positions: np.ndarray, r: float) -> np.ndarray:
    """[N,3] -> [E,2] ordered pairs with distance < r (matches
    ops.geometry.radius_adjacency semantics)."""
    lib = _load()
    assert lib is not None
    pos = np.ascontiguousarray(positions, np.float32)
    n = pos.shape[0]
    cap = n * (n - 1)
    src = np.empty(cap, np.int32)
    dst = np.empty(cap, np.int32)
    cnt = lib.radius_edges(
        _ptr(pos, ctypes.c_float), n, float(r),
        _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32), cap,
    )
    return np.stack([src[:cnt], dst[:cnt]], axis=1).astype(np.int64)


def scan_sdf_file(path: str):
    """Scan a whole V2000 SDF shard in one native call (the offline
    Molecule3D featurizer hot path — see geossl_native.cpp scan_sdf_file).

    Returns ``(ok [M] bool, atom_type_flat, pos_flat [sumN,3],
    atom_offsets [M+1], bond_index [2, sumE], bond_type_flat [sumE],
    bond_offsets [M+1], byte_offsets [M+1])`` with per-block spans empty
    where ``ok`` is False (unparseable / V3000 blocks — callers re-parse
    those in Python from the ``byte_offsets`` span, see
    ``molecule3d._build_molecule3d_native``). Arrays match
    ``featurize.sdf_block_to_arrays`` exactly for ok blocks. The size-
    derived buffer caps are retried geometrically if a pathological file
    (e.g. thousands of tiny malformed blocks) overflows them.
    """
    lib = _load()
    assert lib is not None
    size = os.path.getsize(path)
    # Structural bounds from the file size: an atom line is >= 30 bytes +
    # newline, a bond line >= 9 + newline, a normal block >= ~40 bytes.
    atom_cap = size // 30 + 64
    bond_cap = 2 * (size // 10) + 64
    max_mols = size // 40 + 64
    for _attempt in range(8):
        atom_type = np.empty(atom_cap, np.int32)
        pos = np.empty((atom_cap, 3), np.float32)
        bond_src = np.empty(bond_cap, np.int32)
        bond_dst = np.empty(bond_cap, np.int32)
        bond_type = np.empty(bond_cap, np.int32)
        atom_offsets = np.empty(max_mols + 1, np.int64)
        bond_offsets = np.empty(max_mols + 1, np.int64)
        byte_offsets = np.empty(max_mols + 1, np.int64)
        ok = np.empty(max_mols, np.uint8)
        n = lib.scan_sdf_file(
            path.encode(), _ptr(atom_type, ctypes.c_int32),
            _ptr(pos, ctypes.c_float), atom_cap,
            _ptr(bond_src, ctypes.c_int32), _ptr(bond_dst, ctypes.c_int32),
            _ptr(bond_type, ctypes.c_int32), bond_cap,
            _ptr(atom_offsets, ctypes.c_int64),
            _ptr(bond_offsets, ctypes.c_int64),
            _ptr(byte_offsets, ctypes.c_int64),
            _ptr(ok, ctypes.c_uint8), max_mols,
        )
        if n != -2:
            break
        atom_cap *= 4
        bond_cap *= 4
        max_mols *= 4
    if n < 0:
        raise OSError(f"scan_sdf_file({path!r}) failed with code {n}")
    n_atoms = int(atom_offsets[n])
    n_bonds = int(bond_offsets[n])
    bond_index = np.stack([bond_src[:n_bonds], bond_dst[:n_bonds]])
    return (
        ok[:n].astype(bool),
        atom_type[:n_atoms].copy(),
        pos[:n_atoms].copy(),
        atom_offsets[: n + 1].copy(),
        bond_index.copy(),
        bond_type[:n_bonds].copy(),
        bond_offsets[: n + 1].copy(),
        byte_offsets[: n + 1].copy(),
    )


# The record-list pack used by bucketing.pack_batch's generic path is NOT
# accelerated (records may come from transforms); the store fast path is.
def pack_batch(records, n_max, batch_size):  # pragma: no cover
    raise ImportError("use pack_batch_from_store for the native fast path")
