import numpy as np
import pytest

from geossl_tpu.data.bucketing import BucketedLoader, pack_batch
from geossl_tpu.data.masking import bfs_subgraph_indices
from geossl_tpu.data.synthetic import synthetic_qm9
from geossl_tpu.native import packing as native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_native_pack_matches_numpy():
    store = synthetic_qm9(40, seed=0)
    idx = np.array([3, 17, 29, 5], np.int64)
    at, pos, nm, gm, y = native.pack_batch_from_store(store, idx, 32, 8)
    records = [store.get(int(i)) for i in idx]
    ref = pack_batch(records, 32, 8)
    np.testing.assert_array_equal(at, ref.atom_type)
    np.testing.assert_allclose(pos, ref.positions)
    np.testing.assert_array_equal(nm, ref.node_mask)
    np.testing.assert_array_equal(gm, ref.graph_mask)
    np.testing.assert_allclose(y, ref.y)


def test_loader_uses_native_fast_path_with_same_results():
    store = synthetic_qm9(30, seed=1)
    fast = BucketedLoader(store, batch_size=8, bucket_sizes=(32,), seed=0)
    assert fast._native is not None
    import os

    slow = BucketedLoader(store, batch_size=8, bucket_sizes=(32,), seed=0)
    slow._native = None
    for a, b in zip(fast.epoch(2), slow.epoch(2)):
        np.testing.assert_array_equal(a.atom_type, b.atom_type)
        np.testing.assert_allclose(a.positions, b.positions)
        np.testing.assert_array_equal(a.node_mask, b.node_mask)
        np.testing.assert_array_equal(a.graph_mask, b.graph_mask)
        np.testing.assert_allclose(a.y, b.y)


def test_native_bfs_valid_subgraph():
    store = synthetic_qm9(10, seed=2)
    for i in range(10):
        rec = store.get(i)
        n = rec.num_atoms
        keep = native.bfs_subgraph_indices(
            np.random.default_rng(i), n, rec.bond_index, 0.3
        )
        ref_keep = bfs_subgraph_indices(
            np.random.default_rng(1000 + i), n, rec.bond_index, 0.3
        )
        # same kept-count semantics as the reference implementation
        assert len(keep) == len(ref_keep)
        assert len(np.unique(keep)) == len(keep)
        assert keep.min() >= 0 and keep.max() < n
        assert np.all(np.diff(keep) > 0)  # sorted


def test_native_radius_edges_match_numpy():
    from tests.reference_impls import radius_edges as np_radius

    rng = np.random.default_rng(0)
    pos = (rng.normal(size=(20, 3)) * 2).astype(np.float32)
    got = native.radius_edges(pos, 4.0)
    ref = np_radius(pos.astype(np.float64), 4.0)
    got_set = set(map(tuple, got.tolist()))
    ref_set = set(map(tuple, ref.tolist()))
    assert got_set == ref_set


def test_native_bfs_pack_matches_reference_semantics():
    """Fused C++ BFS+pack: kept counts follow the reference formula, kept
    atoms are a subset of the molecule, padding/graph masks correct."""
    from geossl_tpu.data.bucketing import BucketedLoader
    from geossl_tpu.data.masking import make_bfs_transform

    store = synthetic_qm9(30, seed=7)
    loader = BucketedLoader(
        store, batch_size=8, bucket_sizes=(32,), shuffle=False, seed=0,
        transform=make_bfs_transform(0.3),
    )
    assert loader._native is not None and loader._bfs_ratio == 0.3
    counts = store.num_atoms()
    seen = 0
    for b in loader.epoch(0):
        for row in range(8):
            if not b.graph_mask[row]:
                continue
            n = int(counts[seen])
            kept = int(b.node_mask[row].sum())
            assert kept == min(n, int(n * 0.7) + 1)
            orig = store.get(seen)
            orig_rows = {tuple(r) for r in orig.positions.tolist()}
            for k in range(kept):
                assert tuple(b.positions[row, k].tolist()) in orig_rows
            # padding stays zeroed
            assert not b.node_mask[row, kept:].any()
            seen += 1
    assert seen == 30


@pytest.mark.parametrize(
    "edges,n,ratio",
    [
        # branched tree: frontier choices matter at every step
        ([(0, 1), (1, 2), (2, 3), (1, 4), (4, 5), (0, 6)], 7, 0.4),
        # disconnected graph: exercises the random-restart path
        ([(0, 1), (1, 2), (3, 4)], 6, 0.34),
    ],
)
def test_native_bfs_distribution_matches_numpy(edges, n, ratio):
    """The C++ sampler (SplitMix64 + sorted-vector frontier) must produce the
    SAME kept-subgraph distribution as the NumPy oracle's
    ``rng.choice(sorted(frontier))`` semantics (reference
    ``datasets_3D.py:24-44``) — structural equality alone would miss a biased
    frontier pick. Two-sample chi-square over kept-set frequencies."""
    if not native.available():
        pytest.skip("native library unavailable")
    from collections import Counter

    from scipy.stats import chi2

    bond = np.array(
        [[a for a, b in edges] + [b for a, b in edges],
         [b for a, b in edges] + [a for a, b in edges]], np.int32
    )
    draws = 4000
    rng_np = np.random.default_rng(123)
    rng_cc = np.random.default_rng(456)
    c_np, c_cc = Counter(), Counter()
    for _ in range(draws):
        c_np[tuple(bfs_subgraph_indices(rng_np, n, bond, ratio))] += 1
        c_cc[tuple(native.bfs_subgraph_indices(rng_cc, n, bond, ratio))] += 1
    keys = sorted(set(c_np) | set(c_cc))
    # kept sizes must agree everywhere
    sizes_np = {len(k) for k in c_np}
    sizes_cc = {len(k) for k in c_cc}
    assert sizes_np == sizes_cc
    stat = 0.0
    for k in keys:
        o1, o2 = c_np.get(k, 0), c_cc.get(k, 0)
        e = (o1 + o2) / 2.0
        if e == 0:
            continue
        stat += (o1 - e) ** 2 / e + (o2 - e) ** 2 / e
    df = len(keys) - 1
    p = float(chi2.sf(stat, df))
    # fixed seeds -> deterministic; p ~ U(0,1) under H0, fail only on
    # gross divergence
    assert p > 1e-4, (
        f"kept-set distributions diverge: chi2={stat:.1f} df={df} p={p:.2e}"
    )
