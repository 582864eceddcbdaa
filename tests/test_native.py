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


# ------------------------------------------------------ SDF shard scanner


def _mol_block(elements, coords, bonds, name="mol"):
    lines = [name, "  synthetic", ""]
    lines.append(f"{len(elements):3d}{len(bonds):3d}  0  0  0  0  0  0  0  "
                 "0999 V2000")
    for el, (x, y, z) in zip(elements, coords):
        lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {el:<3s} 0  0  0  0  0  0")
    for i, j, order in bonds:
        lines.append(f"{i + 1:3d}{j + 1:3d}{order:3d}  0")
    lines.append("M  END")
    return "\n".join(lines)


def _fixture_blocks():
    make_mol_block = _mol_block
    return [
        make_mol_block(["C", "O", "H"], [(0, 0, 1), (0.5, -1.25, 2), (0, 0, 3)],
                       [(0, 1, 1), (1, 2, 2)]),
        make_mol_block(["N", "Cl"], [(1, 2, 3), (-4.5, 0.001, 9)], [(0, 1, 3)]),
        "garbage\nnot\nan\nsdf",  # malformed -> ok=False, empty span
        make_mol_block(["Zn", "C"], [(0, 0, 0), (1, 1, 1)], [(0, 1, 9)]),
    ]


def test_scan_sdf_file_matches_python_featurizer(tmp_path):
    from geossl_tpu.data.featurize import sdf_block_to_arrays

    blocks = _fixture_blocks()
    path = tmp_path / "shard.sdf"
    path.write_text("".join(b.rstrip("\n") + "\n$$$$\n" for b in blocks))
    ok, at, pos, aoff, bidx, btype, boff, byte_off = native.scan_sdf_file(
        str(path))
    assert list(ok) == [True, True, False, True]
    for k, block in enumerate(blocks):
        if not ok[k]:
            assert aoff[k + 1] == aoff[k] and boff[k + 1] == boff[k]
            continue
        ref, _ = sdf_block_to_arrays(block)
        s, e = aoff[k], aoff[k + 1]
        bs, be = boff[k], boff[k + 1]
        np.testing.assert_array_equal(at[s:e], ref["atom_type"])
        np.testing.assert_allclose(pos[s:e], ref["positions"])
        np.testing.assert_array_equal(bidx[:, bs:be], ref["bond_index"])
        np.testing.assert_array_equal(btype[bs:be], ref["bond_attr"][:, 0])


def test_native_corpus_build_equals_python(tmp_path, monkeypatch):
    """The one-pass C++ corpus build must produce the exact store the
    per-block Python path does, including property-row alignment across
    malformed blocks and the subset-limit truncation."""
    import pandas as pd

    from geossl_tpu.data import molecule3d as m3d
    from geossl_tpu.data.synthetic import write_synthetic_molecule3d_raw

    root = str(tmp_path)
    write_synthetic_molecule3d_raw(root, 400, seed=3, bad_every=17)
    prop = pd.read_csv(
        tmp_path / "raw" / "properties.csv").to_numpy(np.float32)[:, 1:]

    for limit in (None, 150):
        s_nat = m3d._build_molecule3d_native(str(tmp_path / "raw"), prop, limit)
        monkeypatch.setenv("GEOSSL_NO_NATIVE", "1")
        native._lib = None
        native._tried = False
        s_py = m3d.build_molecule3d(root, limit=limit)
        monkeypatch.delenv("GEOSSL_NO_NATIVE")
        native._lib = None
        native._tried = False
        assert len(s_nat) == len(s_py)
        np.testing.assert_array_equal(s_nat.atom_type, s_py.atom_type)
        np.testing.assert_allclose(s_nat.positions, s_py.positions)
        np.testing.assert_array_equal(s_nat.offsets, s_py.offsets)
        np.testing.assert_array_equal(s_nat.bond_index, s_py.bond_index)
        np.testing.assert_array_equal(s_nat.bond_offsets, s_py.bond_offsets)
        np.testing.assert_allclose(s_nat.y, s_py.y)


def test_scan_sdf_trailing_whitespace_not_a_block(tmp_path):
    """A trailing whitespace-only segment after the last $$$$ must NOT count
    as a block (iter_sdf_blocks parity) — a phantom block would shift every
    later properties.csv row in the corpus build."""
    path = tmp_path / "shard.sdf"
    path.write_text(_mol_block(["C"], [(0, 0, 0)], []) + "\n$$$$\n\n   \n")
    ok, *_ = native.scan_sdf_file(str(path))
    assert list(ok) == [True]


def test_scan_sdf_empty_file(tmp_path):
    path = tmp_path / "empty.sdf"
    path.write_text("")
    ok, at, pos, aoff, bidx, btype, boff, byte_off = native.scan_sdf_file(
        str(path))
    assert len(ok) == 0 and len(at) == 0 and aoff.tolist() == [0]


def test_scan_sdf_cap_retry_on_tiny_malformed_blocks(tmp_path):
    """Thousands of tiny malformed blocks exceed the size-derived max_mols
    estimate; the wrapper must retry with larger caps, not raise."""
    path = tmp_path / "bad.sdf"
    path.write_text("x\n$$$$\n" * 3000)
    ok, *_ = native.scan_sdf_file(str(path))
    assert len(ok) == 3000 and not ok.any()


def test_native_corpus_build_rescues_python_parseable_blocks(tmp_path):
    """Blocks the C scanner rejects but Python parses (V3000, exponent
    coords) must be rescued via the byte-offset re-parse so the native
    build equals the Python build exactly."""
    import pandas as pd

    from geossl_tpu.data import molecule3d as m3d

    v3000 = "\n".join([
        "v3k", "  synthetic", "", "  0  0  0     0  0            999 V3000",
        "M  V30 BEGIN CTAB", "M  V30 COUNTS 2 0 0 0 0",
        "M  V30 BEGIN ATOM",
        "M  V30 1 C 0.0 0.0 0.0 0",
        "M  V30 2 O 1.2 0.0 0.0 0",
        "M  V30 END ATOM", "M  V30 END CTAB", "M  END",
    ])
    expo = "\n".join([
        "expo", "  synthetic", "",
        "  1  0  0  0  0  0  0  0  0  0999 V2000",
        "   1.2e-03  -4.0e+00    0.5000 N   0  0  0  0  0  0",
        "M  END",
    ])
    blocks = [
        _mol_block(["C", "O"], [(0, 0, 0), (1.2, 0, 0)], [(0, 1, 1)]),
        v3000,
        expo,
        "garbage",
        _mol_block(["N"], [(3, 2, 1)], []),
    ]
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / m3d.SDF_SHARDS[0]).write_text(
        "".join(b.rstrip("\n") + "\n$$$$\n" for b in blocks))
    for shard in m3d.SDF_SHARDS[1:]:
        (raw / shard).write_text("")
    with open(raw / "properties.csv", "w") as f:
        f.write("cid,p0\n")
        for i in range(len(blocks)):
            f.write(f"{i},{i}.25\n")
    prop = pd.read_csv(raw / "properties.csv").to_numpy(np.float32)[:, 1:]

    s_nat = m3d._build_molecule3d_native(str(raw), prop, None)
    import os

    os.environ["GEOSSL_NO_NATIVE"] = "1"
    native._lib = None
    native._tried = False
    try:
        s_py = m3d.build_molecule3d(str(tmp_path))
    finally:
        del os.environ["GEOSSL_NO_NATIVE"]
        native._lib = None
        native._tried = False
    assert len(s_nat) == len(s_py) == 4  # V3000 + expo rescued, garbage not
    np.testing.assert_array_equal(s_nat.atom_type, s_py.atom_type)
    np.testing.assert_allclose(s_nat.positions, s_py.positions)
    np.testing.assert_array_equal(s_nat.offsets, s_py.offsets)
    np.testing.assert_array_equal(s_nat.bond_index, s_py.bond_index)
    np.testing.assert_allclose(s_nat.y, s_py.y)  # rows 0,1,2,4 — aligned


def test_parse_sdf_mol_rejects_out_of_range_bonds():
    from geossl_tpu.data.structio import parse_sdf_mol

    block = "\n".join([
        "bad", "  synthetic", "",
        "  2  1  0  0  0  0  0  0  0  0999 V2000",
        "    0.0000    0.0000    0.0000 C   0  0  0  0  0  0",
        "    1.0000    0.0000    0.0000 C   0  0  0  0  0  0",
        "  1  9  1  0",  # atom 9 of 2
        "M  END",
    ])
    with pytest.raises(ValueError, match="references atom"):
        parse_sdf_mol(block)


def test_radius_adjacency_rejects_nonpositive_cap():
    import jax.numpy as jnp

    from geossl_tpu.config import ModelConfig
    from geossl_tpu.ops import geometry

    dist = jnp.ones((1, 4, 4))
    pm = jnp.ones((1, 4, 4), bool)
    with pytest.raises(ValueError, match="max_neighbors"):
        geometry.radius_adjacency(dist, pm, 5.0, 0)
    with pytest.raises(ValueError, match="max_neighbors"):
        ModelConfig(max_neighbors=-3)


def test_scan_sdf_fuzz_corrupted_files(tmp_path):
    """Random byte-level corruption of a valid corpus: the scanner must
    never crash, offsets must stay consistent, and every block it marks ok
    must re-parse identically through the Python featurizer from its byte
    span (the property the corpus builder's rescue path relies on)."""
    from geossl_tpu.data.featurize import sdf_block_to_arrays

    rng = np.random.default_rng(0)
    base_blocks = []
    for i in range(12):
        n = int(rng.integers(1, 9))
        els = [["H", "C", "N", "O", "F", "S", "Cl", "Zn"][j % 8]
               for j in rng.integers(0, 8, n)]
        coords = rng.normal(size=(n, 3)).round(4)
        bonds = [(j, int(rng.integers(0, j + 1)), int(rng.integers(1, 4)))
                 for j in range(1, n)]
        base_blocks.append(_mol_block(els, coords.tolist(), bonds, f"m{i}"))
    base = "".join(b.rstrip("\n") + "\n$$$$\n" for b in base_blocks)
    raw = base.encode()

    for trial in range(25):
        data = bytearray(raw)
        for _ in range(int(rng.integers(1, 6))):
            kind = rng.integers(0, 3)
            pos = int(rng.integers(0, len(data)))
            if kind == 0 and len(data) > 10:  # delete a span
                del data[pos:pos + int(rng.integers(1, 40))]
            elif kind == 1:  # insert noise
                data[pos:pos] = bytes(rng.integers(32, 127, 8).tolist())
            else:  # flip bytes
                end = min(len(data), pos + int(rng.integers(1, 10)))
                data[pos:end] = bytes(rng.integers(32, 127, end - pos).tolist())
        path = tmp_path / f"fuzz{trial}.sdf"
        path.write_bytes(bytes(data))

        ok, at, pos_a, aoff, bidx, btype, boff, byte_off = (
            native.scan_sdf_file(str(path)))
        n = len(ok)
        assert aoff[0] == 0 and boff[0] == 0
        assert np.all(np.diff(aoff) >= 0) and np.all(np.diff(boff) >= 0)
        assert aoff[n] == len(at) and boff[n] == bidx.shape[1]
        assert np.all(np.diff(byte_off) >= 0) and byte_off[n] <= len(data)
        with open(path, "rb") as f:
            for k in np.flatnonzero(ok):
                f.seek(byte_off[k])
                text = f.read(byte_off[k + 1] - byte_off[k]).decode(
                    errors="replace")
                block = "".join(
                    line for line in text.splitlines(keepends=True)
                    if not line.startswith("$$$$"))
                ref, _ = sdf_block_to_arrays(block)
                s, e = aoff[k], aoff[k + 1]
                bs, be = boff[k], boff[k + 1]
                np.testing.assert_array_equal(at[s:e], ref["atom_type"])
                np.testing.assert_allclose(pos_a[s:e], ref["positions"],
                                           atol=1e-5)
                np.testing.assert_array_equal(bidx[:, bs:be],
                                              ref["bond_index"])
