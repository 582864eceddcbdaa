"""Raw-data ingestion tests for LBA (PDBBind) and LEP (atom3d LMDB).

Everything runs on synthesized files — the parsers and transforms are
dependency-free, so the full build pipeline is exercised end-to-end
(reference paths: Geom3D/datasets/datasets_LBA.py:166-295,
PDBBind_utils.py:16-49, datasets_LEP.py:177-292).
"""

import gzip
import json
import os

import numpy as np
import pytest

from geossl_tpu.data import lba, lep, splitters
from geossl_tpu.data.structio import (
    parse_index_refined,
    parse_pdb,
    parse_sdf,
)

# ---------------------------------------------------------------- fixtures


def pdb_line(serial, name, resname, chain, resseq, xyz, element,
             record="ATOM", altloc=" ", icode=" "):
    x, y, z = xyz
    return (
        f"{record:<6s}{serial:5d} {name:<4s}{altloc}{resname:<3s} {chain}"
        f"{resseq:4d}{icode}   {x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{20.0:6.2f}"
        f"          {element:>2s}"
    )


def make_protein_pdb():
    """Three residues: GLY-1 at origin (near ligand), LEU-2 at 50 Å (far),
    HOH-3 at origin (water, must be excluded from the pocket)."""
    lines = [
        pdb_line(1, " N", "GLY", "A", 1, (0.0, 0.0, 0.0), "N"),
        pdb_line(2, " CA", "GLY", "A", 1, (1.5, 0.0, 0.0), "C"),
        pdb_line(3, " C", "GLY", "A", 1, (9.0, 0.0, 0.0), "C"),  # >6 Å but same residue
        pdb_line(4, " N", "LEU", "A", 2, (50.0, 0.0, 0.0), "N"),
        pdb_line(5, " CA", "LEU", "A", 2, (51.5, 0.0, 0.0), "C"),
        pdb_line(6, " O", "HOH", "A", 3, (0.5, 0.5, 0.0), "O", record="HETATM"),
        "END",
    ]
    return "\n".join(lines)


def make_ligand_sdf(elements=("C", "O", "H"), coords=((0, 0, 1), (0, 0, 2), (0, 0, 3))):
    lines = ["lig", "  synthetic", ""]
    lines.append(f"{len(elements):3d}  0  0  0  0  0  0  0  0  0999 V2000")
    for el, (x, y, z) in zip(elements, coords):
        lines.append(
            f"{x:10.4f}{y:10.4f}{z:10.4f} {el:<3s} 0  0  0  0  0  0  0  0  0  0  0  0"
        )
    lines += ["M  END", "$$$$"]
    return "\n".join(lines)


def write_lba_raw(root, pdb_ids=("1abc", "2xyz"), labels=(4.5, 7.25)):
    raw = os.path.join(root, "raw", "refined-set")
    index_lines = [
        "# ==============================================================",
        "# PDB code, resolution, release year, -logKd/Ki, Kd/Ki, reference",
        "# ==============================================================",
    ]
    for pid, lab in zip(pdb_ids, labels):
        d = os.path.join(raw, pid)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{pid}_protein.pdb"), "w") as f:
            f.write(make_protein_pdb())
        with open(os.path.join(d, f"{pid}_ligand.sdf"), "w") as f:
            f.write(make_ligand_sdf())
        index_lines.append(
            f"{pid}  2.00  2015  {lab}  Kd=31uM  // {pid}.pdf (ref)"
        )
    os.makedirs(os.path.join(raw, "index"), exist_ok=True)
    with open(os.path.join(raw, "index", "INDEX_refined_data.2020"), "w") as f:
        f.write("\n".join(index_lines))


# ---------------------------------------------------------------- parsers


def test_parse_pdb_fields():
    s = parse_pdb(make_protein_pdb())
    assert s.elements == ["N", "C", "C", "N", "C", "O"]
    assert s.res_names[:3] == ["GLY"] * 3
    assert s.res_names[-1] == "HOH"
    np.testing.assert_allclose(s.coords[1], [1.5, 0.0, 0.0])
    assert list(s.res_seqs) == [1, 1, 1, 2, 2, 3]


def test_parse_pdb_altloc_keeps_first():
    lines = [
        pdb_line(1, " CA", "SER", "A", 1, (0, 0, 0), "C", altloc="A"),
        pdb_line(2, " CA", "SER", "A", 1, (9, 9, 9), "C", altloc="B"),
        pdb_line(3, " CB", "SER", "A", 1, (1, 1, 1), "C"),
    ]
    s = parse_pdb("\n".join(lines))
    assert len(s) == 2  # altloc B dropped
    np.testing.assert_allclose(s.coords[0], [0, 0, 0])


def test_parse_pdb_element_fallback_from_name():
    # blank element columns -> infer from the atom-name field
    line = pdb_line(1, " CA", "GLY", "A", 1, (0, 0, 0), "  ")
    s = parse_pdb(line)
    assert s.elements == ["C"]
    line = pdb_line(1, "FE  ", "HEM", "A", 1, (0, 0, 0), "  ", record="HETATM")
    s = parse_pdb(line)
    assert s.elements == ["Fe"]


def test_parse_sdf_v2000():
    els, coords = parse_sdf(make_ligand_sdf())
    assert els == ["C", "O", "H"]
    np.testing.assert_allclose(coords[:, 2], [1, 2, 3])


def test_parse_sdf_v3000():
    text = "\n".join([
        "lig", "", "",
        "  0  0  0  0  0  0  0  0  0  0999 V3000",
        "M  V30 BEGIN CTAB",
        "M  V30 COUNTS 2 0 0 0 0",
        "M  V30 BEGIN ATOM",
        "M  V30 1 C 0.0 0.0 1.25 0",
        "M  V30 2 CL 1.0 0.0 0.0 0",
        "M  V30 END ATOM",
        "M  V30 END CTAB",
        "M  END",
    ])
    els, coords = parse_sdf(text)
    assert els == ["Cl", ][1:] or els == ["C", "Cl"]
    np.testing.assert_allclose(coords[0], [0, 0, 1.25])


def test_parse_index_refined():
    text = "\n".join([
        "# comment line",
        "1abc  2.00  2015  4.50  Kd=31uM  // ref",
        "",
        "2xyz  1.80  2018  7.25  Ki=56nM  // ref",
    ])
    labels = parse_index_refined(text)
    assert labels == {"1abc": 4.5, "2xyz": 7.25}


# ---------------------------------------------------------------- LBA


def test_pocket_selects_whole_residues_excluding_water():
    protein = parse_pdb(make_protein_pdb())
    lig_coords = np.asarray([[0.0, 0.0, 1.0]], np.float32)
    idx = lba.get_pocket_atom_indices(protein, lig_coords, dist=6.0)
    # GLY-1: atom 0 within 6 Å -> ALL three GLY atoms kept (even the one at
    # 9 Å; PocketSelect keeps whole residues). LEU far, HOH excluded.
    assert list(idx) == [0, 1, 2]


def test_build_lba_end_to_end(tmp_path):
    root = str(tmp_path)
    write_lba_raw(root)
    store = lba.build_lba(root, year=2020)
    assert len(store) == 2
    rec = store.get(0)
    # pocket residue selection keeps all 3 GLY atoms, but TransformLBA's
    # atom-wise env re-selection (datasets_LBA.py:54-65) then drops the GLY
    # carbon at 9 Å; ligand contributes C,O (H dropped) -> 4 atoms
    assert rec.num_atoms == 4
    assert list(rec.atom_type) == [2, 1, 1, 3]  # N, C | C, O
    np.testing.assert_allclose(rec.y, [4.5])
    np.testing.assert_allclose(store.get(1).y, [7.25])
    with open(os.path.join(root, "processed", "pdb_id2data_id_2020.json")) as f:
        mapping = json.load(f)
    assert mapping == {"1abc": 0, "2xyz": 1}
    # identity-30 split resolves through the mapping + targets files
    tdir = os.path.join(root, "processed", "targets")
    os.makedirs(tdir)
    for mode, pid in [("train", "1abc"), ("val", "2xyz"), ("test", "1abc")]:
        with open(os.path.join(tdir, f"{mode}.txt"), "w") as f:
            f.write(pid + "\n")
    tr, va, te = splitters.atom3d_lba_split(root, 2020)
    assert (list(tr), list(va), list(te)) == ([0], [1], [0])


def test_load_lba_builds_from_raw_then_caches(tmp_path):
    root = str(tmp_path)
    write_lba_raw(root)
    store = lba.load_lba(root, year=2020)
    assert len(store) == 2
    # second load must hit the npz cache
    import shutil

    shutil.rmtree(os.path.join(root, "raw"))
    store2 = lba.load_lba(root, year=2020)
    np.testing.assert_array_equal(store.atom_type, store2.atom_type)


def test_build_lba_skips_missing_label_or_ligand(tmp_path):
    root = str(tmp_path)
    write_lba_raw(root, pdb_ids=("1abc", "2xyz", "3bad"), labels=(4.5, 7.25, 1.0))
    os.remove(os.path.join(root, "raw", "refined-set", "3bad", "3bad_ligand.sdf"))
    store = lba.build_lba(root, year=2020)
    assert len(store) == 2


# ---------------------------------------------------------------- LEP


def make_lep_item(label="A", n_prot=6, n_lig=3, far=False, seed=0):
    """Item dict in post-deserialization form: frames as dict-of-columns."""
    rng = np.random.default_rng(seed)

    def frame(shift):
        prot = rng.normal(scale=2.0, size=(n_prot, 3)) + shift
        lig = rng.normal(scale=0.5, size=(n_lig, 3))
        if far:
            prot = prot + 100.0
        coords = np.concatenate([prot, lig])
        return {
            "element": ["C"] * n_prot + ["N"] * n_lig,
            "chain": ["A"] * n_prot + ["L"] * n_lig,
            "x": coords[:, 0].tolist(),
            "y": coords[:, 1].tolist(),
            "z": coords[:, 2].tolist(),
        }

    return {
        "atoms_active": frame(0.0),
        "atoms_inactive": frame(1.0),
        "label": label,
        "id": f"item{seed}",
    }


def atom3d_serialize(item):
    """Encode an item exactly as atom3d's make_lmdb_dataset does: JSON with
    DataFrames in orient='split' form, gzip-compressed."""
    enc = dict(item)
    types = {}
    for k in ("atoms_active", "atoms_inactive"):
        cols = list(enc[k].keys())
        n = len(enc[k][cols[0]])
        data = [[enc[k][c][i] for c in cols] for i in range(n)]
        enc[k] = {"columns": cols, "index": list(range(n)), "data": data}
        types[k] = "<class 'pandas.core.frame.DataFrame'>"
    enc["types"] = types
    return gzip.compress(json.dumps(enc).encode())


def test_deserialize_lmdb_item_roundtrip():
    item = make_lep_item(label="I", seed=3)
    decoded = lep.deserialize_lmdb_item(atom3d_serialize(item))
    assert decoded["label"] == "I"
    for k in ("atoms_active", "atoms_inactive"):
        assert decoded[k]["element"] == item[k]["element"]
        np.testing.assert_allclose(decoded[k]["x"], item[k]["x"])


def test_item_to_records_label_and_selection():
    a, i, y = lep.item_to_records(make_lep_item(label="A"))
    assert y == 1.0
    _, _, y2 = lep.item_to_records(make_lep_item(label="I"))
    assert y2 == 0.0
    # ligand atoms always kept and placed last (N -> index 2 in the vocab)
    assert list(a.atom_type[-3:]) == [2, 2, 2]
    # far protein -> env selection keeps ligand only
    a_far, _, _ = lep.item_to_records(make_lep_item(far=True))
    assert a_far.num_atoms == 3


def test_item_to_records_maxnum_cap():
    item = make_lep_item(n_prot=30, n_lig=4)
    a, _, _ = lep.item_to_records(item, maxnum=10)
    # protein capped at maxnum - n_lig = 6, plus 4 ligand atoms
    assert a.num_atoms <= 10


def test_build_lep_split_and_load(tmp_path):
    root = str(tmp_path)
    items = [make_lep_item(label=l, seed=s) for s, l in enumerate("AIAI")]
    sa, si, labels = lep.build_lep_split(items, root, "train")
    assert len(sa) == len(si) == 4
    np.testing.assert_allclose(labels, [1, 0, 1, 0])
    sa2, si2, labels2 = lep.load_lep(root, "train")
    np.testing.assert_array_equal(sa.atom_type, sa2.atom_type)
    np.testing.assert_allclose(labels, labels2)


def test_read_lmdb_items_gated():
    try:
        import lmdb  # noqa: F401

        pytest.skip("lmdb available; gate not exercised")
    except ImportError:
        pass
    with pytest.raises((ImportError, FileNotFoundError)):
        list(lep.read_lmdb_items("/nonexistent"))


# ------------------------------------------------------- Molecule3D (no-RDKit)


def make_mol_block(elements, coords, bonds, name="mol"):
    lines = [name, "  synthetic", ""]
    lines.append(f"{len(elements):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000")
    for el, (x, y, z) in zip(elements, coords):
        lines.append(
            f"{x:10.4f}{y:10.4f}{z:10.4f} {el:<3s} 0  0  0  0  0  0  0  0  0  0  0  0"
        )
    for i, j, order in bonds:
        lines.append(f"{i + 1:3d}{j + 1:3d}{order:3d}  0")
    lines += ["M  END"]
    return "\n".join(lines)


def test_parse_sdf_mol_bonds():
    from geossl_tpu.data.structio import parse_sdf_mol

    block = make_mol_block(
        ["C", "O", "H"], [(0, 0, 0), (1.2, 0, 0), (-1, 0, 0)],
        [(0, 1, 2), (0, 2, 1)],
    )
    els, coords, bonds = parse_sdf_mol(block)
    assert els == ["C", "O", "H"]
    np.testing.assert_array_equal(bonds, [[0, 1, 2], [0, 2, 1]])


def test_sdf_block_to_arrays_matches_vocab():
    from geossl_tpu.data.featurize import sdf_block_to_arrays

    block = make_mol_block(
        ["C", "N", "Zn"], [(0, 0, 0), (1.4, 0, 0), (0, 1.4, 0)], [(0, 1, 4)]
    )
    arrays, counts = sdf_block_to_arrays(block)
    # C=idx1, N=idx2, Zn not in vocab -> unknown idx 8
    assert list(arrays["atom_type"]) == [1, 2, 8]
    # aromatic bond (order 4) -> type idx 3, both directions
    np.testing.assert_array_equal(arrays["bond_index"], [[0, 1], [1, 0]])
    assert list(arrays["bond_attr"][:, 0]) == [3, 3]
    assert counts[6] == 1 and counts[7] == 1


def test_build_molecule3d_without_rdkit(tmp_path):
    """The corpus builder must run on the plain-SDF path (rdkit absent in
    this environment), keeping property rows aligned across parse failures."""
    from geossl_tpu.data.molecule3d import SDF_SHARDS, build_molecule3d

    raw = tmp_path / "raw"
    raw.mkdir()
    mols = [
        make_mol_block(["C", "O"], [(0, 0, 0), (1.2, 0, 0)], [(0, 1, 1)]),
        "garbage\n",  # unparseable -> skipped, property row consumed
        make_mol_block(["N", "N"], [(0, 0, 0), (1.1, 0, 0)], [(0, 1, 3)]),
    ]
    (raw / SDF_SHARDS[0]).write_text(
        "".join(m.rstrip("\n") + "\n$$$$\n" for m in mols)
    )
    for shard in SDF_SHARDS[1:]:
        (raw / shard).write_text("")
    with open(raw / "properties.csv", "w") as f:
        # leading cid column is DROPPED by the build (datasets_Molecule3D.py:154)
        f.write("cid,p0,p1\n")
        for i in range(3):
            f.write(f"{900 + i},{i}.5,{i * 10}.0\n")
    store = build_molecule3d(str(tmp_path))
    assert len(store) == 2
    assert list(store.get(0).atom_type) == [1, 3]
    np.testing.assert_allclose(store.get(0).y, [0.5, 0.0])
    np.testing.assert_allclose(store.get(1).y, [2.5, 20.0])  # row 2, not 1


def test_parse_pdb_blank_then_lettered_altloc_not_duplicated():
    # real files mix a blank-altloc primary with lettered alternates of the
    # SAME physical atom — keep only the first record
    lines = [
        pdb_line(1, " CA", "SER", "A", 1, (0, 0, 0), "C"),
        pdb_line(2, " CA", "SER", "A", 1, (9, 9, 9), "C", altloc="A"),
        pdb_line(3, " CB", "SER", "A", 1, (1, 1, 1), "C"),
    ]
    s = parse_pdb("\n".join(lines))
    assert len(s) == 2
    np.testing.assert_allclose(s.coords[0], [0, 0, 0])


def test_parse_pdb_long_hydrogen_names_not_metals():
    # 4-char hydrogen names start at column 13 like 2-char elements do;
    # HG11/HE21 are hydrogens, not mercury/helium (bare HG with no digits
    # IS mercury)
    for name, want in (("HG11", "H"), ("HE21", "H"), ("HD23", "H"),
                       ("HG  ", "Hg")):
        line = pdb_line(1, name, "LEU", "A", 1, (0, 0, 0), "  ",
                        record="HETATM" if want == "Hg" else "ATOM")
        s = parse_pdb(line)
        assert s.elements == [want], (name, s.elements)


def test_parse_sdf_truncated_raises_catchable():
    # counts line declares more atoms than exist -> IndexError; build_lba
    # must skip such ligands rather than crash (it catches ValueError AND
    # IndexError)
    import pytest as _pytest

    text = "\n".join([
        "mol", "", "",
        "  5  0  0  0  0  0  0  0  0  0999 V2000",
        "    0.0000    0.0000    0.0000 C   0  0",
    ])
    with _pytest.raises((ValueError, IndexError)):
        parse_sdf(text)


def _write_qm9_raw(tmp_path, mols, skip_1based=(), n_props=12):
    """Synthesize the five QM9 raw files for build_qm9 (no RDKit here, so
    this exercises the scanner / per-block path)."""
    from geossl_tpu.data.qm9 import TARGET_FIELDS

    raw = tmp_path / "raw"
    raw.mkdir(exist_ok=True)
    (raw / "gdb9.sdf").write_text(
        "".join(m.rstrip("\n") + "\n$$$$\n" for m in mols))
    cols = TARGET_FIELDS[:-1]
    with open(raw / "gdb9.sdf.csv", "w") as f:
        f.write(",".join(cols) + "\n")
        for i in range(len(mols)):
            f.write(",".join(f"{(i + 1) * 0.1 * (k + 1):.6f}"
                             for k in range(len(cols))) + "\n")
    lines = [f"header{i}" for i in range(9)]
    lines += [f"{idx}   1.0   extra" for idx in skip_1based]
    lines += ["footer", ""]
    (raw / "uncharacterized.txt").write_text("\n".join(lines))
    with open(raw / "qm9.csv", "w") as f:
        f.write("smiles\n" + "C\n" * len(mols))
    with open(raw / "atomref.txt", "w") as f:
        f.write("# ZPVE U0 U298 H298 G298 CV\n")
        for sym, base in [("H", 0.1), ("C", 0.2), ("N", 0.3), ("O", 0.4),
                          ("F", 0.5)]:
            f.write(sym + " " + " ".join(f"{base + 0.01 * t:.4f}"
                                         for t in range(6)) + "\n")


def test_build_qm9_without_rdkit(tmp_path):
    """QM9 builds from raw files with no RDKit: skip list applied, thermo
    subtraction + hartree->eV conversions match a hand computation, native
    scanner and per-block Python paths agree."""
    import os

    from geossl_tpu.data.qm9 import (
        CONVERSION, HARTREE2EV, TARGET_FIELDS, build_qm9,
    )
    from geossl_tpu.native import packing

    mols = [
        make_mol_block(["C", "H", "H"], [(0, 0, 0), (1, 0, 0), (0, 1, 0)],
                       [(0, 1, 1), (0, 2, 1)]),
        make_mol_block(["O", "O"], [(0, 0, 0), (1.2, 0, 0)], [(0, 1, 2)]),
        make_mol_block(["N", "F"], [(0, 0, 0), (1.4, 0, 0)], [(0, 1, 1)]),
    ]
    _write_qm9_raw(tmp_path, mols, skip_1based=(2,))
    store = build_qm9(str(tmp_path))
    assert len(store) == 2  # molecule 2 skipped (uncharacterized)
    assert list(store.get(0).atom_type) == [1, 0, 0]  # C H H
    assert list(store.get(1).atom_type) == [2, 4]  # N F

    # row 0: homo (col 2, raw 0.1*3) converts by hartree2ev, no thermo
    np.testing.assert_allclose(
        store.get(0).y[2], 0.1 * 3 * HARTREE2EV, rtol=1e-6)
    # row 0 u0 (col 7, raw 0.1*8): minus C+2H thermo then hartree2ev
    exp_u0 = (0.1 * 8 - (0.2 + 0.01) - 2 * (0.1 + 0.01)) * HARTREE2EV
    np.testing.assert_allclose(store.get(0).y[7], exp_u0, rtol=1e-6)
    # cv (col 11): thermo-subtracted but NOT hartree-converted
    assert CONVERSION[TARGET_FIELDS[11]] == 1.0
    exp_cv = 0.1 * 12 - (0.2 + 0.05) - 2 * (0.1 + 0.05)
    np.testing.assert_allclose(store.get(0).y[11], exp_cv, rtol=1e-6)

    # per-block Python path builds the identical store
    os.environ["GEOSSL_NO_NATIVE"] = "1"
    packing._lib = None
    packing._tried = False
    try:
        store_py = build_qm9(str(tmp_path))
    finally:
        del os.environ["GEOSSL_NO_NATIVE"]
        packing._lib = None
        packing._tried = False
    assert len(store_py) == len(store)
    np.testing.assert_array_equal(store.atom_type, store_py.atom_type)
    np.testing.assert_allclose(store.positions, store_py.positions)
    np.testing.assert_allclose(store.y, store_py.y)
    np.testing.assert_array_equal(store.bond_index, store_py.bond_index)


def test_build_qm9_native_rescues_scanner_rejected_blocks(tmp_path):
    """A gdb9.sdf block the C scanner rejects but Python parses (exponent
    coordinates) must be rescued via the byte-span re-parse, so native and
    per-block builds produce identical stores."""
    from geossl_tpu.data.qm9 import build_qm9
    from geossl_tpu.native import packing

    if not packing.available():
        pytest.skip("native library unavailable")
    expo = "\n".join([
        "expo", "  synthetic", "",
        "  1  0  0  0  0  0  0  0  0  0999 V2000",
        "   1.2e-03  -4.0e+00    0.5000 N   0  0  0  0  0  0",
        "M  END",
    ])
    mols = [
        make_mol_block(["C", "H"], [(0, 0, 0), (1, 0, 0)], [(0, 1, 1)]),
        expo,
        make_mol_block(["O"], [(3, 2, 1)], []),
    ]
    _write_qm9_raw(tmp_path, mols)
    store = build_qm9(str(tmp_path))
    assert len(store) == 3  # exponent block rescued
    assert list(store.get(1).atom_type) == [2]  # N
    np.testing.assert_allclose(store.get(1).positions[0],
                               [1.2e-3, -4.0, 0.5], rtol=1e-6)

    import os

    os.environ["GEOSSL_NO_NATIVE"] = "1"
    packing._lib = None
    packing._tried = False
    try:
        store_py = build_qm9(str(tmp_path))
    finally:
        del os.environ["GEOSSL_NO_NATIVE"]
        packing._lib = None
        packing._tried = False
    assert len(store_py) == len(store)
    np.testing.assert_array_equal(store.atom_type, store_py.atom_type)
    np.testing.assert_allclose(store.positions, store_py.positions)
    np.testing.assert_allclose(store.y, store_py.y)


def test_build_qm9_smiles_drop_file(tmp_path, capsys):
    """The no-RDKit stand-in for the invalid-SMILES filter: a drop-index
    file reproduces the reference's row membership exactly, and the build
    REPORTS the delta either way (round-4 doc-sweep item: the kept-rows
    index shift is now visible, and closable without RDKit)."""
    from geossl_tpu.data.qm9 import build_qm9

    mols = [
        make_mol_block(["C", "H", "H"], [(0, 0, 0), (1, 0, 0), (0, 1, 0)],
                       [(0, 1, 1), (0, 2, 1)]),
        make_mol_block(["O", "O"], [(0, 0, 0), (1.2, 0, 0)], [(0, 1, 2)]),
        make_mol_block(["N", "F"], [(0, 0, 0), (1.4, 0, 0)], [(0, 1, 1)]),
    ]
    _write_qm9_raw(tmp_path, mols, skip_1based=())
    # no filter available: all 3 kept, warning printed
    store = build_qm9(str(tmp_path))
    assert len(store) == 3
    assert "filter UNAVAILABLE" in capsys.readouterr().out

    # drop file standing in for RDKit: row 1 (0-based) dropped + reported
    drop = tmp_path / "drop.txt"
    drop.write_text("1\n")
    store = build_qm9(str(tmp_path), smiles_drop_file=str(drop))
    assert len(store) == 2
    assert list(store.get(1).atom_type) == [2, 4]  # N F moved up
    assert "dropped: 1" in capsys.readouterr().out


def test_2d_and_mmff_variants_are_rdkit_gated():
    """mol_to_arrays_2d / mol_to_arrays_mmff (datasets_utils.py:55-109,
    :179-251 — dead code in the reference) share mol_to_arrays' featurizer
    and defer the rdkit import: importable and cleanly gated without it."""
    import importlib

    from geossl_tpu.data import featurize as F

    assert callable(F.mol_to_arrays_2d) and callable(F.mol_to_arrays_mmff)
    if importlib.util.find_spec("rdkit") is not None:
        pytest.skip("rdkit present: gating path not reachable")

    class FakeMol:  # never touched before the deferred import fires
        def GetAtoms(self):
            raise AssertionError("must import rdkit before touching mol")

    with pytest.raises(ModuleNotFoundError):
        F.mol_to_arrays_2d(FakeMol())
    with pytest.raises(ModuleNotFoundError):
        F.mol_to_arrays_mmff(FakeMol(), num_conformers=5)


def test_process_molecule3d_multi_subset(tmp_path):
    """process_molecule3d (datasets_Molecule3D.py:61-149): ONE raw scan
    writes the full cache plus head-subset caches, and each subset cache
    holds exactly the arrays a direct limit=k build produces."""
    from geossl_tpu.data.molecule3d import (
        SDF_SHARDS,
        build_molecule3d,
        load_molecule3d,
        process_molecule3d,
    )
    from geossl_tpu.data.store import MolStore

    rng = np.random.default_rng(5)
    raw = tmp_path / "raw"
    raw.mkdir()
    mols = []
    for i in range(8):
        n = int(rng.integers(2, 6))
        els = [["C", "N", "O"][int(rng.integers(3))] for _ in range(n)]
        coords = rng.normal(size=(n, 3)).round(3)
        bonds = [(j, j + 1, 1) for j in range(n - 1)]
        mols.append(make_mol_block(els, coords, bonds))
    (raw / SDF_SHARDS[0]).write_text(
        "".join(m.rstrip("\n") + "\n$$$$\n" for m in mols))
    for shard in SDF_SHARDS[1:]:
        (raw / shard).write_text("")
    with open(raw / "properties.csv", "w") as f:
        f.write("cid,p0,p1\n")
        for i in range(8):
            f.write(f"{900 + i},{i}.5,{i * 10}.0\n")

    full = process_molecule3d(str(tmp_path), subsets=(3, 5))
    assert len(full) == 8
    direct = build_molecule3d(str(tmp_path), limit=3)
    sub = MolStore.load(
        str(tmp_path / "processed" / "molecule3d_3_store.npz"))
    assert len(sub) == 3
    for name in ("atom_type", "positions", "offsets", "bond_index",
                 "bond_offsets", "y"):
        np.testing.assert_array_equal(getattr(sub, name),
                                      getattr(direct, name), err_msg=name)
    # load_molecule3d picks the subset cache up directly
    again = load_molecule3d(str(tmp_path), subset=5)
    assert len(again) == 5
    np.testing.assert_array_equal(again.get(4).atom_type,
                                  full.get(4).atom_type)
    with pytest.raises(ValueError, match="exceeds"):
        process_molecule3d(str(tmp_path), subsets=(9,))
