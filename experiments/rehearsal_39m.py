"""Full-reference-scale Molecule3D rehearsal (VERDICT r4 #2/#6): the
reference's ``process()`` scans 3.9M raw molecules ONCE and writes the full
cache plus 1M and 2M head subsets (``datasets_Molecule3D.py:61-149``); the
largest rehearsal so far was 999k. This synthesizes a 3.9M-molecule raw
tree, runs ``data.molecule3d.process_molecule3d`` (one scan -> full + 1M +
2M caches), verifies the 1M subset cache against a DIRECT limit=1M build
(byte- and array-identical), and records wall / peak-RSS / cache sizes.

Run (CPU-bound, ~no TPU use):  python experiments/rehearsal_39m.py
Smoke:  python experiments/rehearsal_39m.py --corpus_size 5000 \
            --subsets 1000 2000 --root /tmp/m3d_39m_smoke --results_out /tmp/r.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def rss_watch(out, stop):
    peak = 0
    pid = os.getpid()
    while not stop.is_set():
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        peak = max(peak, int(line.split()[1]))
        except FileNotFoundError:
            break
        out["peak_rss_mb"] = round(peak / 1024, 1)
        time.sleep(2)


def sha256(path, bufsize=1 << 22):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(bufsize)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/root/corpora/m3d_39m")
    ap.add_argument("--corpus_size", type=int, default=3_900_000,
                    help="raw molecules written (reference full scan: "
                         "3,899,647 — datasets_Molecule3D.py:100)")
    ap.add_argument("--subsets", type=int, nargs="+",
                    default=[1_000_000, 2_000_000])
    ap.add_argument("--results_out",
                    default="/root/repo/experiments/rehearsal_39m_results.json")
    args = ap.parse_args(argv)

    from geossl_tpu.data.molecule3d import (
        build_molecule3d,
        process_molecule3d,
    )
    from geossl_tpu.data.store import MolStore
    from geossl_tpu.data.synthetic import write_synthetic_molecule3d_raw

    res = {"corpus_size_raw": args.corpus_size, "subsets": args.subsets}
    rss = {}
    stop = threading.Event()
    th = threading.Thread(target=rss_watch, args=(rss, stop))
    th.start()
    try:
        t0 = time.time()
        if not os.path.exists(os.path.join(args.root, "raw")):
            write_synthetic_molecule3d_raw(
                args.root, args.corpus_size, seed=args.corpus_size % 997,
                bad_every=1000)
            res["raw_write_s"] = round(time.time() - t0, 1)
        du = lambda p: round(sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p) for f in fs) / 2**20, 1)
        res["raw_tree_mb"] = du(os.path.join(args.root, "raw"))

        # the reference's process(): ONE scan -> full + head-subset caches
        t0 = time.time()
        store = process_molecule3d(args.root, subsets=tuple(args.subsets))
        res["process_s"] = round(time.time() - t0, 1)
        res["corpus_molecules"] = len(store)
        res["cache_dir_mb"] = du(os.path.join(args.root, "processed"))
        res["full_cache_mb"] = round(os.path.getsize(os.path.join(
            args.root, "processed", "molecule3d_store.npz")) / 2**20, 1)
        print(f"[39m] processed: {res}", flush=True)

        # byte- and array-identity of the 1M subset vs a direct build
        k = args.subsets[0]
        t0 = time.time()
        direct = build_molecule3d(args.root, limit=k)
        res["direct_subset_build_s"] = round(time.time() - t0, 1)
        sub_path = os.path.join(args.root, "processed",
                                f"molecule3d_{k}_store.npz")
        sub = MolStore.load(sub_path)
        same = {}
        for name in ("atom_type", "positions", "offsets", "bond_index",
                     "bond_offsets", "y"):
            a, b = getattr(sub, name), getattr(direct, name)
            same[name] = bool(
                a is None and b is None or np.array_equal(a, b))
        res["subset_arrays_identical"] = same
        assert all(same.values()), same
        direct_path = os.path.join(args.root, "processed",
                                   f"molecule3d_{k}_direct.npz")
        direct.save(direct_path)
        res["subset_bytes_identical"] = sha256(sub_path) == sha256(
            direct_path)
        os.remove(direct_path)
        print(f"[39m] subset identity: arrays ok, "
              f"bytes_identical={res['subset_bytes_identical']}", flush=True)
    finally:
        stop.set()
        th.join()
    res["peak_rss_mb"] = rss.get("peak_rss_mb")

    with open(args.results_out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    return res


if __name__ == "__main__":
    main()
