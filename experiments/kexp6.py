"""kexp6: pad-bucket granularity + Morton atom order, on-chip A/Bs.

Two questions feeding the round-3 Atom3D defaults:

1. Bucket: the SAME LEP-shaped molecules (B=16, 250-400 atoms) padded to
   448 (full-row (8,448) tiles — N not 128-divisible) vs 512 ((32,128)
   tiles). Answer (recorded in docs/PERF.md): 512 wins ~40% — the
   occupancy gating skips every padding tile and gains granularity on the
   real ones. -> LEP driver default bucket is 512.

2. Atom order: PDB file order is not spatially local, so a complex's
   in-cutoff pairs smear over many tiles. A/B identical blobby clouds
   (12 Gaussian blobs, sigma 3 A — pocket-like) in shuffled vs
   Morton-sorted index order through the sparse kernels at the LBA shape.
   -> `--spatial_sort on` default on the Atom3D drivers.

Run: python experiments/kexp6.py  (real TPU)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from experiments.kexp5 import bench_pair, make_step
from geossl_tpu.data.transforms import morton_order
from geossl_tpu.models import PaiNN, SchNet
from geossl_tpu.ops import geometry
from geossl_tpu.ops.pallas_utils import pair_tiles, tile_occupancy


def blobby_batch(batch, n_max, seed, order):
    """Protein-pocket-like clouds; ``order`` in {"shuffled", "morton"}."""
    rng = np.random.default_rng(seed)
    atom_type = np.zeros((batch, n_max), np.int32)
    positions = np.zeros((batch, n_max, 3), np.float32)
    node_mask = np.zeros((batch, n_max), bool)
    sizes = rng.integers(300, n_max, size=batch, endpoint=True)
    for i, n in enumerate(sizes):
        centers = rng.normal(scale=18.0, size=(12, 3))
        p = (centers[rng.integers(0, 12, n)]
             + rng.normal(scale=3.0, size=(n, 3))).astype(np.float32)
        p = p[rng.permutation(n)]  # PDB-like: index order is not spatial
        if order == "morton":
            p = p[morton_order(p)]
        atom_type[i, :n] = rng.integers(0, 9, size=n)
        positions[i, :n] = p
        node_mask[i, :n] = True
    y = rng.normal(size=(batch, 1)).astype(np.float32)
    return tuple(map(jnp.asarray, (atom_type, positions, node_mask, y)))


def bench_order(model_3d, batch=64, n_max=512, seed=4, windows=6, steps=10):
    is_painn = model_3d == "painn"
    model = (PaiNN if is_painn else SchNet)(use_pallas=True, sparse=True)
    data = {o: blobby_batch(batch, n_max, seed, o)
            for o in ("shuffled", "morton")}
    cutoff = 5.0 if is_painn else 10.0
    for o, (z, pos, mask, y) in data.items():
        dist, pm = geometry.pairwise_distances(pos, mask)
        adj = geometry.radius_adjacency(dist, pm, cutoff)
        ti, tj = pair_tiles(n_max, 2048 if is_painn else 4096)
        occ = np.asarray(tile_occupancy(adj.astype(jnp.float32), 1, ti, tj))
        print(f"{model_3d} {o}: occupancy {occ.mean():.2%}")

    steps_fn, states, rates = {}, {}, {}
    for o, (z, pos, mask, y) in data.items():
        tower = (z, pos, mask)
        if is_painn:
            dist, pm = geometry.pairwise_distances(pos, mask)
            tower = tower + (geometry.radius_adjacency(dist, pm, 5.0),)
        key = jax.random.PRNGKey(0)
        bp = model.init(key, *tower)["params"]
        params = {"model": bp,
                  "head": {"w": jax.random.normal(key, (128, 1)) * 0.01,
                           "b": jnp.zeros((1,))}}
        steps_fn[o], states[o] = make_step(model, params, tower + (y,))
        data[o] = tower + (y,)
        states[o], loss = steps_fn[o](states[o], *data[o])
        assert np.isfinite(float(loss))
        rates[o] = []

    for w in range(windows):
        for o in data:
            t0 = time.perf_counter()
            for _ in range(steps):
                states[o], loss = steps_fn[o](states[o], *data[o])
            _ = float(loss)
            rates[o].append(steps / (time.perf_counter() - t0))
    sh = float(np.median(rates["shuffled"]))
    mo = float(np.median(rates["morton"]))
    print(f"{model_3d}: shuffled {64*sh:.1f}/s  morton {64*mo:.1f}/s  "
          f"-> {mo/sh:.3f}x")
    return mo / sh


if __name__ == "__main__":
    if "--buckets" in sys.argv:
        for model in ("schnet", "painn"):
            r448 = bench_pair(model, 16, 448, seed=5, n_min=250)
            r512 = bench_pair(model, 16, 512, seed=5, n_min=250)
            print(f"{model}: sparse-448 {r448:.3f}x sparse-512 {r512:.3f}x")
    r1 = bench_order("schnet")
    r2 = bench_order("painn")
    print(f"RESULT morton schnet {r1:.3f}x painn {r2:.3f}x")
