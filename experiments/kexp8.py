"""kexp8: single-chip giant-graph ceiling (fused kernels + sparse tiles).

Question: how far beyond the Atom3D cap (N=512) does ONE v5e chip train,
with the fused Pallas kernels + occupancy gating + Morton order? This
grounds the pair-grid model-parallel extension (parallel/pair_parallel.py):
its job starts where this measurement stops.

Method: pocket-like Morton-sorted clouds (kexp6/7 fixture) at B=1,
N in {512, 1024, 2048, 4096}; jitted value_and_grad+adam step, value-fetch
fenced. Reports step time, atoms/s, and measured tile occupancy.

Run: python experiments/kexp8.py  (real TPU)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from geossl_tpu.data.transforms import morton_order
from geossl_tpu.models import PaiNN, SchNet
from geossl_tpu.ops import geometry
from geossl_tpu.ops.pallas_utils import pair_tiles, tile_occupancy
from experiments.kexp7 import make_step


def cloud(n, seed=0, blob_scale=None):
    rng = np.random.default_rng(seed)
    # constant DENSITY: protein-like packing, volume grows with n
    nblobs = max(4, n // 40)
    scale = blob_scale or 6.0 * (n / 100.0) ** (1 / 3)
    centers = rng.normal(scale=scale, size=(nblobs, 3))
    p = (centers[rng.integers(0, nblobs, n)]
         + rng.normal(scale=3.0, size=(n, 3))).astype(np.float32)
    p = p[morton_order(p)]
    z = rng.integers(1, 9, (1, n)).astype(np.int32)
    mask = np.ones((1, n), bool)
    y = rng.normal(size=(1, 1)).astype(np.float32)
    return (jnp.asarray(z), jnp.asarray(p[None]), jnp.asarray(mask),
            jnp.asarray(y))


def run(model_3d, n, windows=4, steps=4):
    is_painn = model_3d == "painn"
    z, pos, mask, y = cloud(n, seed=n)
    cutoff = 5.0 if is_painn else 10.0
    dist, pm = geometry.pairwise_distances(pos, mask)
    adj = geometry.radius_adjacency(dist, pm, cutoff)
    ti, tj = pair_tiles(n, 2048 if is_painn else 4096)
    occ = np.asarray(tile_occupancy(adj.astype(jnp.float32), 1, ti, tj))
    deg = float(adj.sum() / n)
    extra = (adj,) if is_painn else ()
    tower = (z, pos, mask) + extra
    model = (PaiNN if is_painn else SchNet)(use_pallas=True, sparse=True)
    try:
        key = jax.random.PRNGKey(0)
        bp = model.init(key, *tower)["params"]
        params = {"model": bp,
                  "head": {"w": jax.random.normal(key, (128, 1)) * 0.01,
                           "b": jnp.zeros((1,))}}
        step, state = make_step(model, params, tower, y)
        t0 = time.perf_counter()
        state, loss = step(state, *tower)
        f = float(loss)
        compile_s = time.perf_counter() - t0
        assert np.isfinite(f), f
        rates = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, loss = step(state, *tower)
            f = float(loss)
            rates.append(steps / (time.perf_counter() - t0))
        ms = 1e3 / float(np.median(rates))
        print(f"{model_3d} N={n}: {ms:.1f} ms/step ({n / ms * 1e3:.0f} "
              f"atoms/s) occ {occ.mean():.0%} deg {deg:.0f} "
              f"compile {compile_s:.0f}s", flush=True)
    except Exception as e:
        print(f"{model_3d} N={n}: FAILED — {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    for n in (512, 1024, 2048, 4096):
        run("schnet", n)
    for n in (512, 1024, 2048, 4096):
        run("painn", n)
