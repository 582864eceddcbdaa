"""kexp7: pair-tile HEIGHT sweep under occupancy gating (Atom3D shapes).

Question: the occupancy-gated kernels skip whole (ti, 128) tiles; finer ti
means more granular skipping (lower occupancy) but 2-4x more grid steps and
smaller per-tile matmuls. kexp5/kexp6 ran at the default budgets (SchNet
ti=32, PaiNN ti=16 at N=512). Is the default on the right side of the
trade-off with Morton-sorted pocket-like geometry?

Method: same Morton-sorted pocket-like fixture as kexp6 (12-blob clouds at
the LBA shape), jitted value_and_grad+adam step, INTERLEAVED windows across
all budgets in one process, value-fetch fenced (CLAUDE.md pitfall #1). The
row budget is module-level (`cfconv_pallas._ROW_BUDGET`,
`painn_pallas._PAINN_BUDGET`) and baked in at trace time, so each budget
gets a freshly constructed step function.

Run: python experiments/kexp7.py  (real TPU)

RESULT (v5e, 2026-08-18, quiet window; Morton-sorted fixture, B=64 N=512):
  schnet (32,128) 55.8% occ -> 338/s | (16,128) 48.6% -> 324/s (0.957x)
                                     | (8,128)  43.6% -> 309/s (0.914x)
  painn  (16,128) 42.6% occ -> 306/s | (8,128)  37.2% -> 276/s (0.903x)
                                     | (32,128) 50.1% -> 303/s (0.989x)
The DEFAULTS WIN: finer tiles lower occupancy as expected but per-tile
fixed overhead (grid steps, block loads) outweighs the extra skipping;
coarser SchNet tiles (64,128) exceed the 16 MB scoped-VMEM limit in the
symmetric backward (26.4 MB). Tile budgets stay at 4096/2048.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from functools import partial

import jax.numpy as jnp
import numpy as np

from geossl_tpu.data.transforms import morton_order
from geossl_tpu.models import PaiNN, SchNet
from geossl_tpu.ops import cfconv_pallas, geometry, painn_pallas
from geossl_tpu.ops.pallas_utils import pair_tiles, tile_occupancy
from geossl_tpu.train import common, optim


def pocket_cloud(batch, n_max, seed, n_min=300):
    """Morton-sorted 12-blob clouds (kexp6 fixture)."""
    rng = np.random.default_rng(seed)
    z = np.zeros((batch, n_max), np.int32)
    pos = np.zeros((batch, n_max, 3), np.float32)
    mask = np.zeros((batch, n_max), bool)
    for b in range(batch):
        n = int(rng.integers(n_min, n_max + 1))
        centers = rng.normal(scale=18.0, size=(12, 3))
        p = (centers[rng.integers(0, 12, n)]
             + rng.normal(scale=3.0, size=(n, 3))).astype(np.float32)
        p = p[morton_order(p)]
        z[b, :n] = rng.integers(1, 9, n)
        pos[b, :n] = p
        mask[b, :n] = True
    y = rng.normal(size=(batch, 1)).astype(np.float32)
    return jnp.asarray(z), jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(y)


def make_step(model, params, args, y):
    tx = optim.make_optimizer(1e-4, epochs=300, steps_per_epoch=50)
    state = common.TrainState.create(params, tx)

    def loss_fn(p, *a):
        g, _ = model.apply({"params": p["model"]}, *a)
        pred = (g @ p["head"]["w"] + p["head"]["b"])[:, 0]
        return jnp.mean((pred - y[:, 0]) ** 2)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, *a):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *a)
        return common.apply_updates(state, grads, tx), loss

    return step, state


def sweep(model_3d, budgets, batch=64, n_max=512, seed=11, windows=6,
          steps=8):
    is_painn = model_3d == "painn"
    mod = painn_pallas if is_painn else cfconv_pallas
    attr = "_PAINN_BUDGET" if is_painn else "_ROW_BUDGET"
    default = getattr(mod, attr)

    z, pos, mask, y = pocket_cloud(batch, n_max, seed)
    extra = ()
    cutoff = 5.0 if is_painn else 10.0
    dist, pm = geometry.pairwise_distances(pos, mask)
    adj = geometry.radius_adjacency(dist, pm, cutoff)
    if is_painn:
        extra = (adj,)
    tower = (z, pos, mask) + extra

    steps_fn, states, rates = {}, {}, {}
    params = None
    for budget in budgets:
        setattr(mod, attr, budget)
        ti, tj = pair_tiles(n_max, budget)
        occ = np.asarray(tile_occupancy(adj.astype(jnp.float32), 1, ti, tj))
        print(f"{model_3d} budget={budget}: tile ({ti},{tj}) occupancy "
              f"{occ.mean():.2%}", flush=True)
        model = (PaiNN if is_painn else SchNet)(use_pallas=True, sparse=True)
        if params is None:
            key = jax.random.PRNGKey(0)
            bp = model.init(key, *tower)["params"]
            params = {"model": bp,
                      "head": {"w": jax.random.normal(key, (128, 1)) * 0.01,
                               "b": jnp.zeros((1,))}}
        own = jax.tree_util.tree_map(jnp.array, params)
        steps_fn[budget], states[budget] = make_step(model, own, tower, y)
        states[budget], loss = steps_fn[budget](states[budget], *tower)
        f = float(loss)
        assert np.isfinite(f), f
        rates[budget] = []
    setattr(mod, attr, default)

    for w in range(windows):
        for budget in budgets:
            t0 = time.perf_counter()
            for _ in range(steps):
                states[budget], loss = steps_fn[budget](states[budget], *tower)
            f = float(loss)
            rates[budget].append(steps / (time.perf_counter() - t0))
    losses = {b: float(steps_fn[b](states[b], *tower)[1]) for b in budgets}
    base = float(np.median(rates[default]))
    for budget in budgets:
        r = float(np.median(rates[budget]))
        print(f"{model_3d} budget={budget}: {batch*r:.1f} complex/s "
              f"({r/base:.3f}x vs default {default})  loss={losses[budget]:.6g}",
              flush=True)


if __name__ == "__main__":
    # SchNet default 4096 -> (32,128); finer 2048 -> (16,128), 1024 -> (8,128).
    # Coarser 8192 -> (64,128) exceeds the 16 MB scoped-VMEM limit in the
    # symmetric backward (26.4 MB) and its occupancy is 64% — not a candidate.
    sweep("schnet", [4096, 2048, 1024])
    # PaiNN default 2048 -> (16,128); 1024 -> (8,128); 4096 -> (32,128)
    sweep("painn", [2048, 1024, 4096])
