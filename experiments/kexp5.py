"""kexp5: occupancy-gated ("sparse") pair tiles A/B at the Atom3D shapes.

Question: the LBA/LEP pair grids (N=512/448, cutoff 10/5 A) leave many
(32,128)-atom tiles with zero envelope everywhere (out-of-cutoff + padding).
Do scalar-prefetched per-tile skip flags (ops/pallas_utils.pair_pallas_call)
buy real step time on the v5e, at identical outputs?

Method: same params/batch, jitted value_and_grad+adam step, interleaved
OFF/ON windows (tunnel noise is +-10%), value-fetch fenced per window
(CLAUDE.md benchmark pitfall #1). Also prints the measured tile occupancy so
the speedup can be read against the skippable fraction.

Run: python experiments/kexp5.py  (real TPU)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from functools import partial

import jax.numpy as jnp
import numpy as np

from bench import _example
from geossl_tpu.models import PaiNN, SchNet
from geossl_tpu.ops import geometry
from geossl_tpu.ops.pallas_utils import pair_tiles, tile_occupancy
from geossl_tpu.train import common, optim


def make_step(model, params, flat_args):
    tx = optim.make_optimizer(1e-4, epochs=300, steps_per_epoch=50)
    state = common.TrainState.create(params, tx)

    def loss_fn(p, *args):
        g, _ = model.apply({"params": p["model"]}, *args[:-1])
        pred = (g @ p["head"]["w"] + p["head"]["b"])[:, 0]
        return jnp.mean((pred - args[-1][:, 0]) ** 2)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, *args):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *args)
        return common.apply_updates(state, grads, tx), loss

    return step, state


def bench_pair(model_3d, batch, n_max, seed, windows=6, steps=10,
               n_min=300):
    is_painn = model_3d == "painn"
    z, pos, mask, y, _ = _example(batch, n_max, seed=seed,
                                  n_min=min(n_min, n_max - 1), spread=2.0)
    extra = ()
    if is_painn:
        dist, pm = geometry.pairwise_distances(pos, mask)
        extra = (geometry.radius_adjacency(dist, pm, 5.0),)
    tower = (z, pos, mask) + extra

    # measured occupancy at the kernel's own tiling
    cutoff = 5.0 if is_painn else 10.0
    dist, pm = geometry.pairwise_distances(pos, mask)
    adj = geometry.radius_adjacency(dist, pm, cutoff)
    ti, tj = pair_tiles(n_max, 2048 if is_painn else 4096)
    occ = np.asarray(tile_occupancy(adj.astype(jnp.float32), 1, ti, tj))
    print(f"{model_3d} N={n_max}: tile ({ti},{tj}) occupancy "
          f"{occ.mean():.2%} ({occ.sum()}/{occ.size})")

    rates = {}
    states, steps_fn = {}, {}
    for mode in (False, True):
        model = (PaiNN if is_painn else SchNet)(use_pallas=True, sparse=mode)
        if mode is False:
            key = jax.random.PRNGKey(0)
            bp = model.init(key, *tower)["params"]
            params = {"model": bp,
                      "head": {"w": jax.random.normal(key, (128, 1)) * 0.01,
                               "b": jnp.zeros((1,))}}
        # fresh buffers per mode — the step donates its state, and both
        # states must not alias the same arrays
        own = jax.tree_util.tree_map(jnp.array, params)
        steps_fn[mode], states[mode] = make_step(model, own, tower + (y,))
        # warmup/compile + fence
        states[mode], loss = steps_fn[mode](states[mode], *tower, y)
        f = float(loss)
        assert np.isfinite(f), f
        rates[mode] = []

    for w in range(windows):
        for mode in (False, True):
            t0 = time.perf_counter()
            for _ in range(steps):
                states[mode], loss = steps_fn[mode](states[mode], *tower, y)
            f = float(loss)
            rates[mode].append(steps / (time.perf_counter() - t0))
    off = float(np.median(rates[False]))
    on = float(np.median(rates[True]))
    print(f"{model_3d} N={n_max}: dense {batch*off:.1f}/s  "
          f"sparse {batch*on:.1f}/s  -> {on/off:.3f}x")
    # equality of the final losses (same trajectory either way)
    lo = float(steps_fn[False](states[False], *tower, y)[1])
    ls = float(steps_fn[True](states[True], *tower, y)[1])
    print(f"  final losses dense={lo:.6g} sparse={ls:.6g} "
          f"(rel diff {abs(lo-ls)/max(abs(lo),1e-9):.2e})")
    return on / off


if __name__ == "__main__":
    r1 = bench_pair("schnet", 64, 512, seed=4)
    r2 = bench_pair("painn", 64, 512, seed=8)
    print(f"RESULT schnet_lba {r1:.3f}x  painn_lba {r2:.3f}x")
