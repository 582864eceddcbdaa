"""Kernel headroom experiment 2: ONE mega-kernel for the whole 6-block
SchNet interaction stack (forward) vs the current 6x[XLA Dense + fused
CFConv + XLA post-MLP] chain, at the DDM flagship shape (B=128, N=32).

The mega kernel hoists the RBF (computed once, reused by all 6 blocks —
the current chain recomputes it per block), keeps h resident in VMEM
across blocks, and runs the per-node Dense layers (lin1 / post-MLP) on the
MXU inside the same program: 6 pallas calls + ~24 XLA ops -> 1 call.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geossl_tpu.ops.cfconv_pallas import _offsets, _rbf_4d, _ssp, _dot, _fwd_pallas

B, N, G, F = 128, 32, 51, 128
L = 6
START, STOP = 0.0, 10.0


def mega_kernel(dist_ref, env_ref, h0_ref, wl1_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, wa_ref, ba_ref, wb_ref, bb_ref, out_ref,
                *, start, delta, num_g, coeff, bb, n, f, nblocks):
    offsets = _offsets(start, delta, num_g)
    rbf = _rbf_4d(dist_ref[...], offsets, coeff, bb, n, n, num_g)  # hoisted
    env4 = env_ref[...][:, :, :, None]
    h = h0_ref[...].reshape(bb * n, f)
    for k in range(nblocks):
        x = _dot(h, wl1_ref[k], "f32")                      # lin1 (no bias)
        s = _ssp(_dot(rbf, w1_ref[k], "f32") + b1_ref[k:k + 1])
        w = _dot(s, w2_ref[k], "f32") + b2_ref[k:k + 1]
        w4 = w.reshape(bb, n, n, f) * env4
        m = jnp.sum(w4 * x.reshape(bb, n, f)[:, None, :, :], axis=2)
        y = _dot(m.reshape(bb * n, f), wa_ref[k], "f32") + ba_ref[k:k + 1]
        y = _ssp(y)
        y = _dot(y, wb_ref[k], "f32") + bb_ref[k:k + 1]
        h = h + y
    out_ref[...] = h.reshape(bb, n, f)


def mega_fwd(dist, env, h0, weights, bb):
    b, n, _ = dist.shape
    f = h0.shape[-1]
    delta = (STOP - START) / (G - 1)
    coeff = -0.5 / delta**2
    grid = (b // bb,)
    kern = partial(mega_kernel, start=START, delta=delta, num_g=G,
                   coeff=coeff, bb=bb, n=n, f=f, nblocks=L)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
    wl1, w1, b1, w2, b2, wa, ba, wb, wbias = weights
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
            full(wl1), full(w1), full(b1), full(w2), full(b2),
            full(wa), full(ba), full(wb), full(wbias),
        ],
        out_specs=pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(dist, env, h0, *weights)


def stack6(dist, env, h0, weights):
    """Current path: per block XLA lin1 -> fused CFConv call -> XLA post-MLP."""
    wl1, w1, b1, w2, b2, wa, ba, wb, wbias = weights
    h = h0
    for k in range(L):
        x = h @ wl1[k]
        m = _fwd_pallas(dist, env, x, w1[k], b1[k], w2[k], b2[k],
                        START, STOP, G)
        y = _ssp(m @ wa[k] + ba[k][None])
        y = y @ wb[k] + wbias[k][None]
        h = h + y
    return h


def main():
    rng = np.random.default_rng(0)
    dist = jnp.asarray(np.abs(rng.normal(size=(B, N, N))).astype(np.float32) * 3)
    env = jnp.asarray(rng.random((B, N, N)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32) * 0.1)
    sc = 0.08
    weights = (
        jnp.asarray(rng.normal(size=(L, F, F)).astype(np.float32) * sc),
        jnp.asarray(rng.normal(size=(L, G, F)).astype(np.float32) * sc),
        jnp.zeros((L, F), jnp.float32),
        jnp.asarray(rng.normal(size=(L, F, F)).astype(np.float32) * sc),
        jnp.zeros((L, F), jnp.float32),
        jnp.asarray(rng.normal(size=(L, F, F)).astype(np.float32) * sc),
        jnp.zeros((L, F), jnp.float32),
        jnp.asarray(rng.normal(size=(L, F, F)).astype(np.float32) * sc),
        jnp.zeros((L, F), jnp.float32),
    )

    ref = jax.jit(stack6)(dist, env, h0, weights)
    fns = {"stack6": jax.jit(stack6)}
    for bb in (4, 8, 16):
        fns[f"mega_bb{bb}"] = jax.jit(partial(
            lambda d, e, h, w, bb=bb: mega_fwd(d, e, h, w, bb)))
    outs = {}
    for name, fn in list(fns.items()):
        try:
            if name == "stack6":
                o = fn(dist, env, h0, weights)
            else:
                o = fn(dist, env, h0, weights)
            outs[name] = o
            err = float(jnp.max(jnp.abs(o - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
            print(f"compiled {name}: rel_err_vs_stack6={err:.2e}", flush=True)
        except Exception as ex:
            print(f"FAILED {name}: {type(ex).__name__}: {str(ex)[:200]}", flush=True)
            del fns[name]

    # interleaved timing, value-fetch fenced, chained through h
    reps, rounds = 30, 5
    times = {v: [] for v in fns}
    for r in range(rounds):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            h = h0
            for _ in range(reps):
                h = fn(dist, env, h, weights)
            _ = float(jnp.sum(h))
            times[name].append((time.perf_counter() - t0) / reps * 1e3)
    print("\nvariant: median ms per 6-block forward stack (min..max)")
    for v, ts in times.items():
        ts = sorted(ts)
        print(f"  {v:10s} {ts[len(ts)//2]:7.3f}  ({ts[0]:.3f}..{ts[-1]:.3f})")


if __name__ == "__main__":
    main()
