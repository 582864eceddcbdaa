"""Kernel headroom experiment 1: what does the CFConv backward spend time on?

Interleaved A/B of backward-kernel VARIANTS at the DDM flagship shape
(B=128, N=32, G=51, F=128), 6 chained blocks, value-fetch fenced.

Variants (each = one pallas_call, same grid/blocking as the repo kernel):
  full        — repo backward: ddist, denv, dx, dw1, db1, dw2, db2
  skip_pair   — no ddist/denv (what a symbolic-zeros dispatch would run in
                DDM/QM9/LBA/LEP where positions carry no gradient)
  skip_dw     — only ddist/denv (the MD17 inner-force backward)
  nossp       — full, but ssp/sigmoid replaced by identity (transcendental share)
  noexp       — full, but the RBF exp replaced by its argument (exp share)
  fwdonly     — the forward kernel alone for reference
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

from geossl_tpu.ops.cfconv_pallas import (
    _offsets, _rbf_4d, _ssp, _dot, _batch_block, _fwd_pallas,
)
from geossl_tpu.ops.pallas_utils import pair_tiles

B, N, G, F = 128, 32, 51, 128
START, STOP = 0.0, 10.0


def make_bwd(variant):
    need_pair = variant in ("full", "skip_dw", "nossp", "noexp")
    need_dx = variant != "skip_dw"
    need_dw = variant != "skip_dw"
    use_ssp = variant != "nossp"
    use_exp = variant != "noexp"

    def kernel(dist_ref, env_ref, x_ref, g_ref, w1_ref, b1_ref, w2_ref,
               b2_ref, *outs, start, delta, num_g, coeff, bb, ti, tj):
        outs = list(outs)
        ddist_ref = outs.pop(0) if need_pair else None
        denv_ref = outs.pop(0) if need_pair else None
        dx_ref = outs.pop(0) if need_dx else None
        if need_dw:
            dw1_ref, db1_ref, dw2_ref, db2_ref = outs
        offsets = _offsets(start, delta, num_g)
        bi, jj, ii = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        if need_dx:
            @pl.when(ii == 0)
            def _():
                dx_ref[...] = jnp.zeros_like(dx_ref)
        if need_dw:
            @pl.when((bi == 0) & (ii == 0) & (jj == 0))
            def _():
                dw1_ref[...] = jnp.zeros_like(dw1_ref)
                db1_ref[...] = jnp.zeros_like(db1_ref)
                dw2_ref[...] = jnp.zeros_like(dw2_ref)
                db2_ref[...] = jnp.zeros_like(db2_ref)

        d3 = dist_ref[...]
        env4 = env_ref[...][:, :, :, None]
        if use_exp:
            rbf = _rbf_4d(d3, offsets, coeff, bb, ti, tj, num_g)
        else:
            diff = d3[:, :, :, None] - offsets.reshape(1, 1, 1, num_g)
            rbf = (coeff * diff * diff).reshape(bb * ti * tj, num_g)
        pre1 = _dot(rbf, w1_ref[...], "f32") + b1_ref[0]
        s = _ssp(pre1) if use_ssp else pre1
        f = x_ref.shape[-1]
        g4 = g_ref[...][:, :, None, :]
        q4 = g4 * x_ref[...][:, None, :, :]
        if need_pair or need_dx:
            w_raw = _dot(s, w2_ref[...], "f32") + b2_ref[0]
            w4 = w_raw.reshape(bb, ti, tj, f)
        if need_pair:
            denv_ref[...] = jnp.sum(w4 * q4, axis=3)
        if need_dx:
            dx_ref[...] += jnp.sum(w4 * env4 * g4, axis=1)
        qe = (q4 * env4).reshape(bb * ti * tj, f)
        if need_dw:
            dw2_ref[...] += _dot(s.T, qe, "f32")
            db2_ref[0] += jnp.sum(qe, axis=0)
        if need_dw or need_pair:
            dh = _dot(qe, w2_ref[...].T, "f32")
            if use_ssp:
                dh = dh * jax.nn.sigmoid(pre1)
        if need_dw:
            dw1_ref[...] += _dot(rbf.T, dh, "f32")
            db1_ref[0] += jnp.sum(dh, axis=0)
        if need_pair:
            drbf = _dot(dh, w1_ref[...].T, "f32")
            diff4 = d3[:, :, :, None] - offsets.reshape(1, 1, 1, num_g)
            if use_exp:
                chain4 = drbf.reshape(bb, ti, tj, num_g) * jnp.exp(
                    coeff * diff4 * diff4)
            else:
                chain4 = drbf.reshape(bb, ti, tj, num_g)
            ddist_ref[...] = jnp.sum(chain4 * (2.0 * coeff) * diff4, axis=3)

    def bwd(dist, env, x, g, w1, b1, w2, b2):
        b, n, _ = dist.shape
        f = x.shape[-1]
        f1 = w1.shape[1]
        ti, tj = pair_tiles(n, 4096)
        bb = _batch_block(b, ti, tj, budget=4096)
        delta = (STOP - START) / (G - 1)
        coeff = -0.5 / delta**2
        grid = (b // bb, n // tj, n // ti)
        kern = partial(kernel, start=START, delta=delta, num_g=G,
                       coeff=coeff, bb=bb, ti=ti, tj=tj)
        pair = pl.BlockSpec((bb, ti, tj), lambda b, j, i: (b, i, j))
        acc = lambda shape: pl.BlockSpec(
            shape, lambda b, j, i: tuple(0 for _ in shape))
        out_specs, out_shape = [], []
        if need_pair:
            out_specs += [pair, pair]
            out_shape += [jax.ShapeDtypeStruct((b, n, n), jnp.float32)] * 2
        if need_dx:
            out_specs += [pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0))]
            out_shape += [jax.ShapeDtypeStruct((b, n, f), jnp.float32)]
        if need_dw:
            out_specs += [acc((G, f1)), acc((1, f1)), acc((f1, f)), acc((1, f))]
            out_shape += [jax.ShapeDtypeStruct((G, f1), jnp.float32),
                          jax.ShapeDtypeStruct((1, f1), jnp.float32),
                          jax.ShapeDtypeStruct((f1, f), jnp.float32),
                          jax.ShapeDtypeStruct((1, f), jnp.float32)]
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pair, pair,
                pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((bb, ti, f), lambda b, j, i: (b, i, 0)),
                pl.BlockSpec(w1.shape, lambda b, j, i: (0, 0)),
                pl.BlockSpec((1,) + b1.shape, lambda b, j, i: (0, 0)),
                pl.BlockSpec(w2.shape, lambda b, j, i: (0, 0)),
                pl.BlockSpec((1,) + b2.shape, lambda b, j, i: (0, 0)),
            ],
            out_specs=out_specs, out_shape=out_shape,
        )(dist, env, x, g, w1, b1[None], w2, b2[None])

    return bwd


def chained(variant, n_blocks=6):
    if variant == "fwdonly":
        def run(dist, env, x, w1, b1, w2, b2, g):
            acc = 0.0
            for _ in range(n_blocks):
                out = _fwd_pallas(dist, env, x, w1, b1, w2, b2, START, STOP, G)
                x = x + 0.001 * out
                acc = acc + jnp.sum(out)
            return acc, x
        return jax.jit(run)
    bwd = make_bwd(variant)
    def run(dist, env, x, w1, b1, w2, b2, g):
        acc = 0.0
        for _ in range(n_blocks):
            outs = bwd(dist, env, x, g, w1, b1, w2, b2)
            x = x + 0.001 * outs[-1 if variant == "skip_dw" else (2 if variant != "skip_pair" else 0)][
                ..., :1] * 0 + x * 0 + x  # keep chain via dx-ish dep
            acc = acc + sum(jnp.sum(o) for o in outs)
            x = x + 0.0001 * acc  # serialize blocks
        return acc, x
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    dist = jnp.asarray(np.abs(rng.normal(size=(B, N, N))).astype(np.float32) * 3)
    env = jnp.asarray(rng.random((B, N, N)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(G, F)).astype(np.float32) * 0.1)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.1)
    b2 = jnp.zeros((F,), jnp.float32)
    args = (dist, env, x, w1, b1, w2, b2, g)

    variants = ["full", "skip_pair", "skip_dw", "nossp", "noexp", "fwdonly"]
    fns = {v: chained(v) for v in variants}
    # compile all
    for v in variants:
        acc, _ = fns[v](*args)
        print(f"compiled {v}: {float(acc):.3e}", flush=True)
    # interleaved timing: per round, each variant runs `reps` chained calls
    reps, rounds = 20, 5
    times = {v: [] for v in variants}
    for r in range(rounds):
        for v in variants:
            fn = fns[v]
            t0 = time.perf_counter()
            acc = None
            xx = x
            for _ in range(reps):
                acc, xx = fn(dist, env, xx, w1, b1, w2, b2, g)
            _ = float(acc)  # value fetch fence
            times[v].append((time.perf_counter() - t0) / reps * 1e3)
    print("\nvariant: median ms per 6-block chain (min..max)")
    for v in variants:
        ts = sorted(times[v])
        print(f"  {v:10s} {ts[len(ts)//2]:7.3f}  ({ts[0]:.3f}..{ts[-1]:.3f})")


if __name__ == "__main__":
    main()
