"""Kernel headroom experiment 3: mega-kernel fwd+bwd for the whole 6-block
SchNet interaction stack vs the current per-block path (repo cfconv custom
VJP + XLA Dense glue), on a full value_and_grad at the DDM flagship shape.

Mega backward: ONE kernel, grid (B/bb,), reverse loop over blocks with
per-block forward recompute from the saved h_k stack; RBF hoisted (computed
once, reused by all 6 blocks in fwd AND bwd; ddist chain applied once).
Weight cotangents accumulate across grid steps via whole-ref += of [L,...]
stacks (no sliced-ref accumulation).
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

from geossl_tpu.ops.cfconv_pallas import _offsets, _ssp, _dot, cfconv

B, N, G, F = 128, 32, 51, 128
L = 6
START, STOP = 0.0, 10.0
DELTA = (STOP - START) / (G - 1)
COEFF = -0.5 / DELTA**2


def _rbf_and_diff(d3, offsets, bb, n, num_g):
    diff4 = d3[:, :, :, None] - offsets.reshape(1, 1, 1, num_g)
    rbf4 = jnp.exp(COEFF * diff4 * diff4)
    return rbf4.reshape(bb * n * n, num_g), diff4


# ---------------------------------------------------------------- forward
def mega_fwd_kernel(dist_ref, env_ref, h0_ref, wl1_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, wa_ref, ba_ref, wb_ref, bb_ref,
                    out_ref, hstack_ref, *, bb, n, f, num_g, nblocks):
    offsets = _offsets(START, DELTA, num_g)
    rbf, _ = _rbf_and_diff(dist_ref[...], offsets, bb, n, num_g)
    env4 = env_ref[...][:, :, :, None]
    h = h0_ref[...].reshape(bb * n, f)
    hs = []
    for k in range(nblocks):
        hs.append(h.reshape(bb, n, f))
        x = _dot(h, wl1_ref[k], "f32")
        s = _ssp(_dot(rbf, w1_ref[k], "f32") + b1_ref[k:k + 1])
        w = _dot(s, w2_ref[k], "f32") + b2_ref[k:k + 1]
        w4 = w.reshape(bb, n, n, f) * env4
        m = jnp.sum(w4 * x.reshape(bb, n, f)[:, None, :, :], axis=2)
        y = _ssp(_dot(m.reshape(bb * n, f), wa_ref[k], "f32") + ba_ref[k:k + 1])
        y = _dot(y, wb_ref[k], "f32") + bb_ref[k:k + 1]
        h = h + y
    out_ref[...] = h.reshape(bb, n, f)
    hstack_ref[...] = jnp.stack(hs, axis=0)


def mega_fwd(dist, env, h0, weights, bb=8):
    b, n, _ = dist.shape
    f = h0.shape[-1]
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
    kern = partial(mega_fwd_kernel, bb=bb, n=n, f=f, num_g=G, nblocks=L)
    return pl.pallas_call(
        kern, grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
            *[full(w) for w in weights],
        ],
        out_specs=[
            pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((L, bb, n, f), lambda i: (0, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),
            jax.ShapeDtypeStruct((L, b, n, f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(dist, env, h0, *weights)


# ---------------------------------------------------------------- backward
def mega_bwd_kernel(dist_ref, env_ref, hstack_ref, wl1_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, wa_ref, ba_ref, wb_ref, bb_ref, g_ref,
                    dh0_ref, ddist_ref, denv_ref,
                    dwl1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dwa_ref, dba_ref, dwb_ref, dbb_ref,
                    *, bb, n, f, num_g, nblocks):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in (dwl1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                  dwa_ref, dba_ref, dwb_ref, dbb_ref):
            r[...] = jnp.zeros_like(r)

    offsets = _offsets(START, DELTA, num_g)
    d3 = dist_ref[...]
    rbf, diff4 = _rbf_and_diff(d3, offsets, bb, n, num_g)
    env4 = env_ref[...][:, :, :, None]
    g = g_ref[...].reshape(bb * n, f)
    drbf = jnp.zeros_like(rbf)
    denv3 = jnp.zeros((bb, n, n), jnp.float32)
    dws = {name: [] for name in
           ("wl1", "w1", "b1", "w2", "b2", "wa", "ba", "wb", "bb")}
    for k in range(nblocks - 1, -1, -1):
        h_k = hstack_ref[k].reshape(bb * n, f)
        # forward recompute
        x = _dot(h_k, wl1_ref[k], "f32")
        x4 = x.reshape(bb, n, f)
        pre1 = _dot(rbf, w1_ref[k], "f32") + b1_ref[k:k + 1]
        s = _ssp(pre1)
        w_raw = _dot(s, w2_ref[k], "f32") + b2_ref[k:k + 1]
        w_raw4 = w_raw.reshape(bb, n, n, f)
        w4 = w_raw4 * env4
        m = jnp.sum(w4 * x4[:, None, :, :], axis=2)
        mflat = m.reshape(bb * n, f)
        ya = _dot(mflat, wa_ref[k], "f32") + ba_ref[k:k + 1]
        yh = _ssp(ya)
        # backward
        dy = g
        dws["wb"].append(_dot(yh.T, dy, "f32"))
        dws["bb"].append(jnp.sum(dy, axis=0, keepdims=True))
        dyh = _dot(dy, wb_ref[k].T, "f32")
        dya = dyh * jax.nn.sigmoid(ya)
        dws["wa"].append(_dot(mflat.T, dya, "f32"))
        dws["ba"].append(jnp.sum(dya, axis=0, keepdims=True))
        dm4 = _dot(dya, wa_ref[k].T, "f32").reshape(bb, n, f)
        # m[b,i,f] = sum_j w4[b,i,j,f] x[b,j,f]
        dw4 = dm4[:, :, None, :] * x4[:, None, :, :]
        dx4 = jnp.sum(w4 * dm4[:, :, None, :], axis=1)
        denv3 += jnp.sum(w_raw4 * dw4, axis=3)
        dwflat = (dw4 * env4).reshape(bb * n * n, f)
        dws["w2"].append(_dot(s.T, dwflat, "f32"))
        dws["b2"].append(jnp.sum(dwflat, axis=0, keepdims=True))
        ds = _dot(dwflat, w2_ref[k].T, "f32")
        dpre1 = ds * jax.nn.sigmoid(pre1)
        dws["w1"].append(_dot(rbf.T, dpre1, "f32"))
        dws["b1"].append(jnp.sum(dpre1, axis=0, keepdims=True))
        drbf += _dot(dpre1, w1_ref[k].T, "f32")
        dx = dx4.reshape(bb * n, f)
        dws["wl1"].append(_dot(h_k.T, dx, "f32"))
        g = g + _dot(dx, wl1_ref[k].T, "f32")
    dh0_ref[...] = g.reshape(bb, n, f)
    # rbf chain applied ONCE for the summed drbf (6x cheaper than per-block)
    chain4 = drbf.reshape(bb, n, n, num_g) * jnp.exp(COEFF * diff4 * diff4)
    ddist_ref[...] = jnp.sum(chain4 * (2.0 * COEFF) * diff4, axis=3)
    denv_ref[...] = denv3
    # blocks were visited in reverse: un-reverse the stacks
    dwl1_ref[...] += jnp.stack(dws["wl1"][::-1], axis=0)
    dw1_ref[...] += jnp.stack(dws["w1"][::-1], axis=0)
    db1_ref[...] += jnp.concatenate(dws["b1"][::-1], axis=0)
    dw2_ref[...] += jnp.stack(dws["w2"][::-1], axis=0)
    db2_ref[...] += jnp.concatenate(dws["b2"][::-1], axis=0)
    dwa_ref[...] += jnp.stack(dws["wa"][::-1], axis=0)
    dba_ref[...] += jnp.concatenate(dws["ba"][::-1], axis=0)
    dwb_ref[...] += jnp.stack(dws["wb"][::-1], axis=0)
    dbb_ref[...] += jnp.concatenate(dws["bb"][::-1], axis=0)


def mega_bwd(dist, env, hstack, weights, g, bb=4):
    b, n, _ = dist.shape
    f = g.shape[-1]
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
    acc = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    wl1, w1, b1, w2, b2, wa, ba, wb, wbias = weights
    kern = partial(mega_bwd_kernel, bb=bb, n=n, f=f, num_g=G, nblocks=L)
    pair = pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0))
    node = pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kern, grid=(b // bb,),
        in_specs=[pair, pair,
                  pl.BlockSpec((L, bb, n, f), lambda i: (0, i, 0, 0)),
                  *[full(w) for w in weights], node],
        out_specs=[node, pair, pair,
                   acc(wl1.shape), acc(w1.shape), acc(b1.shape),
                   acc(w2.shape), acc(b2.shape), acc(wa.shape),
                   acc(ba.shape), acc(wb.shape), acc(wbias.shape)],
        out_shape=[jax.ShapeDtypeStruct((b, n, f), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, n), jnp.float32),
                   *[jax.ShapeDtypeStruct(w.shape, jnp.float32)
                     for w in weights]],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(dist, env, hstack, *weights, g)


@jax.custom_vjp
def schnet_stack(dist, env, h0, weights):
    out, _ = mega_fwd(dist, env, h0, weights)
    return out


def _stack_fwd(dist, env, h0, weights):
    out, hstack = mega_fwd(dist, env, h0, weights)
    return out, (dist, env, hstack, weights)


def _stack_bwd(res, g):
    dist, env, hstack, weights = res
    outs = mega_bwd(dist, env, hstack, weights, g)
    dh0, ddist, denv = outs[0], outs[1], outs[2]
    dweights = tuple(outs[3:])
    return ddist, denv, dh0, dweights


schnet_stack.defvjp(_stack_fwd, _stack_bwd)


# ------------------------------------------------- current per-block path
def stack6_current(dist, env, h0, weights):
    wl1, w1, b1, w2, b2, wa, ba, wb, wbias = weights
    h = h0
    for k in range(L):
        x = h @ wl1[k]
        m = cfconv(dist, env, x, w1[k], b1[k], w2[k], b2[k], START, STOP, G,
                   use_pallas=True)
        y = _ssp(m @ wa[k] + ba[k][None])
        y = y @ wb[k] + wbias[k][None]
        h = h + y
    return h


def stack6_xla(dist, env, h0, weights):
    wl1, w1, b1, w2, b2, wa, ba, wb, wbias = weights
    offsets = jnp.linspace(START, STOP, G)
    h = h0
    for k in range(L):
        x = h @ wl1[k]
        diff = dist[..., None] - offsets
        rbf = jnp.exp(COEFF * diff * diff)
        s = _ssp(rbf @ w1[k] + b1[k])
        w = (s @ w2[k] + b2[k]) * env[..., None]
        m = jnp.einsum("bijf,bjf->bif", w, x)
        y = _ssp(m @ wa[k] + ba[k][None])
        y = y @ wb[k] + wbias[k][None]
        h = h + y
    return h


def main():
    rng = np.random.default_rng(0)
    dist = jnp.asarray(np.abs(rng.normal(size=(B, N, N))).astype(np.float32) * 3)
    dist = (dist + jnp.swapaxes(dist, 1, 2)) / 2
    env = jnp.asarray(rng.random((B, N, N)).astype(np.float32))
    env = (env + jnp.swapaxes(env, 1, 2)) / 2
    h0 = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32) * 0.1)
    sc = 0.08
    weights = tuple(
        jnp.asarray(rng.normal(size=shape).astype(np.float32) * sc)
        if len(shape) == 3 else jnp.zeros(shape, jnp.float32)
        for shape in [(L, F, F), (L, G, F), (L, F), (L, F, F), (L, F),
                      (L, F, F), (L, F), (L, F, F), (L, F)]
    )

    def loss_mega(h0, dist, env, weights):
        return jnp.sum(schnet_stack(dist, env, h0, weights) ** 2)

    def loss_cur(h0, dist, env, weights):
        return jnp.sum(stack6_current(dist, env, h0, weights) ** 2)

    def loss_xla(h0, dist, env, weights):
        return jnp.sum(stack6_xla(dist, env, h0, weights) ** 2)

    grad_mega = jax.jit(jax.value_and_grad(loss_mega, argnums=(0, 1, 2, 3)))
    grad_cur = jax.jit(jax.value_and_grad(loss_cur, argnums=(0, 1, 2, 3)))
    grad_xla = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3)))

    vx, gx = grad_xla(h0, dist, env, weights)
    for name, fn in (("mega", grad_mega), ("cur", grad_cur)):
        v, gs = fn(h0, dist, env, weights)
        print(f"{name}: loss rel err {abs(float(v - vx) / float(vx)):.2e}", flush=True)
        for got, want, lbl in zip(jax.tree_util.tree_leaves(gs),
                                  jax.tree_util.tree_leaves(gx),
                                  range(99)):
            rel = float(jnp.max(jnp.abs(got - want)) /
                        (jnp.max(jnp.abs(want)) + 1e-9))
            if rel > 2e-4:
                print(f"  leaf {lbl}: REL ERR {rel:.2e}", flush=True)
    print("grad parity checked", flush=True)

    fns = {"cur": grad_cur, "mega": grad_mega}
    reps, rounds = 30, 5
    times = {v: [] for v in fns}
    for r in range(rounds):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            v = None
            hh = h0
            for _ in range(reps):
                v, gs = fn(hh, dist, env, weights)
                hh = hh + 1e-6 * gs[0]  # serialize
            _ = float(v)
            times[name].append((time.perf_counter() - t0) / reps * 1e3)
    print("\nvariant: median ms per 6-block value_and_grad (min..max)")
    for v, ts in times.items():
        ts = sorted(ts)
        print(f"  {v:6s} {ts[len(ts)//2]:7.3f}  ({ts[0]:.3f}..{ts[-1]:.3f})")


if __name__ == "__main__":
    main()
