"""Kernel headroom experiment 9: ONE mega-kernel for the whole 3-block
PaiNN interaction+mixing stack (forward) vs the production per-block chain
[XLA x-MLP -> fused painn_message -> XLA mixing], at the DDM flagship
shape (B=128, N=32, F=128, R=20) — the PaiNN analog of kexp2/kexp3
(VERDICT r3 #5).

The mega kernel keeps q and the three mu channels resident in VMEM across
all 3 blocks and runs every per-node Dense (x-MLP, mu_channel_mix, the
mixing MLP) on the MXU inside the same program: 3 pallas calls + ~30 XLA
ops -> 1 call. Math is the model's exactly (models/painn.py:73-178).

Why NO LBA-shape (N=512) variant exists: whole-stack residency requires a
full row-block of every layer's gated filter tensor live at once; even at
bb=1 a single [1, 512, 512, 3F] f32 filter block is 402 MB (one F-chunk is
134 MB) against 128 MB of VMEM. Tiling j back in would put the layer loop
inside the j loop — but layer k+1 needs ALL of layer k's j-reduction, so
the kernel would have to round-trip q/mu through HBM per tile anyway,
which is exactly the production per-block chain. The fusion question at
N=512 is therefore already answered by construction; this experiment
settles the N=32 shape where residency IS feasible.

Run (TPU): python experiments/kexp9.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geossl_tpu.ops.cfconv_pallas import _offsets, _rbf_4d
from geossl_tpu.ops.painn_pallas import painn_message

B, N, F, R, L = 128, 32, 128, 20, 3
CUTOFF = 5.0
EPS = 1e-8


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def mega_kernel(dist_ref, gate_ref, dx_ref, dy_ref, dz_ref, q_ref,
                wd1_ref, bd1_ref, wd2_ref, bd2_ref, wk_ref, bk_ref,
                wmix_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                qo_ref, muo_ref, *, bb, n, f, num_r, cutoff, nblocks):
    delta = cutoff / (num_r - 1)
    coeff = -0.5 / delta**2
    offsets = _offsets(0.0, delta, num_r)
    # RBF hoisted: identical for all blocks (the production chain recomputes
    # it per block inside each painn_message call). _rbf_4d keeps the
    # reshape Mosaic-legal (major-dim collapse only — a [bb,n,n] ->
    # [bb*n*n, 1] lane->sublane reshape crashes the remote compiler).
    phi = _rbf_4d(dist_ref[...], offsets, coeff, bb, n, n, num_r)
    gate4 = gate_ref[...][:, :, :, None]
    dirs4 = (dx_ref[...][:, :, :, None], dy_ref[...][:, :, :, None],
             dz_ref[...][:, :, :, None])

    q = q_ref[...].reshape(bb * n, f)
    mu = [jnp.zeros((bb * n, f), jnp.float32) for _ in range(3)]
    for k in range(nblocks):
        # ---- interaction: x-MLP (per node, MXU) ----
        x = _silu(_dot(q, wd1_ref[k]) + bd1_ref[k : k + 1])
        x = _dot(x, wd2_ref[k]) + bd2_ref[k : k + 1]  # [bb*n, 3f]
        xq, xr, xm = jnp.split(x, 3, axis=-1)
        # ---- filters (pair grid, MXU) ----
        w3 = _dot(phi, wk_ref[k]) + bk_ref[k : k + 1]  # [bb*n*n, 3f]
        w3 = w3.reshape(bb, n, n, 3 * f) * gate4
        wq, wr, wm = jnp.split(w3, 3, axis=-1)
        # ---- j-reductions ----
        xq4 = xq.reshape(bb, 1, n, f)
        xr4 = xr.reshape(bb, 1, n, f)
        xm4 = xm.reshape(bb, 1, n, f)
        dq = jnp.sum(wq * xq4, axis=2).reshape(bb * n, f)
        wrx = wr * xr4
        wmx = wm * xm4
        q = q + dq
        for c in range(3):
            mu_c4 = mu[c].reshape(bb, 1, n, f)
            dmu_c = jnp.sum(wrx * dirs4[c] + wmx * mu_c4, axis=2)
            mu[c] = mu[c] + dmu_c.reshape(bb * n, f)
        # ---- mixing (per node, MXU) ----
        v, w = [], []
        for c in range(3):
            mm = _dot(mu[c], wmix_ref[k])  # [bb*n, 2f], no bias
            v_c, w_c = jnp.split(mm, 2, axis=-1)
            v.append(v_c)
            w.append(w_c)
        vn = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2] + EPS)
        ctx = jnp.concatenate([q, vn], axis=-1)  # [bb*n, 2f]
        x2 = _silu(_dot(ctx, w1_ref[k]) + b1_ref[k : k + 1])
        x2 = _dot(x2, w2_ref[k]) + b2_ref[k : k + 1]
        dq_i, dgate, dqmu = jnp.split(x2, 3, axis=-1)
        vw = v[0] * w[0] + v[1] * w[1] + v[2] * w[2]
        q = q + dq_i + dqmu * vw
        for c in range(3):
            mu[c] = mu[c] + dgate * w[c]

    qo_ref[...] = q.reshape(bb, n, f)
    muo_ref[...] = jnp.concatenate(mu, axis=-1).reshape(bb, n, 3 * f)


def mega_fwd(dist, gate, dx, dy, dz, q0, weights, bb):
    b, n, _ = dist.shape
    f = q0.shape[-1]
    kern = partial(mega_kernel, bb=bb, n=n, f=f, num_r=R, cutoff=CUTOFF,
                   nblocks=L)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
    pair = pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(b // bb,),
        in_specs=[pair, pair, pair, pair, pair,
                  pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0))]
        + [full(w) for w in weights],
        out_specs=[
            pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, n, 3 * f), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3 * f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=jax.default_backend() != "tpu",  # CPU numerics smoke
    )(dist, gate, dx, dy, dz, q0, *weights)


def production_stack(dist, gate, dx, dy, dz, q0, weights, use_pallas=True):
    """The driver's current path: per block XLA x-MLP -> fused (or XLA)
    painn_message -> XLA mixing. Math == models/painn.py blocks."""
    (wd1, bd1, wd2, bd2, wk, bk, wmix, w1, b1, w2, b2) = weights
    b, n, f = q0.shape
    q = q0
    mu = jnp.zeros((b, n, 3 * f), jnp.float32)
    for k in range(L):
        x = _silu(q @ wd1[k] + bd1[k][None, None])
        x = x @ wd2[k] + bd2[k][None, None]
        dq, dmu = painn_message(dist, gate, dx, dy, dz, x, mu, wk[k], bk[k],
                                CUTOFF, use_pallas=use_pallas, sparse=False)
        q = q + dq
        mu = mu + dmu
        # mixing on the flat [B,N,3F] channel-major layout
        mus = jnp.split(mu, 3, axis=-1)
        v, w = [], []
        for c in range(3):
            mm = mus[c] @ wmix[k]
            v_c, w_c = jnp.split(mm, 2, axis=-1)
            v.append(v_c)
            w.append(w_c)
        vn = jnp.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2 + EPS)
        ctx = jnp.concatenate([q, vn], axis=-1)
        x2 = _silu(ctx @ w1[k] + b1[k][None, None])
        x2 = x2 @ w2[k] + b2[k][None, None]
        dq_i, dgate, dqmu = jnp.split(x2, 3, axis=-1)
        vw = v[0] * w[0] + v[1] * w[1] + v[2] * w[2]
        q = q + dq_i + dqmu * vw
        mu = jnp.concatenate([mus[c] + dgate * w[c] for c in range(3)],
                             axis=-1)
    return q, mu


def main():
    rng = np.random.default_rng(0)
    pos = np.cumsum(rng.normal(scale=0.9, size=(B, N, 3)), axis=1).astype(
        np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    dist = np.sqrt((diff**2).sum(-1) + 1e-12).astype(np.float32)
    np.einsum("bii->bi", dist)[:] = 0.0
    eye = np.eye(N, dtype=bool)[None]
    adj = (dist < CUTOFF) & ~eye
    gate = (0.5 * (np.cos(np.pi * dist / CUTOFF) + 1.0) * adj).astype(
        np.float32)
    dirn = np.where(dist[..., None] > 0, diff / np.maximum(dist[..., None],
                                                           1e-9), 0.0)
    q0 = rng.normal(size=(B, N, F)).astype(np.float32) * 0.3
    sc = 0.08
    wshapes = [
        (L, F, F), (L, F), (L, F, 3 * F), (L, 3 * F),     # x-MLP
        (L, R, 3 * F), (L, 3 * F),                        # filter
        (L, F, 2 * F),                                    # mu_channel_mix
        (L, 2 * F, F), (L, F), (L, F, 3 * F), (L, 3 * F),  # mixing MLP
    ]
    weights = tuple(jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
                    for s in wshapes)
    args = tuple(map(jnp.asarray, (dist, gate, dirn[..., 0], dirn[..., 1],
                                   dirn[..., 2], q0)))

    fns = {
        "prod_fused": jax.jit(partial(production_stack, use_pallas=True)),
        "prod_xla": jax.jit(partial(production_stack, use_pallas=False)),
    }
    for bb in (4, 8, 16):
        fns[f"mega_bb{bb}"] = jax.jit(
            partial(lambda *a, bb=bb: mega_fwd(*a, bb=bb)))

    ref_q, ref_mu = fns["prod_xla"](*args, weights)
    outs = {}
    for name in list(fns):
        try:
            oq, omu = fns[name](*args, weights)
            err = max(
                float(jnp.max(jnp.abs(oq - ref_q))
                      / (jnp.max(jnp.abs(ref_q)) + 1e-9)),
                float(jnp.max(jnp.abs(omu - ref_mu))
                      / (jnp.max(jnp.abs(ref_mu)) + 1e-9)),
            )
            outs[name] = (oq, omu)
            print(f"compiled {name}: rel_err_vs_xla={err:.2e}", flush=True)
        except Exception as ex:
            print(f"FAILED {name}: {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)
            del fns[name]

    # interleaved timing, value-fetch fenced, chained through q
    reps, rounds = 30, 5
    times = {v: [] for v in fns}
    for r in range(rounds):
        for name, fn in fns.items():
            a = list(args)
            t0 = time.perf_counter()
            for _ in range(reps):
                oq, _ = fn(*a, weights)
                a[5] = oq
            _ = float(jnp.sum(oq))
            times[name].append((time.perf_counter() - t0) / reps * 1e3)
    print(f"\nvariant: median ms per {L}-block forward stack (min..max)")
    for v, ts in times.items():
        ts = sorted(ts)
        print(f"  {v:12s} {ts[len(ts)//2]:7.3f}  ({ts[0]:.3f}..{ts[-1]:.3f})")


if __name__ == "__main__":
    main()
