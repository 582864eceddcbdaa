"""Kernel headroom experiment 10 (round 5, VERDICT r4 #5): measure — not
extrapolate — the PaiNN whole-stack bound on the TRAINING step, and the
SchNet stack kernel's N=128 serving verdict.

Part 1 — DDM-PaiNN training step at the flagship shape (B=128, N=32):
  A/B of the production per-block path (x-MLP/mixing in XLA + fused
  painn_message custom-VJP per block) vs the kexp10 stack-train path
  (ops/painn_pallas.painn_stack_train: forward = ONE stack kernel saving
  block-boundary q/mu; backward = the SAME per-block _painn_bwd kernels +
  XLA vjps). Both run the full DDM loss (two views, two NCSN heads) under
  value_and_grad + Adam, chained k steps per dispatch (lax.scan) so host
  dispatch latency cannot pollute the numbers; fenced by a value fetch.
  Round 4 BOUNDED the training win under ~8% from kexp3's SchNet precedent
  plus VMEM arithmetic; this measures it. Integrate if >= 10%.

Part 2 — SchNet whole-stack inference kernel at N=128 (the pretrain ladder's
  top bucket, currently guarded to N<=64 in serve.py): build the N=128
  pallas_call directly (same kernel, bb from _batch_block) and A/B against
  the per-block fused forward at B=32/128. Records the measured verdict the
  round-4 guard only asserted.

Part 3 — PaiNN whole-stack inference kernel at N=128, B=128: A/B of the
  production ``models.painn.fused_stack_apply`` (which accepts N=128 since
  the STACK_MAX_N raise this experiment justified) vs ``module.apply``.
  This is the measurement behind the 1.32x row in kexp10_results.json.

Run (TPU): python experiments/kexp10.py [part1 part2 part3]
  (no args = all parts; results merge into kexp10_results.json so a
  partial rerun never deletes the other parts' recorded evidence)
"""

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import optax

B, N, F = 128, 32, 128
CUTOFF = 5.0
SIGMA = 0.3
CHAIN = 10  # steps per dispatch


def make_batch(rng, b=B, n=N):
    pos = np.cumsum(rng.normal(scale=0.9, size=(b, n, 3)), axis=1).astype(
        np.float32)
    z = rng.integers(1, 9, (b, n)).astype(np.int32)
    mask = np.ones((b, n), bool)
    return (jnp.asarray(z), jnp.asarray(pos), jnp.asarray(mask))


# ------------------------------------------------------------------ part 1
def part1():
    from geossl_tpu.models.painn import PaiNN, stack_train_apply
    from geossl_tpu.objectives.ncsn import NCSNv3
    from geossl_tpu.objectives.pairs import pair_selection
    from geossl_tpu.ops import geometry

    rng = np.random.default_rng(0)
    z, pos, mask = make_batch(rng)
    mod = PaiNN(use_pallas=True)
    key = jax.random.PRNGKey(42)
    params = {"model": mod.init(key, z, pos, mask)["params"]}
    ncsn = NCSNv3(emb_dim=F)
    h0 = jnp.zeros((2, N, F))
    d0 = jnp.zeros((2, N, N))
    s0 = jnp.ones((2, N, N), bool)
    k1, k2 = jax.random.split(key)
    params["NCSN_01"] = ncsn.init(k1, k1, h0, d0, s0)["params"]
    params["NCSN_02"] = ncsn.init(k2, k2, h0, d0, s0)["params"]
    tx = optax.adam(5e-4)

    def loss_fn(p, rngs, backbone):
        k_view, kn1, kn2 = rngs
        pos1 = pos
        pos2 = pos1 + SIGMA * jax.random.normal(k_view, pos1.shape)
        # cached clean-geometry radius graph (pretrain_GeoSSL.py:88-89)
        dist, pm = geometry.pairwise_distances(pos1, mask)
        pair_mask = geometry.radius_adjacency(dist, pm, CUTOFF, None)
        if backbone == "stack":
            _, h1 = stack_train_apply(mod, p["model"], z, pos1, mask,
                                      pair_mask)
            _, h2 = stack_train_apply(mod, p["model"], z, pos2, mask,
                                      pair_mask)
        else:
            _, h1 = mod.apply({"params": p["model"]}, z, pos1, mask,
                              pair_mask)
            _, h2 = mod.apply({"params": p["model"]}, z, pos2, mask,
                              pair_mask)
        sel = pair_selection(mask, "combination", 1.0)
        d1, _ = geometry.pairwise_distances(pos1, mask)
        d2, _ = geometry.pairwise_distances(pos2, mask)
        l1 = ncsn.apply({"params": p["NCSN_01"]}, kn1, h1, d2, sel)
        l2 = ncsn.apply({"params": p["NCSN_02"]}, kn2, h2, d1, sel)
        return (l1 + l2) / 2

    def make_chain(backbone):
        @partial(jax.jit, donate_argnums=(0, 1))
        def chain(p, opt_state, epoch_key):
            def body(carry, i):
                p, opt_state = carry
                rngs = tuple(jax.random.split(
                    jax.random.fold_in(epoch_key, i), 3))
                loss, grads = jax.value_and_grad(loss_fn)(p, rngs, backbone)
                updates, opt_state = tx.update(grads, opt_state, p)
                p = optax.apply_updates(p, updates)
                return (p, opt_state), loss
            (p, opt_state), losses = jax.lax.scan(
                body, (p, opt_state), jnp.arange(CHAIN))
            return p, opt_state, losses
        return chain

    fns = {"prod_perblock": make_chain("prod"),
           "stack_train": make_chain("stack")}
    # warm compile + loss parity over one chained run from the same state
    ref_losses = {}
    for name, fn in fns.items():
        p2, o2, losses = fn(jax.tree_util.tree_map(jnp.copy, params),
                            tx.init(params), jax.random.PRNGKey(7))
        ref_losses[name] = np.asarray(losses)
        del p2, o2
    drift = float(np.max(np.abs(ref_losses["prod_perblock"]
                                - ref_losses["stack_train"])
                         / np.abs(ref_losses["prod_perblock"])))
    print(f"[part1] 10-step chained loss parity rel drift: {drift:.2e}",
          flush=True)

    reps, rounds = 3, 7
    times = {v: [] for v in fns}
    for r in range(rounds):
        for name, fn in fns.items():
            p = jax.tree_util.tree_map(jnp.copy, params)
            o = tx.init(p)
            t0 = time.perf_counter()
            last = None
            for i in range(reps):
                p, o, losses = fn(p, o, jax.random.fold_in(
                    jax.random.PRNGKey(100 + r), i))
                last = losses
            _ = float(jnp.sum(last))  # value fetch = fence (CLAUDE.md)
            dt = (time.perf_counter() - t0) / (reps * CHAIN) * 1e3
            times[name].append(dt)
    out = {}
    print(f"\n[part1] DDM-PaiNN training step, B={B} N={N}, "
          f"median ms/step (min..max) over {rounds} interleaved rounds:")
    for v, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        out[v] = {"median_ms": med, "min_ms": ts[0], "max_ms": ts[-1],
                  "mol_per_s": B / med * 1e3}
        print(f"  {v:14s} {med:7.3f}  ({ts[0]:.3f}..{ts[-1]:.3f})  "
              f"= {B / med * 1e3:.0f} mol/s", flush=True)
    speedup = out["prod_perblock"]["median_ms"] / out["stack_train"][
        "median_ms"]
    out["speedup_stack_over_prod"] = speedup
    out["loss_parity_rel_drift"] = drift
    print(f"  stack/prod speedup: {speedup:.3f}x "
          f"({'INTEGRATE (>=10%)' if speedup >= 1.10 else 'below the 10% bar'})",
          flush=True)
    return out


# ------------------------------------------------------------------ part 2
def part2():
    import jax.experimental.pallas as pl
    from geossl_tpu.models.schnet import SchNet
    from geossl_tpu.models import schnet as schnet_mod
    from geossl_tpu.ops import cfconv_pallas as cp
    from geossl_tpu.ops import geometry

    n = 128
    results = {}
    for b in (32, 128):
        rng = np.random.default_rng(1)
        z, pos, mask = make_batch(rng, b=b, n=n)
        mod = SchNet(use_pallas=True)
        params = mod.init(jax.random.PRNGKey(3), z, pos, mask)["params"]

        # N=128 stack call built directly (the production guard stops at 64)
        def stack_fwd(p, z, pos, mask):
            h0 = p["Embed_0"]["embedding"][z].astype(jnp.float32)
            dist, pm = geometry.pairwise_distances(pos, mask)
            adj = geometry.radius_adjacency(dist, pm, mod.cutoff, None)
            env = (0.5 * (jnp.cos(dist * jnp.pi / mod.cutoff) + 1.0)
                   * adj.astype(jnp.float32))
            def dw(blk, name, what):
                return blk[name]["Dense_0"][what]
            L = mod.num_interactions
            blocks = [p[f"InteractionBlock_{k}"] for k in range(L)]
            stacked = tuple(jnp.stack(x).astype(jnp.float32) for x in (
                [dw(bk, "Dense_0", "kernel") for bk in blocks],
                [bk["filter_w1"] for bk in blocks],
                [bk["filter_b1"] for bk in blocks],
                [bk["filter_w2"] for bk in blocks],
                [bk["filter_b2"] for bk in blocks],
                [dw(bk, "Dense_1", "kernel") for bk in blocks],
                [dw(bk, "Dense_1", "bias") for bk in blocks],
                [dw(bk, "Dense_2", "kernel") for bk in blocks],
                [dw(bk, "Dense_2", "bias") for bk in blocks],
            ))
            f = h0.shape[-1]
            delta = mod.cutoff / (mod.num_gaussians - 1)
            bb = cp._batch_block(b, n, n)
            kern = partial(cp._stack_kernel, start=0.0, delta=delta,
                           num_g=mod.num_gaussians, coeff=-0.5 / delta**2,
                           bb=bb, n=n, f=f, nblocks=L)
            full = lambda a: pl.BlockSpec(
                a.shape, lambda i: tuple(0 for _ in a.shape))
            from jax.experimental.pallas import tpu as pltpu
            h = pl.pallas_call(
                kern,
                grid=(b // bb,),
                in_specs=[pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0))] * 2
                + [pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0))]
                + [full(w) for w in stacked],
                out_specs=pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 2**20),
            )(dist, env, h0, *stacked)
            return h

        def full_fwd_stack(p):
            h = stack_fwd(p, z, pos, mask)
            from geossl_tpu.models.common import shifted_softplus
            h = h @ p["Dense_0"]["Dense_0"]["kernel"] + \
                p["Dense_0"]["Dense_0"]["bias"]
            h = shifted_softplus(h)
            h = h @ p["Dense_1"]["Dense_0"]["kernel"] + \
                p["Dense_1"]["Dense_0"]["bias"]
            return geometry.readout(h, mask, mod.readout)

        def full_fwd_perblock(p):
            g, _ = mod.apply({"params": p}, z, pos, mask)
            return g

        fns = {}
        try:
            f_stack = jax.jit(full_fwd_stack)
            ref = f_stack(params)
            fns["stack"] = f_stack
        except Exception as ex:
            results[f"B{b}"] = {"stack": f"FAILED {type(ex).__name__}: "
                                         f"{str(ex)[:200]}"}
            print(f"[part2] B={b} stack FAILED: {str(ex)[:200]}", flush=True)
            continue
        f_prod = jax.jit(full_fwd_perblock)
        fns["perblock"] = f_prod
        gref = f_prod(params)
        err = float(jnp.max(jnp.abs(ref - gref))
                    / (jnp.max(jnp.abs(gref)) + 1e-9))
        print(f"[part2] B={b} N={n} stack-vs-perblock rel err: {err:.2e}",
              flush=True)
        reps, rounds = 20, 5
        times = {v: [] for v in fns}
        for r in range(rounds):
            for name, fn in fns.items():
                o = fn(params)
                t0 = time.perf_counter()
                for _ in range(reps):
                    o = fn(params)
                _ = float(jnp.sum(o))
                times[name].append((time.perf_counter() - t0) / reps * 1e3)
        row = {"rel_err": err}
        for v, ts in times.items():
            ts = sorted(ts)
            row[v + "_ms"] = ts[len(ts) // 2]
        row["speedup"] = row["perblock_ms"] / row["stack_ms"]
        results[f"B{b}"] = row
        print(f"[part2] B={b}: stack {row['stack_ms']:.3f} ms vs perblock "
              f"{row['perblock_ms']:.3f} ms = {row['speedup']:.2f}x",
              flush=True)
    return results


# ------------------------------------------------------------------ part 3
def part3():
    from geossl_tpu.models.painn import PaiNN, fused_stack_apply

    n = 128
    results = {}
    for b in (128,):
        rng = np.random.default_rng(2)
        z, pos, mask = make_batch(rng, b=b, n=n)
        mod = PaiNN(use_pallas=True)
        params = mod.init(jax.random.PRNGKey(4), z, pos, mask)["params"]

        # batch passed as ARGUMENTS (CLAUDE.md benchmark pitfall #2)
        @jax.jit
        def f_stack(p, z, pos, mask):
            return fused_stack_apply(mod, p, z, pos, mask)[0]

        @jax.jit
        def f_prod(p, z, pos, mask):
            return mod.apply({"params": p}, z, pos, mask)[0]

        ref = f_stack(params, z, pos, mask)
        gref = f_prod(params, z, pos, mask)
        err = float(jnp.max(jnp.abs(ref - gref))
                    / (jnp.max(jnp.abs(gref)) + 1e-9))
        print(f"[part3] B={b} N={n} stack-vs-perblock rel err: {err:.2e}",
              flush=True)
        reps, rounds = 20, 5
        times = {"stack": [], "perblock": []}
        fns = {"stack": f_stack, "perblock": f_prod}
        for r in range(rounds):
            for name, fn in fns.items():
                o = fn(params, z, pos, mask)
                t0 = time.perf_counter()
                for _ in range(reps):
                    o = fn(params, z, pos, mask)
                _ = float(jnp.sum(o))  # value fetch = the only honest fence
                times[name].append((time.perf_counter() - t0) / reps * 1e3)
        row = {"rel_err": round(err, 6)}
        for v, ts in times.items():
            ts = sorted(ts)
            row[v + "_ms"] = round(ts[len(ts) // 2], 3)
        row["speedup"] = round(row["perblock_ms"] / row["stack_ms"], 2)
        row["note"] = ("parity at the kernel family's usual bf16 drift "
                       "(kexp9 measured 9.3e-4 at N=32)")
        results[f"B{b}"] = row
        print(f"[part3] B={b}: stack {row['stack_ms']:.3f} ms vs perblock "
              f"{row['perblock_ms']:.3f} ms = {row['speedup']:.2f}x",
              flush=True)
    return results


PARTS = {"part1": ("part1_ddm_painn_train", part1),
         "part2": ("part2_schnet_stack_n128", part2),
         "part3": ("part3_painn_stack_n128", part3)}


def main(argv=None):
    want = (argv if argv else sys.argv[1:]) or list(PARTS)
    path = "/root/repo/experiments/kexp10_results.json"
    out = {}
    try:
        with open(path) as f:
            out = json.load(f)  # merge: a partial rerun keeps other parts
    except FileNotFoundError:
        pass
    for name in want:
        key, fn = PARTS[name]
        out[key] = fn()
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
