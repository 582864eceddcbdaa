"""Kernel experiment 4: batch-blocked PaiNN message kernels (bb graphs per
program, cfconv-style) vs the round-2 per-graph grids, interleaved +
value-fenced, on a 3-layer chained value_and_grad at the DDM flagship shape.
Old kernels imported from the pre-change snapshot (/tmp/painn_old.py)."""
import importlib.util
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

spec = importlib.util.spec_from_file_location("painn_old", "/tmp/painn_old.py")
painn_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(painn_old)
from geossl_tpu.ops import painn_pallas as painn_new

B, N, F, R, L = 128, 32, 128, 20, 3
CUTOFF = 5.0


def chain(op):
    def loss(x, mu, wk, bk, dist, gate, dx, dy, dz):
        acc = 0.0
        for _ in range(L):
            dq, dmu = op(dist, gate, dx, dy, dz, x, mu, wk, bk, CUTOFF)
            x = x + 0.1 * jnp.concatenate([dq, dq, dq], axis=-1)
            mu = mu + 0.1 * dmu
            acc = acc + jnp.sum(dq) + jnp.sum(dmu)
        return acc

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))


def main():
    rng = np.random.default_rng(0)
    dist = jnp.asarray(np.abs(rng.normal(size=(B, N, N))).astype(np.float32) * 2)
    gate = jnp.asarray(rng.random((B, N, N)).astype(np.float32))
    dirs = [jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
            for _ in range(3)]
    x = jnp.asarray(rng.normal(size=(B, N, 3 * F)).astype(np.float32) * 0.1)
    mu = jnp.asarray(rng.normal(size=(B, N, 3 * F)).astype(np.float32) * 0.1)
    wk = jnp.asarray(rng.normal(size=(R, 3 * F)).astype(np.float32) * 0.1)
    bk = jnp.zeros((3 * F,), jnp.float32)
    args = (x, mu, wk, bk, dist, gate, *dirs)

    f_old = chain(painn_old.painn_message_fused)
    f_new = chain(painn_new.painn_message_fused)
    v_old, g_old = f_old(*args)
    v_new, g_new = f_new(*args)
    print(f"loss rel err old-vs-new: "
          f"{abs(float(v_old - v_new)) / abs(float(v_old)):.2e}", flush=True)
    for a, b in zip(jax.tree_util.tree_leaves(g_old),
                    jax.tree_util.tree_leaves(g_new)):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        assert rel < 1e-5, rel
    print("grads identical (<1e-5)", flush=True)

    fns = {"old_pergraph": f_old, "new_blocked": f_new}
    reps, rounds = 30, 5
    times = {k: [] for k in fns}
    for r in range(rounds):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            xx = x
            v = None
            for _ in range(reps):
                v, gs = fn(xx, mu, wk, bk, dist, gate, *dirs)
                xx = xx + 1e-6 * gs[0]
            _ = float(v)
            times[name].append((time.perf_counter() - t0) / reps * 1e3)
    print(f"\nvariant: median ms per {L}-layer value_and_grad (min..max)")
    for k, ts in times.items():
        ts = sorted(ts)
        print(f"  {k:14s} {ts[len(ts)//2]:7.3f}  ({ts[0]:.3f}..{ts[-1]:.3f})")


if __name__ == "__main__":
    main()
