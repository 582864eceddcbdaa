"""Profile and close (or pin) the 1M-scale end-to-end gap (VERDICT r4 #4).

Round 4's rehearsal sustained 4,991 mol/s at 1M scale against a ~6.5-7k
blended device ceiling and waved the residual at "host pipeline". This
measures the pipeline stage by stage on the same 1M cache:

  A. host-only loader rate (BFS masking + native pack, no device work)
  B. device-only step rate per bucket (fixed batch, chained steps,
     value-fetch fenced) -> blended ceiling for the corpus bucket mix
  C. one real epoch through the driver, --steps_per_call 1 vs 8 — the
     rehearsal ran k=1, paying the ~8-10 ms tunnel dispatch per step
     (7.8k steps/epoch ≈ 60-80 s of the 200 s epoch)

and records the attribution + the improved rehearsal number.

Run (quiet machine, TPU): python experiments/profile_1m.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/root/corpora/m3d_1m")
    ap.add_argument("--size", type=int, default=999000)
    ap.add_argument("--host_limit", type=int, default=200_000,
                    help="molecules for the host-only stage")
    ap.add_argument("--skip_driver", action="store_true")
    ap.add_argument("--results_out",
                    default="/root/repo/experiments/profile_1m_results.json")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from geossl_tpu.data.bucketing import BucketedLoader
    from geossl_tpu.data.masking import make_bfs_transform
    from geossl_tpu.data.molecule3d import load_molecule3d

    res = {}

    def dump():  # partial results survive a crash in a later stage
        with open(args.results_out, "w") as f:
            json.dump(res, f, indent=1)

    t0 = time.time()
    store = load_molecule3d(args.root, subset=args.size)
    res["store_load_s"] = round(time.time() - t0, 1)

    # ---- A: host-only loader rate ------------------------------------
    for label, transform in (("nomask", None),
                             ("bfs03", make_bfs_transform(0.3))):
        loader = BucketedLoader(store, 128, (32, 64), shuffle=True, seed=1,
                                transform=transform)
        t0 = time.time()
        mols = bucket_counts = 0
        counts = {}
        for b in loader.epoch(0):
            n = b.atom_type.shape[1]
            counts[n] = counts.get(n, 0) + 1
            mols += b.atom_type.shape[0]
            if mols >= args.host_limit:
                break
        dt = time.time() - t0
        res[f"host_only_{label}_mol_per_s"] = round(mols / dt, 1)
        if label == "bfs03":
            res["bucket_batches_sampled"] = counts
        print(f"[A] host-only {label}: {mols / dt:.0f} mol/s", flush=True)
        dump()

    # ---- B: device-only step rate per bucket -------------------------
    # the DDM train step from the driver, on ONE resident batch per bucket,
    # chained 10 steps per dispatch, fenced by a value fetch
    from functools import partial

    import optax

    from geossl_tpu.models.schnet import SchNet
    from geossl_tpu.objectives.ncsn import NCSNv3
    from geossl_tpu.objectives.pairs import pair_selection
    from geossl_tpu.ops import geometry

    mod = SchNet(use_pallas=True)
    ncsn = NCSNv3(emb_dim=128)
    tx = optax.adam(5e-4)
    rates = {}
    loader = BucketedLoader(store, 128, (32, 64), shuffle=True, seed=1,
                            transform=make_bfs_transform(0.3))
    per_bucket_batch = {}
    for b in loader.epoch(0):
        n = b.atom_type.shape[1]
        if n not in per_bucket_batch:
            per_bucket_batch[n] = b
        if len(per_bucket_batch) == 2:
            break
    for n, b in sorted(per_bucket_batch.items()):
        z = jnp.asarray(b.atom_type)
        pos = jnp.asarray(b.positions)
        mask = jnp.asarray(b.node_mask)
        gmask = jnp.asarray(b.graph_mask)
        key = jax.random.PRNGKey(0)
        params = {"model": mod.init(key, z, pos, mask)["params"]}
        h0 = jnp.zeros((2, n, 128))
        d0 = jnp.zeros((2, n, n))
        s0 = jnp.ones((2, n, n), bool)
        k1, k2 = jax.random.split(key)
        params["NCSN_01"] = ncsn.init(k1, k1, h0, d0, s0)["params"]
        params["NCSN_02"] = ncsn.init(k2, k2, h0, d0, s0)["params"]

        # batch tensors passed as jit ARGUMENTS, not closed-over constants
        # (CLAUDE.md benchmark pitfall #2 — constants measure slower on this
        # tunnel; the first recording of this stage closed over them, so its
        # per-bucket rates understated the ceiling)
        def loss_fn(p, rngs, z, pos, mask, gmask):
            kv, kn1, kn2 = rngs
            pos2 = pos + 0.3 * jax.random.normal(kv, pos.shape)
            _, h1 = mod.apply({"params": p["model"]}, z, pos, mask)
            _, h2 = mod.apply({"params": p["model"]}, z, pos2, mask)
            sel = pair_selection(mask, "combination", 1.0)
            d1, _ = geometry.pairwise_distances(pos, mask)
            d2, _ = geometry.pairwise_distances(pos2, mask)
            l1 = ncsn.apply({"params": p["NCSN_01"]}, kn1, h1, d2, sel, gmask)
            l2 = ncsn.apply({"params": p["NCSN_02"]}, kn2, h2, d1, sel, gmask)
            return (l1 + l2) / 2

        CHAIN = 10

        @partial(jax.jit, donate_argnums=(0, 1))
        def chain(p, opt_state, ekey, z, pos, mask, gmask):
            def body(carry, i):
                p, o = carry
                rngs = tuple(jax.random.split(jax.random.fold_in(ekey, i), 3))
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, rngs, z, pos, mask, gmask)
                up, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, up), o), loss
            (p, o), losses = jax.lax.scan(body, (p, opt_state),
                                          jnp.arange(CHAIN))
            return p, o, losses

        o = tx.init(params)
        p = params
        p, o, losses = chain(p, o, jax.random.PRNGKey(1),
                             z, pos, mask, gmask)  # compile
        _ = float(jnp.sum(losses))
        best = []
        for r in range(3):
            t0 = time.time()
            for i in range(3):
                p, o, losses = chain(p, o, jax.random.PRNGKey(2 + r),
                                     z, pos, mask, gmask)
            _ = float(jnp.sum(losses))
            best.append((time.time() - t0) / (3 * CHAIN))
        step_s = min(best)
        rates[n] = 128 / step_s
        print(f"[B] bucket {n}: {rates[n]:.0f} mol/s device "
              f"({step_s * 1e3:.2f} ms/step)", flush=True)
    res["device_mol_per_s_by_bucket"] = {str(k): round(v, 1)
                                         for k, v in rates.items()}
    # blended ceiling over the sampled bucket mix
    counts = res["bucket_batches_sampled"]
    tot_b = sum(counts.values())
    # time for bucket k = counts[k] batches * (128 / rates[k]) seconds;
    # blended mol/s = (tot_b * 128) / total_time = tot_b / sum(counts/rates)
    blended = tot_b / sum(counts[k] / rates[int(k)] for k in counts)
    res["device_blended_mol_per_s"] = round(blended, 1)
    print(f"[B] blended device ceiling: {blended:.0f} mol/s", flush=True)
    dump()

    # ---- C: real epochs, k=1 vs k=8 ----------------------------------
    if not args.skip_driver:
        for k in (1, 8):
            out_dir = f"/root/corpora/profile_1m_k{k}"
            log = os.path.join(out_dir, "epoch.jsonl")
            cmd = [sys.executable, "-m", "geossl_tpu.train.pretrain_geossl",
                   "--data_root", args.root,
                   "--dataset", f"Molecule3D_{args.size}",
                   "--GeoSSL_option", "DDM",
                   "--GeoSSL_atom_masking_ratio", "0.3",
                   "--batch_size", "128", "--lr", "5e-4",
                   "--num_devices", "1", "--epochs", "2", "--seed", "42",
                   "--steps_per_call", str(k),
                   "--output_model_dir", out_dir, "--log_file", log]
            t0 = time.time()
            subprocess.run(cmd, cwd="/root/repo", check=True)
            res[f"driver_k{k}_wall_s"] = round(time.time() - t0, 1)
            with open(log) as f:
                epochs = [d for d in map(json.loads, f) if "epoch" in d]
            steady = [d["time_s"] for d in epochs if d["epoch"] > 1]
            res[f"driver_k{k}_steady_epoch_s"] = steady[-1]
            res[f"driver_k{k}_mol_per_s"] = round(args.size / steady[-1], 1)
            print(f"[C] k={k}: steady epoch {steady[-1]:.1f}s = "
                  f"{args.size / steady[-1]:.0f} mol/s", flush=True)
            dump()

    with open(args.results_out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    return res


if __name__ == "__main__":
    main()
