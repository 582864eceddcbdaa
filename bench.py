"""Benchmark: GeoSSL-DDM pretraining step throughput (the flagship workload).

Measures molecules/second for the full DDM training step — SchNet backbone
forward on both views, two NCSN_version_03 heads over all atom pairs,
backward, Adam update — at the published configuration (emb 128, 6 interaction
blocks, 51 gaussians, cutoff 10, batch 128, σ-ladder 50 levels; SURVEY.md §6)
on synthetic Molecule3D-like data (N ≤ 32 atoms).

Baseline: the reference pretrains the 1M-molecule corpus for 100 epochs
inside a 23 h SLURM limit on one V100 (``submit_pretrain_GeoSSL_DDM.sh``),
i.e. ≳1208 mol/s if it exactly fills the budget — used as the PyG
GPU-baseline estimate because the repo publishes no throughput numbers
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

BASELINE_MOLS_PER_SEC = 1208.0  # 1e6 mols * 100 epochs / 23h — see docstring


def main():
    import os

    import jax
    import jax.numpy as jnp

    # first TPU compiles can cost minutes on remote-compile setups
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "jax"),
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from geossl_tpu import objectives as obj
    from geossl_tpu.models import SchNet
    from geossl_tpu.objectives.ncsn import NCSNv3
    from geossl_tpu.ops import geometry
    from geossl_tpu.train import common, optim

    batch, n_max, emb = 128, 32, 128
    # published defaults; fused Pallas CFConv on real TPU backends. The
    # fused NCSN head exists (ops/ncsn_pallas.py) but measures neutral at
    # N=32 — the factored XLA head is already cheap there — so it stays off.
    model = SchNet(use_pallas=jax.default_backend() == "tpu")
    head = NCSNv3(emb_dim=emb)

    rng = np.random.default_rng(0)
    sizes = rng.integers(8, n_max, size=batch)
    atom_type = np.zeros((batch, n_max), np.int32)
    positions = np.zeros((batch, n_max, 3), np.float32)
    node_mask = np.zeros((batch, n_max), bool)
    for i, n in enumerate(sizes):
        atom_type[i, :n] = rng.integers(0, 9, size=n)
        positions[i, :n] = np.cumsum(rng.normal(scale=0.9, size=(n, 3)), axis=0)
        node_mask[i, :n] = True
    z, pos, mask = map(jnp.asarray, (atom_type, positions, node_mask))

    key = jax.random.PRNGKey(0)
    bp = model.init(key, z, pos, mask)["params"]
    _, node = model.apply({"params": bp}, z, pos, mask)
    dist, _ = geometry.pairwise_distances(pos, mask)
    sel = obj.pair_selection(mask, "combination")
    hp1 = head.init(key, key, node, dist, sel)["params"]
    hp2 = head.init(jax.random.fold_in(key, 1), key, node, dist, sel)["params"]
    params = {"model": bp, "NCSN_01": hp1, "NCSN_02": hp2}

    tx = optim.make_optimizer(5e-4, epochs=100, steps_per_epoch=100)
    state = common.TrainState.create(params, tx)

    def loss_fn(params, z, pos, mask, key):
        k_view, k1, k2 = jax.random.split(key, 3)
        pos2 = obj.perturb_positions(k_view, pos, 0.0, 0.3)
        _, h1 = model.apply({"params": params["model"]}, z, pos, mask)
        _, h2 = model.apply({"params": params["model"]}, z, pos2, mask)
        d1, _ = geometry.pairwise_distances(pos, mask)
        d2, _ = geometry.pairwise_distances(pos2, mask)
        sel = obj.pair_selection(mask, "combination")
        l1 = head.apply({"params": params["NCSN_01"]}, k1, h1, d2, sel)
        l2 = head.apply({"params": params["NCSN_02"]}, k2, h2, d1, sel)
        return (l1 + l2) / 2

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, z, pos, mask, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, z, pos, mask, key)
        return common.apply_updates(state, grads, tx), loss

    # warmup / compile
    state, loss = train_step(state, z, pos, mask, jax.random.PRNGKey(1))
    loss.block_until_ready()

    # median of several windows — the remote-TPU tunnel adds ±10% run noise
    steps, windows = 50, 5
    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(steps):
            state, loss = train_step(
                state, z, pos, mask, jax.random.PRNGKey(2 + w * steps + i)
            )
        loss.block_until_ready()
        rates.append(batch * steps / (time.perf_counter() - t0))

    mols_per_sec = float(np.median(rates))
    print(
        json.dumps(
            {
                "metric": "geossl_ddm_pretrain_throughput",
                "value": round(mols_per_sec, 1),
                "unit": "mol/s/chip",
                "vs_baseline": round(mols_per_sec / BASELINE_MOLS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
