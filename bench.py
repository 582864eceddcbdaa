"""Benchmarks for every BASELINE.md north-star config (one JSON line each).

Configs (BASELINE.md "Reference configs to drive" #1-#5):
  1. schnet_qm9_throughput      — SchNet + linear head, L1 loss, batch 128, N=32
  2. painn_qm9_throughput       — PaiNN 12-target regression, batch 128, N=32
  3. md17_force_step_time       — SchNet energy+force (grad-of-grad), batch 5,
                                  N=32 (aspirin is 21 atoms), driver policy
                                  (fused on TPU; fused/XLA neutral at B=5)
  4. lba_schnet_throughput      — SchNet regression at N=512 complexes, batch 64
  4b. lep_schnet_throughput     — dual-tower BCE at N=512 pairs, batch 16
  4c. lba_painn_throughput / lep_painn_throughput — PaiNN at the same Atom3D
      shapes (N=512 is the shape that once exposed a scoped-VMEM compile
      failure; benched so regressions there are harness-visible)
  4d. geossl_ddm_e2e_throughput — END-TO-END driver wall-clock (loader +
      native BFS masking + prefetch + train, 32/64 bucket ladder)
  4e. geossl_ddm_painn_throughput — the DDM step on the PaiNN backbone
  5. geossl_ddm_pretrain_throughput — the FLAGSHIP: full DDM step (two SchNet
     views + two NCSNv3 heads over all pairs), batch 128. Printed LAST so a
     tail-line parse still sees the headline metric.

Each line: {"metric", "value", "unit", "vs_baseline"}. vs_baseline is the
ratio to the reference's implied V100 budget (the repo publishes no timing
numbers — BASELINE.md — but every published run declares a SLURM wall
budget, and budget + protocol size => the minimum rate the V100 had to
sustain):

  DDM pretrain: 1M molecules x 100 epochs inside 23 h  => 1208 mol/s
    (scripts/pretrain_GeoSSL_DDM/submit_pretrain_GeoSSL_DDM.sh:56)
  QM9:  110k train x 1000 epochs inside 11:59:00       => 2550 mol/s
    (scripts/finetune/submit_finetune_qm9_schnet.sh:14,31; same budget
     for PaiNN, submit_finetune_qm9_painn.sh:17,32)
  MD17: 1000 train x 1000 epochs, batch 5 => 200k steps inside 3:59:00
                                                       => 71.7 ms/step
    (scripts/finetune/submit_finetune_md17_schnet.sh:16,33)
  LBA:  3507 train x 300 epochs inside 1:59:00         => 147.4 complex/s
  LEP:  304 train x 300 epochs inside 1:59:00          => 12.8 pair/s
    (scripts/finetune/submit_finetune_lba_lep_schnet.sh:13,40; split
     sizes are the published Atom3D ones — LBA identity-30 3507/466/490,
     LEP by-protein 304/110/104, Townshend et al. 2021)

These are LOWER bounds on the reference's rate (-t is a kill limit and
eval epochs share the budget), so the printed ratio is an UPPER bound on
the true speedup — stated as such in docs/PERF.md. The serve_* rows keep
vs_baseline null: the reference has no inference surface at all.

Batch data is passed as jit ARGUMENTS (closing over device arrays measures
~7x slower through the remote-compile tunnel — see CLAUDE.md).
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

BASELINE_MOLS_PER_SEC = 1208.0  # 1e6 mols * 100 epochs / 23 h (docstring)

# Implied minimum sustained rates from the reference's declared SLURM
# budgets (module docstring): {metric_prefix: (rate, unit)}. Throughput
# rows report value/rate; the ms/step row reports budget_ms/value.
IMPLIED_V100 = {
    "qm9_mol_per_sec": 110_000 * 1000 / (11 * 3600 + 59 * 60),   # 2549.8
    "md17_ms_per_step": (3 * 3600 + 59 * 60) * 1e3 / (1000 * 200),  # 71.7
    "lba_complex_per_sec": 3507 * 300 / (1 * 3600 + 59 * 60),    # 147.4
    "lep_pair_per_sec": 304 * 300 / (1 * 3600 + 59 * 60),        # 12.8
}


def _setup_cache():
    import os

    import jax

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


def _example(batch, n_max, seed=0, n_min=8, spread=0.9, targets=1,
             size_max=None):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    sizes = rng.integers(n_min, size_max or n_max, size=batch, endpoint=True)
    atom_type = np.zeros((batch, n_max), np.int32)
    positions = np.zeros((batch, n_max, 3), np.float32)
    node_mask = np.zeros((batch, n_max), bool)
    for i, n in enumerate(sizes):
        atom_type[i, :n] = rng.integers(0, 9, size=n)
        positions[i, :n] = np.cumsum(rng.normal(scale=spread, size=(n, 3)), axis=0)
        node_mask[i, :n] = True
    y = rng.normal(size=(batch, targets)).astype(np.float32)
    forces = rng.normal(scale=0.1, size=(batch, n_max, 3)).astype(np.float32)
    forces *= node_mask[..., None]
    return tuple(map(jnp.asarray, (atom_type, positions, node_mask, y, forces)))


def _time_steps(step, state, args, steps=50, windows=5, key_fn=None):
    """Median steps/sec over several windows (tunnel noise is ±10%).

    The fence is a VALUE FETCH of the final chained loss, not
    ``block_until_ready`` — on the remote-TPU tunnel platform the latter
    sometimes returns before queued computations finish (measured: 10 chained
    512-atom steps "blocked" in 20 ms vs a 4.6 s fetch), which silently turns
    the benchmark into a dispatch-rate measurement.
    """
    # warmup/compile
    if key_fn is not None:
        state, loss = step(state, *args, key_fn(0))
    else:
        state, loss = step(state, *args)
    fence = float(loss)
    assert np.isfinite(fence), f"non-finite warmup loss {fence}"
    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(steps):
            if key_fn is not None:
                state, loss = step(state, *args, key_fn(1 + w * steps + i))
            else:
                state, loss = step(state, *args)
        fence = float(loss)  # loss chains through state: fences all steps
        rates.append(steps / (time.perf_counter() - t0))
    assert np.isfinite(fence), f"non-finite final loss {fence}"
    return float(np.median(rates))



def _mfu_fields(flop_count, step_seconds, executed=None, occupancy=1.0):
    """Utilization fields for a bench line (utils/flops.py):

    * ``gflop_per_step`` / ``tflops_dense_eff`` — the DENSE model's FLOPs
      and the dense-effective rate (what a dense implementation would have
      to sustain to match this wall-clock; may exceed peak where the
      occupancy-gated / symmetric kernels skip work — that is the speedup).
    * ``occupancy`` / ``tflops`` / ``pct_*_peak`` — the EXECUTED fraction
      of the pair grid (flops.executed_pair_fraction), the hardware
      FLOP/s actually achieved, and true utilization vs v5e peaks (never
      above 100). TPU matmuls run bf16 operands at default precision
      (which is why the explicit bf16 knob measured neutral), so
      pct_bf16_peak is the operative MFU; pct_f32_peak bounds the
      hypothetical multi-pass-f32 ceiling.

    ``executed`` is the occupancy-scaled FlopCount for gated configs; None
    means the config runs dense (executed == dense, occupancy 1.0)."""
    from geossl_tpu.utils import flops as F

    ex = executed if executed is not None else flop_count
    tf_dense, _ = F.mfu(flop_count.total, step_seconds)
    tf, frac16 = F.mfu(ex.total, step_seconds)
    _, frac32 = F.mfu(ex.total, step_seconds, F.V5E_PEAK_F32)
    return {"gflop_per_step": round(flop_count.total / 1e9, 1),
            "tflops_dense_eff": round(tf_dense, 1),
            "occupancy": round(occupancy, 3),
            "tflops": round(tf, 1),
            "pct_f32_peak": round(frac32 * 100, 1),
            "pct_bf16_peak": round(frac16 * 100, 1)}


def bench_schnet_qm9(use_pallas):
    import jax
    import jax.numpy as jnp

    from geossl_tpu.models import SchNet
    from geossl_tpu.train import common, optim

    batch, n_max = 128, 32
    model = SchNet(use_pallas=use_pallas)
    z, pos, mask, y, _ = _example(batch, n_max, seed=1)
    key = jax.random.PRNGKey(0)
    bp = model.init(key, z, pos, mask)["params"]
    wh = jax.random.normal(key, (128, 1)) * 0.01
    params = {"model": bp, "head": {"w": wh, "b": jnp.zeros((1,))}}
    tx = optim.make_optimizer(5e-4, epochs=1000, steps_per_epoch=100)
    state = common.TrainState.create(params, tx)

    def loss_fn(p, z, pos, mask, y):
        g, _ = model.apply({"params": p["model"]}, z, pos, mask)
        pred = (g @ p["head"]["w"] + p["head"]["b"])[:, 0]
        return jnp.mean(jnp.abs(pred - y[:, 0]))  # mae (finetune_qm9 default)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, z, pos, mask, y):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, z, pos, mask, y)
        return common.apply_updates(state, grads, tx), loss

    sps = _time_steps(step, state, (z, pos, mask, y))
    from geossl_tpu.utils import flops as F
    mols = batch * sps
    return {"metric": "schnet_qm9_throughput", "value": round(mols, 1),
            **_mfu_fields(F.finetune_step(batch, n_max), 1 / sps),
            "unit": "mol/s/chip",
            "vs_baseline": round(mols / IMPLIED_V100["qm9_mol_per_sec"], 2)}


def bench_painn_qm9(use_pallas):
    import jax
    import jax.numpy as jnp

    from geossl_tpu.models import PaiNN
    from geossl_tpu.ops import geometry
    from geossl_tpu.train import common, optim

    batch, n_max, targets = 128, 32, 12
    model = PaiNN(use_pallas=use_pallas)
    z, pos, mask, y, _ = _example(batch, n_max, seed=2, targets=targets)
    key = jax.random.PRNGKey(0)
    dist, pm = geometry.pairwise_distances(pos, mask)
    pair_mask = geometry.radius_adjacency(dist, pm, 5.0)
    bp = model.init(key, z, pos, mask, pair_mask)["params"]
    wh = jax.random.normal(key, (128, targets)) * 0.01
    params = {"model": bp, "head": {"w": wh, "b": jnp.zeros((targets,))}}
    tx = optim.make_optimizer(5e-4, epochs=1000, steps_per_epoch=100)
    state = common.TrainState.create(params, tx)

    def loss_fn(p, z, pos, mask, pair_mask, y):
        g, _ = model.apply({"params": p["model"]}, z, pos, mask, pair_mask)
        pred = g @ p["head"]["w"] + p["head"]["b"]
        return jnp.mean(jnp.abs(pred - y))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, z, pos, mask, pair_mask, y):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, z, pos, mask, pair_mask, y)
        return common.apply_updates(state, grads, tx), loss

    sps = _time_steps(step, state, (z, pos, mask, pair_mask, y))
    from geossl_tpu.utils import flops as F
    mols = batch * sps
    return {"metric": "painn_qm9_throughput", "value": round(mols, 1),
            **_mfu_fields(F.finetune_step(batch, n_max, model="painn"), 1 / sps),
            "unit": "mol/s/chip",
            "vs_baseline": round(mols / IMPLIED_V100["qm9_mol_per_sec"], 2)}


def bench_md17_force(use_pallas=False):
    import jax
    import jax.numpy as jnp

    from geossl_tpu.models import SchNet
    from geossl_tpu.train import common, optim

    batch, n_max = 5, 32  # protocol train batch 5 (submit_finetune_md17:9-17)
    # the fused CFConv supports second-order AD, so the force path may run
    # fused — mirroring the driver's policy (auto: fused on TPU backends)
    model = SchNet(use_pallas=use_pallas)
    z, pos, mask, y, forces = _example(batch, n_max, seed=3, n_min=21)
    key = jax.random.PRNGKey(0)
    bp = model.init(key, z, pos, mask)["params"]
    params = {"model": bp,
              "head": {"w": jax.random.normal(key, (128, 1)) * 0.01,
                       "b": jnp.zeros((1,))}}
    tx = optim.make_optimizer(5e-4, epochs=1000, steps_per_epoch=200)
    state = common.TrainState.create(params, tx)

    def energy(p, z, pos, mask):
        g, _ = model.apply({"params": p["model"]}, z, pos, mask)
        return (g @ p["head"]["w"] + p["head"]["b"])[:, 0]

    def loss_fn(p, z, pos, mask, y, forces):
        e = energy(p, z, pos, mask)
        f = -jax.grad(lambda q: jnp.sum(energy(p, z, q, mask)))(pos)
        nm = mask.astype(jnp.float32)[..., None]
        e_loss = jnp.mean(jnp.abs(e - y[:, 0]))
        f_loss = jnp.sum(jnp.abs(f - forces) * nm) / jnp.maximum(3 * nm.sum(), 1.0)
        return 0.05 * e_loss + 0.95 * f_loss  # config.py:59-60

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, z, pos, mask, y, forces):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, z, pos, mask, y, forces)
        return common.apply_updates(state, grads, tx), loss

    sps = _time_steps(step, state, (z, pos, mask, y, forces))
    from geossl_tpu.utils import flops as F
    ms = 1e3 / sps
    return {"metric": "md17_force_step_time", "value": round(ms, 3),
            **_mfu_fields(F.finetune_step(batch, n_max, forces=True), 1 / sps),
            "unit": "ms/step",
            "vs_baseline": round(IMPLIED_V100["md17_ms_per_step"] / ms, 2)}


def _bench_atom3d(metric, unit, model_3d, use_pallas, batch, n_max,
                  seeds, dual):
    """Shared Atom3D bench body: SchNet/PaiNN x LBA(single-tower MSE,
    finetune_lba.py:244) / LEP(dual-tower BCE, finetune_lep.py). PaiNN gets
    its clean-geometry radius adjacency precomputed per tower (the driver
    pathway); all four configs keep their original seeds/shapes so numbers
    stay comparable across rounds."""
    import jax
    import jax.numpy as jnp
    import optax

    from geossl_tpu.models import PaiNN, SchNet
    from geossl_tpu.ops import geometry
    from geossl_tpu.train import common, optim
    from geossl_tpu.utils import flops as F

    is_painn = model_3d == "painn"
    model = (PaiNN if is_painn else SchNet)(use_pallas=use_pallas)
    emb = 128

    def tower_inputs(seed):
        # LEP structures are protocol-capped at 400 real atoms regardless of
        # the (128-divisible) pad bucket
        z, pos, mask, y, _ = _example(batch, n_max, seed=seed, n_min=250 if dual
                                      else 300, spread=2.0,
                                      size_max=400 if dual else None)
        extra = ()
        if is_painn:
            dist, pm = geometry.pairwise_distances(pos, mask)
            extra = (geometry.radius_adjacency(dist, pm, 5.0),)
        return (z, pos, mask) + extra, y

    towers = [tower_inputs(s) for s in seeds]
    key = jax.random.PRNGKey(0)
    bp = model.init(key, *towers[0][0])["params"]
    head_in = emb * (2 if dual else 1)
    params = {"model": bp,
              "head": {"w": jax.random.normal(key, (head_in, 1)) * 0.01,
                       "b": jnp.zeros((1,))}}
    tx = optim.make_optimizer(1e-4, epochs=300, steps_per_epoch=50)
    state = common.TrainState.create(params, tx)
    n_tower_args = len(towers[0][0])

    if dual:
        y = jnp.asarray((np.random.default_rng(seeds[-1] + 1).random(batch)
                         > 0.5).astype(np.float32))
        flat_args = towers[0][0] + towers[1][0] + (y,)

        def loss_fn(p, *args):
            a, i, y = (args[:n_tower_args], args[n_tower_args:-1], args[-1])
            ga, _ = model.apply({"params": p["model"]}, *a)
            gi, _ = model.apply({"params": p["model"]}, *i)
            logit = (jnp.concatenate([ga, gi], -1) @ p["head"]["w"]
                     + p["head"]["b"])[:, 0]
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logit, y))
    else:
        flat_args = towers[0][0] + (towers[0][1],)

        def loss_fn(p, *args):
            g, _ = model.apply({"params": p["model"]}, *args[:-1])
            pred = (g @ p["head"]["w"] + p["head"]["b"])[:, 0]
            return jnp.mean((pred - args[-1][:, 0]) ** 2)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, *args):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *args)
        return common.apply_updates(state, grads, tx), loss

    sps = _time_steps(step, state, flat_args, steps=10, windows=3)
    fc = F.finetune_step(batch, n_max, model=model_3d)
    # executed FLOPs: occupancy-gated tiles skip empty pair tiles and the
    # symmetric CFConv halves the band — measure the ACTUAL live-pair grid
    # of the benched batch (same gate the kernels flag from)
    cutoff = 5.0 if is_painn else 10.0  # each model's default cutoff
    occs = []
    for tower, _ in towers:
        z, pos, mask = tower[:3]
        dist, pm = geometry.pairwise_distances(pos, mask)
        env = np.asarray((dist < cutoff) & pm, np.float32)
        occs.append(F.executed_pair_fraction(env, model=model_3d))
    occ = float(np.mean(occs))
    fe = F.finetune_step(batch, n_max, model=model_3d, pair_frac=occ)
    if dual:
        fc, fe = fc.scale(2), fe.scale(2)
    implied = IMPLIED_V100["lep_pair_per_sec" if dual else
                           "lba_complex_per_sec"]
    return {"metric": metric, "value": round(batch * sps, 1),
            **_mfu_fields(fc, 1 / sps, executed=fe, occupancy=occ),
            "unit": unit, "vs_baseline": round(batch * sps / implied, 2)}


def bench_lba(use_pallas):
    # protocol batch 64; complexes capped at 500 atoms -> bucket 512
    return _bench_atom3d("lba_schnet_throughput", "complex/s/chip", "schnet",
                         use_pallas, 64, 512, (4,), dual=False)


def bench_lep(use_pallas):
    # protocol batch 16 (submit_finetune_lba_lep:28-33); towers bucketed at
    # 512 (maxnum=400; 128-divisible pad so the sparse tiles get (32,128)
    # granularity — ~40% over the round-2 448 pad) — dual tower: shared
    # backbone over active+inactive, concat -> Linear(2emb->1) -> BCE
    return _bench_atom3d("lep_schnet_throughput", "pair/s/chip", "schnet",
                         use_pallas, 16, 512, (5, 6), dual=True)


def bench_lba_painn(use_pallas):
    """PaiNN at the Atom3D LBA shape (B=64, N=512) — the shape that exposed
    the scoped-VMEM compile failure (docs/PERF.md); benched so a regression
    there is caught by the harness."""
    return _bench_atom3d("lba_painn_throughput", "complex/s/chip", "painn",
                         use_pallas, 64, 512, (8,), dual=False)


def bench_lep_painn(use_pallas):
    return _bench_atom3d("lep_painn_throughput", "pair/s/chip", "painn",
                         use_pallas, 16, 512, (9, 10), dual=True)


def bench_ddm(use_pallas, model_3d="schnet"):
    import jax
    import jax.numpy as jnp  # noqa: F401

    from geossl_tpu import objectives as obj
    from geossl_tpu.models import SchNet
    from geossl_tpu.objectives.ncsn import NCSNv3
    from geossl_tpu.ops import geometry
    from geossl_tpu.train import common, optim

    batch, n_max, emb = 128, 32, 128
    # published defaults; fused Pallas kernels on real TPU backends (11.5 ms
    # XLA vs 8.1 ms fused for SchNet after the dx-in-backward-kernel rework
    # — see docs/PERF.md). The fused NCSN head is neutral at every bucket
    # and stays off, mirroring the driver's policy.
    if model_3d == "painn":
        from geossl_tpu.models import PaiNN

        model = PaiNN(use_pallas=use_pallas)
    else:
        model = SchNet(use_pallas=use_pallas)
    head = NCSNv3(emb_dim=emb)
    z, pos, mask, _, _ = _example(batch, n_max, seed=0)
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
    def step(state, z, pos, mask, epoch_key):
        # per-step RNG derived ON DEVICE (fold_in by state.step), exactly
        # like the driver — a fresh host-built key per timed step would add
        # a ~0.3 ms host->device transfer the real training loop doesn't pay
        rng = jax.random.fold_in(epoch_key, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, z, pos, mask, rng)
        return common.apply_updates(state, grads, tx), loss

    sps = _time_steps(step, state, (z, pos, mask, jax.random.PRNGKey(1)))
    mols = batch * sps
    from geossl_tpu.utils import flops as F
    mfu = _mfu_fields(F.ddm_step(batch, n_max, model=model_3d), 1 / sps)
    name = ("geossl_ddm_pretrain_throughput" if model_3d == "schnet"
            else f"geossl_ddm_{model_3d}_throughput")
    return {"metric": name, "value": round(mols, 1), **mfu,
            "unit": "mol/s/chip",
            "vs_baseline": round(mols / BASELINE_MOLS_PER_SEC, 2)}


def bench_serve(use_pallas):
    """Inference/serving wall-clock (geossl_tpu.serve.Predictor): 16,384
    molecules (N<=32) through bucketing + native packing + batched forward +
    one gathered fetch. The production deployment path; no reference analog
    (the reference has no inference surface). Should sit at or above the
    training-step rate (forward-only)."""
    import jax
    import jax.numpy as jnp

    from geossl_tpu.config import ModelConfig
    from geossl_tpu.data.store import MolRecord, MolStore
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.finetune_qm9 import LinearHead

    cfg = ModelConfig(use_pallas=use_pallas)
    module, _ = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(0)
    params = {
        "model": common.init_backbone(module, rng, n_max=32),
        "graph_pred_linear": LinearHead().init(
            rng, jnp.zeros((2, cfg.emb_dim)))["params"],
    }
    nrng = np.random.default_rng(0)
    records = []
    for _ in range(16384):
        n = int(nrng.integers(10, 33))
        records.append(MolRecord(
            atom_type=nrng.integers(0, 9, n).astype(np.int32),
            positions=np.cumsum(
                nrng.normal(scale=0.9, size=(n, 3)), axis=0).astype(np.float32),
        ))
    store = MolStore.from_records(records)
    pred = Predictor(cfg, params, batch_size=128, bucket_sizes=(32,))
    out = pred.predict(store)  # warm: compiles + caches the bucket program
    assert np.isfinite(out).all()
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        pred.predict(store)
        rates.append(len(store) / (time.perf_counter() - t0))
    mols = float(np.median(rates))
    return {"metric": "geossl_serve_throughput", "value": round(mols, 1),
            "unit": "mol/s/chip", "vs_baseline": None}


def bench_serve_painn(use_pallas):
    """PaiNN serving at QM9 scale (16,384 molecules, N<=32) — exercises the
    whole-stack inference kernel (models/painn.fused_stack_apply, kexp9:
    1.23x over the per-block chain at this shape). Forward-only counterpart
    of ``painn_qm9_throughput``."""
    import jax
    import jax.numpy as jnp

    from geossl_tpu.config import ModelConfig
    from geossl_tpu.data.store import MolRecord, MolStore
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common

    cfg = ModelConfig(model_3d="painn", use_pallas=use_pallas)
    module, _ = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(0)
    head = common.make_head("painn", cfg.emb_dim)
    params = {
        "model": common.init_backbone(module, rng, n_max=32),
        "graph_pred_linear": head.init(
            rng, jnp.zeros((2, cfg.emb_dim)))["params"],
    }
    nrng = np.random.default_rng(0)
    records = []
    for _ in range(16384):
        n = int(nrng.integers(10, 33))
        records.append(MolRecord(
            atom_type=nrng.integers(0, 9, n).astype(np.int32),
            positions=np.cumsum(
                nrng.normal(scale=0.9, size=(n, 3)), axis=0).astype(np.float32),
        ))
    store = MolStore.from_records(records)
    pred = Predictor(cfg, params, batch_size=128, bucket_sizes=(32,))
    out = pred.predict(store)
    assert np.isfinite(out).all()
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        pred.predict(store)
        rates.append(len(store) / (time.perf_counter() - t0))
    mols = float(np.median(rates))
    return {"metric": "geossl_serve_painn_throughput", "value": round(mols, 1),
            "unit": "mol/s/chip", "vs_baseline": None}


def bench_serve_lba(use_pallas):
    """Serving at Atom3D scale: 2,048 pocket+ligand complexes (~up to 480
    atoms, bucket 512) through the same Predictor path — Morton sort +
    occupancy-gated fused kernels + one gathered fetch. The forward-only
    counterpart of ``lba_schnet_throughput``."""
    import jax
    import jax.numpy as jnp

    from geossl_tpu.config import ModelConfig
    from geossl_tpu.data.synthetic import synthetic_lba
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.finetune_qm9 import LinearHead

    cfg = ModelConfig(use_pallas=use_pallas)
    module, _ = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(0)
    params = {
        "model": common.init_backbone(module, rng, n_max=512),
        "graph_pred_linear": LinearHead().init(
            rng, jnp.zeros((2, cfg.emb_dim)))["params"],
    }
    store = synthetic_lba(2048, max_atoms=480)
    pred = Predictor(cfg, params, batch_size=64, bucket_sizes=(512,))
    out = pred.predict(store)  # warm: compiles + caches the bucket program
    assert np.isfinite(out).all()
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        pred.predict(store)
        rates.append(len(store) / (time.perf_counter() - t0))
    cps = float(np.median(rates))
    return {"metric": "geossl_serve_lba_throughput", "value": round(cps, 1),
            "unit": "complex/s/chip", "vs_baseline": None}


def bench_ddm_e2e():
    """END-TO-END DDM driver wall-clock: loader + native BFS masking (0.3) +
    prefetch + train over a synthetic corpus spanning the 32/64 buckets —
    tracks the HOST pipeline, not just the device rate (the device-rate
    flagship is ``geossl_ddm_pretrain_throughput``). Steady state = best
    epoch after the compile epoch; reference analog: the per-epoch
    wall-clock print, ``examples/pretrain_GeoSSL.py:269``."""
    import contextlib
    import io
    import re

    from geossl_tpu.train import pretrain_geossl

    corpus, epochs = 16384, 5  # epoch 1 pays compiles; min over 4 steady
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pretrain_geossl.main([
            "--synthetic", "--synthetic_size", str(corpus),
            "--synthetic_max_atoms", "50", "--bucket", "32", "64",
            "--epochs", str(epochs), "--batch_size", "128",
            "--num_devices", "1", "--GeoSSL_option", "DDM",
            "--GeoSSL_atom_masking_ratio", "0.3", "--lr", "5e-4",
        ])
    times = [float(t) for t in re.findall(r"Time: ([0-9.]+)", buf.getvalue())]
    assert len(times) == epochs, buf.getvalue()
    steady = min(times[1:])  # epoch 1 pays the per-bucket compiles
    mols = corpus / steady
    return {"metric": "geossl_ddm_e2e_throughput", "value": round(mols, 1),
            "unit": "mol/s/chip",
            "vs_baseline": round(mols / BASELINE_MOLS_PER_SEC, 2)}


def main(only=None):
    _setup_cache()
    import jax

    use_pallas = jax.default_backend() == "tpu"
    benches = [
        ("schnet_qm9", lambda: bench_schnet_qm9(use_pallas)),
        ("painn_qm9", lambda: bench_painn_qm9(use_pallas)),
        ("md17", lambda: bench_md17_force(use_pallas)),
        ("lba", lambda: bench_lba(use_pallas)),
        ("lep", lambda: bench_lep(use_pallas)),
        ("lba_painn", lambda: bench_lba_painn(use_pallas)),
        ("lep_painn", lambda: bench_lep_painn(use_pallas)),
        ("serve", lambda: bench_serve(use_pallas)),
        ("serve_painn", lambda: bench_serve_painn(use_pallas)),
        ("serve_lba", lambda: bench_serve_lba(use_pallas)),
        ("ddm_e2e", bench_ddm_e2e),
        ("ddm_painn", lambda: bench_ddm(use_pallas, "painn")),
        ("ddm", lambda: bench_ddm(use_pallas)),  # flagship last (tail-parse)
    ]
    for name, fn in benches:
        if only and name not in only:
            continue
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    import sys

    main(only=set(sys.argv[1:]) or None)
