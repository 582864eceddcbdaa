import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.parallel import mesh as pmesh


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoint():
    """The driver-facing multi-chip dry run must compile and execute."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions():
    """From a bare process (no conftest device forcing), the dryrun must
    provision its own 8-device virtual CPU mesh — this is exactly how the
    driver invokes it (VERDICT.md round 1, missing #1)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "DDM train step OK" in proc.stdout


def test_entry_compiles():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 128)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_data_parallel_matches_single_device():
    """Same batch, 1-device vs 8-device mesh -> identical loss and grads."""
    from geossl_tpu.models import SchNet
    from geossl_tpu.train import common, optim

    model = SchNet(hidden_channels=16, num_filters=16, num_interactions=2,
                   num_gaussians=9, cutoff=6.0)
    rng = np.random.default_rng(0)
    b, n = 16, 8
    z = jnp.asarray(rng.integers(0, 9, size=(b, n)), jnp.int32)
    pos = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    y = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), z, pos, mask)["params"]

    def loss_fn(params, z, pos, mask, y):
        out, _ = model.apply({"params": params}, z, pos, mask)
        return jnp.mean((out.mean(axis=-1) - y) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    losses, grads = [], []
    for ndev in (1, 8):
        mesh = pmesh.make_mesh(ndev)
        zp, pp, mp, yp = (pmesh.shard_batch(mesh, x) for x in (z, pos, mask, y))
        prep = pmesh.put_replicated(mesh, params)
        l, g = grad_fn(prep, zp, pp, mp, yp)
        losses.append(float(l))
        grads.append(jax.device_get(g))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(grads[0]),
                     jax.tree_util.tree_leaves(grads[1])):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-6)


def test_prefetch_propagates_producer_errors():
    mesh = pmesh.make_mesh(1)

    def gen():
        yield {"x": np.ones((4, 2), np.float32)}
        raise RuntimeError("boom in producer")

    it = pmesh.prefetch(gen(), mesh)
    first = next(it)
    assert np.asarray(first["x"]).shape == (4, 2)
    with pytest.raises(RuntimeError, match="boom in producer"):
        next(it)


def test_prefetch_yields_all_batches_in_order():
    mesh = pmesh.make_mesh(2)
    batches = [{"x": np.full((4, 2), i, np.float32)} for i in range(7)]
    out = list(pmesh.prefetch(iter(batches), mesh, size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert float(np.asarray(b["x"])[0, 0]) == i


def test_prefetch_producer_stops_when_consumer_abandons():
    import threading
    import time as _time

    mesh = pmesh.make_mesh(1)
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2, 2), i, np.float32)}

    it = pmesh.prefetch(gen(), mesh, size=2)
    next(it)
    before = threading.active_count()
    it.close()  # abandon the generator -> finally sets the stop flag
    _time.sleep(0.5)
    assert threading.active_count() <= before  # producer thread exited
    assert len(produced) < 100  # it did not drain the whole iterator


# ----------------------------------------- multi-device trajectory equality


def _run_ddm(tmp_path, tag, ndev, epochs, resume=False, seed=7):
    """Drive the real pretrain_geossl DDM driver (mixed 32/64 buckets,
    BFS masking on) and return the final backbone params."""
    import contextlib
    import io

    from geossl_tpu.train import checkpoints, pretrain_geossl

    out = str(tmp_path / tag)
    argv = [
        "--synthetic", "--synthetic_size", "64", "--synthetic_max_atoms", "40",
        "--bucket", "32", "64", "--batch_size", "16", "--epochs", str(epochs),
        "--num_devices", str(ndev), "--GeoSSL_option", "DDM",
        "--GeoSSL_atom_masking_ratio", "0.3", "--lr", "5e-4",
        "--seed", str(seed), "--emb_dim", "16", "--num_filters", "16",
        "--num_interactions", "2", "--num_gaussians", "9",
        "--SM_num_noise_level", "5", "--output_model_dir", out,
    ]
    if resume:
        argv.append("--resume")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pretrain_geossl.main(argv)
    ckpt = checkpoints.load_checkpoint(out + "/model_final.ckpt")
    return ckpt["model"], buf.getvalue()


def test_ddm_trajectory_matches_across_mesh_sizes(tmp_path):
    """A 3-epoch DDM trajectory (mixed buckets, BFS masking, resumable
    driver loop) must match the single-device trajectory across mesh sizes
    {1, 2, 4, 8} — the global batch is identical, only its sharding differs,
    so divergence is bounded by reduction-order float drift."""
    import jax

    ref, ref_log = _run_ddm(tmp_path, "dev1", 1, 3)
    for ndev in (2, 4, 8):
        got, log = _run_ddm(tmp_path, f"dev{ndev}", ndev, 3)
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(
                a, b, rtol=2e-3, atol=1e-6,
                err_msg=f"params diverge at mesh size {ndev}")


def test_ddm_resume_reproduces_straight_run(tmp_path, monkeypatch):
    """Interrupt-and-resume under a 4-device mesh must reproduce the
    uninterrupted trajectory EXACTLY: the loader is deterministic per
    (seed, epoch), the step RNG is fold_in(epoch_key, state.step), and the
    full optimizer state (including the cosine-schedule step count) round-
    trips through state.ckpt. The interruption is a real mid-run crash —
    same --epochs as the straight run (launching the first leg with fewer
    epochs would silently change the LR schedule), killed right after the
    epoch-2 state checkpoint lands."""
    import jax

    from geossl_tpu.train import checkpoints

    straight, _ = _run_ddm(tmp_path, "straight", 4, 3)

    real_save = checkpoints.save_train_state

    def crash_after_epoch_2(path, state, epoch, best, extra=None):
        real_save(path, state, epoch, best, extra)
        if epoch == 2:
            raise KeyboardInterrupt("simulated interruption")

    monkeypatch.setattr(checkpoints, "save_train_state", crash_after_epoch_2)
    with pytest.raises(KeyboardInterrupt):
        _run_ddm(tmp_path, "resumed", 4, 3)
    monkeypatch.setattr(checkpoints, "save_train_state", real_save)

    resumed, log = _run_ddm(tmp_path, "resumed", 4, 3, resume=True)
    assert "Resumed from" in log
    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(a, b)


def test_make_mesh_rejects_out_of_range_num_devices():
    """Single-process make_mesh must error on num_devices the host cannot
    satisfy — devices[:n] silently truncating to fewer chips is a silent
    loss of the requested parallelism."""
    with pytest.raises(ValueError, match="out of range"):
        pmesh.make_mesh(num_devices=99)
    with pytest.raises(ValueError, match="out of range"):
        pmesh.make_mesh(num_devices=0)
    assert pmesh.make_mesh(num_devices=2).size == 2
