"""Environment health check: ``python -m geossl_tpu doctor``.

Diagnoses the things that actually go wrong in a geossl_tpu deployment
before a multi-hour pretrain is launched against them:

- backend platform + device inventory (axon TPU tunnels show ONE chip),
- compilation-cache configuration (a cold cache costs 30-300 s per new
  program through a remote-compile tunnel),
- device dispatch latency and tunnel health, fenced by a VALUE FETCH —
  ``block_until_ready()`` is not a reliable fence on tunneled backends
  (docs/PERF.md "benchmark pitfalls"), and this check measures the
  discrepancy explicitly so a silently-broken fence is visible,
- the native host runtime (``libgeossl_native.so`` build + load),
- a fused-vs-XLA Pallas kernel equality smoke at a tiny shape,
- (optionally, ``--mesh N``) a fresh-process N-device virtual-mesh SPMD
  compile, the same self-provisioning path ``--num_devices`` uses.

The reference has no equivalent (its failure mode — a wrong conda env —
fails at import time); a remote-TPU framework needs an explicit probe.
Exit code: 0 all checks pass, 1 otherwise. ``[warn]`` does not fail.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _p(status: str, name: str, detail: str = "") -> None:
    print(f"[{status}] {name}" + (f": {detail}" if detail else ""), flush=True)


def check_backend(results: dict) -> bool:
    import jax

    try:
        devs = jax.devices()
    except Exception as e:  # no backend at all
        _p("fail", "backend", f"jax.devices() raised: {e}")
        results["backend"] = {"ok": False, "error": str(e)}
        return False
    plat = devs[0].platform if devs else "none"
    _p("ok", "backend", f"platform={plat} devices={len(devs)} "
       f"({', '.join(d.device_kind for d in devs[:4])})")
    results["backend"] = {"ok": True, "platform": plat, "n_devices": len(devs)}
    return True


def check_cache(results: dict) -> bool:
    import jax

    cache = jax.config.jax_compilation_cache_dir
    if not cache:
        _p("warn", "compile cache", "jax_compilation_cache_dir unset — every "
           "new program recompiles (30-300 s each through a remote tunnel); "
           "set JAX_COMPILATION_CACHE_DIR or jax.config.update(...)")
        results["cache"] = {"ok": True, "configured": False}
        return True
    try:
        os.makedirs(cache, exist_ok=True)
        probe = os.path.join(cache, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
    except OSError as e:
        _p("fail", "compile cache", f"{cache} not writable: {e}")
        results["cache"] = {"ok": False, "dir": cache}
        return False
    n = len(os.listdir(cache))
    _p("ok", "compile cache", f"{cache} writable, {n} cached programs")
    results["cache"] = {"ok": True, "configured": True, "dir": cache,
                        "entries": n}
    return True


def check_dispatch(results: dict, budget_s: float) -> bool:
    """Compile + dispatch latency, value-fetch fenced; fence-health check."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256), jnp.float32)
    t0 = time.time()
    try:
        first = float(f(x))  # compile + first execute + fetch
    except Exception as e:
        _p("fail", "dispatch", f"first call raised: {e}")
        results["dispatch"] = {"ok": False, "error": str(e)}
        return False
    t_compile = time.time() - t0
    if t_compile > budget_s:
        _p("warn", "dispatch", f"first call took {t_compile:.1f}s "
           "(cold cache or congested tunnel)")

    # steady-state dispatch latency, value-fetch fenced
    n = 10
    t0 = time.time()
    for _ in range(n):
        out = f(x)
    fetched = float(out)  # fence
    per_fetched = (time.time() - t0) / n

    # the same chain "fenced" by block_until_ready — on healthy local
    # backends these agree; on a tunnel that acks before executing,
    # block_until_ready reads much faster than the true rate
    t0 = time.time()
    for _ in range(n):
        out = f(x)
    out.block_until_ready()
    per_blocked = (time.time() - t0) / n

    ratio = per_fetched / max(per_blocked, 1e-9)
    detail = (f"first={t_compile:.2f}s steady={per_fetched * 1e3:.1f}ms/call "
              f"(block_until_ready reads {per_blocked * 1e3:.1f}ms)")
    if ratio > 3.0:
        _p("warn", "dispatch", detail + " — block_until_ready is NOT a "
           "reliable fence here; benchmark with value fetches")
    else:
        _p("ok", "dispatch", detail)
    results["dispatch"] = {
        "ok": True, "first_s": round(t_compile, 2),
        "steady_ms": round(per_fetched * 1e3, 2),
        "blocked_ms": round(per_blocked * 1e3, 2),
        "fence_reliable": ratio <= 3.0, "value": fetched,
    }
    return True


def check_native(results: dict) -> bool:
    from geossl_tpu import native

    if not native.packing.available():
        _p("warn", "native runtime", "libgeossl_native.so unavailable and "
           "rebuild failed — NumPy fallbacks in use (correct, slower host "
           "pipeline); g++ required to rebuild")
        results["native"] = {"ok": True, "available": False}
        return True
    import numpy as np

    pos = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float64)
    edges = native.packing.radius_edges(pos, 3.0)
    _p("ok", "native runtime",
       f"loaded; radius_edges smoke -> {len(edges)} edges")
    results["native"] = {"ok": True, "available": True}
    return True


def check_kernels(results: dict) -> bool:
    """Fused Pallas CFConv == XLA reference at a tiny shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geossl_tpu.ops.cfconv_pallas import cfconv_fused, cfconv_fused_reference
    from geossl_tpu.ops.pallas_utils import interpret as pallas_interpret

    plat = jax.devices()[0].platform
    B, N, G, F1, F = 2, 32, 51, 64, 128
    start, stop = 0.0, 10.0
    rng = np.random.default_rng(1)
    pos = np.cumsum(rng.normal(scale=0.9, size=(B, N, 3)), axis=1)
    dist = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
    adj = (dist < stop) & ~np.eye(N, dtype=bool)
    env = 0.5 * (np.cos(dist * np.pi / stop) + 1.0) * adj
    x = rng.normal(size=(B, N, F)) * 0.5
    w1, b1 = rng.normal(size=(G, F1)) * 0.2, np.zeros(F1)
    w2, b2 = rng.normal(size=(F1, F)) * 0.2, np.zeros(F)
    args = tuple(jnp.asarray(a, jnp.float32)
                 for a in (dist, env, x, w1, b1, w2, b2))
    try:
        fused = cfconv_fused(*args, start, stop, G)
        ref = cfconv_fused_reference(*args, start, stop, G)
        err = float(jnp.max(jnp.abs(fused - ref)))
    except Exception as e:
        _p("fail", "pallas kernels", f"CFConv smoke raised: {e}")
        results["kernels"] = {"ok": False, "error": str(e)}
        return False
    tol = 5e-3  # bf16-operand MXU drift headroom on TPU; exact elsewhere
    ok = err < tol
    mode = "interpret" if pallas_interpret() else "compiled"
    _p("ok" if ok else "fail", "pallas kernels",
       f"fused CFConv vs XLA max|Δ|={err:.2e} ({mode})")
    results["kernels"] = {"ok": ok, "max_abs_err": err, "mode": mode}
    return ok


def check_mesh(results: dict, n: int) -> bool:
    """Fresh-process N-device virtual-mesh SPMD compile (CPU devices)."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "from jax.sharding import Mesh, NamedSharding, PartitionSpec as P\n"
        "import numpy as np\n"
        f"mesh = Mesh(np.array(jax.devices()[:{n}]), ('data',))\n"
        "s = NamedSharding(mesh, P('data'))\n"
        f"x = jax.device_put(jnp.ones(({n} * 4, 8)), s)\n"
        "y = jax.jit(lambda v: (v * 2).sum())(x)\n"
        "print(float(y))\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n}")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, env=env)
    if r.returncode != 0:
        _p("fail", f"virtual mesh ({n})", r.stderr.strip().splitlines()[-1]
           if r.stderr.strip() else "subprocess failed")
        results["mesh"] = {"ok": False, "n": n}
        return False
    _p("ok", f"virtual mesh ({n})",
       f"SPMD compile+run OK (sum={r.stdout.strip()})")
    results["mesh"] = {"ok": True, "n": n}
    return True


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m geossl_tpu doctor", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--platform", default=None,
                   help="force a backend (e.g. cpu) before first use")
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="also verify an N-device virtual-mesh SPMD compile "
                        "in a fresh process (0 = skip)")
    p.add_argument("--first_call_budget", type=float, default=60.0,
                   help="seconds before the first jitted call is flagged "
                        "slow (default 60)")
    p.add_argument("--json", action="store_true",
                   help="print a machine-readable JSON summary line last")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if not jax.config.jax_compilation_cache_dir:
        # configure before triggering any compile so the probe benefits too
        default = os.path.join(os.path.expanduser("~"), ".jax_cache")
        if os.path.isdir(default):
            jax.config.update("jax_compilation_cache_dir", default)

    results: dict = {}
    ok = check_backend(results)
    if ok:
        ok &= check_cache(results)
        ok &= check_dispatch(results, args.first_call_budget)
        ok &= check_kernels(results)
    ok &= check_native(results)
    if args.mesh:
        ok &= check_mesh(results, args.mesh)
    print("doctor:", "all checks passed" if ok else "FAILURES above",
          flush=True)
    if args.json:
        print(json.dumps({"ok": bool(ok), **results}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
