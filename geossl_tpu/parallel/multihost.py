"""Multi-host (multi-process) data parallelism.

The reference is strictly one process / one GPU (SURVEY.md §2.8). TPU pods
are multi-HOST by construction: each host owns a slice of the chips, JAX
runs one process per host, and a jitted step over a global ``Mesh`` spans
all of them — XLA's gradient psum rides ICI across hosts with no NCCL/MPI
analog in user code. This module is the thin host-side layer that makes the
existing drivers run that way:

- :func:`initialize` — ``jax.distributed.initialize`` with the CPU-backend
  Gloo collectives wired up, so the SAME code path is testable as N local
  processes (tests/test_multihost.py runs a real 2-process DDM pretrain and
  pins it to the single-process trajectory).
- :func:`process_local_batch` — every process packs the same global batch
  (loaders are seed-deterministic, so batch ORDER and CONTENT agree across
  processes); each leaf becomes a global jax.Array whose addressable shards
  are this process's rows. Only the local rows transfer to devices. At pod
  scale the redundant host-side packing is noise next to device compute —
  and it buys exact single-process == multi-process trajectories, which is
  the property the tests pin.

Driver contract (``train/common.py::setup_platform``): pass
``--coordinator_address host:port --num_processes P --process_id i`` to any
driver; checkpoint/metric writes are process-0-only (``is_main``), loss
fetches are replicated scalars (valid on every process).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_count: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` + the CPU-collectives knob.

    Must run BEFORE first backend use (same constraint as platform forcing,
    CLAUDE.md). ``local_device_count`` caps this process's local devices
    (virtual CPU meshes in tests); on real TPU hosts leave it None — the
    runtime knows its chips.
    """
    if num_processes < 2:
        raise ValueError(f"multi-host needs num_processes >= 2, got "
                         f"{num_processes}")
    if not 0 <= process_id < num_processes:
        raise ValueError(f"process_id {process_id} out of range "
                         f"[0, {num_processes})")
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    try:
        # CPU backend: cross-process collectives need an explicit transport
        # (Gloo ships in jaxlib); TPU backends ignore this knob.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jaxlib: flag absent, TPU-only deployment
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    # Align processes BEFORE jax's own atexit shutdown barrier: drivers end
    # at skewed times (process 0 writes final checkpoints after the others
    # are already exiting), and the skew can fail the coordination
    # service's shutdown barrier, turning a clean 4-process run into a
    # fatal "Shutdown barrier has failed". atexit is LIFO, so registering
    # here (after jax.distributed registered its shutdown) makes the sync
    # run first.
    import atexit

    def _sync_before_shutdown(timeout_s: float = 60.0):
        # Bounded: a peer that dies in a way the coordination service does
        # not detect promptly leaves the collective BLOCKED (not raising), so
        # run it in a daemon thread and give up after timeout_s — exit then
        # degrades to jax's own shutdown-barrier error instead of hanging.
        import threading

        def _sync():
            try:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("geossl-exit")
            except Exception:
                pass  # peer already dead: the coordination service reports it

        t = threading.Thread(target=_sync, daemon=True)
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            print("[multihost] exit sync timed out after "
                  f"{timeout_s:.0f}s (peer unreachable?); proceeding to "
                  "shutdown", flush=True)

    atexit.register(_sync_before_shutdown)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_main() -> bool:
    """True on the process that owns host-side side effects (checkpoint and
    metric-file writes, stdout epoch lines are fine everywhere)."""
    return jax.process_index() == 0


def assert_host_agreement(name: str, value: float) -> None:
    """Fail fast when a host-side decision differs across processes.

    Resume decisions, epoch counters, and loader lengths are made from
    process-local state (e.g. ``os.path.exists`` on a checkpoint that only
    process 0 wrote); if processes disagree, the jitted steps issue
    mismatched collectives that hang or corrupt the run with no diagnostic.
    This allgathers the scalar over the existing collective transport and
    raises an actionable error instead. No-op single-process.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    vals = np.asarray(multihost_utils.process_allgather(
        np.asarray(value, np.float64)))
    if not np.all(vals == vals.flat[0]):
        raise SystemExit(
            f"multi-host desync: {name!r} differs across processes "
            f"(per-process values {[float(v) for v in vals.flat]}). "
            "Typical cause: --resume with --output_model_dir on a "
            "non-shared filesystem — only process 0 has state.ckpt. "
            "Put the output dir on storage every process can read, or "
            "drop --resume.")


def process_local_batch(sharding, x: Any):
    """Host array (FULL global batch, identical on every process) -> global
    jax.Array under ``sharding``. Each process transfers only the rows its
    devices own (jax.make_array_from_process_local_data slices them out)."""
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(sharding, x, x.shape)
