"""SPMD data parallelism over a device mesh.

The reference has no distributed layer at all (SURVEY.md §2.8) — one GPU, one
process. Here every training step is jitted over a 1-D ``data`` mesh:
parameters/optimizer state replicated, batch sharded along its leading axis,
XLA inserts the gradient all-reduce (psum over ICI). Models are 1-5M params,
so parameter sharding would be pure overhead; the batch axis is where the
FLOPs scale.

The same code path runs single-device (mesh of 1) and on a virtual CPU mesh
for testing (``XLA_FLAGS=--xla_force_host_platform_device_count=8``).

Extension point (SURVEY.md §5.7): should graphs ever outgrow one chip
(beyond the ≤512-atom Atom3D caps), the dense ``[B, N, N]`` pair grid can be
sharded blockwise over a second mesh axis the way ring attention splits
(i, j) blocks — each chip holds an i-stripe of the pair matrix and j-tiles
rotate via ``ppermute``. Not needed for any reference workload.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()  # GLOBAL devices: spans hosts under
        # jax.distributed (parallel/multihost.py)
    if num_devices is not None:
        if jax.process_count() > 1 and num_devices != len(devices):
            raise ValueError(
                f"--num_devices {num_devices} != the {len(devices)} global "
                "devices: a multi-process mesh must include every process's "
                "chips (a prefix slice would leave some processes without "
                "addressable shards)")
        if not 1 <= num_devices <= len(devices):
            raise ValueError(
                f"--num_devices {num_devices} out of range: this process "
                f"sees {len(devices)} device(s)")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for every array leaf in a batch pytree."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put a host batch with its leading axis split over the mesh.
    Requires batch_size % mesh.size == 0 (loaders pad partial batches).

    Multi-process (jax.distributed up): every process holds the same full
    host batch (seed-deterministic loaders); each transfers only its own
    rows (parallel/multihost.py)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        from geossl_tpu.parallel import multihost

        def put(x):
            if x is None:
                return None
            return multihost.process_local_batch(sh, x)
    else:
        def put(x):
            if x is None:
                return None
            return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def put_replicated(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    if jax.process_count() > 1:
        from geossl_tpu.parallel import multihost

        return jax.tree_util.tree_map(
            lambda x: multihost.process_local_batch(sh, x), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def fetch(x) -> np.ndarray:
    """Device array -> host numpy, valid under multi-process SPMD too: a
    batch-sharded eval output is not fully addressable on any one process,
    so cross-host it is allgathered first (every process gets the full
    array — the drivers' metric code is then process-agnostic)."""
    if jax.process_count() > 1 and not getattr(
            x, "is_fully_addressable", True):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def prefetch(batch_iterator, mesh: Mesh, size: int = 2):
    """Overlap host batch packing + device transfer with device compute.

    A background thread drains ``batch_iterator``, shards each batch onto the
    mesh (async device_put) and keeps up to ``size`` batches in flight — the
    padded-batch analog of the reference's ``num_workers`` loader processes
    (``submit_pretrain_GeoSSL_DDM.sh:10``).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up if the consumer abandoned the generator
        # (otherwise the thread would block forever holding device buffers)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in batch_iterator:
                if not _put(shard_batch(mesh, batch)):
                    return
        except BaseException as e:  # surface errors on the consumer side
            _put(e)
            return
        _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
