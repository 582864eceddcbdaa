"""Pair-grid model parallelism — shard the O(N²) message computation.

SURVEY.md §5.7 records the TPU-native answer to graphs that outgrow one
chip: shard the dense ``[B, N, N]`` pair grid blockwise across ICI the way
ring attention shards (i, j) blocks. No reference workload needs it (Atom3D
caps at ~500 atoms), so it is an *extension*, not a port — this module makes
it a working one.

Scheme (simplest-correct stripe variant): run the whole backbone inside
``shard_map`` over a mesh axis named ``"pair"``. Node tensors (``[B, N, F]``)
are small and stay replicated; each device computes the message partial sum
for its contiguous j-stripe of the pair grid — the O(N²·F) term in both
FLOPs and (XLA-path) filter-tensor memory — and one ``psum`` over ICI
restores the full per-node messages. Everything outside the message op
(embeddings, filter MLPs on nodes, readout) is recomputed replicated; that
work is O(N·F²) and vanishes against the pair term at large N.

Composes with data parallelism on a 2-D ``("data", "pair")`` mesh: the batch
shards over ``"data"`` exactly as in training (``parallel/mesh.py``), the
pair grid over ``"pair"``; gradient psums ride the same mesh.

Backbones opt in via the ``pair_axis`` module field
(``models/schnet.py InteractionBlock.pair_axis``,
``models/painn.py PaiNNInteraction.pair_axis``); inside they take
``lax.axis_index``-addressed j-slices and ``lax.psum`` the partials, which
also gives reverse-mode AD the right collectives for free. With
``use_pallas`` the stripes run the FUSED kernels — both accept rectangular
``[B, Ni, Nj]`` grids (``pair_tiles_rect``) — so sharding keeps the kernel
wins and the no-filter-tensor memory profile. Driver surface:
``finetune_lba --pair_devices K``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

PAIR_AXIS = "pair"


def make_pair_mesh(num_pair: int, num_data: int = 1, devices=None) -> Mesh:
    """A ``("data", "pair")`` mesh: batch parallelism × pair-grid
    parallelism. ``num_data * num_pair`` devices are taken in order, so on a
    v5e slice the pair axis (which carries the per-layer psum) maps to
    adjacent chips."""
    if devices is None:
        devices = jax.devices()
    n = num_data * num_pair
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(num_data, num_pair),
                axis_names=("data", PAIR_AXIS))


def local_stripe(axis_name: str, n: int):
    """The (start, length) of this device's contiguous j-stripe of an
    ``n``-wide pair-grid axis under ``shard_map`` over ``axis_name``.
    Shared by the backbones' ``pair_axis`` paths."""
    d = jax.lax.psum(1, axis_name)  # static axis size
    if n % d:
        raise ValueError(
            f"pair_axis sharding needs N % axis_size == 0; "
            f"got N={n}, axis {axis_name!r} size {d}")
    nloc = n // d
    return jax.lax.axis_index(axis_name) * nloc, nloc


def pair_sharded_apply(apply_fn, mesh: Mesh):
    """Wrap a backbone ``apply_fn(params, *batch_arrays) -> outputs`` for a
    ``("data", "pair")`` mesh (:func:`make_pair_mesh`).

    Params replicate; every batch array shards its leading (batch) axis over
    ``"data"`` and replicates over ``"pair"``; outputs come back sharded
    over ``"data"``. The backbone must have been constructed with
    ``pair_axis=PAIR_AXIS``. The global batch size must divide by the data
    axis and N by the pair axis.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    def inner(params, batch_arrays):
        return apply_fn(params, *batch_arrays)

    def wrapped(params, *batch_arrays):
        return inner(params, batch_arrays)

    return wrapped
