"""Checkpointing — the pretrain → finetune transfer contract.

Reference (SURVEY.md §5.4): ``torch.save({"model": backbone.state_dict()})``
to ``model.pth`` on best train loss and ``model_final.pth`` at the end
(``pretrain_GeoSSL.py:48-65``); fine-tune saves
``{"model": ..., "graph_pred_linear": ...}`` on best val. Here the same
contract is a dict of flax param pytrees serialized with
``flax.serialization`` msgpack:

    {"model": <backbone params>, ["graph_pred_linear": <head params>], ...}
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree: Dict[str, Any]) -> None:
    if jax.process_index() != 0:
        return  # multi-host: process 0 owns the (shared or per-host) fs
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tree = jax.tree_util.tree_map(np.asarray, tree)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint tree. ``.pth``/``.pt`` files are imported from the
    reference's torch state_dict format (released GeoSSL checkpoints drop
    straight into ``--input_model_file`` — utils/torch_import.py)."""
    if path.endswith((".pth", ".pt")):
        from geossl_tpu.utils.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_train_state(path: str, state, epoch: int,
                     best_metric: float = float("inf"),
                     extra: Dict[str, float] | None = None) -> None:
    """Full-state checkpoint (params + optimizer state + step + epoch +
    best-so-far metric) for mid-training resume. The reference restarts
    killed jobs from scratch (SURVEY.md §5.3); this is the elastic-recovery
    extension. ``extra`` carries driver-specific scalars that must survive
    the restart (e.g. the fine-tuners' test-at-best metrics)."""
    if jax.process_index() != 0:
        return  # multi-host: process 0 owns the (shared or per-host) fs
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "state": serialization.to_state_dict(jax.device_get(state)),
        "epoch": epoch,
        "best_metric": float(best_metric),
        "extra": {k: float(v) for k, v in (extra or {}).items()},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, payload)
        ))
    os.replace(tmp, path)  # atomic: a killed job never sees a torn file


def load_train_state(path: str, state_template):
    """Restore (state, epoch, best_metric, extra) from ``save_train_state``
    output; the template provides the pytree structure (freshly created
    TrainState)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    best = float(payload.get("best_metric", float("inf")))
    extra = {k: float(v) for k, v in payload.get("extra", {}).items()}
    return state, int(payload["epoch"]), best, extra


class BestModelSaver:
    """Best-by-metric + final checkpoints (lower is better), mirroring the
    reference's ``save_model`` (``pretrain_GeoSSL.py:48-65``)."""

    def __init__(self, output_dir: str, best_name="model.ckpt", final_name="model_final.ckpt"):
        self.output_dir = output_dir
        self.best_name = best_name
        self.final_name = final_name
        self.best_metric = float("inf")

    def maybe_save_best(self, metric: float, tree) -> bool:
        # NaN-safe: only a STRICTLY smaller finite metric counts as a new
        # best (``metric >= best`` is False for NaN, which must not win).
        # ``tree`` may be a zero-arg callable: drivers pass a thunk wrapping
        # ``jax.device_get`` so non-improving epochs never pay the device->
        # host parameter fetch (~0.5 s for the published model through the
        # remote-TPU tunnel).
        is_better = metric < self.best_metric
        if not self.output_dir or not is_better:
            return False
        self.best_metric = metric
        if callable(tree):
            tree = tree()
        save_checkpoint(os.path.join(self.output_dir, self.best_name), tree)
        return True

    def save_final(self, tree: Dict[str, Any]) -> None:
        if self.output_dir:
            save_checkpoint(os.path.join(self.output_dir, self.final_name), tree)
