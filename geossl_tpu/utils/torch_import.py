"""Import the reference's released torch checkpoints into geossl_tpu trees.

The reference saves backbones with ``torch.save(model.state_dict(), ...)``
(``examples/pretrain_GeoSSL.py:48-65``); its published GeoSSL-DDM weights
are such ``.pth`` state_dicts for ``Geom3D/models/schnet.py`` /
``painn.py`` modules. These converters map them onto this framework's flax
param trees so a reference user can drop a released checkpoint straight
into ``--input_model_file model.pth``.

Mapping notes:
* torch ``Linear.weight`` is ``[out, in]`` -> transposed to flax ``[in,
  out]`` kernels.
* SchNet (``schnet.py:16-216``): ``interactions.{k}.mlp.{0,2}`` is the
  filter MLP (-> ``filter_w1/b1/w2/b2``), ``conv.lin1`` (no bias) ->
  ``Dense_0``, ``conv.lin2`` -> ``Dense_1``, block ``lin`` -> ``Dense_2``,
  top ``lin1/lin2`` -> ``Dense_0/Dense_1``. Buffers (``atomic_mass``,
  ``distance_expansion.offset``, ``initial_atomref``) are derived
  constants here, not parameters.
* PaiNN (``painn.py:117-269``): ``filter_net`` -> the per-layer-sliced
  ``filter_kernel/filter_bias`` (slice order matches ``torch.split(...,
  3F, dim=-1)``), ``interactions.{k}.interatomic_context_net.{0,1}`` ->
  ``PaiNNInteraction_k/Dense_{0,1}``, ``mixing.{k}`` ->
  ``PaiNNMixing_k`` (``mu_channel_mix`` has no bias).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "schnet_params_from_torch",
    "painn_params_from_torch",
    "backbone_params_from_torch",
    "load_torch_checkpoint",
]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _clean(sd: Dict) -> Dict[str, np.ndarray]:
    import warnings

    sd = dict(sd)
    # unwrap common containers: {'model': sd}, {'state_dict': sd}. Reference
    # FINETUNE checkpoints also carry sibling trees (graph_pred_linear, ...)
    # that have no generic mapping here — warn loudly instead of silently
    # importing a backbone and re-initializing the trained head.
    for key in ("state_dict", "model"):
        if key in sd and isinstance(sd[key], dict):
            extras = sorted(k for k in sd if k != key)
            if extras:
                warnings.warn(
                    f"torch checkpoint carries {extras} beside {key!r}; only "
                    "the backbone is imported by this function — "
                    "load_torch_checkpoint carries the fine-tuned "
                    "graph_pred_linear head too", stacklevel=3)
            sd = dict(sd[key])
    # strip DataParallel / wrapper prefixes
    for pre in ("module.", "molecule_model_3D."):
        if sd and all(k.startswith(pre) for k in sd):
            sd = {k[len(pre):]: v for k, v in sd.items()}
    return {k: _np(v) for k, v in sd.items()}


def _n_layers(sd, prefix):
    ks = [k for k in sd if k.startswith(prefix)]
    if not ks:
        raise KeyError(
            f"no '{prefix}*' keys in state_dict — not a checkpoint of this "
            f"backbone (keys: {sorted(sd)[:8]}...)"
        )
    return 1 + max(int(k.split(".")[1]) for k in ks)


def schnet_params_from_torch(state_dict) -> dict:
    """Reference ``SchNet.state_dict()`` -> params for ``models.SchNet``."""
    sd = _clean(state_dict)
    n = _n_layers(sd, "interactions.")
    params = {"Embed_0": {"embedding": sd["embedding.weight"]}}
    for k in range(n):
        p = f"interactions.{k}."
        params[f"InteractionBlock_{k}"] = {
            "filter_w1": sd[p + "mlp.0.weight"].T,
            "filter_b1": sd[p + "mlp.0.bias"],
            "filter_w2": sd[p + "mlp.2.weight"].T,
            "filter_b2": sd[p + "mlp.2.bias"],
            "Dense_0": {"Dense_0": {"kernel": sd[p + "conv.lin1.weight"].T}},
            "Dense_1": {"Dense_0": {"kernel": sd[p + "conv.lin2.weight"].T,
                                    "bias": sd[p + "conv.lin2.bias"]}},
            "Dense_2": {"Dense_0": {"kernel": sd[p + "lin.weight"].T,
                                    "bias": sd[p + "lin.bias"]}},
        }
    params["Dense_0"] = {"Dense_0": {"kernel": sd["lin1.weight"].T,
                                     "bias": sd["lin1.bias"]}}
    params["Dense_1"] = {"Dense_0": {"kernel": sd["lin2.weight"].T,
                                     "bias": sd["lin2.bias"]}}
    if "atomref.weight" in sd:
        params["atomref"] = sd["atomref.weight"]
    return params


def painn_params_from_torch(state_dict) -> dict:
    """Reference ``PaiNN.state_dict()`` -> params for ``models.PaiNN``."""
    sd = _clean(state_dict)
    n = _n_layers(sd, "interactions.")
    f = sd["embedding.weight"].shape[1]
    width = sd["filter_net.weight"].shape[0]
    if width not in (3 * f, n * 3 * f):
        raise ValueError(
            f"filter_net width {width} matches neither shared (3F={3 * f}) "
            f"nor per-layer ({n}*3F={n * 3 * f}) filters — unsupported "
            "PaiNN variant")
    # width == 3F with n > 1 is a shared_filters checkpoint: construct
    # PaiNN(shared_filters=True) to consume it
    params = {
        "embedding": sd["embedding.weight"],
        "filter_kernel": sd["filter_net.weight"].T,
        "filter_bias": sd["filter_net.bias"],
    }
    for k in range(n):
        i = f"interactions.{k}.interatomic_context_net."
        m = f"mixing.{k}."
        params[f"PaiNNInteraction_{k}"] = {
            "Dense_0": {"Dense_0": {"kernel": sd[i + "0.weight"].T,
                                    "bias": sd[i + "0.bias"]}},
            "Dense_1": {"Dense_0": {"kernel": sd[i + "1.weight"].T,
                                    "bias": sd[i + "1.bias"]}},
        }
        params[f"PaiNNMixing_{k}"] = {
            "mu_channel_mix": {"Dense_0": {
                "kernel": sd[m + "mu_channel_mix.weight"].T}},
            "Dense_0": {"Dense_0": {
                "kernel": sd[m + "intraatomic_context_net.0.weight"].T,
                "bias": sd[m + "intraatomic_context_net.0.bias"]}},
            "Dense_1": {"Dense_0": {
                "kernel": sd[m + "intraatomic_context_net.1.weight"].T,
                "bias": sd[m + "intraatomic_context_net.1.bias"]}},
        }
    return params


def backbone_params_from_torch(state_dict) -> dict:
    """Auto-detect the backbone family from the state_dict's key set."""
    sd = _clean(state_dict)
    if any(k.startswith("filter_net.") for k in sd):
        return painn_params_from_torch(sd)
    if any(k.startswith("interactions.0.mlp.") for k in sd):
        return schnet_params_from_torch(sd)
    raise ValueError(
        "state_dict matches neither the reference SchNet nor PaiNN "
        f"(keys: {sorted(sd)[:8]}...)"
    )


def head_params_from_torch(sd) -> dict:
    """``graph_pred_linear`` state_dict -> flax head params. Two reference
    layouts: a bare ``torch.nn.Linear`` (SchNet tasks
    ``finetune_qm9.py:113``, and LEP's dual head for both backbones) and the
    PaiNN ``create_output_layers()`` Sequential of Dense(=Linear) layers
    (``painn.py:205-213``)."""
    sd = {k: _np(v) for k, v in sd.items()}
    if "weight" in sd:  # nn.Linear -> LinearHead / DualHead
        return {"Dense_0": {"Dense_0": {"kernel": sd["weight"].T,
                                        "bias": sd["bias"]}}}
    if "0.weight" in sd:  # Sequential -> PaiNNHead(HalvingMLP)
        layers = sorted({int(k.split(".")[0]) for k in sd})
        return {"HalvingMLP_0": {
            f"Dense_{i}": {"Dense_0": {"kernel": sd[f"{i}.weight"].T,
                                       "bias": sd[f"{i}.bias"]}}
            for i in layers}}
    raise ValueError(
        f"unrecognized graph_pred_linear layout (keys: {sorted(sd)[:4]})")


def head_params_to_torch(tree) -> Dict[str, np.ndarray]:
    """Inverse of :func:`head_params_from_torch`."""
    if "Dense_0" in tree:  # LinearHead / DualHead -> nn.Linear
        p = tree["Dense_0"]["Dense_0"]
        return {"weight": np.asarray(p["kernel"], np.float32).T,
                "bias": np.asarray(p["bias"], np.float32)}
    if "HalvingMLP_0" in tree:  # PaiNNHead -> Sequential
        out = {}
        for name, sub in tree["HalvingMLP_0"].items():
            i = int(name.split("_")[1])
            p = sub["Dense_0"]
            out[f"{i}.weight"] = np.asarray(p["kernel"], np.float32).T
            out[f"{i}.bias"] = np.asarray(p["bias"], np.float32)
        return out
    raise ValueError(
        f"unrecognized head param tree (keys: {sorted(tree)[:4]})")


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``.pth``/``.pt`` checkpoint file ->
    ``{"model": params[, "graph_pred_linear": head]}`` (this framework's
    transfer contract; fine-tune checkpoints carry the trained head,
    ``finetune_qm9.py:141-150``)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    if isinstance(sd, dict) and isinstance(sd.get("graph_pred_linear"), dict):
        sd = dict(sd)
        out["graph_pred_linear"] = head_params_from_torch(
            sd.pop("graph_pred_linear"))
    out["model"] = backbone_params_from_torch(sd)
    return out


# --------------------------------------------------------------- export
# The reverse direction: our pretrained backbones as reference-format torch
# state_dicts, so checkpoints trained here drop into the reference's own
# eval/finetune harness (load_model, examples/finetune_qm9.py:524-539).


def schnet_params_to_torch(params) -> Dict[str, np.ndarray]:
    """``models.SchNet`` params -> reference ``SchNet.state_dict()`` arrays
    (exact inverse of ``schnet_params_from_torch``)."""
    params = {k: v for k, v in params.items()}
    sd = {"embedding.weight": _np(params["Embed_0"]["embedding"])}
    n = sum(1 for k in params if k.startswith("InteractionBlock_"))
    for k in range(n):
        blk = params[f"InteractionBlock_{k}"]
        p = f"interactions.{k}."
        sd[p + "mlp.0.weight"] = _np(blk["filter_w1"]).T
        sd[p + "mlp.0.bias"] = _np(blk["filter_b1"])
        sd[p + "mlp.2.weight"] = _np(blk["filter_w2"]).T
        sd[p + "mlp.2.bias"] = _np(blk["filter_b2"])
        sd[p + "conv.lin1.weight"] = _np(blk["Dense_0"]["Dense_0"]["kernel"]).T
        sd[p + "conv.lin2.weight"] = _np(blk["Dense_1"]["Dense_0"]["kernel"]).T
        sd[p + "conv.lin2.bias"] = _np(blk["Dense_1"]["Dense_0"]["bias"])
        sd[p + "lin.weight"] = _np(blk["Dense_2"]["Dense_0"]["kernel"]).T
        sd[p + "lin.bias"] = _np(blk["Dense_2"]["Dense_0"]["bias"])
    sd["lin1.weight"] = _np(params["Dense_0"]["Dense_0"]["kernel"]).T
    sd["lin1.bias"] = _np(params["Dense_0"]["Dense_0"]["bias"])
    sd["lin2.weight"] = _np(params["Dense_1"]["Dense_0"]["kernel"]).T
    sd["lin2.bias"] = _np(params["Dense_1"]["Dense_0"]["bias"])
    if "atomref" in params:
        sd["atomref.weight"] = _np(params["atomref"])
    return sd


def painn_params_to_torch(params) -> Dict[str, np.ndarray]:
    """``models.PaiNN`` params -> reference ``PaiNN.state_dict()`` arrays
    (exact inverse of ``painn_params_from_torch``)."""
    sd = {
        "embedding.weight": _np(params["embedding"]),
        "filter_net.weight": _np(params["filter_kernel"]).T,
        "filter_net.bias": _np(params["filter_bias"]),
    }
    n = sum(1 for k in params if k.startswith("PaiNNInteraction_"))
    for k in range(n):
        blk = params[f"PaiNNInteraction_{k}"]
        mix = params[f"PaiNNMixing_{k}"]
        i = f"interactions.{k}.interatomic_context_net."
        m = f"mixing.{k}."
        sd[i + "0.weight"] = _np(blk["Dense_0"]["Dense_0"]["kernel"]).T
        sd[i + "0.bias"] = _np(blk["Dense_0"]["Dense_0"]["bias"])
        sd[i + "1.weight"] = _np(blk["Dense_1"]["Dense_0"]["kernel"]).T
        sd[i + "1.bias"] = _np(blk["Dense_1"]["Dense_0"]["bias"])
        sd[m + "mu_channel_mix.weight"] = _np(
            mix["mu_channel_mix"]["Dense_0"]["kernel"]).T
        sd[m + "intraatomic_context_net.0.weight"] = _np(
            mix["Dense_0"]["Dense_0"]["kernel"]).T
        sd[m + "intraatomic_context_net.0.bias"] = _np(
            mix["Dense_0"]["Dense_0"]["bias"])
        sd[m + "intraatomic_context_net.1.weight"] = _np(
            mix["Dense_1"]["Dense_0"]["kernel"]).T
        sd[m + "intraatomic_context_net.1.bias"] = _np(
            mix["Dense_1"]["Dense_0"]["bias"])
    return sd


def save_torch_checkpoint(path: str, tree: dict) -> None:
    """Write ``{"model": params[, "graph_pred_linear": head]}`` (or bare
    backbone params) as a reference-format torch ``.pth``, in the exact
    wrapper layout the reference's own save/load uses
    (``finetune_qm9.py:132-150``: ``model_weight["model"]`` plus the
    optional fine-tuned head) — so exports drop into the reference's
    ``load_model``/fine-tune harness unchanged. The backbone family is
    auto-detected from the tree's key set."""
    import torch

    params = tree.get("model", tree) if isinstance(tree, dict) else tree
    if "filter_kernel" in params:
        sd = painn_params_to_torch(params)
    elif "Embed_0" in params:
        sd = schnet_params_to_torch(params)
    else:
        raise ValueError(
            f"param tree matches neither backbone (keys: {sorted(params)[:6]})"
        )
    out = {"model": {k: torch.tensor(v) for k, v in sd.items()}}
    if isinstance(tree, dict) and "graph_pred_linear" in tree:
        out["graph_pred_linear"] = {
            k: torch.tensor(v)
            for k, v in head_params_to_torch(tree["graph_pred_linear"]).items()}
    torch.save(out, path)
