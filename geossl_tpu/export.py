"""Sealed serving artifacts — ahead-of-time compiled deployment units.

The reference has no deployment format at all: shipping a trained model
means shipping the conda env, the ``Geom3D`` package and a ``.pth`` file,
and re-tracing the model on every process start (its eval loops live inside
the fine-tune scripts, e.g. ``examples/finetune_qm9.py:278-384``). Here a
trained :class:`~geossl_tpu.serve.Predictor` can be **sealed**: every
(mode, bucket-shape) program it would jit is exported once via
``jax.export`` (StableHLO), and the serialized programs + parameters +
metadata are written into ONE zip artifact.

:class:`SealedPredictor` replays that artifact with the same public API as
``Predictor`` — but without constructing a model: no flax modules, no
Pallas tracing, no config resolution at load time (fused-kernel custom
calls are already embedded in the program bytes). Only the host-side
bucketing/padding/packing code runs in Python. This is the unit you copy
to a fleet of TPU servers:

    pred = Predictor.from_checkpoint("runs/x/model.ckpt", cfg)
    seal(pred, "model.sealed", modes=("predict", "embed"))
    ...
    SealedPredictor.load("model.sealed").predict(store)   # anywhere

TPU-first notes: programs are exported per pad-bucket shape (the same
static-shape ladder serving uses), so a sealed artifact admits exactly the
shapes it was exported for — a deliberate property for production (no
surprise retraces, no Python tracing on the serving path). The artifact
carries StableHLO, not a compiled executable: the first execution of each
program still pays one XLA compile (hidden by the persistent compilation
cache on warm fleets); steady state is the device rate (measured: 52 ms
for a 6-molecule 2-bucket pass on v5e). Export with ``platforms=("tpu",
"cpu")`` for artifacts that run on both.

CLI: ``python -m geossl_tpu seal --ckpt runs/x/model.ckpt --out m.sealed``
then ``python -m geossl_tpu serve --ckpt m.sealed --input mols.sdf``.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import serialization

from geossl_tpu.config import ModelConfig
from geossl_tpu.data.bucketing import find_native_packer
from geossl_tpu.serve import Predictor

FORMAT_VERSION = 1
ALL_MODES = ("predict", "embed", "forces", "pairs")


def _batch_specs(batch: int, n: int):
    """ShapeDtypeStructs for one padded tower input (atom_type, positions,
    node_mask) at bucket size ``n`` — the exact shapes ``Predictor._pack``
    produces."""
    return (
        jax.ShapeDtypeStruct((batch, n), np.int32),
        jax.ShapeDtypeStruct((batch, n, 3), np.float32),
        jax.ShapeDtypeStruct((batch, n), np.bool_),
    )


def _tree_specs(tree):
    # Read dtype off the leaf itself (device arrays carry it) — np.asarray
    # here would pull every parameter to host over the TPU tunnel just to
    # look at its dtype.
    def spec(a):
        dtype = a.dtype if hasattr(a, "dtype") else np.asarray(a).dtype
        return jax.ShapeDtypeStruct(np.shape(a), dtype)

    return jax.tree_util.tree_map(spec, tree)


def seal(
    predictor: Predictor,
    path: str,
    modes: Sequence[str] = ("predict", "embed"),
    platforms: Optional[Sequence[str]] = None,
    pair_buckets: Optional[Sequence[int]] = None,
) -> Dict[str, int]:
    """Export ``predictor``'s compiled surface into a sealed artifact.

    One StableHLO program per (mode, bucket) — ``pairs`` gets one per
    (bucket_active, bucket_inactive) combination, over ``pair_buckets``
    (default: the predictor's full ladder; pass e.g. ``[512]`` to keep
    LEP-only artifacts small). ``platforms`` defaults to the current
    backend; pass ``("tpu", "cpu")`` for a dual-platform artifact.

    Returns ``{program_name: serialized_bytes}`` sizes (for logging).
    Backbone-only checkpoints can seal ``modes=("embed",)`` only —
    head-bearing modes raise the same error serving them would.
    """
    from jax import export as jexport

    bad = [m for m in modes if m not in ALL_MODES]
    if bad:
        raise ValueError(f"unknown modes {bad}; choose from {ALL_MODES}")
    if predictor.mesh is not None:
        raise ValueError("sealing a multi-device Predictor is not supported; "
                         "build it with num_devices=None")
    if any(m != "embed" for m in modes):
        predictor._require_head()

    platforms = tuple(platforms) if platforms else None
    B = predictor.batch_size
    params_spec = _tree_specs(predictor.params)
    model_spec = params_spec["model"]

    def _export(fn, *specs) -> bytes:
        exp = jexport.export(fn, platforms=platforms)(*specs)
        return exp.serialize()

    programs: Dict[str, bytes] = {}
    for n in predictor.bucket_sizes:
        tower = _batch_specs(B, n)
        if "embed" in modes:
            programs[f"embed_{n}"] = _export(
                predictor._embed_fn, model_spec, *tower)
        if "predict" in modes:
            programs[f"predict_{n}"] = _export(
                predictor._predict_fn, params_spec, *tower)
        if "forces" in modes:
            programs[f"forces_{n}"] = _export(
                predictor._energy_forces_fn, params_spec, *tower)
    if "pairs" in modes:
        pb = tuple(sorted(pair_buckets or predictor.bucket_sizes))
        unknown = [n for n in pb if n not in predictor.bucket_sizes]
        if unknown:
            raise ValueError(f"pair_buckets {unknown} not in the predictor's "
                             f"ladder {predictor.bucket_sizes}")
        for na in pb:
            for ni in pb:
                programs[f"pairs_{na}x{ni}"] = _export(
                    predictor._pair_logit_fn, params_spec,
                    *_batch_specs(B, na), *_batch_specs(B, ni))

    meta = {
        "format_version": FORMAT_VERSION,
        "modes": sorted(modes),
        "bucket_sizes": list(predictor.bucket_sizes),
        "pair_buckets": sorted(pair_buckets or predictor.bucket_sizes)
        if "pairs" in modes else [],
        "batch_size": B,
        "model_3d": predictor.cfg.model_3d,
        "emb_dim": predictor.cfg.emb_dim,
        "y_mean": predictor.y_mean,
        "y_std": predictor.y_std,
        "spatial_sort": predictor.spatial_sort,
        "platforms": list(platforms) if platforms else
        [jax.default_backend()],
        "jax_version": jax.__version__,
    }
    host_params = jax.tree_util.tree_map(
        np.asarray, jax.device_get(predictor.params))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("params.msgpack",
                   serialization.msgpack_serialize(host_params))
        for name, blob in programs.items():
            z.writestr(f"programs/{name}.bin", blob)
    return {k: len(v) for k, v in programs.items()}


class SealedPredictor(Predictor):
    """Serve a sealed artifact with ``Predictor``'s API, model-free.

    Inherits every public method (``predict`` / ``embed`` /
    ``predict_forces`` / ``predict_pairs`` — the bucketing, packing,
    ordering and async-gather logic) and replaces the jitted closures with
    dispatchers that pick the exported program matching the padded shape.
    Shapes outside the sealed ladder raise with the available buckets
    listed; re-``seal`` with a wider ladder to admit them.
    """

    def __init__(self, meta: dict, params, programs: Dict[str, bytes]):
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(f"unsupported artifact format_version "
                             f"{meta.get('format_version')} "
                             f"(this build reads {FORMAT_VERSION})")
        # Deliberately NOT calling Predictor.__init__ — no model is built.
        self.cfg = ModelConfig(model_3d=meta["model_3d"],
                               emb_dim=meta["emb_dim"])
        self.meta = meta
        self.modes = tuple(meta["modes"])
        self.y_mean = float(meta["y_mean"])  # baked into the programs;
        self.y_std = float(meta["y_std"])    # kept for introspection only
        self.mesh = None
        self.params = jax.device_put(params)
        self.batch_size = int(meta["batch_size"])
        self.bucket_sizes = tuple(meta["bucket_sizes"])
        self.spatial_sort = meta.get("spatial_sort", "auto")
        self._head_params = params.get("graph_pred_linear")
        self._native = find_native_packer()
        self._blobs = programs
        self._loaded: Dict[str, object] = {}

        def call(mode_of_shape, *args):
            return self._program(mode_of_shape).call(*args)

        self._embed_fn = lambda m, at, pos, nm: call(
            f"embed_{at.shape[1]}", m, at, pos, nm)
        self._predict_fn = lambda p, at, pos, nm: call(
            f"predict_{at.shape[1]}", p, at, pos, nm)
        self._energy_forces_fn = lambda p, at, pos, nm: call(
            f"forces_{at.shape[1]}", p, at, pos, nm)
        self._pair_logit_fn = lambda p, za, pa, ma, zi, pi, mi: call(
            f"pairs_{za.shape[1]}x{zi.shape[1]}", p, za, pa, ma, zi, pi, mi)

    def _program(self, name: str):
        """Deserialize lazily, cache per program (deserialize is cheap; the
        first execution pays XLA's AOT compile of the embedded StableHLO,
        later calls hit the executable cache keyed by program identity)."""
        prog = self._loaded.get(name)
        if prog is None:
            blob = self._blobs.get(name)
            if blob is None:
                mode = name.split("_")[0]
                have = sorted(k for k in self._blobs
                              if k.startswith(mode + "_"))
                raise ValueError(
                    f"sealed artifact has no program {name!r} (available "
                    f"for {mode!r}: {have if have else 'none — mode not sealed'}); "
                    f"re-seal with this mode/bucket included")
            from jax import export as jexport

            prog = jexport.deserialize(blob)
            self._loaded[name] = prog
        return prog

    def _require_head(self):
        if self._head_params is None:
            raise ValueError(
                "sealed artifact was built from a backbone-only checkpoint; "
                "only embed() is available")

    @classmethod
    def load(cls, path: str) -> "SealedPredictor":
        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read("meta.json"))
            params = serialization.msgpack_restore(z.read("params.msgpack"))
            programs = {
                name[len("programs/"):-len(".bin")]: z.read(name)
                for name in z.namelist()
                if name.startswith("programs/") and name.endswith(".bin")
            }
        return cls(meta, params, programs)


# -- CLI -----------------------------------------------------------------------


def build_parser():
    import argparse

    p = argparse.ArgumentParser(
        description="Seal a checkpoint into an AOT serving artifact "
                    "(StableHLO programs + params in one zip).")
    p.add_argument("--ckpt", required=True,
                   help="model[_final].ckpt (msgpack) or reference .pth")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--model_3d", default="schnet",
                   choices=["schnet", "painn"])
    p.add_argument("--modes", nargs="+", default=["predict", "embed"],
                   choices=list(ALL_MODES))
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--bucket", type=int, nargs="+",
                   default=[32, 64, 128, 256, 512])
    p.add_argument("--pair_bucket", type=int, nargs="+", default=None,
                   help="restrict 'pairs' programs to these buckets "
                        "(default: full ladder, quadratic in its length)")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="target platforms, e.g. --platforms tpu cpu "
                        "(default: current backend)")
    p.add_argument("--use_pallas", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="fused kernels in the sealed programs (default: on "
                        "when the current backend is TPU; --no-use_pallas "
                        "forces portable XLA-only programs, required for "
                        "dual-platform --platforms tpu cpu artifacts)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    use_pallas = (jax.default_backend() == "tpu"
                  if args.use_pallas is None else args.use_pallas)
    cfg = ModelConfig(model_3d=args.model_3d, use_pallas=use_pallas)
    pred = Predictor.from_checkpoint(
        args.ckpt, cfg, batch_size=args.batch_size, bucket_sizes=args.bucket)
    sizes = seal(pred, args.out, modes=args.modes, platforms=args.platforms,
                 pair_buckets=args.pair_bucket)
    total = sum(sizes.values())
    print(f"sealed {len(sizes)} programs ({total / 1e6:.2f} MB serialized) "
          f"-> {args.out}")
    for name in sorted(sizes):
        print(f"  {name}: {sizes[name] / 1e3:.1f} kB")


if __name__ == "__main__":
    main()
