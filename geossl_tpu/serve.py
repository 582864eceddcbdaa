"""Batched inference / serving on trained checkpoints.

The reference has no inference path beyond the per-epoch eval loops inside
its fine-tune scripts (e.g. ``examples/finetune_qm9.py:278-384``); deploying
a trained model means copy-pasting one of those loops. Here serving is a
first-class surface:

* :class:`Predictor` — loads a fine-tune checkpoint (``model.ckpt`` /
  ``model_final.ckpt``, or a reference torch ``.pth`` via
  ``utils/torch_import``), buckets + pads incoming molecules (one compiled
  program per bucket shape, cached across calls by jit), and returns
  predictions aligned to the input order. Denormalizes when the checkpoint
  carries ``y_mean``/``y_std`` (the QM9 driver saves them since round 3).
* ``predict`` (scalar property) / ``embed`` (pooled graph representation) /
  ``predict_forces`` (MD17-style ``-∂E/∂pos``) / ``predict_pairs`` (LEP
  dual-tower probabilities).
* CLI: ``python -m geossl_tpu.serve --ckpt runs/x/model.ckpt --input
  mols.sdf --output preds.csv``.

TPU notes: batches are padded to a fixed ``batch_size`` so every call of a
bucket reuses one compiled program; partial final chunks pad with empty
graph slots (``graph_mask``) rather than recompiling. Atom3D-sized inputs
(N >= 128) are Morton-sorted by default so the occupancy-gated kernels skip
out-of-cutoff tiles (docs/PERF.md); outputs are per-graph and thus
order-invariant (forces are mapped back to the input atom order).
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from geossl_tpu.config import ModelConfig
from geossl_tpu.data.batch import DenseMolBatch
from geossl_tpu.data.bucketing import (
    assign_buckets,
    find_native_packer,
    pack_batch,
)
from geossl_tpu.data.store import MolRecord, MolStore
from geossl_tpu.train import checkpoints, common


def _chunks(idx: np.ndarray, size: int):
    for s in range(0, len(idx), size):
        yield idx[s : s + size]


class Predictor:
    """Batched property prediction from a trained checkpoint.

    ``params`` is the fine-tune checkpoint tree: ``{"model": backbone,
    ["graph_pred_linear": head], ["y_mean"/"y_std": scalars]}`` (the
    pretrain->finetune transfer contract of SURVEY.md §5.4 plus the round-3
    normalization stats). Without a head — a pretrain/backbone-only
    checkpoint — only :meth:`embed` is available.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        y_mean: Optional[float] = None,
        y_std: Optional[float] = None,
        batch_size: int = 128,
        bucket_sizes: Sequence[int] = (32, 64, 128, 256, 512),
        spatial_sort: str = "auto",  # {"auto", "on", "off"}
        num_devices: Optional[int] = None,
    ):
        self.cfg = cfg
        self.module, self.backbone_apply = common.make_backbone(cfg)
        self.y_mean = float(y_mean if y_mean is not None
                            else params.get("y_mean", 0.0))
        self.y_std = float(y_std if y_std is not None
                           else params.get("y_std", 1.0))
        # SPMD serving: params replicated over a 1-D data mesh, each padded
        # batch sharded on its leading axis — the same sharding recipe as
        # training (parallel/mesh.py); XLA runs the towers data-parallel.
        self.mesh = None
        if num_devices is not None and num_devices > 1:
            from geossl_tpu.parallel import mesh as pmesh

            self.mesh = pmesh.make_mesh(num_devices)
            batch_size = common.round_batch_to_mesh(batch_size, self.mesh)
            params = pmesh.put_replicated(self.mesh, params)
        else:
            # resident once — checkpoint trees arrive as host numpy arrays,
            # and passing those re-uploads the full parameter set on EVERY
            # batch call (measured 20x slower through the remote-TPU tunnel)
            params = jax.device_put(params)
        self.params = params
        self.batch_size = batch_size
        self.bucket_sizes = tuple(sorted(bucket_sizes))
        if spatial_sort not in ("auto", "on", "off"):
            raise ValueError(f"spatial_sort must be auto/on/off, "
                             f"got {spatial_sort!r}")
        self.spatial_sort = spatial_sort
        self._head_params = params.get("graph_pred_linear")
        self._native = find_native_packer()
        # Linear for SchNet, create_output_layers halving MLP for PaiNN —
        # matching what the fine-tune drivers trained (train/common.make_head)
        head = common.make_head(cfg.model_3d, cfg.emb_dim)
        dual_head = common.DualHead()

        # Forward-only buckets up to each kernel's measured VMEM-residency
        # limit run the whole-stack inference kernels (models/{schnet,painn}
        # .fused_stack_apply — kexp2/kexp9/kexp10: the full interaction
        # chain in one Pallas program; serving forward 1.5x for PaiNN at
        # the QM9 shape, 1.18-1.25x for SchNet at N=128). The force path
        # keeps backbone_apply: the stack kernels are deliberately VJP-free.
        fwd_apply = self.backbone_apply
        if (cfg.use_pallas and self.module.pair_axis is None
                and self.module.dtype is None):
            if cfg.model_3d == "painn":
                from geossl_tpu.models.painn import fused_stack_apply
                from geossl_tpu.ops.painn_pallas import STACK_MAX_N
                stackable = True
            else:
                from geossl_tpu.models.schnet import fused_stack_apply
                from geossl_tpu.ops.cfconv_pallas import STACK_MAX_N
                # the stack kernel keeps h resident at ONE width: rectangular
                # filter configs fall back to the per-block path
                stackable = (self.module.filter_mxu == "f32"
                             and self.module.num_filters
                             == self.module.hidden_channels)
            if stackable:
                def fwd_apply(p, z, pos, mask, _orig=self.backbone_apply,
                              _stack=fused_stack_apply, _max=STACK_MAX_N):
                    if pos.shape[1] <= _max:
                        return _stack(self.module, p, z, pos, mask)
                    return _orig(p, z, pos, mask)

        @jax.jit
        def _embed(backbone, atom_type, positions, node_mask):
            graph, _ = fwd_apply(
                backbone, atom_type, positions, node_mask)
            return graph

        @jax.jit
        def _predict(p, atom_type, positions, node_mask):
            graph, _ = fwd_apply(
                p["model"], atom_type, positions, node_mask)
            pred = head.apply({"params": p["graph_pred_linear"]}, graph)
            return pred * self.y_std + self.y_mean

        @jax.jit
        def _energy_forces(p, atom_type, positions, node_mask):
            def energy_sum(pos):
                graph, _ = self.backbone_apply(
                    p["model"], atom_type, pos, node_mask)
                e = head.apply({"params": p["graph_pred_linear"]}, graph)
                e = e * self.y_std + self.y_mean
                return jnp.sum(e), e

            grads, e = jax.grad(energy_sum, has_aux=True)(positions)
            return e, -grads  # force = -∂E/∂pos (finetune_md17.py:46)

        @jax.jit
        def _pair_logit(p, za, pa, ma, zi, pi, mi):
            ga, _ = fwd_apply(p["model"], za, pa, ma)
            gi, _ = fwd_apply(p["model"], zi, pi, mi)
            return dual_head.apply({"params": p["graph_pred_linear"]}, ga, gi)

        self._embed_fn = _embed
        self._predict_fn = _predict
        self._energy_forces_fn = _energy_forces
        self._pair_logit_fn = _pair_logit

    # -- construction -------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[ModelConfig] = None,
                        **kw) -> "Predictor":
        """Load ``model[_final].ckpt`` (msgpack) or a reference torch
        ``.pth``/``.pt`` (``utils/torch_import``, detected by extension —
        backbone-only: the torch contract carries no head)."""
        cfg = cfg or ModelConfig(use_pallas=jax.default_backend() == "tpu")
        if path.endswith((".pth", ".pt")):
            from geossl_tpu.utils.torch_import import load_torch_checkpoint

            params = load_torch_checkpoint(path)
        else:
            params = checkpoints.load_checkpoint(path)
        return cls(cfg, params, **kw)

    # -- internals ------------------------------------------------------------

    def _maybe_sort(self, store: MolStore) -> MolStore:
        if self.spatial_sort == "off" or len(store) == 0:
            return store
        if self.spatial_sort == "auto" and int(store.num_atoms().max()) < 128:
            return store
        from geossl_tpu.data.transforms import spatial_sort_store

        return spatial_sort_store(store)

    def _pack(self, store: MolStore, chunk, n_max: int) -> DenseMolBatch:
        """Pack one chunk through the C++ runtime when available (2.87M
        mol/s vs 194k NumPy — docs/PERF.md), same as the training loader."""
        if self._native is not None:
            at, pos, nm, gm, y = self._native.pack_batch_from_store(
                store, chunk, n_max, self.batch_size)
            return DenseMolBatch(atom_type=at, positions=pos,
                                 node_mask=nm, y=y, graph_mask=gm)
        records = [store.get(int(i)) for i in chunk]
        return pack_batch(records, n_max, self.batch_size)

    def _batches(self, store: MolStore):
        """Yield (indices, DenseMolBatch); shapes static per bucket."""
        bucket_of = assign_buckets(store.num_atoms(), self.bucket_sizes)
        for b in np.unique(bucket_of):
            idx = np.nonzero(bucket_of == b)[0]
            for chunk in _chunks(idx, self.batch_size):
                yield chunk, self._shard(self._pack(store, chunk, int(b)))

    def _shard(self, batch):
        if self.mesh is None:
            return batch
        from geossl_tpu.parallel import mesh as pmesh

        return pmesh.shard_batch(self.mesh, batch)

    def _require_head(self):
        if self._head_params is None:
            raise ValueError(
                "checkpoint has no 'graph_pred_linear' head — this is a "
                "pretrain (backbone-only) checkpoint; use embed(), or load "
                "a fine-tune checkpoint for predict()")

    # -- public API ------------------------------------------------------------

    def embed(self, store: MolStore) -> np.ndarray:
        """Pooled graph representations, [M, emb], input order."""
        store = self._maybe_sort(store)
        out = np.zeros((len(store), self.cfg.emb_dim), np.float32)
        pending = [
            (idx, self._embed_fn(self.params["model"], batch.atom_type,
                                 batch.positions, batch.node_mask))
            for idx, batch in self._batches(store)
        ]
        for (idx, _), g in zip(pending, self._gather(pending)):
            out[idx] = g[: len(idx)]
        return out

    def _gather(self, pending):
        """One overlapped host fetch for a whole prediction pass. Dispatches
        are async (JAX queues them), but a per-batch ``np.asarray``
        serializes a device->host round-trip into the loop — measured 8-10x
        slower through the remote-TPU tunnel. ``jax.device_get`` starts the
        host copies for every leaf before waiting on any (73 ms for 96
        leaves vs ~4 s looped), and unlike a device-side concat it compiles
        nothing — request sizes can vary freely (docs/PERF.md)."""
        return jax.device_get([p for _, p in pending])

    def predict(self, store: MolStore) -> np.ndarray:
        """Scalar predictions (denormalized), [M], input order."""
        self._require_head()
        store = self._maybe_sort(store)
        out = np.zeros((len(store),), np.float32)
        pending = [
            (idx, self._predict_fn(self.params, batch.atom_type,
                                   batch.positions, batch.node_mask))
            for idx, batch in self._batches(store)
        ]
        for (idx, _), p in zip(pending, self._gather(pending)):
            out[idx] = p[: len(idx)]
        return out

    def predict_forces(self, store: MolStore):
        """(energy [M], forces [sum_N, 3]) via ``-∂E/∂pos`` (MD17 path).
        Atom order is preserved (no spatial sort) so ``forces`` aligns with
        the store's flat atom layout."""
        self._require_head()
        energies = np.zeros((len(store),), np.float32)
        forces = np.zeros((int(store.offsets[-1]), 3), np.float32)
        pending = []
        for idx, batch in self._batches(store):
            e, f = self._energy_forces_fn(
                self.params, batch.atom_type, batch.positions,
                batch.node_mask)
            pending.extend([(idx, e), (idx, f)])
        fetched = self._gather(pending)
        for k in range(0, len(pending), 2):
            idx, (e, f) = pending[k][0], (fetched[k], fetched[k + 1])
            energies[idx] = e[: len(idx)]
            for row, i in enumerate(idx):
                s, t = store.offsets[i], store.offsets[i + 1]
                forces[s:t] = f[row, : t - s]
        return energies, forces

    def predict_pairs(self, active: MolStore, inactive: MolStore) -> np.ndarray:
        """LEP dual-tower probabilities, [M], input order. The stores must be
        index-aligned (pair i = active[i] vs inactive[i])."""
        self._require_head()
        if len(active) != len(inactive):
            raise ValueError(f"store lengths differ: "
                             f"{len(active)} vs {len(inactive)}")
        active = self._maybe_sort(active)
        inactive = self._maybe_sort(inactive)
        na = assign_buckets(active.num_atoms(), self.bucket_sizes)
        ni = assign_buckets(inactive.num_atoms(), self.bucket_sizes)
        out = np.zeros((len(active),), np.float32)
        # group by the (bucket_active, bucket_inactive) shape pair
        keys = na.astype(np.int64) * (max(self.bucket_sizes) + 1) + ni
        pending = []
        for k in np.unique(keys):
            idx = np.nonzero(keys == k)[0]
            for chunk in _chunks(idx, self.batch_size):
                ba = self._shard(self._pack(active, chunk, int(na[chunk[0]])))
                bi = self._shard(self._pack(inactive, chunk,
                                            int(ni[chunk[0]])))
                pending.append((chunk, self._pair_logit_fn(
                    self.params, ba.atom_type, ba.positions, ba.node_mask,
                    bi.atom_type, bi.positions, bi.node_mask)))
        for (chunk, _), logit in zip(pending, self._gather(pending)):
            out[chunk] = 1.0 / (1.0 + np.exp(-logit[: len(chunk)]))
        return out


# -- CLI -----------------------------------------------------------------------


def store_from_sdf(path: str) -> MolStore:
    """Featurize a multi-molecule SDF file into a MolStore (RDKit when
    available, else the dependency-free parser — ``data/molecule3d.py``).
    Unparseable blocks raise: serving input, unlike a corpus build, should
    not silently drop molecules (prediction i must mean input i)."""
    from geossl_tpu.data.molecule3d import _iter_mol_arrays

    records = []
    for i, arrays in enumerate(_iter_mol_arrays(path)):
        if arrays is None:
            raise ValueError(f"unparseable SDF block #{i} in {path}")
        records.append(MolRecord(
            atom_type=arrays["atom_type"],
            positions=arrays["positions"],
            chirality=arrays.get("chirality"),
            bond_index=arrays.get("bond_index"),
        ))
    return MolStore.from_records(records)


def load_input_store(path: str) -> MolStore:
    """An ``.npz`` MolStore cache, or a raw ``.sdf`` file."""
    if path.endswith(".npz"):
        return MolStore.load(path)
    if path.endswith(".sdf"):
        return store_from_sdf(path)
    raise ValueError(f"unsupported input {path!r} (want .npz or .sdf)")


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="model[_final].ckpt (msgpack) or reference .pth")
    p.add_argument("--input", required=True, help=".npz MolStore or .sdf")
    p.add_argument("--input_inactive", default=None,
                   help="second (inactive-conformation) store for "
                        "--mode pairs — LEP dual-tower serving")
    p.add_argument("--output", default="-", help="CSV path or - for stdout")
    p.add_argument("--model_3d", default="schnet", choices=["schnet", "painn"])
    p.add_argument("--mode", default="predict",
                   choices=["predict", "embed", "forces", "pairs"])
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--bucket", type=int, nargs="+",
                   default=[32, 64, 128, 256, 512],
                   help="pad-bucket ladder; extend it (e.g. ... 1024) for "
                        "inputs above 512 atoms")
    p.add_argument("--spatial_sort", default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--num_devices", type=int, default=None,
                   help="SPMD serving over a data mesh (default: one device)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.ckpt.endswith(".sealed"):
        # AOT artifact (geossl_tpu/export.py): programs + params + batching
        # metadata are all inside; the shape knobs come from the artifact.
        from geossl_tpu.export import SealedPredictor

        pred = SealedPredictor.load(args.ckpt)
    else:
        cfg = ModelConfig(model_3d=args.model_3d,
                          use_pallas=jax.default_backend() == "tpu")
        pred = Predictor.from_checkpoint(
            args.ckpt, cfg, batch_size=args.batch_size,
            bucket_sizes=args.bucket,
            spatial_sort=args.spatial_sort, num_devices=args.num_devices)
    store = load_input_store(args.input)
    if args.mode == "pairs" and not args.input_inactive:
        # Validate BEFORE opening --output: open(..., "w") truncates an
        # existing results file, which a usage error must never do.
        raise SystemExit("--mode pairs needs --input_inactive")
    out = sys.stdout if args.output == "-" else open(args.output, "w")
    try:
        if args.mode == "predict":
            for i, v in enumerate(pred.predict(store)):
                out.write(f"{i},{v}\n")
        elif args.mode == "pairs":
            inactive = load_input_store(args.input_inactive)
            for i, v in enumerate(pred.predict_pairs(store, inactive)):
                out.write(f"{i},{v}\n")
        elif args.mode == "embed":
            for i, row in enumerate(pred.embed(store)):
                out.write(",".join([str(i)] + [f"{v:.6g}" for v in row]) + "\n")
        else:
            e, f = pred.predict_forces(store)
            for i, v in enumerate(e):
                s, t = store.offsets[i], store.offsets[i + 1]
                fx = ";".join(f"{a:.6g},{b:.6g},{c:.6g}" for a, b, c in f[s:t])
                out.write(f"{i},{v},{fx}\n")
    finally:
        if out is not sys.stdout:
            out.close()


if __name__ == "__main__":
    main()
