"""Analytic FLOP accounting for MFU / roofline reporting.

Counts the arithmetic of the padded DENSE formulation — the model's math,
padding included. Since the occupancy-gated sparse tiles (kexp5) the chip
no longer executes all of it: empty pair tiles (out-of-cutoff + padding,
~45-70% at Atom3D density) skip their whole kernel body, and the symmetric
CFConv evaluates each unordered tile once. Two rates therefore exist and
both are reported (`docs/PERF.md`, bench rows):

* **dense-effective** (dense FLOPs / time): the speedup metric — what a
  dense implementation would have to sustain to match this wall-clock. MAY
  exceed the hardware peak; that is the point of skipping work.
* **executed** (dense FLOPs x :func:`executed_pair_fraction` / time): actual
  hardware utilization; never printed above 100% of peak.

Conventions:

* 1 MAC = 2 FLOP; elementwise transcendentals count 1 FLOP (they cost more
  VPU cycles than an add — the table reports them separately so the binding
  resource is visible).
* A training step is ``fwd + backward``, with backward = 2x the forward
  matmul work (dgrad + wgrad) and ~2x the elementwise work — the standard
  3x-forward convention, matching this codebase's kernels (the fused CFConv
  backward recomputes the forward filter chain once and runs 4 extra
  matmuls; 3x is accurate to ~10%).
* v5e peaks: 197 TFLOP/s bf16 MXU (the operative number — TPU matmuls
  default to bf16 operands with f32 accumulation), ~49 TFLOP/s for
  multi-pass f32 operands, and ~4-8 TOP/s-scale VPU elementwise.

Reference hot op being accounted: ``Geom3D/models/schnet.py:170-195`` (the
CFConv filter MLP — G·F + F² MACs per pair per block dominates everything).
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_PEAK_BF16 = 197e12  # FLOP/s, one chip
V5E_PEAK_F32 = 49e12


@dataclass
class FlopCount:
    matmul: float  # FLOPs through the MXU (2 * MACs)
    elementwise: float  # VPU FLOPs (muls/adds of pair-grid chains)
    transcendental: float  # exp/log/softplus/sigmoid element count

    @property
    def total(self) -> float:
        return self.matmul + self.elementwise + self.transcendental

    def scale(self, k: float) -> "FlopCount":
        return FlopCount(self.matmul * k, self.elementwise * k,
                         self.transcendental * k)

    def __add__(self, o: "FlopCount") -> "FlopCount":
        return FlopCount(self.matmul + o.matmul,
                         self.elementwise + o.elementwise,
                         self.transcendental + o.transcendental)


def schnet_forward(n: int, g: int = 51, f: int = 128, blocks: int = 6,
                   pair_frac: float = 1.0) -> FlopCount:
    """Per-graph forward FLOPs at padded size n (``models/schnet.py``).
    ``pair_frac`` scales the pair-grid terms to the EXECUTED fraction
    (:func:`executed_pair_fraction`); 1.0 counts the dense model."""
    pairs = n * n * pair_frac
    # per block: filter MLP (G->F, F->F) on every pair + lin1/lin2/post Dense
    mm = blocks * (2.0 * pairs * (g * f + f * f) + 3 * 2.0 * n * f * f)
    # final readout MLP (two Dense F->F; the hidden halving of the reference
    # head lives in the drivers' heads, not here)
    mm += 2 * 2.0 * n * f * f
    # RBF: diff, square, mul-coeff per (pair, G); envelope: 2 ops/pair;
    # message: w*env, w*x, sum over j (2 ops) per (pair, F)
    ew = blocks * (pairs * (3.0 * g + 2.0) + pairs * f * 4.0)
    # ssp in filter MLP hidden [pairs, F] + block activation [n, F]
    ts = blocks * (pairs * f + n * f) * 2.0  # softplus = exp + log1p
    return FlopCount(mm, ew, ts)


def painn_forward(n: int, r: int = 20, f: int = 128, blocks: int = 3,
                  pair_frac: float = 1.0) -> FlopCount:
    """Per-graph PaiNN forward (``models/painn.py``): message + mixing."""
    pairs = n * n * pair_frac
    # message: filter matmul R->3F per pair; q/mu reductions (q: 2F,
    # dmu_r: 3 channels * 3F, dmu_m: 3 channels * 3F per pair)
    mm = blocks * (2.0 * pairs * r * 3 * f)
    # per-node MLPs: interaction (F->F, F->3F), mixing (2F channel mix on 3
    # vector channels, F+F->F, F->3F)
    mm += blocks * 2.0 * n * (f * f + f * 3 * f + 3 * f * 2 * f + 2 * f * f + f * 3 * f)
    ew = blocks * pairs * (3.0 * r + 2.0 * f + 9.0 * f + 9.0 * f + 3 * f)
    ts = blocks * (pairs * r + 2.0 * n * f)  # rbf exp + silu-ish
    return FlopCount(mm, ew, ts)


def ncsn_head_forward(n: int, emb: int = 128) -> FlopCount:
    """NCSNv3 per-graph forward (``objectives/ncsn.py:140-148``)."""
    pairs = n * n
    mm = 2.0 * pairs * (emb + emb + emb * emb // 2 + emb // 2)
    mm += 2.0 * n * emb * emb  # per-node u Dense
    ew = pairs * (emb * 4.0 + 10.0)  # perturb/target/adds/relu masks
    ts = 0.0
    return FlopCount(mm, ew, ts)


def train_step(fwd: FlopCount) -> FlopCount:
    """fwd + backward ~= 3x forward (see module docstring)."""
    return fwd.scale(3.0)


def ddm_step(batch: int, n: int, g: int = 51, f: int = 128, blocks: int = 6,
             model: str = "schnet") -> FlopCount:
    """Full DDM training step: two backbone views + two NCSN heads, backward
    through everything (``train/pretrain_geossl.py`` loss_fn)."""
    bb = (schnet_forward(n, g, f, blocks) if model == "schnet"
          else painn_forward(n, f=f))
    per_graph = train_step(bb.scale(2.0) + ncsn_head_forward(n, f).scale(2.0))
    return per_graph.scale(batch)


def finetune_step(batch: int, n: int, model: str = "schnet",
                  forces: bool = False, pair_frac: float = 1.0) -> FlopCount:
    """Regression fine-tune step (linear head ~free). MD17's force loss
    differentiates an inner gradient: approximately doubles the work again
    (inner grad ~= 2x fwd, outer backward over that ~= 2x more)."""
    bb = (schnet_forward(n, pair_frac=pair_frac) if model == "schnet"
          else painn_forward(n, pair_frac=pair_frac))
    per = train_step(bb)
    if forces:
        per = per.scale(2.0)
    return per.scale(batch)


def mfu(flops_per_step: float, step_seconds: float,
        peak: float = V5E_PEAK_BF16) -> tuple[float, float]:
    """Returns (achieved TFLOP/s, fraction of peak)."""
    achieved = flops_per_step / step_seconds
    return achieved / 1e12, achieved / peak


def executed_pair_fraction(env, model: str = "schnet",
                           symmetric: bool = True) -> float:
    """Fraction of the dense pair-grid FLOPs the gated kernels EXECUTE.

    ``env``: [B, N, N] array, nonzero exactly where a pair is live (inside
    cutoff x valid) — the same gate the kernels build their occupancy flags
    from (``ops/pallas_utils.tile_occupancy``). Uses each model's own
    forward tile geometry:

    * ``schnet``: the symmetric kernel's band grid (``sym_grid_info``),
      gated on ``symmetric`` — pass ``module.max_neighbors is None``: a
      max_neighbors-truncated adjacency is not symmetric, so cfconv
      dispatches the plain kernel and no band tiles are skipped —
      a tile executes iff it is not fully below the diagonal band AND its
      occupancy flag is set; each executed off-diagonal tile serves its
      mirror, so dividing executed tiles by the FULL grid also accounts for
      the 2x symmetric saving. Falls back to plain occupancy when the
      symmetric variant is unprofitable at this N (single-tile grids).
    * ``painn``: plain occupancy gating at the PaiNN message-kernel tiles.

    Approximation: the backward kernels re-derive the same flags at a
    possibly smaller batch block (their VMEM budget halves bb), which can
    only LOWER true executed work — this estimate errs high by a few %,
    i.e. utilization derived from it is an upper bound that still stays
    honest (<= 100%). Per-node FLOPs are never gated; callers scale only
    the pair terms (the ``pair_frac`` arguments below).
    """
    import numpy as np

    from geossl_tpu.ops.cfconv_pallas import _batch_block
    from geossl_tpu.ops.pallas_utils import (
        pair_tiles,
        sparse_auto,
        sym_grid_info,
        tile_occupancy,
    )

    env = np.asarray(env)
    b, n, _ = env.shape
    gated = sparse_auto(n, "auto")  # drivers/bench run the auto policy
    if model == "schnet":
        ti, tj, n_skipped = sym_grid_info(n)
        # mirrors the ops.cfconv_pallas dispatch: symmetric kernel only when
        # the adjacency is symmetric AND sym_profitable
        sym = symmetric and n_skipped > 0
        bb = _batch_block(b, ti, tj, budget=8192)
    else:
        from geossl_tpu.ops.painn_pallas import _PAINN_BUDGET

        ti, tj = pair_tiles(n, _PAINN_BUDGET)
        sym = False
        bb = _batch_block(b, ti, tj, budget=4096)
    if not gated and not sym:
        return 1.0  # single-tile grids run dense: every FLOP executes
    nti, ntj = n // ti, n // tj
    if gated:
        flags = np.asarray(tile_occupancy(env, bb, ti, tj)).reshape(
            b // bb, nti, ntj).astype(bool)
    else:  # symmetric band-skipping only; no occupancy flags
        flags = np.ones((b // bb, nti, ntj), bool)
    if sym:
        ii, jj = np.meshgrid(np.arange(nti), np.arange(ntj), indexing="ij")
        in_band = (jj + 1) * tj > ii * ti  # not fully below the diagonal
        flags = flags & in_band[None]
    executed = flags.sum() * bb * ti * tj
    return float(executed) / float(b * n * n)
