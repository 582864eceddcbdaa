"""Fused Pallas kernel for the NCSN_version_03 score-matching head (DDM).

Computes the whole per-pair chain of ``NCSN.py:183-212`` in VMEM per
(batch-block, i-tile, j-tile) — perturbed distance, the 1→emb→1 distance
MLP, the factored output MLP's first layer (per-node projections ``u`` enter
as input), the two remaining MLP layers, the score/target residual and the
annealed squared loss — and emits per-row loss sums ``[B, N]``. The XLA
path materializes ``[B,N,N,emb]`` activations twice (forward) plus their
backward counterparts; here HBM sees only the ``[B,N,N]`` geometry/noise
grids.

Each program processes ``bb`` batch rows (graphs): per-graph tiles are tiny
(32×32 at the DDM protocol) and a (B, 1, 1) grid spends the step on
per-program overhead. ``bb`` is VMEM-budgeted per kernel. The per-graph σ
enters as a [B, 128] broadcast strip in VMEM (a [B, 1] block is not a legal
Mosaic block shape, and SMEM windows pad rows to 128 lanes anyway).

Gradients flow to the node projections ``u`` (→ backbone) and every head
weight; distances/noise/σ are data (no cotangents needed). ``du`` needs both
i- and j-side accumulation: the i-side accumulates over the innermost j axis;
the j-side is emitted as per-i-tile partial sums ``[B, nI, N, emb]`` and
reduced in XLA (nI ≤ 16 tiles).

Mosaic layout rules observed throughout: column weights (emb, 1) travel
PRE-TRANSPOSED as (1, emb); no 1-D intermediates (keepdims reductions only);
matvec-shaped layers are broadcast+lane-reduce in (·, ti, tj, ·) layout (a
[R, 1] → [ti, tj] shape cast is lane↔sublane and unsupported); collapse /
expand MAJOR dims only.

First-order AD only (DDM needs nothing more).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from geossl_tpu.ops.cfconv_pallas import _batch_block
from geossl_tpu.ops.pallas_utils import interpret as _interpret
from geossl_tpu.ops.pallas_utils import pair_tiles


def _tile_forward(dist_ref, noise_ref, ui_ref, uj_ref, sig3, params, bb, ti, tj):
    """Per-block forward; returns intermediates shared with the backward.

    ``sig3`` is [bb, 1, 1]; ``w_d2t``/``w3t`` arrive transposed as (1, emb)."""
    (w_d1, b_d1, w_d2t, b_d2, w_od, b_od, w2, b2, w3t, b3) = params
    dp = dist_ref[...] + noise_ref[...] * sig3  # [bb, ti, tj]
    # distance MLP: relu(dp*w_d1 + b_d1) . w_d2 + b_d2 -> demb [bb, ti, tj]
    pre_d = dp[..., None] * w_d1[...][None, None] + b_d1[...][None, None]
    t1_4 = jax.nn.relu(pre_d)  # [bb, ti, tj, emb]
    demb = jnp.sum(t1_4 * w_d2t[...][None, None], axis=3) + b_d2[0, 0]
    # first output layer (factored): relu(u_i + u_j + demb*w_od + b_od)
    dterm = demb[..., None] * w_od[...][None, None] + b_od[...][None, None]
    pre1 = ui_ref[...][:, :, None, :] + uj_ref[...][:, None, :, :] + dterm
    l1 = jax.nn.relu(pre1).reshape(bb * ti * tj, -1)  # [R, emb]
    pre2 = jnp.dot(l1, w2[...], preferred_element_type=jnp.float32) + b2[0]
    x2 = jax.nn.relu(pre2)  # [R, emb2]
    x2_4 = x2.reshape(bb, ti, tj, -1)
    score_raw = jnp.sum(x2_4 * w3t[...][None, None], axis=3) + b3[0, 0]
    return dp, t1_4, demb, pre1, l1, pre2, x2_4, score_raw


def _fwd_kernel(dist_ref, noise_ref, sel_ref, sig_ref, ui_ref, uj_ref,
                w_d1, b_d1, w_d2t, b_d2, w_od, b_od, w2, b2, w3t, b3,
                rows_ref, *, anneal, bb, ti, tj):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        rows_ref[...] = jnp.zeros_like(rows_ref)

    # every (8, 128) tile holds sigma; reduce instead of slicing
    # (Mosaic rejects value lane slices)
    sig3 = jnp.max(jnp.max(sig_ref[...], axis=2), axis=1)[:, None, None]
    params = (w_d1, b_d1, w_d2t, b_d2, w_od, b_od, w2, b2, w3t, b3)
    _, _, _, _, _, _, _, score_raw = _tile_forward(
        dist_ref, noise_ref, ui_ref, uj_ref, sig3, params, bb, ti, tj
    )
    score = score_raw / sig3
    target = -noise_ref[...] / sig3
    w_sig = jnp.exp(anneal * jnp.log(sig3))
    per = 0.5 * (score - target) ** 2 * w_sig * sel_ref[...]
    rows_ref[...] += jnp.sum(per, axis=2, keepdims=True)


def _weight_specs(shapes):
    return [pl.BlockSpec(s, lambda b, i, j: tuple(0 for _ in s)) for s in shapes]


def _prep_weights(w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3):
    """Column weights (emb, 1) travel transposed; 1-D biases as (1, X)."""
    return (
        w_d1, b_d1[None], w_d2.T, b_d2[None, :], w_od, b_od[None],
        w2, b2[None], w3.T, b3[None, :],
    )


def _sig_strip(sigma):
    """[B, 1] per-graph sigma -> [B, 8, 128] VMEM strip: a (bb, 128) block
    would need bb to be a multiple of 8; a trailing (8, 128) tile is always
    legal and costs 4 KB/graph."""
    return jnp.broadcast_to(sigma.reshape(-1, 1, 1), (sigma.shape[0], 8, 128))


def _fwd_pallas(dist, noise, sel, sigma, u,
                w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3, anneal):
    b, n, _ = dist.shape
    emb = u.shape[-1]
    ti, tj = pair_tiles(n, 2048)
    bb = _batch_block(b, ti, tj, budget=4096)
    weights = _prep_weights(w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3)
    pair = pl.BlockSpec((bb, ti, tj), lambda b, i, j: (b, i, j))
    kernel = partial(_fwd_kernel, anneal=anneal, bb=bb, ti=ti, tj=tj)
    rows = pl.pallas_call(
        kernel,
        grid=(b // bb, n // ti, n // tj),
        in_specs=[
            pair, pair, pair,
            pl.BlockSpec((bb, 8, 128), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((bb, ti, emb), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((bb, tj, emb), lambda b, i, j: (b, j, 0)),
            *_weight_specs([w.shape for w in weights]),
        ],
        out_specs=pl.BlockSpec((bb, ti, 1), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        interpret=_interpret(),
    )(dist, noise, sel, _sig_strip(sigma), u, u, *weights)
    return rows[..., 0]


def _bwd_kernel(dist_ref, noise_ref, sel_ref, sig_ref, ui_ref, uj_ref, g_ref,
                w_d1, b_d1, w_d2t, b_d2, w_od, b_od, w2, b2, w3t, b3,
                dui_ref, duj_ref, dw_d1_ref, db_d1_ref, dw_d2t_ref, db_d2_ref,
                dw_od_ref, db_od_ref, dw2_ref, db2_ref, dw3t_ref, db3_ref,
                *, anneal, bb, ti, tj):
    bi, ii, jj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(jj == 0)
    def _():
        dui_ref[...] = jnp.zeros_like(dui_ref)

    @pl.when((bi == 0) & (ii == 0) & (jj == 0))
    def _():
        for r in (dw_d1_ref, db_d1_ref, dw_d2t_ref, db_d2_ref, dw_od_ref,
                  db_od_ref, dw2_ref, db2_ref, dw3t_ref, db3_ref):
            r[...] = jnp.zeros_like(r)

    # every (8, 128) tile holds sigma; reduce instead of slicing
    # (Mosaic rejects value lane slices)
    sig3 = jnp.max(jnp.max(sig_ref[...], axis=2), axis=1)[:, None, None]
    params = (w_d1, b_d1, w_d2t, b_d2, w_od, b_od, w2, b2, w3t, b3)
    dp, t1_4, demb, pre1, l1, pre2, x2_4, score_raw = _tile_forward(
        dist_ref, noise_ref, ui_ref, uj_ref, sig3, params, bb, ti, tj
    )
    score = score_raw / sig3
    target = -noise_ref[...] / sig3
    w_sig = jnp.exp(anneal * jnp.log(sig3))
    # d(loss_rows[b,i]) / d(score[b,i,j]) = g[b,i] * (score-target) * wσ * sel
    g_i = g_ref[...]  # [bb, ti, 1]
    dscore = (score - target) * (w_sig * g_i) * sel_ref[...]
    ds = dscore / sig3  # [bb, ti, tj]
    ds4 = ds[..., None]

    def reduce_rows(x4):  # [bb, ti, tj, X] -> (1, X), 2D-safe reductions
        return jnp.sum(x4.reshape(bb * ti * tj, x4.shape[-1]), axis=0,
                       keepdims=True)

    dw3t_ref[...] += reduce_rows(x2_4 * ds4)
    # lane-reduce tj first: reshaping [bb,ti,tj] to [R,1] would be a
    # lane->sublane reshape (illegal on Mosaic)
    ds_rows = jnp.sum(ds, axis=2, keepdims=True).reshape(bb * ti, 1)
    db3_ref[...] += jnp.sum(ds_rows, axis=0, keepdims=True)
    dx2_4 = ds4 * w3t[...][None, None] * (x2_4 > 0).astype(jnp.float32)
    dx2 = dx2_4.reshape(bb * ti * tj, -1)
    dw2_ref[...] += jnp.dot(l1.T, dx2, preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dx2, axis=0, keepdims=True)
    dl1 = jnp.dot(dx2, w2[...].T, preferred_element_type=jnp.float32)
    dl1 = dl1 * (pre1.reshape(bb * ti * tj, -1) > 0).astype(jnp.float32)
    dl1_4 = dl1.reshape(bb, ti, tj, -1)
    dui_ref[...] += jnp.sum(dl1_4, axis=2)  # accumulate over j (innermost)
    duj_ref[:, 0] = jnp.sum(dl1_4, axis=1)  # per-(i-tile) partial, XLA-summed

    ddterm4 = dl1_4  # pre1 = u_i + u_j + dterm
    dw_od_ref[...] += reduce_rows(ddterm4 * demb[..., None])
    db_od_ref[...] += jnp.sum(dl1, axis=0, keepdims=True)
    ddemb = jnp.sum(ddterm4 * w_od[...][None, None], axis=3)  # [bb, ti, tj]
    dw_d2t_ref[...] += reduce_rows(t1_4 * ddemb[..., None])
    ddemb_rows = jnp.sum(ddemb, axis=2, keepdims=True).reshape(bb * ti, 1)
    db_d2_ref[...] += jnp.sum(ddemb_rows, axis=0, keepdims=True)
    dt1_4 = ddemb[..., None] * w_d2t[...][None, None]
    dt1_4 = dt1_4 * (t1_4 > 0).astype(jnp.float32)
    dw_d1_ref[...] += reduce_rows(dt1_4 * dp[..., None])
    db_d1_ref[...] += reduce_rows(dt1_4)


def _bwd_pallas(dist, noise, sel, sigma, u, g_rows,
                w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3, anneal):
    b, n, _ = dist.shape
    emb = u.shape[-1]
    ti, tj = pair_tiles(n, 2048)
    # the backward keeps ~2x the forward's [bb*ti*tj, emb] tensors live
    bb = _batch_block(b, ti, tj, budget=2048)
    n_it = n // ti
    weights = _prep_weights(w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3)
    pair = pl.BlockSpec((bb, ti, tj), lambda b, i, j: (b, i, j))
    acc = lambda s: pl.BlockSpec(s, lambda b, i, j: tuple(0 for _ in s))
    kernel = partial(_bwd_kernel, anneal=anneal, bb=bb, ti=ti, tj=tj)
    wshapes = [w.shape for w in weights]
    outs = pl.pallas_call(
        kernel,
        grid=(b // bb, n_it, n // tj),
        in_specs=[
            pair, pair, pair,
            pl.BlockSpec((bb, 8, 128), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((bb, ti, emb), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((bb, tj, emb), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((bb, ti, 1), lambda b, i, j: (b, i, 0)),
            *_weight_specs(wshapes),
        ],
        out_specs=[
            pl.BlockSpec((bb, ti, emb), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((bb, 1, tj, emb), lambda b, i, j: (b, i, j, 0)),
            *[acc(s) for s in wshapes],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, emb), jnp.float32),  # du_i
            jax.ShapeDtypeStruct((b, n_it, n, emb), jnp.float32),  # du_j parts
            *[jax.ShapeDtypeStruct(s, jnp.float32) for s in wshapes],
        ],
        interpret=_interpret(),
    )(dist, noise, sel, _sig_strip(sigma), u, u, g_rows[..., None], *weights)
    du_i, du_j_part, *wg = outs
    du = du_i + jnp.sum(du_j_part, axis=1)
    (dw_d1, db_d1, dw_d2t, db_d2, dw_od, db_od, dw2, db2, dw3t, db3) = wg
    return (
        du, dw_d1, db_d1[0], dw_d2t.T, db_d2[0], dw_od, db_od[0],
        dw2, db2[0], dw3t.T, db3[0],
    )


@partial(jax.custom_vjp, nondiff_argnums=(15,))
def ncsn_score_loss(dist, noise, sel, sigma, u,
                    w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3,
                    anneal):
    """Per-row annealed score-matching loss sums [B, N] (see module doc)."""
    return _fwd_pallas(dist, noise, sel, sigma, u,
                       w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3,
                       anneal)


def _vjp_fwd(dist, noise, sel, sigma, u,
             w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3, anneal):
    out = _fwd_pallas(dist, noise, sel, sigma, u,
                      w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3,
                      anneal)
    return out, (dist, noise, sel, sigma, u,
                 w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3)


def _vjp_bwd(anneal, res, g_rows):
    (dist, noise, sel, sigma, u,
     w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3) = res
    grads = _bwd_pallas(dist, noise, sel, sigma, u, g_rows.astype(jnp.float32),
                        w_d1, b_d1, w_d2, b_d2, w_od, b_od, w2, b2, w3, b3,
                        anneal)
    du, *wg = grads
    zeros = lambda x: jnp.zeros_like(x)
    return (zeros(dist), zeros(noise), zeros(sel), zeros(sigma), du, *wg)


ncsn_score_loss.defvjp(_vjp_fwd, _vjp_bwd)
