"""Fused Pallas CFConv kernel — SchNet's hot op without HBM blowup.

The XLA path materializes the per-edge filter tensor ``[B, N, N, F]`` in HBM
three times per interaction block (filter-MLP layer 1 out, layer 2 out, and
the einsum read). This kernel fuses the whole chain

    m[b,i,f] = Σ_j env[b,i,j] · W2ᵀ(ssp(rbf(d[b,i,j])·W1 + b1)) [f] · x[b,j,f]

reading only ``dist/env [B,N,N]`` and ``x [B,N,F]`` from HBM and writing
``m [B,N,F]`` — per j-tile, the RBF expansion, both filter matmuls (MXU), the
envelope gate and the message reduction all stay in VMEM.

Gradients: a custom VJP with ONE backward kernel that recomputes the tile
forward and produces all cotangents — ``dx`` (accumulated over the innermost
i grid axis, like ``painn_pallas``), ``dW1/db1/dW2/db2`` (accumulated across
the sequential TPU grid) and ``ddist/denv`` (written per pair tile). An
earlier version computed ``dx`` with a second full forward-kernel launch per
block-backward (exploiting (i, j) symmetry); folding it into the backward
kernel is 15% faster on a 6-block chained grad step (interleaved A/B, v5e:
4.06 -> 3.44 ms) and took the full DDM train step from 9.7 to 8.1 ms.

Second-order AD (MD17 force training: the loss contains ``-∂E/∂pos`` and is
differentiated again w.r.t. parameters) IS supported: the backward kernel is
itself wrapped in a custom VJP whose derivative is taken through the pure-XLA
reference math (``cfconv_fused_reference``). First-order traffic — the hot
path everywhere — stays fully fused; only the double-backward terms
materialize ``[B,N,N,F]``, and MD17 runs at B=5, N≤32 where that is a few MB.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from geossl_tpu.ops.pallas_utils import interpret as _interpret
from geossl_tpu.ops.pallas_utils import (
    mirror_skipped_mask as _mirror_skipped_mask,
    occ_at,
    pair_pallas_call,
    pair_tiles,
    pair_tiles_rect,
    sparse_auto,
    sym_grid_info,
    tile_occupancy,
    unplace_pair_cotangent,
)


LOG2 = math.log(2.0)


def _ssp(x):
    return jax.nn.softplus(x) - LOG2


def _dot(a, b, mxu):
    """MXU matmul with f32 accumulation; mxu='bf16' feeds the systolic array
    bf16 operands (full-rate) instead of multi-pass f32."""
    if mxu == "bf16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# per-pair-tile row budget (ti*tj cells); module-level so experiments can
# sweep the tile height (kexp7) — 4096 -> (32,128) tiles at N=512
_ROW_BUDGET = 4096


def _offsets(start, delta, num_g):
    # computed in-kernel (pallas kernels may not capture array constants)
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, num_g), 1).astype(jnp.float32)
    return start + delta * ids


def _rbf_4d(d3, offsets, coeff, bb, ti, tj, num_g):
    # d3 [bb, ti, tj] -> rbf [bb*ti*tj, num_g]. Mosaic supports broadcast
    # into a new minor dim and collapsing MAJOR dims, but not lane->sublane
    # reshapes — so expand to [bb, ti, tj, G] then collapse the major dims.
    diff = d3[:, :, :, None] - offsets.reshape(1, 1, 1, num_g)
    rbf4 = jnp.exp(coeff * diff * diff)
    return rbf4.reshape(bb * ti * tj, num_g)


from geossl_tpu.ops.pallas_utils import batch_block as _batch_block  # noqa: E402


def _fwd_kernel(*refs, start, delta, num_g, coeff, bb, ti, tj, mxu, sparse):
    if sparse:
        occ_ref, *refs = refs
    (dist_ref, env_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     out_ref) = refs
    offsets = _offsets(start, delta, num_g)
    bi, ii, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body():
        rbf = _rbf_4d(dist_ref[...], offsets, coeff, bb, ti, tj, num_g)
        h = _dot(rbf, w1_ref[...], mxu) + b1_ref[0]
        h = _ssp(h)
        w = _dot(h, w2_ref[...], mxu) + b2_ref[0]
        w = w.reshape(bb, ti, tj, -1) * env_ref[...][:, :, :, None]
        out_ref[...] += jnp.sum(w * x_ref[...][:, None, :, :], axis=2)

    if sparse:
        pl.when(occ_at(occ_ref, bi, ii, j, pl.num_programs(1),
                       pl.num_programs(2)) != 0)(body)
    else:
        body()


def _fwd_pallas(dist, env, x, w1, b1, w2, b2, start, stop, num_g, mxu="f32",
                sparse=False):
    b, ni, nj = dist.shape
    f = x.shape[-1]
    ti, tj = pair_tiles_rect(ni, nj, _ROW_BUDGET)
    bb = _batch_block(b, ti, tj, budget=8192)
    delta = (stop - start) / (num_g - 1)
    coeff = -0.5 / delta**2
    grid = (b // bb, ni // ti, nj // tj)
    kernel = partial(_fwd_kernel, start=start, delta=delta, num_g=num_g,
                     coeff=coeff, bb=bb, ti=ti, tj=tj, mxu=mxu, sparse=sparse)
    return pair_pallas_call(
        kernel,
        grid,
        in_specs=[
            pl.BlockSpec((bb, ti, tj), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((bb, ti, tj), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((bb, tj, f), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec(w1.shape, lambda b, i, j: (0, 0)),
            pl.BlockSpec((1,) + b1.shape, lambda b, i, j: (0, 0)),
            pl.BlockSpec(w2.shape, lambda b, i, j: (0, 0)),
            pl.BlockSpec((1,) + b2.shape, lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, ti, f), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ni, f), jnp.float32),
        args=(dist, env, x, w1, b1[None], w2, b2[None]),
        occ=tile_occupancy(env, bb, ti, tj) if sparse else None,
        interpret=_interpret(),
    )


def _bwd_kernel(*refs, start, delta, num_g, coeff, bb, ti, tj, mxu, sparse):
    # grid = (b, j_tile, i_tile): i innermost so the j-indexed dx output
    # accumulates over consecutive grid steps (same pattern as painn_pallas)
    if sparse:
        occ_ref, *refs = refs
    (dist_ref, env_ref, x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     ddist_ref, denv_ref, dx_ref, dw1_ref, db1_ref, dw2_ref,
     db2_ref) = refs
    offsets = _offsets(start, delta, num_g)
    bi, jj, ii = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ii == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when((bi == 0) & (ii == 0) & (jj == 0))
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    def body():
        d3 = dist_ref[...]  # [bb, ti, tj]
        env4 = env_ref[...][:, :, :, None]  # [bb, ti, tj, 1]
        rbf = _rbf_4d(d3, offsets, coeff, bb, ti, tj, num_g)
        pre1 = _dot(rbf, w1_ref[...], mxu) + b1_ref[0]
        s = _ssp(pre1)
        w_raw = _dot(s, w2_ref[...], mxu) + b2_ref[0]

        # q[b,i,j,f] = g[b,i,f] * x[b,j,f]
        f = x_ref.shape[-1]
        w4 = w_raw.reshape(bb, ti, tj, f)
        g4 = g_ref[...][:, :, None, :]  # [bb, ti, 1, F]
        q4 = g4 * x_ref[...][:, None, :, :]  # [bb,ti,tj,F]
        denv_ref[...] = jnp.sum(w4 * q4, axis=3)
        # dx[b,j,f] = Σ_i env[i,j]·W[i,j,f]·g[i,f] — this tile already
        # recomputed W, so emitting dx here replaces a second full
        # forward-kernel launch
        dx_ref[...] += jnp.sum(w4 * env4 * g4, axis=1)
        qe = (q4 * env4).reshape(bb * ti * tj, f)

        dw2_ref[...] += _dot(s.T, qe, mxu)
        db2_ref[0] += jnp.sum(qe, axis=0)
        dh = _dot(qe, w2_ref[...].T, mxu)
        dh = dh * jax.nn.sigmoid(pre1)  # ssp' = sigmoid
        dw1_ref[...] += _dot(rbf.T, dh, mxu)
        db1_ref[0] += jnp.sum(dh, axis=0)
        # ddist via the RBF chain rule: drbf/dd = rbf * 2*coeff*(d - off)
        drbf = _dot(dh, w1_ref[...].T, mxu)
        diff4 = d3[:, :, :, None] - offsets.reshape(1, 1, 1, num_g)
        chain4 = drbf.reshape(bb, ti, tj, num_g) * jnp.exp(
            coeff * diff4 * diff4
        )
        ddist_ref[...] = jnp.sum(chain4 * (2.0 * coeff) * diff4, axis=3)

    if sparse:
        occupied = occ_at(occ_ref, bi, ii, jj, pl.num_programs(2),
                          pl.num_programs(1)) != 0
        pl.when(occupied)(body)

        @pl.when(jnp.logical_not(occupied))
        def _():
            # empty tile: ddist is exactly zero (every term carries an env
            # factor); denv is zeroed by the occupancy-skip contract
            # (pallas_utils.tile_occupancy docstring)
            ddist_ref[...] = jnp.zeros_like(ddist_ref)
            denv_ref[...] = jnp.zeros_like(denv_ref)
    else:
        body()


def _bwd_pallas(dist, env, x, g, w1, b1, w2, b2, start, stop, num_g,
                mxu="f32", sparse=False):
    b, ni, nj = dist.shape
    f = x.shape[-1]
    f1 = w1.shape[1]
    ti, tj = pair_tiles_rect(ni, nj, _ROW_BUDGET)
    # the backward keeps ~10 [bb*ti*tj, F] tensors live -> tighter bb budget
    # (bb=8 at N=32 measured 26 MB scoped VMEM vs the 16 MB limit)
    bb = _batch_block(b, ti, tj, budget=4096)
    delta = (stop - start) / (num_g - 1)
    coeff = -0.5 / delta**2
    # grid (b, jt, it): i innermost; pair blocks live at (i, j)
    grid = (b // bb, nj // tj, ni // ti)
    kernel = partial(_bwd_kernel, start=start, delta=delta, num_g=num_g,
                     coeff=coeff, bb=bb, ti=ti, tj=tj, mxu=mxu, sparse=sparse)
    pair = pl.BlockSpec((bb, ti, tj), lambda b, j, i: (b, i, j))
    acc = lambda shape: pl.BlockSpec(shape, lambda b, j, i: tuple(0 for _ in shape))
    return pair_pallas_call(
        kernel,
        grid,
        in_specs=[
            pair,
            pair,
            pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((bb, ti, f), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec(w1.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + b1.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + b2.shape, lambda b, j, i: (0, 0)),
        ],
        out_specs=[
            pair,
            pair,
            pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0)),
            acc((num_g, f1)),
            acc((1, f1)),
            acc((f1, f)),
            acc((1, f)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ni, nj), jnp.float32),  # ddist
            jax.ShapeDtypeStruct((b, ni, nj), jnp.float32),  # denv
            jax.ShapeDtypeStruct((b, nj, f), jnp.float32),  # dx
            jax.ShapeDtypeStruct((num_g, f1), jnp.float32),
            jax.ShapeDtypeStruct((1, f1), jnp.float32),
            jax.ShapeDtypeStruct((f1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        args=(dist, env, x, g, w1, b1[None], w2, b2[None]),
        occ=tile_occupancy(env, bb, ti, tj) if sparse else None,
        interpret=_interpret(),
    )


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def cfconv_fused(dist, env, x, w1, b1, w2, b2, start, stop, num_g, mxu="f32",
                 sparse=False):
    """Fused CFConv: see module docstring. All inputs f32; returns [B,N,F].
    ``mxu='bf16'`` runs the filter matmuls (fwd AND grad) with bf16 operands
    and f32 accumulation — full MXU rate, ~1e-3 relative drift.
    ``sparse=True`` skips pair tiles whose env block is all-zero (scalar-
    prefetched occupancy flags) — identical outputs; the denv cotangent is
    zeroed on skipped tiles (exact: env is identically zero there)."""
    return _fwd_pallas(dist, env, x, w1, b1, w2, b2, start, stop, num_g, mxu,
                       sparse)


def _vjp_fwd(dist, env, x, w1, b1, w2, b2, start, stop, num_g, mxu="f32",
             sparse=False):
    # call the custom-vjp op (not the raw kernel) so that differentiating the
    # saved forward — which second-order AD does — hits this VJP again
    # instead of pallas_call's missing JVP rule
    out = cfconv_fused(dist, env, x, w1, b1, w2, b2, start, stop, num_g, mxu,
                       sparse)
    return out, (dist, env, x, w1, b1, w2, b2)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _cfconv_bwd(dist, env, x, w1, b1, w2, b2, g, start, stop, num_g,
                mxu="f32", sparse=False):
    """Differentiable wrapper of the backward kernel: returns
    (ddist, denv, dx, dw1, db1, dw2, db2). Its own VJP (the second-order
    terms) runs through the XLA reference math."""
    ddist, denv, dx, dw1, db1, dw2, db2 = _bwd_pallas(
        dist, env, x, g, w1, b1, w2, b2, start, stop, num_g, mxu, sparse
    )
    return ddist, denv, dx, dw1, db1[0], dw2, db2[0]


def _cfconv_bwd_fwd(dist, env, x, w1, b1, w2, b2, g, start, stop, num_g,
                    mxu="f32", sparse=False):
    out = _cfconv_bwd(dist, env, x, w1, b1, w2, b2, g, start, stop, num_g,
                      mxu, sparse)
    return out, (dist, env, x, w1, b1, w2, b2, g)


def _cfconv_bwd_bwd(start, stop, num_g, mxu, sparse, res, cts):
    dist, env, x, w1, b1, w2, b2, g = res

    def ref_grads(dist, env, x, w1, b1, w2, b2, g):
        _, vjp = jax.vjp(
            lambda d, e, xx, a, ab, c, cb: cfconv_fused_reference(
                d, e, xx, a, ab, c, cb, start, stop, num_g, mxu
            ),
            dist, env, x, w1, b1, w2, b2,
        )
        return vjp(g)  # (ddist, denv, dx, dw1, db1, dw2, db2)

    _, vjp2 = jax.vjp(ref_grads, dist, env, x, w1, b1, w2, b2, g)
    return vjp2(tuple(cts))


_cfconv_bwd.defvjp(_cfconv_bwd_fwd, _cfconv_bwd_bwd)


def _vjp_bwd(start, stop, num_g, mxu, sparse, res, g):
    dist, env, x, w1, b1, w2, b2 = res
    return _cfconv_bwd(
        dist, env, x, w1, b1, w2, b2, g.astype(jnp.float32),
        start, stop, num_g, mxu, sparse,
    )


cfconv_fused.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Symmetric variant: dist/env are symmetric in SchNet (both derive from the
# same pairwise-distance matrix), so the gated filter W[i,j,:] == W[j,i,:].
# Tiles fully below the diagonal band are SKIPPED; each computed tile also
# emits the mirrored contributions of the skipped cells (per-cell masks make
# this exact for rectangular tilings). At N=512 that removes 37.5% of the
# filter-MLP work in both directions. Requirements and deltas vs the plain op:
#
# * dist and env MUST be symmetric in their last two axes (guaranteed when
#   they come from ``geometry.pairwise_distances`` + a symmetric adjacency).
# * The ddist/denv cotangents are returned SYMMETRIZED-BY-PLACEMENT: the
#   (i,j)+(j,i) mass of each skipped cell is placed on its computed mirror,
#   zeros on the skipped cell. Any downstream that treats dist/env as the
#   symmetric functions they are (e.g. the pullback through
#   pairwise_distances, where ∂dist[i,j]/∂pos == ∂dist[j,i]/∂pos) receives
#   identical gradients; per-cell equality with the reference does NOT hold.
#   Model-level gradients (params, positions) are exactly equal — tested.
# * Second-order AD routes through the reference math with the placement
#   operator's transpose applied to the incoming ddist/denv cotangents.
#
# ``sym_profitable(n)`` gates the dispatch: at N<=128 with the default tile
# budget no tile is skippable and the plain kernel is used.
# ---------------------------------------------------------------------------


def _sym_grid_info(n):
    return sym_grid_info(n, _ROW_BUDGET)


def sym_profitable(n: int) -> bool:
    """True when the symmetric kernel skips at least one tile."""
    return _sym_grid_info(n)[2] > 0


def _fwd_sym_kernel(*refs, start, delta, num_g, coeff, bb, ti, tj, mxu,
                    sparse):
    # grid = (b, j_tile, i_tile), i innermost. The j-indexed out2 block stays
    # resident across the inner loop (consecutive accumulation — Mosaic does
    # not support accumulating into a block that is left and revisited); the
    # i-indexed A contributions go to per-tile slots summed outside.
    if sparse:
        occ_ref, *refs = refs
    (dist_ref, env_ref, xj_ref, xi_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     out1_ref, out2_ref) = refs
    offsets = _offsets(start, delta, num_g)
    bi, jj, ii = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    skipped = (jj + 1) * tj <= ii * ti  # tile fully below the band
    if sparse:
        # empty tiles contribute nothing; their (symmetric) mirror tile is
        # equally empty, so no mirror emission is lost either
        skipped = skipped | (occ_at(occ_ref, bi, ii, jj,
                            pl.num_programs(2),
                            pl.num_programs(1)) == 0)

    @pl.when(ii == 0)
    def _():
        out2_ref[...] = jnp.zeros_like(out2_ref)

    @pl.when(skipped)
    def _():
        out1_ref[...] = jnp.zeros_like(out1_ref)

    @pl.when(jnp.logical_not(skipped))
    def _():
        rbf = _rbf_4d(dist_ref[...], offsets, coeff, bb, ti, tj, num_g)
        h = _ssp(_dot(rbf, w1_ref[...], mxu) + b1_ref[0])
        w = _dot(h, w2_ref[...], mxu) + b2_ref[0]
        w = w.reshape(bb, ti, tj, -1) * env_ref[...][:, :, :, None]
        # A: m[r] += Σ_c W·x_c — true per-cell values for every computed cell
        out1_ref[...] = jnp.sum(w * xj_ref[...][:, None, :, :], axis=2)[
            :, None, :, :
        ]
        # B: for cells whose mirror tile was skipped, emit the mirror's
        # message m[c] += W[r,c]·x_r (W symmetric)
        wb = w * _mirror_skipped_mask(ii * ti, jj * tj, ti, tj)
        out2_ref[...] += jnp.sum(wb * xi_ref[...][:, :, None, :], axis=1)


def _fwd_sym_pallas(dist, env, x, w1, b1, w2, b2, start, stop, num_g,
                    mxu="f32", sparse=False):
    b, n, _ = dist.shape
    f = x.shape[-1]
    ti, tj, _ = _sym_grid_info(n)
    bb = _batch_block(b, ti, tj, budget=8192)
    delta = (stop - start) / (num_g - 1)
    coeff = -0.5 / delta**2
    kernel = partial(_fwd_sym_kernel, start=start, delta=delta, num_g=num_g,
                     coeff=coeff, bb=bb, ti=ti, tj=tj, mxu=mxu, sparse=sparse)
    out1, out2 = pair_pallas_call(
        kernel,
        (b // bb, n // tj, n // ti),
        in_specs=[
            pl.BlockSpec((bb, ti, tj), lambda b, j, i: (b, i, j)),
            pl.BlockSpec((bb, ti, tj), lambda b, j, i: (b, i, j)),
            pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((bb, ti, f), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec(w1.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + b1.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + b2.shape, lambda b, j, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, 1, ti, f), lambda b, j, i: (b, j, i, 0)),
            pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n // tj, n, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        ],
        args=(dist, env, x, x, w1, b1[None], w2, b2[None]),
        occ=tile_occupancy(env, bb, ti, tj) if sparse else None,
        interpret=_interpret(),
    )
    return jnp.sum(out1, axis=1) + out2


def _bwd_sym_kernel(*refs, start, delta, num_g, coeff, bb, ti, tj, mxu,
                    sparse):
    # grid = (b, j_tile, i_tile), i innermost (dxj accumulates consecutively)
    if sparse:
        occ_ref, *refs = refs
    (dist_ref, env_ref, xj_ref, xi_ref, gi_ref, gj_ref,
     w1_ref, b1_ref, w2_ref, b2_ref,
     ddist_ref, denv_ref, dxj_ref, dxi_ref,
     dw1_ref, db1_ref, dw2_ref, db2_ref) = refs
    offsets = _offsets(start, delta, num_g)
    bi, jj, ii = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ii == 0)
    def _():
        dxj_ref[...] = jnp.zeros_like(dxj_ref)

    @pl.when((bi == 0) & (ii == 0) & (jj == 0))
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    skipped = (jj + 1) * tj <= ii * ti
    if sparse:
        skipped = skipped | (occ_at(occ_ref, bi, ii, jj,
                            pl.num_programs(2),
                            pl.num_programs(1)) == 0)

    @pl.when(skipped)
    def _():
        ddist_ref[...] = jnp.zeros_like(ddist_ref)
        denv_ref[...] = jnp.zeros_like(denv_ref)
        dxi_ref[...] = jnp.zeros_like(dxi_ref)

    @pl.when(jnp.logical_not(skipped))
    def _():
        d3 = dist_ref[...]
        env4 = env_ref[...][:, :, :, None]
        rbf = _rbf_4d(d3, offsets, coeff, bb, ti, tj, num_g)
        pre1 = _dot(rbf, w1_ref[...], mxu) + b1_ref[0]
        s = _ssp(pre1)
        w_raw = _dot(s, w2_ref[...], mxu) + b2_ref[0]

        f = xj_ref.shape[-1]
        w4 = w_raw.reshape(bb, ti, tj, f)
        gi4 = gi_ref[...][:, :, None, :]  # [bb, ti, 1, F]
        gj4 = gj_ref[...][:, None, :, :]  # [bb, 1, tj, F]
        mb4 = _mirror_skipped_mask(ii * ti, jj * tj, ti, tj)
        # combined per-pair cotangent: A (this cell) + B (mirror cell,
        # transposed into this layout; exact because W/env are symmetric)
        q4 = gi4 * xj_ref[...][:, None, :, :] + mb4 * (
            xi_ref[...][:, :, None, :] * gj4
        )
        denv_ref[...] = jnp.sum(w4 * q4, axis=3)
        we4 = w4 * env4
        # A-part dx is j-indexed: its block is resident across the inner i
        # loop (consecutive accumulation). The i-indexed B-part goes to a
        # per-tile slot (Mosaic cannot accumulate into revisited blocks).
        dxj_ref[...] += jnp.sum(we4 * gi4, axis=1)
        dxi_ref[...] = jnp.sum(we4 * mb4 * gj4, axis=2)[:, None, :, :]
        qe = (q4 * env4).reshape(bb * ti * tj, f)

        dw2_ref[...] += _dot(s.T, qe, mxu)
        db2_ref[0] += jnp.sum(qe, axis=0)
        dh = _dot(qe, w2_ref[...].T, mxu)
        dh = dh * jax.nn.sigmoid(pre1)
        dw1_ref[...] += _dot(rbf.T, dh, mxu)
        db1_ref[0] += jnp.sum(dh, axis=0)
        drbf = _dot(dh, w1_ref[...].T, mxu)
        diff4 = d3[:, :, :, None] - offsets.reshape(1, 1, 1, num_g)
        chain4 = drbf.reshape(bb, ti, tj, num_g) * jnp.exp(coeff * diff4 * diff4)
        ddist_ref[...] = jnp.sum(chain4 * (2.0 * coeff) * diff4, axis=3)


def _bwd_sym_pallas(dist, env, x, g, w1, b1, w2, b2, start, stop, num_g,
                    mxu="f32", sparse=False):
    b, n, _ = dist.shape
    f = x.shape[-1]
    f1 = w1.shape[1]
    ti, tj, _ = _sym_grid_info(n)
    bb = _batch_block(b, ti, tj, budget=4096)
    delta = (stop - start) / (num_g - 1)
    coeff = -0.5 / delta**2
    kernel = partial(_bwd_sym_kernel, start=start, delta=delta, num_g=num_g,
                     coeff=coeff, bb=bb, ti=ti, tj=tj, mxu=mxu, sparse=sparse)
    pair = pl.BlockSpec((bb, ti, tj), lambda b, j, i: (b, i, j))
    acc = lambda shape: pl.BlockSpec(shape, lambda b, j, i: tuple(0 for _ in shape))
    return pair_pallas_call(
        kernel,
        (b // bb, n // tj, n // ti),
        in_specs=[
            pair,
            pair,
            pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((bb, ti, f), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((bb, ti, f), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec(w1.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + b1.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + b2.shape, lambda b, j, i: (0, 0)),
        ],
        out_specs=[
            pair,
            pair,
            pl.BlockSpec((bb, tj, f), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((bb, 1, ti, f), lambda b, j, i: (b, j, i, 0)),
            acc((num_g, f1)),
            acc((1, f1)),
            acc((f1, f)),
            acc((1, f)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),  # ddist (placed)
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),  # denv (placed)
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),  # dx (j part)
            jax.ShapeDtypeStruct((b, n // tj, n, f), jnp.float32),  # dx i slots
            jax.ShapeDtypeStruct((num_g, f1), jnp.float32),
            jax.ShapeDtypeStruct((1, f1), jnp.float32),
            jax.ShapeDtypeStruct((f1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        args=(dist, env, x, x, g, g, w1, b1[None], w2, b2[None]),
        occ=tile_occupancy(env, bb, ti, tj) if sparse else None,
        interpret=_interpret(),
    )


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def cfconv_fused_sym(dist, env, x, w1, b1, w2, b2, start, stop, num_g,
                     mxu="f32", sparse=False):
    """Symmetric-input CFConv (see block comment above): identical output,
    37.5% less filter work at N=512; ddist/denv cotangents are placement-
    symmetrized. Use ONLY with symmetric dist/env. ``sparse=True``
    additionally skips tiles whose env block is all-zero (occupancy flags
    via scalar prefetch; see pallas_utils.tile_occupancy)."""
    return _fwd_sym_pallas(dist, env, x, w1, b1, w2, b2, start, stop, num_g,
                           mxu, sparse)


def _sym_vjp_fwd(dist, env, x, w1, b1, w2, b2, start, stop, num_g, mxu="f32",
                 sparse=False):
    out = cfconv_fused_sym(dist, env, x, w1, b1, w2, b2, start, stop, num_g,
                           mxu, sparse)
    return out, (dist, env, x, w1, b1, w2, b2)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _cfconv_sym_bwd(dist, env, x, w1, b1, w2, b2, g, start, stop, num_g,
                    mxu="f32", sparse=False):
    ddist, denv, dxj, dxi, dw1, db1, dw2, db2 = _bwd_sym_pallas(
        dist, env, x, g, w1, b1, w2, b2, start, stop, num_g, mxu, sparse
    )
    return ddist, denv, dxj + jnp.sum(dxi, axis=1), dw1, db1[0], dw2, db2[0]


def _cfconv_sym_bwd_fwd(dist, env, x, w1, b1, w2, b2, g, start, stop, num_g,
                        mxu="f32", sparse=False):
    out = _cfconv_sym_bwd(dist, env, x, w1, b1, w2, b2, g, start, stop,
                          num_g, mxu, sparse)
    return out, (dist, env, x, w1, b1, w2, b2, g)


def _cfconv_sym_bwd_bwd(start, stop, num_g, mxu, sparse, res, cts):
    dist, env, x, w1, b1, w2, b2, g = res
    ti, tj, _ = _sym_grid_info(dist.shape[-1])
    c_dd, c_de, c_dx, c_w1, c_b1, c_w2, c_b2 = cts
    cts_ref = (
        unplace_pair_cotangent(c_dd, ti, tj),
        unplace_pair_cotangent(c_de, ti, tj),
        c_dx, c_w1, c_b1, c_w2, c_b2,
    )

    def ref_grads(dist, env, x, w1, b1, w2, b2, g):
        _, vjp = jax.vjp(
            lambda d, e, xx, a, ab, c, cb: cfconv_fused_reference(
                d, e, xx, a, ab, c, cb, start, stop, num_g, mxu
            ),
            dist, env, x, w1, b1, w2, b2,
        )
        return vjp(g)

    _, vjp2 = jax.vjp(ref_grads, dist, env, x, w1, b1, w2, b2, g)
    return vjp2(cts_ref)


_cfconv_sym_bwd.defvjp(_cfconv_sym_bwd_fwd, _cfconv_sym_bwd_bwd)


def _sym_vjp_bwd(start, stop, num_g, mxu, sparse, res, g):
    dist, env, x, w1, b1, w2, b2 = res
    return _cfconv_sym_bwd(
        dist, env, x, w1, b1, w2, b2, g.astype(jnp.float32),
        start, stop, num_g, mxu, sparse,
    )


cfconv_fused_sym.defvjp(_sym_vjp_fwd, _sym_vjp_bwd)


def cfconv(dist, env, x, w1, b1, w2, b2, start, stop, num_g, mxu="f32",
           symmetric=False, use_pallas=True, sparse="auto"):
    """Dispatcher: fused kernel (symmetric variant when the caller guarantees
    symmetric dist/env AND the tiling can skip tiles) or the XLA reference.
    ``sparse``: True/False force occupancy-gated tiles on/off; "auto" enables
    them at the Atom3D pair-grid sizes (N>=128) where cutoff+padding leave
    ~half the tiles empty (docs/PERF.md)."""
    if not use_pallas:
        return cfconv_fused_reference(dist, env, x, w1, b1, w2, b2, start,
                                      stop, num_g, mxu)
    sp = sparse_auto(dist.shape[-1], sparse)
    if symmetric and sym_profitable(dist.shape[-1]):
        return cfconv_fused_sym(dist, env, x, w1, b1, w2, b2, start, stop,
                                num_g, mxu, sp)
    return cfconv_fused(dist, env, x, w1, b1, w2, b2, start, stop, num_g,
                        mxu, sp)


def cfconv_fused_reference(dist, env, x, w1, b1, w2, b2, start, stop, num_g,
                           mxu="f32"):
    """Pure-XLA reference of the fused op (same math, arbitrary-order AD).
    ``mxu='bf16'`` mimics the kernel's bf16-operand filter matmuls."""
    from geossl_tpu.models.common import gaussian_smearing

    rbf = gaussian_smearing(dist, start, stop, num_g)
    if mxu == "bf16":
        w = _ssp(_dot(rbf, w1, mxu) + b1)
        w = _dot(w, w2, mxu) + b2
    else:
        w = _ssp(rbf @ w1 + b1) @ w2 + b2
    acc = jnp.promote_types(jnp.float32, jnp.result_type(w, env, x))
    return jnp.einsum("bijf,bij,bjf->bif", w, env, x, preferred_element_type=acc)



# --------------------------------------------------------------------------
# Whole-stack inference kernel (kexp2, integrated round 4 alongside PaiNN's
# kexp9): the full num_interactions-deep SchNet interaction chain in ONE
# program — h resident in VMEM across blocks, RBF computed once and reused
# (the per-block chain recomputes it per block), lin1/post-MLP on the MXU
# in-program. FORWARD-ONLY, no custom VJP: training keeps the per-block
# cfconv path (kexp3: a mega-backward bought 6% — the backward is at its
# compute floor). Measured at the flagship shape: 1.18x over the per-block
# fused chain on the stack alone (experiments/README.md kexp2). N>=128 is
# excluded for the same VMEM-residency reason as painn_stack_infer.


def _stack_kernel(dist_ref, env_ref, h0_ref, wl1_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, wa_ref, ba_ref, wb_ref, bbias_ref,
                  out_ref, *, start, delta, num_g, coeff, bb, n, f, nblocks):
    offsets = _offsets(start, delta, num_g)
    rbf = _rbf_4d(dist_ref[...], offsets, coeff, bb, n, n, num_g)  # hoisted
    env4 = env_ref[...][:, :, :, None]
    h = h0_ref[...].reshape(bb * n, f)
    for k in range(nblocks):
        x = _dot(h, wl1_ref[k], "f32")                      # lin1 (no bias)
        s = _ssp(_dot(rbf, w1_ref[k], "f32") + b1_ref[k : k + 1])
        w = _dot(s, w2_ref[k], "f32") + b2_ref[k : k + 1]
        w4 = w.reshape(bb, n, n, f) * env4
        m = jnp.sum(w4 * x.reshape(bb, n, f)[:, None, :, :], axis=2)
        y = _ssp(_dot(m.reshape(bb * n, f), wa_ref[k], "f32")
                 + ba_ref[k : k + 1])
        y = _dot(y, wb_ref[k], "f32") + bbias_ref[k : k + 1]
        h = h + y
    out_ref[...] = h.reshape(bb, n, f)


# Largest N the whole-stack kernel accepts. Round 4 guarded at 64 by VMEM
# analysis; kexp10 MEASURED N=128 on the chip: compiles, bitwise vs the
# per-block forward, 1.18x at B=32 / 1.25x at B=128 — so the pretrain
# ladder's top bucket serves through the stack too (kexp10_results.json).
STACK_MAX_N = 128


def schnet_stack_infer(dist, env, h0, stacked, start, stop, num_g):
    """Whole-stack SchNet node features after ALL interaction blocks
    (inference only — see the block comment). ``stacked`` is the 9-tuple of
    per-layer weight stacks (wl1 [L,F,F], w1 [L,G,F], b1 [L,F], w2 [L,F,F],
    b2 [L,F], wa [L,F,F], ba [L,F], wb [L,F,F], bbias [L,F])."""
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = dist.shape
    f = h0.shape[-1]
    nblocks = stacked[0].shape[0]
    if n > STACK_MAX_N:
        raise ValueError(
            f"schnet_stack_infer: N={n} exceeds the VMEM-resident limit "
            f"({STACK_MAX_N}); use the per-block path")
    delta = (stop - start) / (num_g - 1)
    coeff = -0.5 / delta**2
    bb = _batch_block(b, n, n)
    kern = partial(_stack_kernel, start=start, delta=delta, num_g=num_g,
                   coeff=coeff, bb=bb, n=n, f=f, nblocks=nblocks)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
    return pl.pallas_call(
        kern,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
        ] + [full(w) for w in stacked],
        out_specs=pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(dist, env, h0, *stacked)
