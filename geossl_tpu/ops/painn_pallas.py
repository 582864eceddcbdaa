"""Fused Pallas kernel for the PaiNN inter-atomic message block.

Computes, per interaction layer (reference ``painn.py:52-65`` in dense form):

    w        = (phi(d) @ Wk + bk) · gate          (per-pair filters, 3F wide)
    wq,wr,wm = split(w);  xq,xr,xm = split(x_j)
    dq[i,f]     = Σ_j wq·xq_j
    dmu[i,c,f]  = Σ_j wr·xr_j·dir_c[i,j]  +  Σ_j wm·xm_j·mu[j,c,f]

The XLA path materializes the gated filter tensor ``[B,N,N,3F]`` in HBM per
layer (plus rematerialization in backward). This kernel keeps the RBF
expansion, the filter matmul (MXU) and all three message reductions in VMEM
per (i-tile, j-tile); HBM traffic is only the ``[B,N,N]`` geometry grids and
the per-node tensors.

Layouts: direction passed as three separate ``[B,N,N]`` component arrays
(a trailing axis of 3 would waste the 128-lane registers); ``mu`` flattened
to ``[B,N,3F]`` with c-major layout ``mu2d[..., c*F+f]``.

Custom VJP: one backward kernel (grid transposed so j-indexed outputs
accumulate over the innermost i axis) produces dx, dmu_in, dWk, dbk, ddist,
dgate and the three ddir components.

Second-order AD (MD17 force training with PaiNN: the loss contains
``-∂E/∂pos`` and is differentiated again w.r.t. parameters) IS supported,
the same way as ``cfconv_pallas``: the backward kernel is itself wrapped in
a custom VJP whose derivative is taken through the pure-XLA reference math
(``painn_message_reference``). First-order traffic — the hot path — stays
fully fused; only the double-backward terms materialize ``[B,N,N,3F]``, and
MD17 runs at B=5, N≤32 where that is a few MB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geossl_tpu.ops.pallas_utils import interpret as _interpret
from geossl_tpu.ops.pallas_utils import (
    mirror_skipped_mask,
    occ_at,
    pair_pallas_call,
    pair_tiles,
    pair_tiles_rect,
    sym_grid_info,
    tile_occupancy,
    unplace_pair_cotangent,
)


def _offsets(cutoff, num_r):
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, num_r), 2).astype(jnp.float32)
    return ids * (cutoff / (num_r - 1))


def _gated_filters(d2, gate2, wk_ref, bk_ref, cutoff, num_r, coeff, ti, tj):
    """[ti,tj] dist/gate -> gated filters [ti*tj, 3F] + phi [ti*tj, R]."""
    off = _offsets(cutoff, num_r)  # [1,1,R]
    diff = d2[:, :, None] - off
    phi3 = jnp.exp(coeff * diff * diff)  # [ti,tj,R]
    phi = phi3.reshape(ti * tj, num_r)
    w = jnp.dot(phi, wk_ref[...], preferred_element_type=jnp.float32) + bk_ref[0]
    w3 = w.reshape(ti, tj, -1) * gate2[:, :, None]
    return phi, w3


def _gated_filters_blocked(d3, gate3, wk_ref, bk_ref, cutoff, num_r, coeff,
                           bb, ti, tj):
    """[bb,ti,tj] dist/gate -> (phi [bb*ti*tj, R], gated w4 [bb,ti,tj,3F])."""
    off = _offsets(cutoff, num_r)
    diff = d3[:, :, :, None] - off.reshape(1, 1, 1, num_r)
    phi4 = jnp.exp(coeff * diff * diff)
    phi = phi4.reshape(bb * ti * tj, num_r)
    w = jnp.dot(phi, wk_ref[...], preferred_element_type=jnp.float32) + bk_ref[0]
    w4 = w.reshape(bb, ti, tj, -1) * gate3[:, :, :, None]
    return phi, w4


from geossl_tpu.ops.pallas_utils import batch_block as _batch_block  # noqa: E402


def _fwd_kernel(*refs, cutoff, num_r, coeff, bb, ti, tj, f, sparse):
    if sparse:
        occ_ref, *refs = refs
    (dist_ref, gate_ref, dx_ref, dy_ref, dz_ref, x_ref, mu_ref,
     wk_ref, bk_ref, dq_ref, dmu_ref) = refs
    bi, ii, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)
        dmu_ref[...] = jnp.zeros_like(dmu_ref)

    def body():
        _, w4 = _gated_filters_blocked(
            dist_ref[...], gate_ref[...], wk_ref, bk_ref, cutoff, num_r,
            coeff, bb, ti, tj,
        )
        wq, wr, wm = jnp.split(w4, 3, axis=-1)
        xq, xr, xm = jnp.split(x_ref[...], 3, axis=-1)  # [bb, tj, F] each
        mu_c_list = jnp.split(mu_ref[...], 3, axis=-1)  # [bb, tj, F] each

        dq_ref[...] += jnp.sum(wq * xq[:, None, :, :], axis=2)
        m_r = wr * xr[:, None, :, :]  # [bb,ti,tj,f]
        m_m = wm * xm[:, None, :, :]
        dirs = (dx_ref[...], dy_ref[...], dz_ref[...])
        parts = []
        for c in range(3):
            dmu_c = jnp.sum(m_r * dirs[c][:, :, :, None], axis=2)
            dmu_c += jnp.sum(m_m * mu_c_list[c][:, None, :, :], axis=2)
            parts.append(dmu_c)
        dmu_ref[...] += jnp.concatenate(parts, axis=-1)

    if sparse:
        pl.when(occ_at(occ_ref, bi, ii, j, pl.num_programs(1),
                       pl.num_programs(2)) != 0)(body)
    else:
        body()


def _fwd_pallas(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
                sparse=False):
    b, ni, nj = dist.shape
    f3 = x.shape[-1]
    f = f3 // 3
    num_r = wk.shape[0]
    ti, tj = pair_tiles_rect(ni, nj, _PAINN_BUDGET)
    bb = _batch_block(b, ti, tj, budget=4096)
    delta = cutoff / (num_r - 1)
    coeff = -0.5 / delta**2
    kernel = partial(_fwd_kernel, cutoff=cutoff, num_r=num_r, coeff=coeff,
                     bb=bb, ti=ti, tj=tj, f=f, sparse=sparse)
    pair = pl.BlockSpec((bb, ti, tj), lambda b, i, j: (b, i, j))
    return pair_pallas_call(
        kernel,
        (b // bb, ni // ti, nj // tj),
        in_specs=[
            pair, pair, pair, pair, pair,
            pl.BlockSpec((bb, tj, f3), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((bb, tj, f3), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec(wk.shape, lambda b, i, j: (0, 0)),
            pl.BlockSpec((1,) + bk.shape, lambda b, i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, ti, f), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((bb, ti, f3), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ni, f), jnp.float32),
            jax.ShapeDtypeStruct((b, ni, f3), jnp.float32),
        ],
        args=(dist, gate, dirx, diry, dirz, x, mu, wk, bk[None]),
        occ=tile_occupancy(gate, bb, ti, tj) if sparse else None,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )


def _bwd_kernel(*refs, cutoff, num_r, coeff, bb, ti, tj, f, sparse):
    # grid = (b, j_tile, i_tile): i innermost so j-indexed outputs accumulate
    if sparse:
        occ_ref, *refs = refs
    (dist_ref, gate_ref, dx_ref, dy_ref, dz_ref, x_ref, mu_ref,
     wk_ref, bk_ref, gq_ref, gmu_ref,
     dxn_ref, dmu_in_ref, dwk_ref, dbk_ref,
     ddist_ref, dgate_ref, ddx_ref, ddy_ref, ddz_ref) = refs
    bi, jj, ii = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ii == 0)
    def _():
        dxn_ref[...] = jnp.zeros_like(dxn_ref)
        dmu_in_ref[...] = jnp.zeros_like(dmu_in_ref)

    @pl.when((bi == 0) & (jj == 0) & (ii == 0))
    def _():
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)

    def body():
        d3, gate3 = dist_ref[...], gate_ref[...]
        phi, w4 = _gated_filters_blocked(
            d3, gate3, wk_ref, bk_ref, cutoff, num_r, coeff, bb, ti, tj)
        wq, wr, wm = jnp.split(w4, 3, axis=-1)
        xq, xr, xm = jnp.split(x_ref[...], 3, axis=-1)  # [bb, tj, F]
        mu_c_list = jnp.split(mu_ref[...], 3, axis=-1)  # [bb, tj, F] each
        gq = gq_ref[...]  # [bb, ti, F]
        gmu_c_list = jnp.split(gmu_ref[...], 3, axis=-1)  # [bb, ti, F] each
        dirs = (dx_ref[...], dy_ref[...], dz_ref[...])

        # D[b,i,j,f] := Σ_c dir_c[b,i,j]·gmu_c[b,i,f];
        # M[b,i,j,f] := Σ_c mu_c[b,j,f]·gmu_c[b,i,f]
        D = jnp.zeros((bb, ti, tj, f), jnp.float32)
        M = jnp.zeros((bb, ti, tj, f), jnp.float32)
        dmu_parts = []
        for c in range(3):
            gmu_c = gmu_c_list[c]
            mu_c = mu_c_list[c]
            D += dirs[c][:, :, :, None] * gmu_c[:, :, None, :]
            M += mu_c[:, None, :, :] * gmu_c[:, :, None, :]
            s_c = jnp.sum(wm * gmu_c[:, :, None, :], axis=1)  # [bb, tj, f]
            dmu_parts.append(s_c * xm)
            # ddir_c[b,i,j] = Σ_f wr·xr_j·gmu_c[b,i,f]
            ddir_c = jnp.sum(
                wr * xr[:, None, :, :] * gmu_c[:, :, None, :], axis=3
            )
            (ddx_ref, ddy_ref, ddz_ref)[c][...] = ddir_c
        dmu_in_ref[...] += jnp.concatenate(dmu_parts, axis=-1)

        # dx parts (accumulate over i)
        dxq = jnp.sum(wq * gq[:, :, None, :], axis=1)  # [bb, tj, f]
        dxr = jnp.sum(wr * D, axis=1)
        dxm = jnp.sum(wm * M, axis=1)
        dxn_ref[...] += jnp.concatenate([dxq, dxr, dxm], axis=-1)

        # cotangent on gated filters
        dw4 = jnp.concatenate(
            [gq[:, :, None, :] * xq[:, None, :, :], D * xr[:, None, :, :],
             M * xm[:, None, :, :]],
            axis=3,
        )  # [bb, ti, tj, 3F]
        # dgate = Σ_t w_raw·dw4 where w4 = w_raw·gate -> w_raw = w4/gate
        # (gate may be 0; recompute w_raw instead)
        off = _offsets(cutoff, num_r)
        diff4 = d3[:, :, :, None] - off.reshape(1, 1, 1, num_r)
        w_raw = (
            jnp.dot(phi, wk_ref[...], preferred_element_type=jnp.float32)
            + bk_ref[0]
        ).reshape(bb, ti, tj, 3 * f)
        dgate_ref[...] = jnp.sum(w_raw * dw4, axis=3)
        dwg = (dw4 * gate3[:, :, :, None]).reshape(bb * ti * tj, 3 * f)
        dwk_ref[...] += jnp.dot(phi.T, dwg, preferred_element_type=jnp.float32)
        dbk_ref[0] += jnp.sum(dwg, axis=0)
        dphi = jnp.dot(dwg, wk_ref[...].T, preferred_element_type=jnp.float32)
        chain4 = dphi.reshape(bb, ti, tj, num_r) * jnp.exp(
            coeff * diff4 * diff4
        )
        ddist_ref[...] = jnp.sum(chain4 * (2.0 * coeff) * diff4, axis=3)

    if sparse:
        occupied = occ_at(occ_ref, bi, ii, jj, pl.num_programs(2),
                          pl.num_programs(1)) != 0
        pl.when(occupied)(body)

        @pl.when(jnp.logical_not(occupied))
        def _():
            # gate==0 everywhere in this tile: ddist/ddir are exactly zero
            # (every term carries a gate factor); dgate is zeroed by the
            # occupancy-skip contract (pallas_utils.tile_occupancy)
            ddist_ref[...] = jnp.zeros_like(ddist_ref)
            dgate_ref[...] = jnp.zeros_like(dgate_ref)
            ddx_ref[...] = jnp.zeros_like(ddx_ref)
            ddy_ref[...] = jnp.zeros_like(ddy_ref)
            ddz_ref[...] = jnp.zeros_like(ddz_ref)
    else:
        body()


def _bwd_pallas(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff, gq, gmu,
                sparse=False):
    b, ni, nj = dist.shape
    f3 = x.shape[-1]
    f = f3 // 3
    num_r = wk.shape[0]
    ti, tj = pair_tiles_rect(ni, nj, _PAINN_BUDGET)
    bb = _batch_block(b, ti, tj, budget=2048)
    delta = cutoff / (num_r - 1)
    coeff = -0.5 / delta**2
    kernel = partial(_bwd_kernel, cutoff=cutoff, num_r=num_r, coeff=coeff,
                     bb=bb, ti=ti, tj=tj, f=f, sparse=sparse)
    # grid (b, jt, it): pair blocks live at (i, j) => index_map (b, i, j)
    pair = pl.BlockSpec((bb, ti, tj), lambda b, j, i: (b, i, j))
    acc = lambda shape: pl.BlockSpec(shape, lambda b, j, i: tuple(0 for _ in shape))
    return pair_pallas_call(
        kernel,
        (b // bb, nj // tj, ni // ti),
        in_specs=[
            pair, pair, pair, pair, pair,
            pl.BlockSpec((bb, tj, f3), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((bb, tj, f3), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec(wk.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + bk.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((bb, ti, f), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((bb, ti, f3), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, tj, f3), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((bb, tj, f3), lambda b, j, i: (b, j, 0)),
            acc(wk.shape),
            acc((1,) + bk.shape),
            pair, pair, pair, pair, pair,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nj, f3), jnp.float32),  # dx
            jax.ShapeDtypeStruct((b, nj, f3), jnp.float32),  # dmu_in
            jax.ShapeDtypeStruct(wk.shape, jnp.float32),
            jax.ShapeDtypeStruct((1,) + bk.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, ni, nj), jnp.float32),  # ddist
            jax.ShapeDtypeStruct((b, ni, nj), jnp.float32),  # dgate
            jax.ShapeDtypeStruct((b, ni, nj), jnp.float32),  # ddirx
            jax.ShapeDtypeStruct((b, ni, nj), jnp.float32),  # ddiry
            jax.ShapeDtypeStruct((b, ni, nj), jnp.float32),  # ddirz
        ],
        args=(dist, gate, dirx, diry, dirz, x, mu, wk, bk[None], gq, gmu),
        occ=tile_occupancy(gate, bb, ti, tj) if sparse else None,
        interpret=_interpret(),
        # B=64/N=512 (the LBA protocol with PaiNN) measures 16.21M scoped
        # VMEM — just over the 16M default soft limit (v5e has 128M)
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )


@partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def painn_message_fused(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
                        sparse=False):
    """Fused PaiNN message pass. Returns (dq [B,N,F], dmu [B,N,3F]).
    ``sparse=True`` skips pair tiles whose gate block is all-zero (scalar-
    prefetched occupancy flags) — identical outputs; the dgate cotangent is
    zeroed on skipped tiles (exact: gate is identically zero there)."""
    return _fwd_pallas(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
                       sparse)


def _vjp_fwd(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
             sparse=False):
    # call the custom-vjp op (not the raw kernel) so that differentiating the
    # saved forward — which second-order AD does — hits this VJP again
    # instead of pallas_call's missing JVP rule
    out = painn_message_fused(dist, gate, dirx, diry, dirz, x, mu, wk, bk,
                              cutoff, sparse)
    return out, (dist, gate, dirx, diry, dirz, x, mu, wk, bk)


@partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _painn_bwd(dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu, cutoff,
               sparse=False):
    """Differentiable wrapper of the backward kernel: returns the cotangents
    in the op's argument order (ddist, dgate, ddirx, ddiry, ddirz, dx, dmu,
    dwk, dbk). Its own VJP (the second-order terms) runs through the XLA
    reference math."""
    dx_in, dmu_in, dwk, dbk, ddist, dgate, ddx, ddy, ddz = _bwd_pallas(
        dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff, gq, gmu, sparse
    )
    return ddist, dgate, ddx, ddy, ddz, dx_in, dmu_in, dwk, dbk[0]


def _painn_bwd_fwd(dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu,
                   cutoff, sparse=False):
    out = _painn_bwd(dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu,
                     cutoff, sparse)
    return out, (dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu)


def _painn_bwd_bwd(cutoff, sparse, res, cts):
    dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu = res

    def ref_grads(dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu):
        _, vjp = jax.vjp(
            lambda d, g, cx, cy, cz, xx, m, a, ab: painn_message_reference(
                d, g, cx, cy, cz, xx, m, a, ab, cutoff
            ),
            dist, gate, dirx, diry, dirz, x, mu, wk, bk,
        )
        return vjp((gq, gmu))  # 9 grads, same order as _painn_bwd's outputs

    _, vjp2 = jax.vjp(ref_grads, dist, gate, dirx, diry, dirz, x, mu, wk, bk,
                      gq, gmu)
    return vjp2(tuple(cts))


_painn_bwd.defvjp(_painn_bwd_fwd, _painn_bwd_bwd)


def _vjp_bwd(cutoff, sparse, res, cots):
    dist, gate, dirx, diry, dirz, x, mu, wk, bk = res
    gq, gmu = cots
    return _painn_bwd(
        dist, gate, dirx, diry, dirz, x, mu, wk, bk,
        gq.astype(jnp.float32), gmu.astype(jnp.float32), cutoff, sparse,
    )


painn_message_fused.defvjp(_vjp_fwd, _vjp_bwd)


def painn_message_reference(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff):
    """Pure-XLA reference of the fused op (same math, any-order AD)."""
    num_r = wk.shape[0]
    offsets = jnp.linspace(0.0, cutoff, num_r, dtype=jnp.float32)
    delta = cutoff / (num_r - 1)
    coeff = -0.5 / delta**2
    diff = dist[..., None] - offsets
    phi = jnp.exp(coeff * diff * diff)
    w3 = (phi @ wk + bk) * gate[..., None]
    f = x.shape[-1] // 3
    wq, wr, wm = w3[..., :f], w3[..., f : 2 * f], w3[..., 2 * f :]
    xq, xr, xm = x[..., :f], x[..., f : 2 * f], x[..., 2 * f :]
    dq = jnp.einsum("bijf,bjf->bif", wq, xq)
    dmu = []
    dirs = (dirx, diry, dirz)
    for c in range(3):
        mu_c = mu[..., c * f : (c + 1) * f]
        dmu_c = jnp.einsum("bijf,bjf,bij->bif", wr, xr, dirs[c])
        dmu_c += jnp.einsum("bijf,bjf,bjf->bif", wm, xm, mu_c)
        dmu.append(dmu_c)
    return dq, jnp.concatenate(dmu, axis=-1)


# ---------------------------------------------------------------------------
# Symmetric variant. PaiNN's pair inputs obey: dist/gate symmetric (both from
# the symmetric distance matrix × a symmetric adjacency), direction
# ANTIsymmetric (dir[j,i] = -dir[i,j]); so the gated filters are symmetric
# and tiles fully below the diagonal band can be skipped, with each computed
# tile also emitting the skipped cells' mirrored contributions (direction
# terms pick up a sign). Same scheme as ``cfconv_pallas.cfconv_fused_sym``:
# j-indexed outputs accumulate consecutively, i-indexed parts go to per-tile
# slots summed outside (Mosaic cannot accumulate into revisited blocks), and
# the pair-field cotangents (ddist/dgate symmetric, ddir antisymmetric) are
# returned placement-symmetrized — exact for PaiNN's symmetric/antisymmetric
# consumers (positions -> dist/dir), tested at the model level.
# ---------------------------------------------------------------------------

_PAINN_BUDGET = 2048


def painn_sym_profitable(n: int) -> bool:
    return sym_grid_info(n, _PAINN_BUDGET)[2] > 0


def _fwd_sym_kernel(*refs, cutoff, num_r, coeff, ti, tj, f, sparse):
    if sparse:
        occ_ref, *refs = refs
    (dist_ref, gate_ref, dx_ref, dy_ref, dz_ref,
     xj_ref, xi_ref, muj_ref, mui_ref, wk_ref, bk_ref,
     dqb_ref, dmub_ref, dqa_ref, dmua_ref) = refs
    bi, jj, ii = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    skipped = (jj + 1) * tj <= ii * ti
    if sparse:
        # empty (gate==0) tiles contribute nothing; their symmetric mirror
        # tile is equally empty, so no mirror emission is lost either
        skipped = skipped | (occ_at(occ_ref, bi, ii, jj,
                            pl.num_programs(2),
                            pl.num_programs(1)) == 0)

    @pl.when(ii == 0)
    def _():
        dqb_ref[...] = jnp.zeros_like(dqb_ref)
        dmub_ref[...] = jnp.zeros_like(dmub_ref)

    @pl.when(skipped)
    def _():
        dqa_ref[...] = jnp.zeros_like(dqa_ref)
        dmua_ref[...] = jnp.zeros_like(dmua_ref)

    @pl.when(jnp.logical_not(skipped))
    def _():
        _, w3 = _gated_filters(
            dist_ref[0], gate_ref[0], wk_ref, bk_ref, cutoff, num_r, coeff,
            ti, tj,
        )
        wq, wr, wm = jnp.split(w3, 3, axis=-1)
        xqj, xrj, xmj = jnp.split(xj_ref[0], 3, axis=-1)   # [tj, F]
        xqi, xri, xmi = jnp.split(xi_ref[0], 3, axis=-1)   # [ti, F]
        muj_c = jnp.split(muj_ref[0], 3, axis=-1)
        mui_c = jnp.split(mui_ref[0], 3, axis=-1)
        dirs = (dx_ref[0], dy_ref[0], dz_ref[0])
        mb3 = mirror_skipped_mask(ii * ti, jj * tj, ti, tj)[0]  # [ti, tj, 1]

        # A: true per-cell messages for the rows of this tile
        dqa = jnp.sum(wq * xqj[None, :, :], axis=1)  # [ti, F]
        m_r = wr * xrj[None, :, :]
        m_m = wm * xmj[None, :, :]
        parts = []
        for c in range(3):
            dmu_c = jnp.sum(m_r * dirs[c][:, :, None], axis=1)
            dmu_c += jnp.sum(m_m * muj_c[c][None, :, :], axis=1)
            parts.append(dmu_c)
        dqa_ref[...] = dqa[None, None, :, :]
        dmua_ref[...] = jnp.concatenate(parts, axis=-1)[None, None, :, :]

        # B: mirrored messages for columns whose mirror tile was skipped
        # (dir at the mirror cell is -dir here)
        wqb, wrb, wmb = wq * mb3, wr * mb3, wm * mb3
        dqb_ref[0] += jnp.sum(wqb * xqi[:, None, :], axis=0)  # [tj, F]
        mb_r = wrb * xri[:, None, :]
        mb_m = wmb * xmi[:, None, :]
        partsb = []
        for c in range(3):
            dmu_c = jnp.sum(mb_r * (-dirs[c])[:, :, None], axis=0)
            dmu_c += jnp.sum(mb_m * mui_c[c][:, None, :], axis=0)
            partsb.append(dmu_c)
        dmub_ref[0] += jnp.concatenate(partsb, axis=-1)


def _fwd_sym_pallas(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
                    sparse=False):
    b, n, _ = dist.shape
    f3 = x.shape[-1]
    f = f3 // 3
    num_r = wk.shape[0]
    ti, tj, _ = sym_grid_info(n, _PAINN_BUDGET)
    delta = cutoff / (num_r - 1)
    coeff = -0.5 / delta**2
    kernel = partial(_fwd_sym_kernel, cutoff=cutoff, num_r=num_r, coeff=coeff,
                     ti=ti, tj=tj, f=f, sparse=sparse)
    pair = pl.BlockSpec((1, ti, tj), lambda b, j, i: (b, i, j))
    jblk = lambda w: pl.BlockSpec((1, tj, w), lambda b, j, i: (b, j, 0))
    iblk = lambda w: pl.BlockSpec((1, ti, w), lambda b, j, i: (b, i, 0))
    islot = lambda w: pl.BlockSpec((1, 1, ti, w), lambda b, j, i: (b, j, i, 0))
    dqb, dmub, dqa, dmua = pair_pallas_call(
        kernel,
        (b, n // tj, n // ti),
        in_specs=[
            pair, pair, pair, pair, pair,
            jblk(f3), iblk(f3), jblk(f3), iblk(f3),
            pl.BlockSpec(wk.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + bk.shape, lambda b, j, i: (0, 0)),
        ],
        out_specs=[jblk(f), jblk(f3), islot(f), islot(f3)],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n, f3), jnp.float32),
            jax.ShapeDtypeStruct((b, n // tj, n, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n // tj, n, f3), jnp.float32),
        ],
        args=(dist, gate, dirx, diry, dirz, x, x, mu, mu, wk, bk[None]),
        occ=tile_occupancy(gate, 1, ti, tj) if sparse else None,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )
    return dqb + jnp.sum(dqa, axis=1), dmub + jnp.sum(dmua, axis=1)


def _bwd_sym_kernel(*refs, cutoff, num_r, coeff, ti, tj, f, sparse):
    if sparse:
        occ_ref, *refs = refs
    (dist_ref, gate_ref, dx_ref, dy_ref, dz_ref,
     xj_ref, xi_ref, muj_ref, mui_ref,
     wk_ref, bk_ref, gqi_ref, gqj_ref, gmui_ref, gmuj_ref,
     dxnj_ref, dmuj_ref, dxni_ref, dmui_out_ref,
     dwk_ref, dbk_ref, ddist_ref, dgate_ref,
     ddx_ref, ddy_ref, ddz_ref) = refs
    bi, jj, ii = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    skipped = (jj + 1) * tj <= ii * ti
    if sparse:
        skipped = skipped | (occ_at(occ_ref, bi, ii, jj,
                            pl.num_programs(2),
                            pl.num_programs(1)) == 0)

    @pl.when(ii == 0)
    def _():
        dxnj_ref[...] = jnp.zeros_like(dxnj_ref)
        dmuj_ref[...] = jnp.zeros_like(dmuj_ref)

    @pl.when((bi == 0) & (ii == 0) & (jj == 0))
    def _():
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)

    @pl.when(skipped)
    def _():
        dxni_ref[...] = jnp.zeros_like(dxni_ref)
        dmui_out_ref[...] = jnp.zeros_like(dmui_out_ref)
        ddist_ref[...] = jnp.zeros_like(ddist_ref)
        dgate_ref[...] = jnp.zeros_like(dgate_ref)
        ddx_ref[...] = jnp.zeros_like(ddx_ref)
        ddy_ref[...] = jnp.zeros_like(ddy_ref)
        ddz_ref[...] = jnp.zeros_like(ddz_ref)

    @pl.when(jnp.logical_not(skipped))
    def _():
        d2, gate2 = dist_ref[0], gate_ref[0]
        phi, w3 = _gated_filters(
            d2, gate2, wk_ref, bk_ref, cutoff, num_r, coeff, ti, tj
        )
        wq, wr, wm = jnp.split(w3, 3, axis=-1)
        xqj, xrj, xmj = jnp.split(xj_ref[0], 3, axis=-1)
        xqi, xri, xmi = jnp.split(xi_ref[0], 3, axis=-1)
        muj_c = jnp.split(muj_ref[0], 3, axis=-1)
        mui_c = jnp.split(mui_ref[0], 3, axis=-1)
        gqi, gqj = gqi_ref[0], gqj_ref[0]
        gmui_c = jnp.split(gmui_ref[0], 3, axis=-1)
        gmuj_c = jnp.split(gmuj_ref[0], 3, axis=-1)
        dirs = (dx_ref[0], dy_ref[0], dz_ref[0])
        mb3 = mirror_skipped_mask(ii * ti, jj * tj, ti, tj)[0]  # [ti, tj, 1]

        # A-direction structures (this tile's true per-cell terms)
        DA = jnp.zeros((ti, tj, f), jnp.float32)
        MA = jnp.zeros((ti, tj, f), jnp.float32)
        # B-direction structures (mirror cells, expressed in this layout)
        DB = jnp.zeros((ti, tj, f), jnp.float32)
        MB = jnp.zeros((ti, tj, f), jnp.float32)
        dmu_j_parts = []
        dmu_i_parts = []
        for c in range(3):
            DA += dirs[c][:, :, None] * gmui_c[c][:, None, :]
            MA += muj_c[c][None, :, :] * gmui_c[c][:, None, :]
            DB += (-dirs[c])[:, :, None] * gmuj_c[c][None, :, :]
            MB += mui_c[c][:, None, :] * gmuj_c[c][None, :, :]
            # dmu_in at columns (A) and rows (B, mirrored)
            s_c = jnp.sum(wm * gmui_c[c][:, None, :], axis=0)  # [tj, f]
            dmu_j_parts.append(s_c * xmj)
            t_c = jnp.sum(wm * mb3 * gmuj_c[c][None, :, :], axis=1)  # [ti, f]
            dmu_i_parts.append(t_c * xmi)
            # ddir: A term minus the mirrored B term (dir antisymmetric)
            ddir_a = jnp.sum(wr * xrj[None, :, :] * gmui_c[c][:, None, :],
                             axis=2)
            ddir_b = jnp.sum(
                wr * mb3 * xri[:, None, :] * gmuj_c[c][None, :, :], axis=2
            )
            (ddx_ref, ddy_ref, ddz_ref)[c][0] = ddir_a - ddir_b
        dmuj_ref[0] += jnp.concatenate(dmu_j_parts, axis=-1)
        dmui_out_ref[...] = jnp.concatenate(dmu_i_parts, axis=-1)[
            None, None, :, :
        ]

        # dx at columns (A) and rows (B, mirrored; slots)
        wqb, wrb, wmb = wq * mb3, wr * mb3, wm * mb3
        dxq_j = jnp.sum(wq * gqi[:, None, :], axis=0)
        dxr_j = jnp.sum(wr * DA, axis=0)
        dxm_j = jnp.sum(wm * MA, axis=0)
        dxnj_ref[0] += jnp.concatenate([dxq_j, dxr_j, dxm_j], axis=-1)
        dxq_i = jnp.sum(wqb * gqj[None, :, :], axis=1)
        dxr_i = jnp.sum(wrb * DB, axis=1)
        dxm_i = jnp.sum(wmb * MB, axis=1)
        dxni_ref[...] = jnp.concatenate([dxq_i, dxr_i, dxm_i], axis=-1)[
            None, None, :, :
        ]

        # combined cotangent on the gated filters: A + mirrored B
        dw3 = jnp.concatenate(
            [
                gqi[:, None, :] * xqj[None, :, :]
                + mb3 * (xqi[:, None, :] * gqj[None, :, :]),
                DA * xrj[None, :, :] + mb3 * (DB * xri[:, None, :]),
                MA * xmj[None, :, :] + mb3 * (MB * xmi[:, None, :]),
            ],
            axis=2,
        )  # [ti, tj, 3F]
        off = _offsets(cutoff, num_r)
        diff3 = d2[:, :, None] - off
        w_raw = (
            jnp.dot(phi, wk_ref[...], preferred_element_type=jnp.float32)
            + bk_ref[0]
        ).reshape(ti, tj, 3 * f)
        dgate_ref[0] = jnp.sum(w_raw * dw3, axis=2)
        dwg = (dw3 * gate2[:, :, None]).reshape(ti * tj, 3 * f)
        dwk_ref[...] += jnp.dot(phi.T, dwg, preferred_element_type=jnp.float32)
        dbk_ref[0] += jnp.sum(dwg, axis=0)
        dphi = jnp.dot(dwg, wk_ref[...].T, preferred_element_type=jnp.float32)
        chain3 = dphi.reshape(ti, tj, num_r) * jnp.exp(coeff * diff3 * diff3)
        ddist_ref[0] = jnp.sum(chain3 * (2.0 * coeff) * diff3, axis=2)


def _bwd_sym_pallas(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
                    gq, gmu, sparse=False):
    b, n, _ = dist.shape
    f3 = x.shape[-1]
    f = f3 // 3
    num_r = wk.shape[0]
    ti, tj, _ = sym_grid_info(n, _PAINN_BUDGET)
    delta = cutoff / (num_r - 1)
    coeff = -0.5 / delta**2
    kernel = partial(_bwd_sym_kernel, cutoff=cutoff, num_r=num_r, coeff=coeff,
                     ti=ti, tj=tj, f=f, sparse=sparse)
    pair = pl.BlockSpec((1, ti, tj), lambda b, j, i: (b, i, j))
    jblk = lambda w: pl.BlockSpec((1, tj, w), lambda b, j, i: (b, j, 0))
    iblk = lambda w: pl.BlockSpec((1, ti, w), lambda b, j, i: (b, i, 0))
    islot = lambda w: pl.BlockSpec((1, 1, ti, w), lambda b, j, i: (b, j, i, 0))
    acc = lambda shape: pl.BlockSpec(shape, lambda b, j, i: tuple(0 for _ in shape))
    return pair_pallas_call(
        kernel,
        (b, n // tj, n // ti),
        in_specs=[
            pair, pair, pair, pair, pair,
            jblk(f3), iblk(f3), jblk(f3), iblk(f3),
            pl.BlockSpec(wk.shape, lambda b, j, i: (0, 0)),
            pl.BlockSpec((1,) + bk.shape, lambda b, j, i: (0, 0)),
            iblk(f), jblk(f), iblk(f3), jblk(f3),
        ],
        out_specs=[
            jblk(f3), jblk(f3), islot(f3), islot(f3),
            acc(wk.shape), acc((1,) + bk.shape),
            pair, pair, pair, pair, pair,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, f3), jnp.float32),  # dx (j)
            jax.ShapeDtypeStruct((b, n, f3), jnp.float32),  # dmu_in (j)
            jax.ShapeDtypeStruct((b, n // tj, n, f3), jnp.float32),  # dx i slots
            jax.ShapeDtypeStruct((b, n // tj, n, f3), jnp.float32),  # dmu i slots
            jax.ShapeDtypeStruct(wk.shape, jnp.float32),
            jax.ShapeDtypeStruct((1,) + bk.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),  # ddist (placed)
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),  # dgate (placed)
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),  # ddirx (placed, signed)
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),  # ddiry
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),  # ddirz
        ],
        args=(dist, gate, dirx, diry, dirz, x, x, mu, mu, wk, bk[None],
              gq, gq, gmu, gmu),
        occ=tile_occupancy(gate, 1, ti, tj) if sparse else None,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )


@partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def painn_message_fused_sym(dist, gate, dirx, diry, dirz, x, mu, wk, bk,
                            cutoff, sparse=False):
    """Symmetric-input PaiNN message pass (see block comment): identical
    output, skips below-diagonal tiles; pair-field cotangents are placement-
    symmetrized (ddir with the antisymmetric sign). Use ONLY with symmetric
    dist/gate and antisymmetric directions. ``sparse=True`` additionally
    skips tiles whose gate block is all-zero (occupancy flags via scalar
    prefetch; see pallas_utils.tile_occupancy)."""
    return _fwd_sym_pallas(dist, gate, dirx, diry, dirz, x, mu, wk, bk,
                           cutoff, sparse)


def _sym_vjp_fwd(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
                 sparse=False):
    out = painn_message_fused_sym(dist, gate, dirx, diry, dirz, x, mu, wk,
                                  bk, cutoff, sparse)
    return out, (dist, gate, dirx, diry, dirz, x, mu, wk, bk)


@partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _painn_sym_bwd(dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu,
                   cutoff, sparse=False):
    (dxj, dmuj, dxi, dmui, dwk, dbk, ddist, dgate, ddx, ddy, ddz
     ) = _bwd_sym_pallas(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
                         gq, gmu, sparse)
    return (ddist, dgate, ddx, ddy, ddz,
            dxj + jnp.sum(dxi, axis=1), dmuj + jnp.sum(dmui, axis=1),
            dwk, dbk[0])


def _painn_sym_bwd_fwd(dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu,
                       cutoff, sparse=False):
    out = _painn_sym_bwd(dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq,
                         gmu, cutoff, sparse)
    return out, (dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu)


def _painn_sym_bwd_bwd(cutoff, sparse, res, cts):
    dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu = res
    ti, tj, _ = sym_grid_info(dist.shape[-1], _PAINN_BUDGET)
    c_dd, c_dg, c_dx, c_dy, c_dz, c_x, c_mu, c_wk, c_bk = cts
    cts_ref = (
        unplace_pair_cotangent(c_dd, ti, tj),
        unplace_pair_cotangent(c_dg, ti, tj),
        unplace_pair_cotangent(c_dx, ti, tj, antisymmetric=True),
        unplace_pair_cotangent(c_dy, ti, tj, antisymmetric=True),
        unplace_pair_cotangent(c_dz, ti, tj, antisymmetric=True),
        c_x, c_mu, c_wk, c_bk,
    )

    def ref_grads(dist, gate, dirx, diry, dirz, x, mu, wk, bk, gq, gmu):
        _, vjp = jax.vjp(
            lambda d, g, cx, cy, cz, xx, m, a, ab: painn_message_reference(
                d, g, cx, cy, cz, xx, m, a, ab, cutoff
            ),
            dist, gate, dirx, diry, dirz, x, mu, wk, bk,
        )
        return vjp((gq, gmu))

    _, vjp2 = jax.vjp(ref_grads, dist, gate, dirx, diry, dirz, x, mu, wk, bk,
                      gq, gmu)
    return vjp2(cts_ref)


_painn_sym_bwd.defvjp(_painn_sym_bwd_fwd, _painn_sym_bwd_bwd)


def _sym_vjp_bwd(cutoff, sparse, res, cots):
    dist, gate, dirx, diry, dirz, x, mu, wk, bk = res
    gq, gmu = cots
    return _painn_sym_bwd(
        dist, gate, dirx, diry, dirz, x, mu, wk, bk,
        gq.astype(jnp.float32), gmu.astype(jnp.float32), cutoff, sparse,
    )


painn_message_fused_sym.defvjp(_sym_vjp_fwd, _sym_vjp_bwd)


def painn_message(dist, gate, dirx, diry, dirz, x, mu, wk, bk, cutoff,
                  use_pallas=True, symmetric=False, sparse="auto"):
    """Dispatcher: fused kernel (symmetric variant when the caller guarantees
    symmetric dist/gate + antisymmetric directions AND the tiling can skip
    tiles) or the XLA reference. ``sparse``: True/False force occupancy-gated
    tiles on/off; "auto" enables them at the Atom3D pair-grid sizes (N>=128)
    where cutoff+padding leave most tiles empty (docs/PERF.md)."""
    if not use_pallas:
        return painn_message_reference(dist, gate, dirx, diry, dirz, x, mu,
                                       wk, bk, cutoff)
    from geossl_tpu.ops.pallas_utils import sparse_auto

    sp = sparse_auto(dist.shape[-1], sparse)
    if symmetric and painn_sym_profitable(dist.shape[-1]):
        return painn_message_fused_sym(dist, gate, dirx, diry, dirz, x, mu,
                                       wk, bk, cutoff, sp)
    return painn_message_fused(dist, gate, dirx, diry, dirz, x, mu, wk, bk,
                               cutoff, sp)


# --------------------------------------------------------------------------
# Whole-stack inference kernel (kexp9, round 4): the full n_interactions-deep
# interaction+mixing chain in ONE program, q and the three mu channels
# resident in VMEM across blocks and the RBF hoisted (the per-block chain
# recomputes it per layer). FORWARD-ONLY — no custom VJP: training keeps the
# per-block painn_message path (kexp3's SchNet precedent: the backward is at
# its compute floor, so whole-stack fusion there bought 6%). Measured at the
# DDM/QM9 shape (B=128, N=32, F=128): 1.23x over the per-block fused chain,
# 1.63x over XLA (experiments/README.md kexp9).
#
# No N>=128 variant exists BY CONSTRUCTION: one layer's gated filter
# row-block is 100-400 MB against 128 MB of VMEM, and tiling j back in
# forces q/mu through HBM per tile — which is exactly the per-block chain.


def _stack_kernel(dist_ref, gate_ref, dx_ref, dy_ref, dz_ref, q_ref,
                  wd1_ref, bd1_ref, wd2_ref, bd2_ref, wk_ref, bk_ref,
                  wmix_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  qo_ref, muo_ref, *res_refs, bb, n, f, num_r, cutoff,
                  nblocks, epsilon):
    # res_refs (save_residuals mode, painn_stack_train): qs/mus = q/mu at
    # interaction entry, qps/mups = at mixing entry — the per-block
    # boundaries the XLA-side backward chain resumes from (kexp10).
    if res_refs:
        qs_ref, mus_ref, qps_ref, mups_ref = res_refs
    coeff = -0.5 / (cutoff / (num_r - 1)) ** 2

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # RBF hoisted across blocks (Mosaic-legal: minor expand, major collapse)
    off = _offsets(cutoff, num_r)
    diff4 = dist_ref[...][:, :, :, None] - off.reshape(1, 1, 1, num_r)
    phi = jnp.exp(coeff * diff4 * diff4).reshape(bb * n * n, num_r)
    gate4 = gate_ref[...][:, :, :, None]
    dirs4 = (dx_ref[...][:, :, :, None], dy_ref[...][:, :, :, None],
             dz_ref[...][:, :, :, None])

    q = q_ref[...].reshape(bb * n, f)
    mu = [jnp.zeros((bb * n, f), jnp.float32) for _ in range(3)]
    for k in range(nblocks):
        if res_refs:
            qs_ref[:, k] = q.reshape(bb, n, f)
            mus_ref[:, k] = jnp.concatenate(mu, axis=-1).reshape(bb, n, 3 * f)
        # interaction: per-node x-MLP (MXU)
        x = jax.nn.silu(dot(q, wd1_ref[k]) + bd1_ref[k : k + 1])
        x = dot(x, wd2_ref[k]) + bd2_ref[k : k + 1]
        xq, xr, xm = jnp.split(x, 3, axis=-1)
        # gated filter slice for this layer (pair grid, MXU)
        w3 = (dot(phi, wk_ref[k]) + bk_ref[k : k + 1]).reshape(
            bb, n, n, 3 * f) * gate4
        wq, wr, wm = jnp.split(w3, 3, axis=-1)
        # j-reductions
        xq4 = xq.reshape(bb, 1, n, f)
        dq = jnp.sum(wq * xq4, axis=2).reshape(bb * n, f)
        wrx = wr * xr.reshape(bb, 1, n, f)
        wmx = wm * xm.reshape(bb, 1, n, f)
        q = q + dq
        for c in range(3):
            mu_c4 = mu[c].reshape(bb, 1, n, f)
            dmu_c = jnp.sum(wrx * dirs4[c] + wmx * mu_c4, axis=2)
            mu[c] = mu[c] + dmu_c.reshape(bb * n, f)
        if res_refs:
            qps_ref[:, k] = q.reshape(bb, n, f)
            mups_ref[:, k] = jnp.concatenate(mu, axis=-1).reshape(
                bb, n, 3 * f)
        # mixing (per node, MXU)
        v, w = [], []
        for c in range(3):
            v_c, w_c = jnp.split(dot(mu[c], wmix_ref[k]), 2, axis=-1)
            v.append(v_c)
            w.append(w_c)
        vn = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2] + epsilon)
        ctx = jnp.concatenate([q, vn], axis=-1)
        x2 = jax.nn.silu(dot(ctx, w1_ref[k]) + b1_ref[k : k + 1])
        x2 = dot(x2, w2_ref[k]) + b2_ref[k : k + 1]
        dq_i, dgate, dqmu = jnp.split(x2, 3, axis=-1)
        vw = v[0] * w[0] + v[1] * w[1] + v[2] * w[2]
        q = q + dq_i + dqmu * vw
        for c in range(3):
            mu[c] = mu[c] + dgate * w[c]

    qo_ref[...] = q.reshape(bb, n, f)
    muo_ref[...] = jnp.concatenate(mu, axis=-1).reshape(bb, n, 3 * f)


# Largest N the whole-stack kernels accept. 64 was the round-4 VMEM
# analysis; kexp10 MEASURED N=128 on the chip: compiles (bb=1 fits the
# [bb,128,128,3F] gated filter block under the 110 MB window), parity at
# the usual bf16 drift (8.2e-4 rel), 1.32x over the per-block fused chain
# at B=128 (kexp10_results.json part3). N=512 stays impossible by
# construction — the kexp9 docstring analysis.
STACK_MAX_N = 128


def _stack_pallas(dist, gate, dirx, diry, dirz, q0, stacked, cutoff,
                  epsilon, save_residuals=False):
    b, n, _ = dist.shape
    f = q0.shape[-1]
    num_r = stacked[4].shape[1]
    nblocks = stacked[0].shape[0]
    if n > STACK_MAX_N:
        raise ValueError(
            f"painn stack kernel: N={n} exceeds the VMEM-resident limit "
            f"({STACK_MAX_N}); use the per-block path")
    bb = _batch_block(b, n, n, budget=4096)
    kern = partial(
        _stack_kernel, bb=bb, n=n, f=f, num_r=num_r, cutoff=cutoff,
        nblocks=nblocks, epsilon=epsilon)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
    pair = pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0))
    out_specs = [
        pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0)),
        pl.BlockSpec((bb, n, 3 * f), lambda i: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        jax.ShapeDtypeStruct((b, n, 3 * f), jnp.float32),
    ]
    if save_residuals:
        L = nblocks
        for width in (f, 3 * f, f, 3 * f):  # qs, mus, qps, mups
            out_specs.append(
                pl.BlockSpec((bb, L, n, width), lambda i: (i, 0, 0, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct((b, L, n, width), jnp.float32))
    return pl.pallas_call(
        kern,
        grid=(b // bb,),
        in_specs=[pair] * 5
        + [pl.BlockSpec((bb, n, f), lambda i: (i, 0, 0))]
        + [full(w) for w in stacked],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
    )(dist, gate, dirx, diry, dirz, q0, *stacked)


def painn_stack_infer(dist, gate, dirx, diry, dirz, q0, stacked, cutoff,
                      epsilon=1e-8):
    """Whole-stack PaiNN forward: (q [B,N,F], mu_flat [B,N,3F]) after ALL
    interaction+mixing blocks. ``stacked`` is the 11-tuple of per-layer
    weight stacks (wd1 [L,F,F], bd1 [L,F], wd2 [L,F,3F], bd2 [L,3F],
    wk [L,R,3F], bk [L,3F], wmix [L,F,2F], w1 [L,2F,F], b1 [L,F],
    w2 [L,F,3F], b2 [L,3F]). Inference only — see the block comment;
    the differentiable variant is :func:`painn_stack_train`."""
    return _stack_pallas(dist, gate, dirx, diry, dirz, q0, stacked, cutoff,
                         epsilon, save_residuals=False)


# --------------------------------------------------------------------------
# kexp10 (round 5): differentiable whole-stack forward. The mega kernel has
# no VJP of its own; instead the forward saves the per-block (q, mu)
# boundary values it already holds in VMEM, and the backward REUSES the
# existing per-block machinery — XLA vjps for the x-MLP/mixing halves and
# the _painn_bwd kernel (which recomputes its pair grid in-kernel) for the
# message half. Net effect on a training step: the forward pass runs the
# stack kernel (1.23x over the per-block fused chain at the DDM shape,
# kexp9) while the backward work is unchanged.


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def painn_stack_train(dist, gate, dirx, diry, dirz, q0, stacked, cutoff,
                      epsilon=1e-8):
    """Differentiable whole-stack PaiNN forward (same contract as
    :func:`painn_stack_infer`). First-order AD only; grads flow to every
    array input (dist, gate, directions, q0, the 11 weight stacks)."""
    return _stack_pallas(dist, gate, dirx, diry, dirz, q0, stacked, cutoff,
                         epsilon, save_residuals=False)


def _xmlp(q, wd1, bd1, wd2, bd2):
    x = jax.nn.silu(q @ wd1 + bd1)
    return x @ wd2 + bd2


def _mixing(qp, mup_flat, wmix, w1, b1, w2, b2, epsilon):
    """PaiNNMixing math on [B,N,·] tensors (models/painn.py:155-178)."""
    b, n, f = qp.shape
    mu = mup_flat.reshape(b, n, 3, f)
    mu_mix = mu @ wmix
    mu_v, mu_w = jnp.split(mu_mix, 2, axis=-1)
    mu_vn = jnp.sqrt(jnp.sum(mu_v * mu_v, axis=-2) + epsilon)
    ctx = jnp.concatenate([qp, mu_vn], axis=-1)
    x = jax.nn.silu(ctx @ w1 + b1)
    x = x @ w2 + b2
    dq_intra, dmu_gate, dqmu_intra = jnp.split(x, 3, axis=-1)
    vw = jnp.sum(mu_v * mu_w, axis=-2)
    q_out = qp + dq_intra + dqmu_intra * vw
    mu_out = mu + dmu_gate[:, :, None, :] * mu_w
    return q_out, mu_out.reshape(b, n, 3 * f)


def _stack_train_fwd(dist, gate, dirx, diry, dirz, q0, stacked, cutoff,
                     epsilon):
    q, mu, qs, mus, qps, mups = _stack_pallas(
        dist, gate, dirx, diry, dirz, q0, stacked, cutoff, epsilon,
        save_residuals=True)
    return (q, mu), (dist, gate, dirx, diry, dirz, stacked, qs, mus, qps,
                     mups)


def _stack_train_bwd(cutoff, epsilon, res, cots):
    dist, gate, dirx, diry, dirz, stacked, qs, mus, qps, mups = res
    gq, gmu = cots
    wd1, bd1, wd2, bd2, wk, bk, wmix, w1, b1, w2, b2 = stacked
    L = wd1.shape[0]
    # per-k gradient pieces collected in lists and stacked at the end:
    # .at[k].add scatters here fuse (with all nine kernel outputs live)
    # into one XLA fusion whose scoped-VMEM allocation blows the 16 MB
    # limit at the flagship shape
    per_k = [[None] * L for _ in range(11)]
    gdist = jnp.zeros_like(dist)
    ggate = jnp.zeros_like(gate)
    gdx = jnp.zeros_like(dirx)
    gdy = jnp.zeros_like(diry)
    gdz = jnp.zeros_like(dirz)
    for k in reversed(range(L)):
        # mixing half (XLA vjp; recomputes its per-node intermediates)
        _, mix_vjp = jax.vjp(
            partial(_mixing, epsilon=epsilon),
            qps[:, k], mups[:, k], wmix[k], w1[k], b1[k], w2[k], b2[k])
        gqp, gmup, gwmix, gw1, gb1, gw2, gb2 = mix_vjp((gq, gmu))
        per_k[6][k], per_k[7][k], per_k[8][k] = gwmix, gw1, gb1
        per_k[9][k], per_k[10][k] = gw2, gb2
        # message half: the existing per-block backward kernel (recomputes
        # the pair grid in-kernel from the saved block inputs)
        x_k, xmlp_vjp = jax.vjp(
            _xmlp, qs[:, k], wd1[k], bd1[k], wd2[k], bd2[k])
        dd, dg, ddx, ddy, ddz, dx, dmu_in, dwk, dbk = _painn_bwd(
            dist, gate, dirx, diry, dirz, x_k, mus[:, k], wk[k], bk[k],
            gqp, gmup, cutoff, False)
        gdist += dd
        ggate += dg
        gdx += ddx
        gdy += ddy
        gdz += ddz
        per_k[4][k], per_k[5][k] = dwk, dbk
        gq_from_x, gwd1, gbd1, gwd2, gbd2 = xmlp_vjp(dx)
        per_k[0][k], per_k[1][k] = gwd1, gbd1
        per_k[2][k], per_k[3][k] = gwd2, gbd2
        # residual identity paths into the block inputs
        gq = gqp + gq_from_x
        gmu = gmup + dmu_in
    g_stack = tuple(jnp.stack(pieces) for pieces in per_k)
    # mu0 is created inside the op (zeros): its cotangent is dropped
    return gdist, ggate, gdx, gdy, gdz, gq, g_stack


painn_stack_train.defvjp(_stack_train_fwd, _stack_train_bwd)
