"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax


def interpret() -> bool:
    """Compiled Mosaic kernels need a real TPU; everywhere else (CPU tests,
    the 8-virtual-device mesh) runs the interpreter."""
    return jax.default_backend() != "tpu"


def _largest_legal_divisor(n: int, cap: int, unit: int) -> int:
    """Largest divisor of n that is <= cap and a multiple of ``unit``;
    falls back to n itself (a full-size block dim is always legal)."""
    for d in range(min(n, cap), unit - 1, -1):
        if n % d == 0 and d % unit == 0:
            return d
    return n


def batch_block(b: int, ti: int, tj: int, budget: int = 8192) -> int:
    """Graphs per kernel program for a (b, i, j) pair-tile grid. Tiny
    per-graph tiles (N=32 -> 32x32) would otherwise spend the step on
    per-program overhead and under-feed the MXU; blocking bb graphs per
    program amortizes both. Keeps bb*ti*tj <= budget so live
    [bb*ti*tj, F] intermediates stay a few MB; large-N shapes
    (ti*tj >= budget) degrade to bb=1, per-graph programs. (For the PaiNN
    kernels the measured win is only ~1.02x — they are bound by in-kernel
    VPU reductions — kept there for variance and structural consistency;
    round-3 interleaved A/B, bitwise-identical outputs.)"""
    return _largest_legal_divisor(b, max(1, budget // (ti * tj)), 1)


def pair_tiles(n: int, row_budget: int = 4096) -> tuple[int, int]:
    """(ti, tj) tile shape for an [N, N] pair grid.

    Mosaic requires the last two block dims be multiples of (8, 128) or
    equal to the full array dims; choosing divisors (falling back to n)
    keeps every N legal — power-of-two buckets get the usual
    (row_budget/128, 128) tiles, odd sizes degrade to full-dim blocks.
    ``row_budget`` bounds ti*tj (VMEM working set; kernels with more live
    per-pair tensors pass a smaller budget)."""
    return pair_tiles_rect(n, n, row_budget)


def pair_tiles_rect(ni: int, nj: int, row_budget: int = 4096) -> tuple[int, int]:
    """(ti, tj) for a rectangular [Ni, Nj] pair grid (the pair-axis
    model-parallel stripes, parallel/pair_parallel.py). Identical to
    :func:`pair_tiles` when ni == nj."""
    tj = _largest_legal_divisor(nj, 128, 128)
    ti = _largest_legal_divisor(ni, max(8, row_budget // tj), 8)
    return ti, tj


def sym_grid_info(n: int, row_budget: int = 4096) -> tuple[int, int, int]:
    """(ti, tj, n_skipped) for the symmetric pair kernels: tile (pi, pj) is
    skippable iff every cell (r, c) in it lies in the strict lower triangle
    at tile granularity: (pj+1)*tj <= pi*ti."""
    ti, tj = pair_tiles(n, row_budget)
    skipped = sum(
        1
        for pi in range(n // ti)
        for pj in range(n // tj)
        if (pj + 1) * tj <= pi * ti
    )
    return ti, tj, skipped


def tile_occupancy(env, bb: int, ti: int, tj: int):
    """int32 FLAT [B/bb * N/ti * N/tj] flags ([b, i, j] order): 1 where any
    cell of the (bb, ti, tj) pair-tile block has a nonzero envelope/gate.
    Computed in XLA right before a sparse ``pallas_call`` and handed to the
    kernel via scalar prefetch — empty tiles (out-of-cutoff and padding
    regions; 45-60% of all tiles at Atom3D density, see docs/PERF.md) skip
    their whole VPU/MXU body. Kept 1-D deliberately: multi-dim SMEM arrays
    are lane-padded to 128 in the minor dim, which overflows scoped SMEM at
    Atom3D grid sizes (s32[64,32,4] pads to 1 MB); the flat form stays at
    its true byte size. Read it with :func:`occ_at`.

    Exactness: a tile with env==0 everywhere contributes zero to the output
    and to every env-weighted cotangent; the raw ``denv`` cotangent is zeroed
    on skipped tiles, which is exact for any downstream where env is
    identically zero outside the cutoff (hard cutoff and cosine envelope both
    have value AND slope zero there)."""
    import jax.numpy as jnp

    b, ni, nj = env.shape
    t = env.reshape(b // bb, bb, ni // ti, ti, nj // tj, tj)
    return jnp.any(t != 0, axis=(1, 3, 5)).astype(jnp.int32).reshape(-1)


def occ_at(occ_ref, bi, ii, jj, ni, nj):
    """Tile flag from the flat ``tile_occupancy`` array. ``ni``/``nj`` are
    the i/j tile counts — inside a kernel pass the matching
    ``pl.num_programs`` axes (fwd grids are (b, i, j); the backward and
    symmetric grids are (b, j, i), so their ni is num_programs(2))."""
    return occ_ref[(bi * ni + ii) * nj + jj]


def _drop_scalar_arg(index_map):
    """Adapt a dense index_map to the scalar-prefetch calling convention
    (grid indices ..., occ_ref) by ignoring the trailing scalar ref."""
    def adapted(*args, _f=index_map):
        return _f(*args[:-1])

    return adapted


def pair_pallas_call(kernel, grid, in_specs, out_specs, out_shape, args,
                     occ=None, interpret=False, compiler_params=None):
    """``pl.pallas_call`` over a pair-tile grid, optionally occupancy-gated.

    With ``occ`` (int32 tile flags from :func:`tile_occupancy`) the call uses
    ``PrefetchScalarGridSpec``: the kernel receives ``occ_ref`` as its first
    argument (read it with the grid's program_ids) and every index_map is
    adapted to the (…, occ_ref) convention. With ``occ=None`` this is a plain
    dense call and the kernel must NOT expect ``occ_ref``."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    single_out = not isinstance(out_specs, (list, tuple))
    kw = {} if compiler_params is None else {"compiler_params": compiler_params}
    if occ is None:
        return pl.pallas_call(
            kernel, grid=grid, in_specs=list(in_specs), out_specs=out_specs,
            out_shape=out_shape, interpret=interpret, **kw,
        )(*args)
    adapt = lambda s: pl.BlockSpec(s.block_shape, _drop_scalar_arg(s.index_map))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[adapt(s) for s in in_specs],
        out_specs=adapt(out_specs) if single_out
        else [adapt(s) for s in out_specs],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        **kw,
    )(occ, *args)


def sparse_auto(n: int, sparse) -> bool:
    """Resolve a ``sparse`` knob ('auto' -> every multi-tile pair grid;
    measured wins at every such shape — 1.05-1.13x at the N=128 pretrain
    bucket, 1.16-2.36x at the Atom3D shapes (experiments/kexp5.py). At
    N<=64 the grid is a single full-array tile that is always occupied
    (a molecule's own pairs), so flags would be pure overhead)."""
    if sparse == "auto":
        return n >= 128
    if sparse in ("on", True):
        return True
    if sparse in ("off", False, None):
        return False
    raise ValueError(
        f"sparse must be 'auto', 'on'/'off', or a bool; got {sparse!r}")


def mirror_skipped_mask(ri, cj, ti, tj):
    """[1, ti, tj, 1] f32: 1 where cell (r, c)'s MIRROR (c, r) lies in a
    skipped tile — i.e. this computed cell must also emit the mirror's
    contributions. Built f32-first with stepwise dim expansion (major expand
    then minor append) — Mosaic rejects reshapes of i1 vectors."""
    import jax
    import jax.numpy as jnp

    r = ri + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    c = cj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    mb = ((r // tj + 1) * tj <= (c // ti) * ti).astype(jnp.float32)
    return mb[None, :, :][:, :, :, None]


def unplace_pair_cotangent(c, ti, tj, antisymmetric: bool = False):
    """Transpose of the symmetric kernels' placement operator P over the last
    two axes: skipped cells read their computed mirror's cotangent (negated
    for antisymmetric pair fields like directions)."""
    import jax.numpy as jnp

    n = c.shape[-1]
    r = jnp.arange(n)[:, None]
    cc = jnp.arange(n)[None, :]
    skipped = (cc // tj + 1) * tj <= (r // ti) * ti
    mirrored = jnp.swapaxes(c, -1, -2)
    if antisymmetric:
        mirrored = -mirrored
    return jnp.where(skipped, mirrored, c)
