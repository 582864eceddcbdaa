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


def pair_tiles(n: int, row_budget: int = 4096) -> tuple[int, int]:
    """(ti, tj) tile shape for an [N, N] pair grid.

    Mosaic requires the last two block dims be multiples of (8, 128) or
    equal to the full array dims; choosing divisors (falling back to n)
    keeps every N legal — power-of-two buckets get the usual
    (row_budget/128, 128) tiles, odd sizes degrade to full-dim blocks.
    ``row_budget`` bounds ti*tj (VMEM working set; kernels with more live
    per-pair tensors pass a smaller budget)."""
    tj = _largest_legal_divisor(n, 128, 128)
    ti = _largest_legal_divisor(n, max(8, row_budget // tj), 8)
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
