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
