"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax


def interpret() -> bool:
    """Compiled Mosaic kernels need a real TPU; everywhere else (CPU tests,
    the 8-virtual-device mesh) runs the interpreter."""
    return jax.default_backend() != "tpu"


def pair_tiles(n: int, row_budget: int = 4096) -> tuple[int, int]:
    """(ti, tj) tile shape for an [N, N] pair grid: full-width lanes up to
    128, then as many sublane rows as fit ``row_budget`` pair rows (VMEM
    working-set control; kernels with more live per-pair tensors pass a
    smaller budget)."""
    tj = min(n, 128)
    ti = min(n, max(8, row_budget // tj))
    while n % ti:
        ti //= 2
    while n % tj:
        tj //= 2
    return ti, tj
