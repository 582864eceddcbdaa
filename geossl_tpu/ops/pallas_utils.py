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
    if (ti < 8 and ti != n) or (tj < 128 and tj != n):
        # Mosaic requires the last two block dims be (8, 128)-divisible or
        # equal to the full array dims; the padded-bucket loader only emits
        # power-of-two N so this never triggers in the training paths.
        raise ValueError(
            f"pair grids of size N={n} do not tile cleanly; pad N to a "
            "power-of-two bucket (data/bucketing.py) or a multiple of 128"
        )
    return ti, tj
