"""Static-shape helpers. Everything that runs under jit in this framework
uses fixed shapes (capacity-padded index arrays, padded query batches) so
XLA compiles once and caches; these helpers centralize the rounding."""
from __future__ import annotations

import numpy as np


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def pad_axis_to(arr: np.ndarray, size: int, axis: int = 0, fill=0) -> np.ndarray:
    """Pad `arr` along `axis` to exactly `size` with `fill` (numpy, host-side)."""
    cur = arr.shape[axis]
    if cur == size:
        return arr
    if cur > size:
        raise ValueError(f"axis {axis} already {cur} > target {size}")
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, size - cur)
    return np.pad(arr, widths, constant_values=fill)
