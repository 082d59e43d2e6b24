"""Vectorized Hilbert-curve ranking on a 2^16 x 2^16 grid.

Branchless Hilbert d-index, vectorized with numpy uint32/uint64 ops so a
whole Arrow batch of grid coordinates is ranked in a handful of SIMD
passes.  Algorithm: the public-domain branchless formulation from
https://github.com/rawrunprotected/hilbert_curves (the same public
source the reference credits at locus/_core/hilbert.py:8); conformance
is tested against an independent textbook implementation
(:func:`hilbert_index_slow`, the classic xy2d loop from the Wikipedia
"Hilbert curve" article), mirroring the reference's own independent
oracle at tests/utils.py:229-246.

Parity target: identical 32-bit ranks to locus/_core/hilbert.py:7-42
for every (x, y) in [0, 65535]^2.
"""

from __future__ import annotations

import numpy as np

from .config import MAX_COORDINATE

_M = np.uint32(MAX_COORDINATE)


def _interleave(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each uint32 into even bit positions."""
    v = (v | (v << 8)) & np.uint32(0x00FF00FF)
    v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & np.uint32(0x33333333)
    return (v | (v << 1)) & np.uint32(0x55555555)


def hilbert_index(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert rank (uint64 in [0, 2^32)) of integer grid coords.

    ``x``/``y`` must already be clipped to [0, 65535]; use
    :func:`locus_ray.cells.grid_coords` for float->grid scaling.
    """
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)

    a = x ^ y
    b = _M ^ a
    c = _M ^ (x | y)
    d = x & (y ^ _M)

    a, b, c, d = (
        a | (b >> 1),
        (a >> 1) ^ a,
        ((c >> 1) ^ (b & (d >> 1))) ^ c,
        ((a & (c >> 1)) ^ (d >> 1)) ^ d,
    )
    a, b, c, d = (
        (a & (a >> 2)) ^ (b & (b >> 2)),
        (a & (b >> 2)) ^ (b & ((a ^ b) >> 2)),
        c ^ ((a & (c >> 2)) ^ (b & (d >> 2))),
        d ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2))),
    )
    a, b, c, d = (
        (a & (a >> 4)) ^ (b & (b >> 4)),
        (a & (b >> 4)) ^ (b & ((a ^ b) >> 4)),
        c ^ ((a & (c >> 4)) ^ (b & (d >> 4))),
        d ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4))),
    )
    c = c ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    d = d ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))

    a = c ^ (c >> 1)
    b = d ^ (d >> 1)
    i0 = x ^ y
    i1 = b | (_M ^ (i0 | a))
    return (
        (_interleave(i1).astype(np.uint64) << np.uint64(1))
        | _interleave(i0).astype(np.uint64)
    )


def hilbert_index_slow(size: int, x: int, y: int) -> int:
    """Independent scalar oracle: classic xy2d (Wikipedia, Hilbert curve).

    Same role as the reference's independent oracle
    (tests/utils.py:229-246): validates :func:`hilbert_index` without
    sharing any code with it.
    """
    rank = 0
    step = size // 2
    while step > 0:
        rx = 1 if (x & step) > 0 else 0
        ry = 1 if (y & step) > 0 else 0
        rank += step * step * ((3 * rx) ^ ry)
        # rotate quadrant (rotation reflects within the full grid)
        if ry == 0:
            if rx == 1:
                x = size - 1 - x
                y = size - 1 - y
            x, y = y, x
        step //= 2
    return rank
