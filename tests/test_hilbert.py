"""Hilbert encode conformance vs the independent slow oracle
(mirrors the reference's oracle pattern, tests/utils.py:229-246)."""

import numpy as np

from locus_ray.hilbert import hilbert_index, hilbert_index_slow


def test_matches_independent_oracle():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 65536, 500).astype(np.uint32)
    ys = rng.integers(0, 65536, 500).astype(np.uint32)
    fast = hilbert_index(xs, ys)
    for i in range(len(xs)):
        assert int(fast[i]) == hilbert_index_slow(65536, int(xs[i]), int(ys[i]))


def test_corners_and_range():
    corners = [(0, 0), (0, 65535), (65535, 65535), (65535, 0)]
    vals = hilbert_index(
        np.array([c[0] for c in corners], dtype=np.uint32),
        np.array([c[1] for c in corners], dtype=np.uint32),
    )
    assert int(vals[0]) == 0
    assert int(vals[3]) == 2**32 - 1
    assert all(0 <= int(v) < 2**32 for v in vals)


def test_locality_small_steps():
    # adjacent grid cells along the curve differ by exactly 1 in rank
    # for a sample of ranks -> invertibility/locality sanity
    rng = np.random.default_rng(1)
    xs = rng.integers(0, 65535, 200).astype(np.uint32)
    ys = rng.integers(0, 65535, 200).astype(np.uint32)
    r = hilbert_index(xs, ys)
    # distinct points map to distinct ranks (bijection sample)
    assert len(np.unique(r)) == len(np.unique(xs.astype(np.uint64) << 32 | ys))


def test_morton_rank_matches_bit_reference():
    """Morton gate key equals a per-bit python reference (x odd bits)."""
    import numpy as np

    from locus_ray.hilbert import _interleave

    rng = np.random.default_rng(71)
    ix = rng.integers(0, 1 << 16, 200).astype(np.uint32)
    iy = rng.integers(0, 1 << 16, 200).astype(np.uint32)
    got = ((_interleave(ix).astype(np.uint64) << np.uint64(1))
           | _interleave(iy).astype(np.uint64))
    for a, b, g in zip(ix.tolist(), iy.tolist(), got.tolist()):
        want = 0
        for j in range(16):
            want |= ((a >> j) & 1) << (2 * j + 1)
            want |= ((b >> j) & 1) << (2 * j)
        assert g == want
