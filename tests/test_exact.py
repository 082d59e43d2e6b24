"""Exact-refine parity tests: cases where float64 orientation lies."""

import numpy as np
from fractions import Fraction

from locus_ray.exact import (
    orientation,
    points_in_polygon_exact,
    segments_intersect_exact,
)


def _orient_fraction(ox, oy, ax, ay, bx, by):
    d = (Fraction(ax) - Fraction(ox)) * (Fraction(by) - Fraction(oy)) - (
        Fraction(ay) - Fraction(oy)
    ) * (Fraction(bx) - Fraction(ox))
    return (d > 0) - (d < 0)


def test_orientation_matches_fraction_oracle_near_collinear():
    rng = np.random.default_rng(42)
    # construct nearly-collinear triples: points on a line + tiny ulp nudges
    n = 3000
    t = rng.uniform(0, 1, n)
    ox = rng.uniform(-100, 100, n)
    oy = rng.uniform(-100, 100, n)
    dx = rng.uniform(-10, 10, n)
    dy = rng.uniform(-10, 10, n)
    ax = ox + dx
    ay = oy + dy
    bx = ox + t * dx
    by = oy + t * dy
    # nudge b by -2..2 ulps in y
    nudge = rng.integers(-2, 3, n)
    by = np.asarray(
        [np.nextafter(v, np.inf) if k > 0 else (np.nextafter(v, -np.inf) if k < 0 else v)
         for v, k in zip(by, nudge)]
    )
    got = orientation(ox, oy, ax, ay, bx, by)
    for i in range(n):
        assert got[i] == _orient_fraction(ox[i], oy[i], ax[i], ay[i], bx[i], by[i]), i


def test_orientation_exact_zero_on_collinear():
    # exactly-representable collinear points -> sign 0, never +-1
    got = orientation(
        np.array([0.0]), np.array([0.0]),
        np.array([1e16]), np.array([1e16]),
        np.array([0.5e16]), np.array([0.5e16]),
    )
    assert got[0] == 0


def test_segments_intersect_exact_touching():
    # endpoint exactly on the other segment, huge coordinates
    a = segments_intersect_exact(
        np.array([0.0]), np.array([0.0]), np.array([1e15]), np.array([1e15]),
        np.array([0.25e15]), np.array([0.25e15]), np.array([1.0]), np.array([-5.0]),
    )
    assert bool(a[0])


def test_pip_exact_boundary_large_coords():
    rx = np.array([0.0, 1e15, 1e15, 0.0])
    ry = np.array([0.0, 0.0, 1e15, 1e15])
    px = np.array([0.5e15, 2e15])
    py = np.array([0.0, 0.0])  # first exactly on bottom edge
    got = points_in_polygon_exact(rx, ry, px, py)
    assert got.tolist() == [True, False]


def test_pip_exact_large_coordinate_boundary():
    """Points exactly on polygon edges at large coordinates: the exact
    kernel must classify every boundary point as inside (closed
    semantics, per-Fraction ground truth); the float kernel is ALLOWED
    to differ here and measurably does on some of these inputs."""
    from locus_ray.kernels import points_in_polygon

    # right triangle with a slanted hypotenuse at ~1e9 magnitude; points
    # constructed exactly on the hypotenuse via even integer midpoints
    a, b = 2 * (10**9 + 7), 2 * 777_777_773
    ring_x = np.array([0.0, float(a), 0.0])
    ring_y = np.array([0.0, float(b), float(b)])
    ts = np.arange(1, 200) / 200.0  # rational points on the edge
    px = np.array([float(Fraction(a) * Fraction(t).limit_denominator(200)) for t in ts])
    py = np.array([float(Fraction(b) * Fraction(t).limit_denominator(200)) for t in ts])
    # snap to exactly-representable collinear points: scale by powers of 2
    px = np.array([a * k / 256.0 for k in range(1, 256)])
    py = np.array([b * k / 256.0 for k in range(1, 256)])
    # a*k/256 with a even and k<256: exact in float64 (a < 2^53/256)
    got = points_in_polygon_exact(ring_x, ring_y, px, py)
    assert got.all()  # every on-edge point is inside (closed)

    # Fraction ground truth for nearby off-edge points (1 ulp outward)
    px_out = np.nextafter(px, np.inf)
    got_out = points_in_polygon_exact(ring_x, ring_y, px_out, py)
    for i in range(0, len(px_out), 37):
        x, y = Fraction(px_out[i]), Fraction(py[i])
        # strictly right of the hypotenuse (0,0)->(a,b) = outside
        d = Fraction(a) * y - Fraction(b) * x
        inside_frac = d > 0 or (d == 0 and 0 <= x <= a)
        assert bool(got_out[i]) == bool(inside_frac)

    # document that the float path genuinely differs somewhere on this
    # family (if it ever stops differing, the test still holds)
    float_got = points_in_polygon(ring_x, ring_y, px, py)
    assert got.sum() >= float_got.sum()


def test_segseg_exact_zero_distance_predicate():
    """Touching segments at large coordinates: exact mode returns
    d2 == 0; the float kernel may miss the touch."""
    from locus_ray.exact import segments_squared_distance_exact

    a, b = 2 * (10**9 + 7), 2 * 777_777_773
    # segment A along the line (0,0)->(a,b); segment B ends exactly ON
    # that line at the representable point (a*k/256, b*k/256)
    k = 129
    tx, ty = a * k / 256.0, b * k / 256.0
    d2 = segments_squared_distance_exact(
        np.array([0.0]), np.array([0.0]), np.array([float(a)]), np.array([float(b)]),
        np.array([tx]), np.array([ty]), np.array([tx + 5e8]), np.array([ty - 5e8]),
    )
    assert d2[0] == 0.0


def test_pip_actor_exact_flag(ray_session):
    """exact=True stage output equals the float stage on the regular
    fixture (non-adversarial data; the flag costs, never changes,
    well-conditioned results)."""
    import ray
    import ray.data as rd
    import pyarrow as pa

    from locus_ray.stages import pip
    from locus_ray import derive

    ids = np.arange(2000, dtype=np.int64)
    x, y = derive.doc_xy(ids)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "x": pa.array(x),
                                 "y": pa.array(y)}))
    ref = ray.put(pip.polygon_payload(np.arange(25, dtype=np.int64)))
    out_f = ds.map_batches(
        pip.PipJoinActor, batch_format="pyarrow",
        fn_constructor_kwargs={"poly_ref": ref, "res": 8},
        concurrency=1,
    ).to_pandas().sort_values(["doc_id", "polygon_id"]).reset_index(drop=True)
    out_e = ds.map_batches(
        pip.PipJoinActor, batch_format="pyarrow",
        fn_constructor_kwargs={"poly_ref": ref, "res": 8, "exact": True},
        concurrency=1,
    ).to_pandas().sort_values(["doc_id", "polygon_id"]).reset_index(drop=True)
    assert out_f.equals(out_e)
