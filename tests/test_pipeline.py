"""End-to-end Ray pipeline tests: span passthrough, flagship shape,
stage behavior, checkpoint resume."""

import numpy as np
import pytest

from tests.conftest import SF


def test_flagship_span_passthrough(ray_session):
    """Every surviving row's span sequence is byte-identical to the
    input (the BASELINE.json input_hint invariant)."""
    from locus_ray.pipelines import flagship
    from locus_ray.sources import synth

    docs = synth.interleaved_docs(300)
    in_tab = docs.to_pandas().set_index("doc_id")
    in_sig = {}
    import pyarrow as pa

    docs2 = synth.interleaved_docs(300)
    tab = pa.Table.from_pandas(docs2.to_pandas())
    sigs = synth.span_signature(tab.column("spans"))
    for d, s in zip(tab.column("doc_id").to_pylist(), sigs):
        in_sig[d] = s

    out = flagship.flagship(sf_dir=SF, n_docs=300, k=2).to_pandas()
    assert len(out) == 600  # every doc gets k=2 neighbors
    out_tab = pa.Table.from_pandas(out)
    out_sigs = synth.span_signature(out_tab.column("spans"))
    for d, s in zip(out_tab.column("doc_id").to_pylist(), out_sigs):
        assert in_sig[d] == s


def test_assign_tiles_matches_library(ray_session):
    import ray.data as rd

    from locus_ray.cells import cell_id, grid_coords
    from locus_ray.hilbert import hilbert_index
    from locus_ray.stages import spatial

    rng = np.random.default_rng(3)
    x = rng.uniform(-180, 180, 500)
    y = rng.uniform(-90, 90, 500)
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"x": x, "y": y}))
    out = spatial.assign_tiles(ds, res=8).to_pandas()
    ix, iy = grid_coords(x, y)
    assert np.array_equal(out["ix"].to_numpy(), ix)
    assert np.array_equal(out["iy"].to_numpy(), iy)
    assert np.array_equal(out["cell_id"].to_numpy(), cell_id(x, y, 8))
    assert np.array_equal(
        out["hilbert_key"].to_numpy(),
        hilbert_index(ix.astype(np.uint32), iy.astype(np.uint32)).astype(np.int64),
    )


def test_pip_join_vs_brute_force(ray_session):
    import pyarrow as pa
    import ray
    import ray.data as rd

    from locus_ray.kernels import points_in_polygon
    from locus_ray.stages import pip

    payload = pip.polygon_payload(np.arange(12))
    rng = np.random.default_rng(5)
    x = rng.uniform(-180, 180, 800)
    y = rng.uniform(-90, 90, 800)
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(800), "x": x, "y": y}))
    ref = ray.put(payload)
    out = ds.map_batches(
        pip.PipJoinActor, batch_format="pyarrow",
        fn_constructor_kwargs={"poly_ref": ref, "res": 8},
        concurrency=1, batch_size=400,
    ).to_pandas()
    got = set(zip(out["doc_id"], out["polygon_id"]))
    exp = set()
    for p in payload["polygons"]:
        ok = points_in_polygon(p["ring_x"], p["ring_y"], x, y)
        for i in np.where(ok)[0]:
            exp.add((i, p["polygon_id"]))
    assert got == exp


def test_dedup_exact_with_planted_dups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import dedup

    texts = ["alpha beta", "gamma", "alpha beta", "delta", "gamma", "unique"]
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(6, dtype=np.int64), "text": texts}))
    out = dedup.dedup_exact(ds).to_pandas()
    assert len(out) == 4
    assert set(out["keep_id"]) == {0, 1, 3, 5}


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import dedup

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    rng = np.random.default_rng(9)
    others = [" ".join(rng.choice(list("abcdefghij"), 40)) for _ in range(20)]
    texts = [base, near, *others]
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                                 "text": texts}))
    pairs = dedup.minhash_lsh_pairs(ds, jaccard_threshold=0.4).to_pandas()
    assert (0, 1) in set(zip(pairs["doc_a"], pairs["doc_b"]))


def test_minhash_lsh_degenerate_bucket_is_linear(ray_session):
    """10^3 identical docs land in ONE bucket per band; star linking
    must emit exactly n-1 (rep, member) pairs — not O(n^2) — with
    est_jaccard 1.0 (VERDICT.md 'What's wrong' #4)."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import dedup

    n = 1000
    texts = ["identical boilerplate text repeated for every document"] * n
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(n, dtype=np.int64),
                                 "text": texts}))
    pairs = dedup.minhash_lsh_pairs(ds).to_pandas()
    assert len(pairs) == n - 1
    assert set(pairs["doc_a"]) == {0}
    assert set(pairs["doc_b"]) == set(range(1, n))
    assert (pairs["est_jaccard"] == 1.0).all()


def test_simhash_identical_texts_equal(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import dedup

    ds = rd.from_arrow(pa.table({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["same words here", "same words here", "totally different content"],
    }))
    out = dedup.simhash(ds).to_pandas().sort_values("doc_id")
    v = out["simhash"].tolist()
    assert v[0] == v[1] != v[2]


def test_ann_cosine_vs_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import ann

    rng = np.random.default_rng(13)
    m = rng.standard_normal((300, 16)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": np.arange(300, dtype=np.int64),
        "embedding": list(m),
    }))
    queries = {"query_id": np.array([0, 1]), "matrix": m[:2].astype(np.float64)}
    out = ann.cosine_topk(ds, queries, k=5).to_pandas()
    mm = m.astype(np.float64)
    mn = mm / np.linalg.norm(mm, axis=1, keepdims=True)
    for qi in (0, 1):
        sims = mn @ mn[qi]
        exp = np.lexsort((np.arange(300), -sims))[:5]
        got = out[out["query_id"] == qi].sort_values("rnk")["vec_id"].to_numpy()
        assert np.array_equal(got, exp)


def test_ann_lsh_recall(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import ann

    rng = np.random.default_rng(14)
    m = rng.standard_normal((500, 32)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": np.arange(500, dtype=np.int64),
        "embedding": list(m),
    }))
    queries = {"query_id": np.array([7]), "matrix": m[7:8].astype(np.float64)}
    out = ann.lsh_bucketed_topk(ds, queries, k=5).to_pandas()
    # the query vector itself must always be retrieved (same bucket)
    assert 7 in set(out["vec_id"])


def test_media_features_stub(ray_session):
    from locus_ray.sources import synth
    from locus_ray.stages import multimodal

    docs = synth.interleaved_docs(100)
    out = multimodal.media_features(docs, decode="fake", dim=8).to_pandas()
    assert set(out["kind"]) <= {"image", "audio", "table"}
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic: same ref -> same feature
    one = out[out["media_ref"] == out["media_ref"].iloc[0]]
    assert len({tuple(f) for f in one["feature"]}) == 1


def test_media_actors_empty_and_one_sided_batches():
    """Empty blocks (filtered upstreams emit them) and batches with
    zero spans of the wanted kind must not crash the vectorized
    fan-out (the ([0], cumsum[:-1]) idiom is 1-long vs 0-long counts
    — the same bug _csr_pairs/_bbox_cover_explode guard)."""
    import pyarrow as pa

    from locus_ray.stages.multimodal import (MediaFeatureActor,
                                             MediaTransformActor)

    span_t = pa.list_(pa.struct([
        ("kind", pa.string()), ("media_ref", pa.string()),
        ("start", pa.int32()), ("length", pa.int32())]))
    img = {"kind": "image", "media_ref": "m1", "start": 0, "length": 1}
    txt = {"kind": "text", "media_ref": None, "start": 0, "length": 5}
    full = pa.table({"doc_id": pa.array(["a", "b"], type=pa.string()),
                     "spans": pa.array([[img, txt], [txt]], type=span_t)})
    empty = full.slice(0, 0)

    for actor in (MediaFeatureActor(dim=4),
                  MediaTransformActor(op="resize"),
                  MediaTransformActor(op="frame_sample")):
        assert actor(empty).num_rows == 0
    # image-only corpus: frame_sample wants audio/table spans -> none
    assert MediaTransformActor(op="frame_sample")(full).num_rows == 0
    # and text-only docs produce no media features
    assert MediaFeatureActor(dim=4)(
        full.slice(1, 1)).num_rows == 0


def test_media_features_real_raises():
    from locus_ray.stages.multimodal import MediaFeatureActor

    actor = MediaFeatureActor(decode="real")
    with pytest.raises(NotImplementedError):
        actor._decode_one("media://image/1")


def test_checkpoint_resume(ray_session, tmp_path):
    import ray.data as rd

    from locus_ray.state import checkpoint

    out = str(tmp_path / "out")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return rd.range(100)

    r1 = checkpoint.run_shard(out, "s0", build)
    assert r1["rows"] == 100
    # second run: skipped (resumes from completed fragment)
    r2 = checkpoint.run_shard(out, "s0", build)
    assert calls["n"] == 1
    assert checkpoint.completed_shards(out) == {"s0"}


def test_partitioned_contain_join_with_salting(ray_session):
    from locus_ray.sources import tables
    from locus_ray.stages import partitioned, spatial
    import ray

    docs = tables.docs_geo(SF)
    zones = tables.zones_ds(SF)
    got = partitioned.contain_join_partitioned(
        docs, zones, res=8, num_partitions=4, hot_threshold=50
    ).to_pandas()
    # broadcast path is the oracle here
    ref = ray.put(tables.zones_payload(SF))
    exp = tables.docs_geo(SF).map_batches(
        spatial.ContainJoinActor, batch_format="pyarrow",
        fn_constructor_kwargs={"zones_ref": ref, "res": 8},
        concurrency=1,
    ).to_pandas()
    assert set(zip(got["doc_id"], got["zone_id"])) == set(zip(exp["doc_id"], exp["zone_id"]))


def test_contain_join_engines_equivalent(ray_session):
    """The grouped (default) and hash-join exchange shapes emit the
    same pair set, salted or not — the join engine stays covered as
    the A/B control after the default switched to "group"."""
    from locus_ray.sources import tables
    from locus_ray.stages import partitioned

    for hot in (None, 50):
        pair_sets = []
        for engine in ("group", "join"):
            got = partitioned.contain_join_partitioned(
                tables.docs_geo(SF), tables.zones_ds(SF), res=8,
                num_partitions=4, hot_threshold=hot, engine=engine,
            ).to_pandas()
            pair_sets.append(set(zip(got["doc_id"], got["zone_id"])))
        assert pair_sets[0] == pair_sets[1]
        assert pair_sets[0]


def test_knn_join_engines_equivalent(ray_session):
    """The grouped (default) and left-outer-join exchange shapes of the
    shuffle kNN emit identical (doc, zone, d2, rnk) rows, salted or
    not — and both match the broadcast-index oracle."""
    import ray

    from locus_ray import workload
    from locus_ray.sources import tables
    from locus_ray.stages import partitioned, spatial

    ref = ray.put(tables.zones_payload(SF))
    exp = (
        tables.docs_geo(SF).map_batches(
            spatial.KnnJoinActor, batch_format="pyarrow",
            fn_constructor_kwargs={"build_ref": ref, "kind": "box", "res": 8,
                                   "k": workload.K_ZONES, "id_out": "zone_id"},
            concurrency=1,
        ).to_pandas()
        .sort_values(["doc_id", "rnk"]).reset_index(drop=True)
    )
    for hot in (None, 50):
        for engine in ("group", "join"):
            got = partitioned.knn_join_partitioned(
                tables.docs_geo(SF), tables.zones_ds(SF),
                tables.zones_payload(SF), k=workload.K_ZONES, res=8,
                num_partitions=4, hot_threshold=hot, engine=engine,
            ).to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
            assert list(got["doc_id"]) == list(exp["doc_id"]), (engine, hot)
            assert list(got["zone_id"]) == list(exp["zone_id"]), (engine, hot)
            assert list(got["d2"]) == list(exp["d2"]), (engine, hot)


def test_contain_join_string_carry_falls_back_to_join(ray_session):
    """A non-integer carry column cannot ride the grouped exchange's
    unified int gid column — the engine must auto-fall-back to the
    hash-join path and still produce the broadcast oracle's pairs."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from locus_ray.sources import tables
    from locus_ray.stages import partitioned, spatial

    def add_s(t: pa.Table) -> pa.Table:
        return t.append_column("skey", pc.cast(t.column("doc_id"),
                                               pa.string()))

    docs = tables.docs_geo(SF).map_batches(add_s, batch_format="pyarrow")
    got = partitioned.contain_join_partitioned(
        docs, tables.zones_ds(SF), res=8, num_partitions=4,
        carry=("skey",),
    ).to_pandas()
    ref = ray.put(tables.zones_payload(SF))
    exp = tables.docs_geo(SF).map_batches(
        spatial.ContainJoinActor, batch_format="pyarrow",
        fn_constructor_kwargs={"zones_ref": ref, "res": 8},
        concurrency=1,
    ).to_pandas()
    assert set(zip(got["skey"].astype(int), got["zone_id"])) == \
        set(zip(exp["doc_id"], exp["zone_id"]))


def test_knn_shuffle_dominance_prune_vs_brute_force(ray_session):
    """Adversarial layer for the full-cover ID-dominance prune: a
    world-spanning zone, cell-sized interior zones stacked on one spot
    (zero-distance ties beyond k), boxes straddling cell borders
    (partial covers — must never be pruned), and docs in grid-EDGE
    cells (whose preimage is unbounded — never classified full).  The
    shuffle result must equal the brute-force top-k."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from locus_ray.kernels import box_point_squared_distance
    from locus_ray.stages import partitioned

    res, k = 4, 3  # coarse grid -> multi-cell zones with few rows
    # zones: 1 world-spanner, 8 identical stacked interior boxes
    # (ids 1..8 — dominance must keep ids 1..k), 3 border-straddlers
    # the 8 stacked boxes FULLY cover cells (7..8, 7..8) at res 4
    # (cell = 22.5 x 11.25 deg), so docs there see 8 zero-distance
    # ties and dominance must keep exactly ids 1..k
    zb = [(-180.0, 180.0, -90.0, 90.0)] + [(-25.0, 25.0, -15.0, 15.0)] * 8 \
        + [(-11.0, 9.0, -11.0, 9.0), (50.0, 71.0, -40.0, -19.0),
           (-179.0, -150.0, 60.0, 89.0)]
    zdf = pd.DataFrame({
        "zone_id": np.arange(len(zb), dtype=np.int64),
        "min_x": [b[0] for b in zb], "max_x": [b[1] for b in zb],
        "min_y": [b[2] for b in zb], "max_y": [b[3] for b in zb]})
    rng = np.random.default_rng(7)
    n = 400
    x = np.concatenate([rng.uniform(-179, 179, n - 4),
                        [-179.9, 179.9, 0.0, 20.0]])  # edge cells + stack
    y = np.concatenate([rng.uniform(-89, 89, n - 4),
                        [-89.9, 89.9, 0.0, 20.0]])
    ddf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "x": x, "y": y})
    payload = {"ids": zdf.zone_id.to_numpy(), "min_x": zdf.min_x.to_numpy(),
               "max_x": zdf.max_x.to_numpy(), "min_y": zdf.min_y.to_numpy(),
               "max_y": zdf.max_y.to_numpy()}

    d2m = box_point_squared_distance(
        payload["min_x"][None, :], payload["max_x"][None, :],
        payload["min_y"][None, :], payload["max_y"][None, :],
        x[:, None], y[:, None])
    rows = []
    for i in range(n):
        order = sorted(range(len(zb)), key=lambda j: (d2m[i, j], j))[:k]
        rows += [(i, j, d2m[i, j], r + 1) for r, j in enumerate(order)]
    exp = pd.DataFrame(rows, columns=["doc_id", "zone_id", "d2", "rnk"])

    for hot in (None, 50):
        got = partitioned.knn_join_partitioned(
            rd.from_pandas(ddf), rd.from_pandas(zdf), payload, k=k, res=res,
            num_partitions=4, hot_threshold=hot,
        ).to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
        assert list(got["doc_id"]) == list(exp["doc_id"]), hot
        assert list(got["zone_id"]) == list(exp["zone_id"]), hot
        assert np.allclose(got["d2"], exp["d2"]), hot


def test_csr_pairs_empty_sides():
    """Round-5 regression: a gkey group with ZERO probe rows (routine
    once GROUP_FAN makes groups finer than the build side's cover at
    small scale) crashed _csr_pairs — np.concatenate(([0], ...)) built
    a 1-long starts against a 0-long cnt.  Both empty sides must
    return empty pairings, and a mixed group must pair within cell."""
    import numpy as np

    from locus_ray.stages.partitioned import _csr_pairs

    cell = np.array([5, 5, 7, 9], dtype=np.int64)
    e = np.empty(0, dtype=np.int64)
    # zone-only group (no probes)
    di, zi, pd_, pz = _csr_pairs(cell, e, np.arange(4, dtype=np.int64))
    assert len(di) == len(pd_) == len(pz) == 0
    # probe-only group (no build rows)
    di, zi, pd_, pz = _csr_pairs(cell, np.arange(4, dtype=np.int64), e)
    assert len(pd_) == len(pz) == 0
    # mixed: probes rows 0,2 vs build rows 1,3 -> only cell 5 pairs
    di, zi, pd_, pz = _csr_pairs(cell, np.array([0, 2], dtype=np.int64),
                                 np.array([1, 3], dtype=np.int64))
    assert list(di[pd_]) == [0] and list(zi[pz]) == [1]


def test_knn_shuffle_dominance_prune_hostile_hot_cells(ray_session):
    """VERDICT r4 #6: a HOSTILE fixture for the full-cover prune —
    a dense hot doc cluster whose cells are fully covered by MANY
    stacked zones with INTERLEAVED partial covers crossing the same
    cells, salting active.  The shuffle result must equal brute force
    under the (d2, smallest-id) tie-break, and the prune must actually
    collapse the full-cover bulk (op-count receipt asserted)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from locus_ray.kernels import box_point_squared_distance
    from locus_ray.stages import partitioned

    res, k = 5, 3  # cell = 11.25 x 5.625 deg
    rng = np.random.default_rng(3)
    # hot cluster: 3000 docs inside ONE interior cell; 2000 background
    n_hot, n_bg = 3000, 2000
    x = np.concatenate([rng.uniform(1.0, 10.0, n_hot),
                        rng.uniform(-179, 179, n_bg)])
    y = np.concatenate([rng.uniform(0.5, 5.0, n_hot),
                        rng.uniform(-89, 89, n_bg)])
    n = n_hot + n_bg
    # 24 stacked FULL covers of the hot cell + ring (ids 0..23 —
    # dominance must keep only the k smallest ids per cell), 24
    # partial covers with edges INSIDE the hot cell (never pruned),
    # 12 background zones elsewhere
    zb = [(-60.0, 60.0, -40.0, 40.0)] * 24
    for i in range(24):
        zb.append((1.0 + 0.3 * i, 40.0 + i, 1.0 + 0.15 * i, 30.0 + i))
    for i in range(12):
        zb.append((-170.0 + 25.0 * i, -160.0 + 25.0 * i,
                   -80.0 + 12.0 * i, -70.0 + 12.0 * i))
    zdf = pd.DataFrame({
        "zone_id": np.arange(len(zb), dtype=np.int64),
        "min_x": [b[0] for b in zb], "max_x": [b[1] for b in zb],
        "min_y": [b[2] for b in zb], "max_y": [b[3] for b in zb]})
    ddf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "x": x, "y": y})
    payload = {"ids": zdf.zone_id.to_numpy(), "min_x": zdf.min_x.to_numpy(),
               "max_x": zdf.max_x.to_numpy(), "min_y": zdf.min_y.to_numpy(),
               "max_y": zdf.max_y.to_numpy()}

    # op-count receipt: the prune must collapse the stacked full-cover
    # bulk (24 identical covers -> k survivors per fully-covered cell)
    cover = partitioned._zone_cover(rd.from_pandas(zdf), res, pad_rings=1)
    before = cover.count()
    after = partitioned._dominance_prune_cover(cover, res, k, 8).count()
    assert after < 0.7 * before, (before, after)

    d2m = box_point_squared_distance(
        payload["min_x"][None, :], payload["max_x"][None, :],
        payload["min_y"][None, :], payload["max_y"][None, :],
        x[:, None], y[:, None])
    order = np.lexsort((np.broadcast_to(
        np.arange(len(zb)), d2m.shape), d2m), axis=1)[:, :k]
    exp_zone = order.ravel()
    exp_d2 = np.take_along_axis(d2m, order, axis=1).ravel()

    # hot_threshold=256 -> the 3000-doc cell salts (fan ~12)
    got = partitioned.knn_join_partitioned(
        rd.from_pandas(ddf), rd.from_pandas(zdf), payload, k=k, res=res,
        num_partitions=8, hot_threshold=256,
    ).to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
    assert len(got) == n * k
    assert (got["doc_id"].to_numpy()
            == np.repeat(np.arange(n, dtype=np.int64), k)).all()
    assert (got["zone_id"].to_numpy() == exp_zone).all()
    assert np.allclose(got["d2"].to_numpy(), exp_d2)


def test_resumable_flagship(ray_session, tmp_path):
    import numpy as np

    from locus_ray import derive
    from locus_ray.pipelines import resumable

    ids = np.arange(64, dtype=np.int64)
    mnx, mxx, mny, mxy = derive.zone_box(ids)
    zp = {"ids": ids, "min_x": mnx, "max_x": mxx, "min_y": mny, "max_y": mxy}
    out = str(tmp_path / "flag")
    recs = resumable.run_resumable_flagship(out, n_docs=400, zones_payload=zp,
                                            n_shards=4, k=2)
    assert len(recs) == 4
    assert sum(r["rows"] for r in recs) == 800  # 400 docs x k=2
    # rerun: everything skipped (lineage returned from markers)
    recs2 = resumable.run_resumable_flagship(out, n_docs=400, zones_payload=zp,
                                             n_shards=4, k=2)
    assert [r["completed_at"] for r in recs2] == [r["completed_at"] for r in recs]
    # outputs are disjoint shard dirs with global doc coverage
    import pyarrow.parquet as pq
    import glob, os

    files = glob.glob(os.path.join(out, "shard=*", "*.parquet"))
    tabs = [pq.read_table(f, columns=["doc_id"]) for f in files]
    all_ids = sorted(x for t in tabs for x in t.column("doc_id").to_pylist())
    assert len(set(all_ids)) == 400


def test_shuffle_join_then_rejoin_spans(ray_session):
    """The scale pattern from SURVEY.md §7: carry only doc ids through
    the shuffle, re-join the wide spans payload afterwards; span
    sequences must survive byte-identical."""
    import pyarrow as pa

    from locus_ray import derive
    from locus_ray.sources import synth
    from locus_ray.stages import partitioned
    import ray.data as rd

    docs = synth.interleaved_docs(300)
    zone_ids = np.arange(64, dtype=np.int64)
    mnx, mxx, mny, mxy = derive.zone_box(zone_ids)
    zones = rd.from_arrow(pa.table({
        "zone_id": zone_ids, "min_x": mnx, "max_x": mxx,
        "min_y": mny, "max_y": mxy,
    }))
    joined = partitioned.contain_join_partitioned(
        docs.select_columns(["doc_id", "x", "y"]), zones,
        res=6, num_partitions=4,
    )
    # re-join spans by doc_id (nested payload: searchsorted+take attach,
    # hash joins cannot carry list<struct> payloads)
    import ray
    from locus_ray.stages.spatial import AttachPayloadActor

    spans_tab = pa.Table.from_pandas(
        synth.interleaved_docs(300).select_columns(["doc_id", "spans"]).to_pandas()
    )
    ref2 = ray.put(spans_tab)
    out = joined.map_batches(
        AttachPayloadActor, batch_format="pyarrow",
        fn_constructor_kwargs={"payload_ref": ref2},
        concurrency=(1, 2),
    )
    out_t = pa.Table.from_pandas(out.to_pandas())

    ref = pa.Table.from_pandas(synth.interleaved_docs(300).to_pandas())
    want = dict(zip(ref.column("doc_id").to_pylist(),
                    synth.span_signature(ref.column("spans"))))
    got_sigs = synth.span_signature(out_t.column("spans"))
    assert len(out_t) > 0
    for d, s in zip(out_t.column("doc_id").to_pylist(), got_sigs):
        assert want[d] == s


def test_media_transform_stubs(ray_session):
    from locus_ray.sources import synth
    from locus_ray.stages import multimodal

    docs = synth.interleaved_docs(80)
    rz = multimodal.media_transform(docs, op="resize").to_pandas()
    assert len(rz) > 0 and (rz["width"] == 224).all()
    fs = multimodal.media_transform(docs, op="frame_sample", stride=7).to_pandas()
    assert len(fs) > 0 and (fs["frame_idx"] % 7 == 0).all()


def test_ngram_jaccard_verifies_pairs(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import dedup

    texts = ["a b c d e f g h", "a b c d e f g x", "totally different words here"]
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(3, dtype=np.int64),
                                 "text": texts}))
    cands = pd.DataFrame({"doc_a": [0, 0], "doc_b": [1, 2]})
    out = dedup.ngram_jaccard_pairs(ds, cands).to_pandas().sort_values("doc_b")
    j01 = out[out["doc_b"] == 1]["jaccard"].iloc[0]
    j02 = out[out["doc_b"] == 2]["jaccard"].iloc[0]
    assert j01 > 0.5 > j02
    assert j02 == 0.0


def test_ngram_jaccard_matches_reference_sets(ray_session):
    """The distributed two-exchange verify (VERDICT r4 #1) must equal
    driver-side set arithmetic over the same shingle kernel, on a
    planted corpus with near-dup clusters, fully-disjoint pairs, ids
    absent from the corpus (zero-shingle sides), a self-pair, and
    DUPLICATE candidate rows (which must not skew the size counts)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import dedup
    from locus_ray.stages.text import flat_token_hashes

    rng = np.random.default_rng(11)
    words = np.array(["w%d" % i for i in range(30)])
    texts = [" ".join(rng.choice(words, int(rng.integers(1, 25))))
             for _ in range(60)]
    for i in range(10):  # planted near-dups: shared long prefix
        texts[i + 30] = texts[i] + " zz%d" % i
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(60, dtype=np.int64),
                                 "text": texts}))
    cand = pd.DataFrame({
        "doc_a": list(range(10)) + [12, 13, 14, 999, 20],
        "doc_b": list(range(30, 40)) + [45, 13, 47, 1000, 20]})
    cand = pd.concat([cand, cand.iloc[:3]])  # duplicate candidates

    got = dedup.ngram_jaccard_pairs(ds, cand).to_pandas()
    got = got.set_index(["doc_a", "doc_b"])["jaccard"]

    th, lo = flat_token_hashes(pa.chunked_array([pa.array(texts)]))
    sh, so = dedup._shingle_hashes_flat(th, lo, 3)
    sets = {i: set(sh[so[i]:so[i + 1]].astype(np.int64).tolist())
            for i in range(60)}
    expect = {
        (a, b): len(sets.get(a, set()) & sets.get(b, set()))
        / max(1, len(sets.get(a, set()) | sets.get(b, set())))
        for a, b in set(zip(cand["doc_a"], cand["doc_b"]))
    }
    assert len(got) == len(expect)
    for pair_key, v in expect.items():
        assert got[pair_key] == v, pair_key
    assert got[(13, 13)] == 1.0 and got[(999, 1000)] == 0.0


def test_io_lance_gating(ray_session, tmp_path):
    from locus_ray.sources import io

    # lance is absent in this image: the gate reports False, a .lance
    # path RAISES (the old silent parquet fallback published parquet
    # bytes under a Lance name that a pylance box then failed to read),
    # and plain parquet paths round-trip
    assert io.lance_available() is False
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "v": [0.1, 0.2, 0.3]}))
    with pytest.raises(RuntimeError, match="pylance"):
        io.write_docs(ds, str(tmp_path / "docs.lance"))
    with pytest.raises(RuntimeError, match="pylance"):
        io.read_docs(str(tmp_path / "docs.lance"))
    out = str(tmp_path / "docs_parquet")
    io.write_docs(ds, out)
    assert io.read_docs(out, columns=["doc_id"]).count() == 3


def test_connected_components_chain(ray_session):
    """A chain a-b-c-d (diameter 3) plus an isolated pair must resolve
    to min-id components in a few propagation rounds."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages.dedup import connected_components

    pairs = rd.from_arrow(pa.table({
        "doc_a": np.array([1, 2, 3, 10], dtype=np.int64),
        "doc_b": np.array([2, 3, 4, 11], dtype=np.int64),
    }))
    out = connected_components(pairs).to_pandas().sort_values("doc_id")
    assert dict(zip(out["doc_id"], out["component"])) == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_within_distance_pairs_vs_brute_force(ray_session):
    """Radius self-join matches an O(n^2) numpy brute force, including
    pairs exactly AT the radius (closed) and across cell boundaries."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages.partitioned import within_distance_pairs

    rng = np.random.default_rng(11)
    n = 400
    x = rng.uniform(-10, 10, n)
    y = rng.uniform(-5, 5, n)
    # planted: a pair exactly at distance r (closed -> included), one
    # just beyond (excluded), and a pair straddling a cell boundary
    r = 0.5
    x[0], y[0] = 0.0, 0.0
    x[1], y[1] = r, 0.0              # exactly r
    x[2], y[2] = 0.0, np.nextafter(r, 1.0)  # just beyond r
    x[3], y[3] = -180.0 + 0.499, -90.0 + 0.001   # cell (0, 0)
    x[4], y[4] = -180.0 + 0.501, -90.0 + 0.001   # cell (1, 0), dist 0.002
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "x": pa.array(x), "y": pa.array(y)}))
    out = within_distance_pairs(ds, radius=r).to_pandas()
    got = sorted(zip(out.id_a, out.id_b, out.d2))

    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    a, b = np.nonzero((d2 <= r * r) & (ids[:, None] < ids[None, :]))
    want = sorted(zip(ids[a], ids[b], d2[a, b]))
    assert (0, 1, r * r) in want and (3, 4, d2[3, 4]) in want
    assert not any(p[:2] == (0, 2) for p in want)
    assert got == want


def test_spatial_clusters_vs_union_find(ray_session):
    """Density clustering gate matches a driver-side union-find over
    the eps-graph of the derived doc coordinates."""
    import pyarrow.parquet as pq

    from locus_ray import derive
    from locus_ray.entry import CLUSTER_EPS, _q_spatial_clusters

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]
                        ).column("doc_id").to_numpy()
    x, y = derive.doc_xy(ids)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    a, b = np.nonzero((d2 <= CLUSTER_EPS**2) & (ids[:, None] < ids[None, :]))

    parent = {}

    def find(u):
        while parent.setdefault(u, u) != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for ia, ib in zip(ids[a], ids[b]):
        ra, rb = find(int(ia)), find(int(ib))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {u: find(u) for u in parent}

    out = _q_spatial_clusters(SF).to_pandas()
    assert dict(zip(out.doc_id, out.cluster)) == want


def test_knn_outliers_vs_brute_force(ray_session):
    """Outlier score = squared distance to the rank-3 self-join
    neighbor (rank 1 is self), bit-exact vs numpy."""
    import pyarrow.parquet as pq

    from locus_ray import derive
    from locus_ray.entry import OUTLIER_D2, _q_knn_outliers

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]
                        ).column("doc_id").to_numpy()
    x, y = derive.doc_xy(ids)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    want = {}
    for i, di in enumerate(zip(d2, ids)):
        row, _ = di
        order = np.lexsort((ids, row))
        kth = row[order[2]]
        want[int(ids[i])] = (kth, int(kth > OUTLIER_D2))

    out = _q_knn_outliers(SF).to_pandas()
    got = {int(r.doc_id): (r.d2_k, int(r.outlier)) for r in out.itertuples()}
    assert got == want


def test_idw_interpolate_vs_brute_force(ray_session):
    """IDW gate: integer-quantized weights over the K_DOCS nearest
    docs reproduce the numpy ratio exactly."""
    import pyarrow.parquet as pq

    from locus_ray import derive, workload
    from locus_ray.entry import IDW_SCALE, IDW_VALUE_MOD, _q_idw_interpolate

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]
                        ).column("doc_id").to_numpy()
    x, y = derive.doc_xy(ids)
    want = {}
    for q, qx, qy in zip(workload.QUERY_POINTS["query_id"],
                         workload.QUERY_POINTS["x"], workload.QUERY_POINTS["y"]):
        d2 = (x - qx) ** 2 + (y - qy) ** 2
        order = np.lexsort((ids, d2))[: workload.K_DOCS]
        w = np.floor(IDW_SCALE / (1.0 + d2[order]) + 0.5).astype(np.int64)
        m = ids[order] % IDW_VALUE_MOD
        want[int(q)] = (float((w * m).sum()) / float(w.sum()), int(w.sum()))

    out = _q_idw_interpolate(SF).to_pandas()
    got = {int(r.query_id): (r.idw_value, int(r.wsum)) for r in out.itertuples()}
    assert got == want


def test_tile_smooth_vs_shifted_histogram(ray_session):
    """3x3 smoothed tile density equals the sum of 9 shifted copies of
    the 2D cell histogram (zero-neighborhood cells emit no row)."""
    import pyarrow.parquet as pq

    from locus_ray import cells, derive
    from locus_ray.entry import RES, _q_tile_smooth

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]
                        ).column("doc_id").to_numpy()
    x, y = derive.doc_xy(ids)
    cid = cells.cell_id(x, y, RES)
    axis = 1 << RES
    hist = np.zeros((axis, axis), dtype=np.int64)
    np.add.at(hist, (cid // axis, cid % axis), 1)
    smooth = np.zeros_like(hist)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            src = hist[max(-dx, 0): axis - max(dx, 0),
                       max(-dy, 0): axis - max(dy, 0)]
            smooth[max(dx, 0): axis - max(-dx, 0),
                   max(dy, 0): axis - max(-dy, 0)] += src

    out = _q_tile_smooth(SF).to_pandas()
    got = dict(zip(out.cell_id, out.n_smooth))
    nz = np.nonzero(smooth)
    want = {int(cx * axis + cy): int(smooth[cx, cy])
            for cx, cy in zip(*nz)}
    assert got == want


def test_span_gates_vs_pylist_brute_force(ray_session):
    """span_stats / span_texts match a per-row to_pylist re-derivation
    of the same interleaved corpus (independent of the vectorized
    ListArray-offset decode)."""
    from locus_ray.entry import _SPAN_DOCS, _q_span_stats, _q_span_texts
    from locus_ray.sources.synth import spans_for

    ids = np.arange(_SPAN_DOCS, dtype=np.int64)
    rows = spans_for(ids).to_pylist()
    want_stats = {}
    want_texts = []
    for did, spans in zip(ids, rows):
        texts = [(i, s["text"]) for i, s in enumerate(spans) if s["kind"] == "text"]
        want_stats[int(did)] = (len(spans), len(texts),
                                sum(len(t) for _, t in texts))
        want_texts += [(int(did), i, t) for i, t in texts]

    got_stats = {int(r.doc_key): (int(r.n_spans), int(r.n_text), int(r.text_chars))
                 for r in _q_span_stats("").to_pandas().itertuples()}
    assert got_stats == want_stats

    got_texts = sorted((int(r.doc_key), int(r.span_pos), r.text)
                       for r in _q_span_texts("").to_pandas().itertuples())
    assert got_texts == sorted(want_texts)


def test_box_overlap_pairs_vs_brute_force(ray_session):
    """Box-box overlap join matches an O(n^2) strict-overlap brute
    force, including edge-sharing pairs (excluded — strict P2),
    nested boxes (included), and pairs whose intersection straddles
    cell boundaries (min-corner dedup emits exactly once)."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages.partitioned import box_overlap_pairs

    rng = np.random.default_rng(21)
    n = 300
    cx = rng.uniform(-160, 160, n)
    cy = rng.uniform(-80, 80, n)
    hw = rng.uniform(0.5, 12.0, n)
    hh = rng.uniform(0.5, 8.0, n)
    mnx, mxx = cx - hw, cx + hw
    mny, mxy = cy - hh, cy + hh
    # planted: an edge-sharing pair (strict -> excluded), a nested pair,
    # and two OVERSIZED boxes (cover >> 64 cells at res 6) that must
    # route through the hybrid broadcast branch — overlapping each
    # other (big x big) and most normal boxes (big x normal)
    mnx[0], mxx[0], mny[0], mxy[0] = 0.0, 10.0, 0.0, 10.0
    mnx[1], mxx[1], mny[1], mxy[1] = 10.0, 20.0, 0.0, 10.0   # shares x edge
    mnx[2], mxx[2], mny[2], mxy[2] = 2.0, 3.0, 2.0, 3.0      # nested in 0
    mnx[3], mxx[3], mny[3], mxy[3] = -150.0, 150.0, -70.0, 70.0
    mnx[4], mxx[4], mny[4], mxy[4] = -100.0, 120.0, -50.0, 60.0
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "zone_id": pa.array(ids),
        "min_x": pa.array(mnx), "max_x": pa.array(mxx),
        "min_y": pa.array(mny), "max_y": pa.array(mxy),
    }))
    out = box_overlap_pairs(ds, res=6).to_pandas()
    got = sorted(zip(out.id_a, out.id_b))
    assert len(got) == len(set(got))  # min-corner dedup: no double emits

    hit = ((mnx[:, None] < mxx[None, :]) & (mnx[None, :] < mxx[:, None])
           & (mny[:, None] < mxy[None, :]) & (mny[None, :] < mxy[:, None])
           & (ids[:, None] < ids[None, :]))
    a, b = np.nonzero(hit)
    want = sorted(zip(ids[a], ids[b]))
    assert (0, 2) in want and (0, 1) not in want
    assert (3, 4) in want          # big x big (driver branch)
    assert (0, 3) in want          # big x normal (broadcast branch)
    assert got == want


def test_contain_anti_join_vs_brute_force(ray_session):
    """anti=True emits exactly the rows contained by no zone."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from locus_ray.stages import spatial

    rng = np.random.default_rng(22)
    n = 2000
    x = rng.uniform(-180, 180, n)
    y = rng.uniform(-90, 90, n)
    zid = np.arange(40, dtype=np.int64)
    zx = rng.uniform(-170, 150, 40)
    zy = rng.uniform(-80, 70, 40)
    zones = {"ids": zid, "min_x": zx, "max_x": zx + 25.0,
             "min_y": zy, "max_y": zy + 12.0}
    ds = rd.from_arrow(pa.table({"doc_id": np.arange(n, dtype=np.int64),
                                 "x": pa.array(x), "y": pa.array(y)}))
    ref = ray.put(zones)
    out = ds.map_batches(
        spatial.ContainJoinActor, batch_format="pyarrow",
        fn_constructor_kwargs={"zones_ref": ref, "res": 6, "anti": True},
        concurrency=1, batch_size=512,
    ).to_pandas()
    inside = ((x[:, None] >= zones["min_x"][None, :])
              & (x[:, None] <= zones["max_x"][None, :])
              & (y[:, None] >= zones["min_y"][None, :])
              & (y[:, None] <= zones["max_y"][None, :])).any(axis=1)
    assert sorted(out.doc_id) == sorted(np.nonzero(~inside)[0].tolist())


def test_connected_components_long_chain_path_halving(ray_session):
    """A 300-node chain through the DISTRIBUTED loop (fast path
    disabled) must converge in O(log n) rounds via the path-halving
    hop — plain neighbor propagation would need ~300 rounds and raise."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages.dedup import connected_components

    n = 300
    pairs = rd.from_arrow(pa.table({
        "doc_a": np.arange(n - 1, dtype=np.int64),
        "doc_b": np.arange(1, n, dtype=np.int64),
    }))
    out = connected_components(pairs, max_rounds=20,
                               small_graph_limit=0).to_pandas()
    assert len(out) == n
    assert (out["component"] == 0).all()


def test_connected_components_fast_path_matches_distributed(ray_session):
    """Driver union-find and the distributed loop label a random pair
    graph identically."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages.dedup import connected_components

    rng = np.random.default_rng(31)
    a = rng.integers(0, 120, 200)
    b = rng.integers(0, 120, 200)
    keep = a != b
    tbl = pa.table({"doc_a": pa.array(np.minimum(a, b)[keep]),
                    "doc_b": pa.array(np.maximum(a, b)[keep])})
    fast = connected_components(rd.from_arrow(tbl)).to_pandas()
    dist = connected_components(rd.from_arrow(tbl),
                                small_graph_limit=0).to_pandas()
    f = dict(zip(fast.doc_id, fast.component))
    d = dict(zip(dist.doc_id, dist.component))
    assert f == d


def test_sample_per_tile_and_quantiles_vs_brute_force(ray_session):
    """Stratified sampler and histogram quantiles match driver-side
    numpy re-derivations at SF."""
    import pyarrow.parquet as pq

    from locus_ray import cells, derive
    from locus_ray.entry import (_STRATUM_K, RES, _q_chars_quantiles,
                                 _q_sample_per_tile)

    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    ids = tab.column("doc_id").to_numpy()
    x, y = derive.doc_xy(ids)
    cid = cells.cell_id(x, y, RES)
    h = ((ids % 1000003) * (2654435761 % 1000003)) % 1000003
    want = set()
    for c in np.unique(cid):
        m = cid == c
        order = np.lexsort((ids[m], h[m]))[:_STRATUM_K]
        want |= {(int(c), int(d)) for d in ids[m][order]}
    out = _q_sample_per_tile(SF).to_pandas()
    assert set(zip(out.cell_id, out.doc_id)) == want

    nch = np.sort(tab.column("n_chars").to_numpy())
    n = len(nch)
    med = (np.float64(nch[(n + 1) // 2 - 1]) + np.float64(nch[(n + 2) // 2 - 1])) / 2.0
    p90 = int(nch[(9 * n + 9) // 10 - 1])
    q = _q_chars_quantiles(SF)
    assert int(q["n"][0]) == n
    assert float(q["median_chars"][0]) == float(med)
    assert int(q["p90_chars"][0]) == p90


def test_segment_intersection_pairs_vs_brute_force(ray_session):
    """Segment-overlay self-join matches an O(n^2) orientation-test
    brute force, including a touching pair (closed -> included), a
    collinear overlapping pair, and a near-miss (excluded); min-corner
    dedup emits each pair exactly once."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.kernels import segments_intersect
    from locus_ray.stages.partitioned import segment_intersection_pairs

    rng = np.random.default_rng(31)
    n = 250
    sx = rng.uniform(-170, 170, n)
    sy = rng.uniform(-80, 80, n)
    ex = sx + rng.uniform(-6, 6, n)
    ey = sy + rng.uniform(-6, 6, n)
    # planted: 1 touches 0 at an endpoint; 2 collinear-overlaps 0;
    # 3 stops just short of 0 (excluded)
    sx[0], sy[0], ex[0], ey[0] = 0.0, 0.0, 10.0, 0.0
    sx[1], sy[1], ex[1], ey[1] = 5.0, 0.0, 5.0, 8.0      # touch at (5,0)
    sx[2], sy[2], ex[2], ey[2] = 8.0, 0.0, 14.0, 0.0     # collinear overlap
    sx[3], sy[3], ex[3], ey[3] = 3.0, np.nextafter(0.0, 1.0), 3.0, 5.0
    # 4: OVERSIZED (bbox cover >> 64 cells at res 6) -> must route
    # through the hybrid broadcast branch
    sx[4], sy[4], ex[4], ey[4] = -150.0, -60.0, 150.0, 60.0
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "segment_id": pa.array(ids),
        "start_x": pa.array(sx), "start_y": pa.array(sy),
        "end_x": pa.array(ex), "end_y": pa.array(ey),
    }))
    out = segment_intersection_pairs(ds, res=6).to_pandas()
    got = sorted(zip(out.id_a, out.id_b))
    assert len(got) == len(set(got))  # min-corner dedup: no double emits

    hit = segments_intersect(
        sx[:, None], sy[:, None], ex[:, None], ey[:, None],
        sx[None, :], sy[None, :], ex[None, :], ey[None, :],
    ) & (ids[:, None] < ids[None, :])
    a, b = np.nonzero(hit)
    want = sorted(zip(ids[a], ids[b]))
    assert (0, 1) in want and (0, 2) in want and (0, 3) not in want
    assert sum(1 for p in want if 4 in p) > 3  # big segment exercised
    assert got == want


def test_box_segment_overlap_join_vs_brute_force(ray_session):
    """Bipartite box x segment intersection join matches the P8
    zero-distance brute force: a pass-through segment (both endpoints
    outside), a fully-inside segment (no edge crossing), a corner
    touch (closed -> included), and a near-miss (excluded)."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.kernels import box_segment_intersects
    from locus_ray.stages.partitioned import box_segment_overlap_join

    rng = np.random.default_rng(32)
    nz, ns = 120, 200
    cx = rng.uniform(-160, 160, nz)
    cy = rng.uniform(-80, 80, nz)
    hw = rng.uniform(0.5, 10.0, nz)
    hh = rng.uniform(0.5, 6.0, nz)
    mnx, mxx, mny, mxy = cx - hw, cx + hw, cy - hh, cy + hh
    sx = rng.uniform(-170, 170, ns)
    sy = rng.uniform(-80, 80, ns)
    ex = sx + rng.uniform(-8, 8, ns)
    ey = sy + rng.uniform(-8, 8, ns)
    # planted box 0 = [0,10]x[0,10]; box 1 OVERSIZED (cover >> 64 at
    # res 6) so it must route through the hybrid broadcast branch
    mnx[0], mxx[0], mny[0], mxy[0] = 0.0, 10.0, 0.0, 10.0
    mnx[1], mxx[1], mny[1], mxy[1] = -150.0, 150.0, -70.0, 70.0
    sx[0], sy[0], ex[0], ey[0] = -5.0, 5.0, 15.0, 5.0    # pass-through
    sx[1], sy[1], ex[1], ey[1] = 2.0, 2.0, 8.0, 8.0      # fully inside
    sx[2], sy[2], ex[2], ey[2] = 10.0, 10.0, 20.0, 20.0  # corner touch
    sx[3], sy[3], ex[3], ey[3] = np.nextafter(10.0, 20.0), 5.0, 20.0, 5.0
    zid = np.arange(nz, dtype=np.int64)
    sid = np.arange(ns, dtype=np.int64)
    zones = rd.from_arrow(pa.table({
        "zone_id": pa.array(zid),
        "min_x": pa.array(mnx), "max_x": pa.array(mxx),
        "min_y": pa.array(mny), "max_y": pa.array(mxy),
    }))
    segs = rd.from_arrow(pa.table({
        "segment_id": pa.array(sid),
        "start_x": pa.array(sx), "start_y": pa.array(sy),
        "end_x": pa.array(ex), "end_y": pa.array(ey),
    }))
    out = box_segment_overlap_join(zones, segs, res=6).to_pandas()
    got = sorted(zip(out.zone_id, out.segment_id))
    assert len(got) == len(set(got))

    hit = box_segment_intersects(
        mnx[:, None], mxx[:, None], mny[:, None], mxy[:, None],
        sx[None, :], sy[None, :], ex[None, :], ey[None, :])
    z, s = np.nonzero(hit)
    want = sorted(zip(zid[z], sid[s]))
    for planted in ((0, 0), (0, 1), (0, 2)):
        assert planted in want
    assert (0, 3) not in want
    assert sum(1 for z, _ in want if z == 1) > 50  # big zone exercised
    assert got == want


def test_buffered_contain_join_vs_brute_force(ray_session):
    """ContainJoinActor(radius=r) matches the P5 <= r^2 brute force,
    including a point exactly AT distance r (closed) and one just
    beyond (excluded)."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from locus_ray.kernels import box_point_squared_distance
    from locus_ray.stages import spatial

    rng = np.random.default_rng(33)
    n, nz = 1500, 60
    x = rng.uniform(-180, 180, n)
    y = rng.uniform(-90, 90, n)
    zx = rng.uniform(-160, 160, nz)
    zy = rng.uniform(-75, 75, nz)
    hw = rng.uniform(0.5, 8.0, nz)
    hh = rng.uniform(0.5, 5.0, nz)
    mnx, mxx, mny, mxy = zx - hw, zx + hw, zy - hh, zy + hh
    r = 1.25
    # planted against box 0: exactly at r east of max_x (closed ->
    # included), just beyond r (excluded)
    mnx[0], mxx[0], mny[0], mxy[0] = 0.0, 4.0, 0.0, 4.0
    x[0], y[0] = 4.0 + r, 2.0
    x[1], y[1] = np.nextafter(4.0 + r, 100.0), 2.0
    ids = np.arange(n, dtype=np.int64)
    zid = np.arange(nz, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                   "x": pa.array(x), "y": pa.array(y)}))
    ref = ray.put({"ids": zid, "min_x": mnx, "max_x": mxx,
                   "min_y": mny, "max_y": mxy})
    out = docs.map_batches(
        spatial.ContainJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"zones_ref": ref, "res": 8, "radius": r},
        concurrency=2, batch_size=512,
    ).to_pandas()
    got = sorted(zip(out.doc_id, out.zone_id, out.d2))

    d2 = box_point_squared_distance(
        mnx[None, :], mxx[None, :], mny[None, :], mxy[None, :],
        x[:, None], y[:, None])
    a, b = np.nonzero(d2 <= r * r)
    want = sorted(zip(ids[a], zid[b], d2[a, b]))
    assert any(p[:2] == (0, 0) for p in want)
    assert not any(p[:2] == (1, 0) for p in want)
    assert got == want


def test_within_distance_pairs_carry_col_alignment(ray_session):
    """carry_col rides the pair shuffle and stays aligned with
    (id_a, id_b) even when the emit order was swapped to normalize
    id_a < id_b."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages.partitioned import within_distance_pairs

    rng = np.random.default_rng(41)
    n = 300
    x = rng.uniform(-20, 20, n)
    y = rng.uniform(-10, 10, n)
    ids = np.arange(n, dtype=np.int64)
    vals = ids * 7 + 1  # recover expected value from the id
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "x": pa.array(x), "y": pa.array(y),
                                 "v": pa.array(vals)}))
    out = within_distance_pairs(ds, radius=1.0, carry_col="v").to_pandas()
    assert len(out) > 0
    assert (out.va == out.id_a * 7 + 1).all()
    assert (out.vb == out.id_b * 7 + 1).all()


def test_skyline_vs_brute_force(ray_session):
    """Local skyline kernel + merge matches the O(n^2) dominance brute
    force, including exact-duplicate points (both kept) and same-x
    points (only the min-y survives)."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.entry import _q_skyline_docs  # kernel reused via gate

    rng = np.random.default_rng(42)
    n = 800
    x = rng.uniform(-100, 100, n)
    y = rng.uniform(-50, 50, n)
    # planted: exact duplicates at a frontier point, and a same-x pair
    x[0], y[0] = -100.5, -50.5
    x[1], y[1] = -100.5, -50.5     # duplicate of the frontier point
    x[2], y[2] = -100.5, -49.0     # same x, larger y -> dominated
    ids = np.arange(n, dtype=np.int64)

    dom = ((x[None, :] <= x[:, None]) & (y[None, :] <= y[:, None])
           & ((x[None, :] < x[:, None]) | (y[None, :] < y[:, None])))
    want = sorted(ids[~dom.any(axis=1)])
    assert 0 in want and 1 in want and 2 not in want

    # drive the same kernel through the Dataset path used by the gate
    import locus_ray.entry as entry_mod

    class FakeTables:
        @staticmethod
        def docs_geo(sf_dir, extra_columns=()):
            return rd.from_arrow(pa.table({
                "doc_id": pa.array(ids), "x": pa.array(x), "y": pa.array(y),
            })).repartition(8)

    real = entry_mod.tables if hasattr(entry_mod, "tables") else None
    import locus_ray.sources.tables as tables_mod
    orig = tables_mod.docs_geo
    tables_mod.docs_geo = FakeTables.docs_geo
    try:
        out = _q_skyline_docs("unused").to_pandas()
    finally:
        tables_mod.docs_geo = orig
    assert sorted(out.doc_id) == want


def test_morans_i_vs_float_reference(ray_session):
    """The integer-exact distributed Moran's I equals the textbook
    float formula to rounding, and its integer partials are exact."""
    from locus_ray.entry import MORAN_EPS, _q_morans_i
    from tests.conftest import SF

    out = _q_morans_i(SF)
    n = int(out["n"][0])
    p = int(out["n_pairs"][0])
    got = float(out["moran_i"][0])

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    import locus_ray.derive as derive

    d = con.execute(f"SELECT doc_id, x, y FROM ({derive.sql_docs_geo()})").df()
    v = con.execute("SELECT n_chars FROM documents ORDER BY doc_id").df()["n_chars"].to_numpy()
    x, y = d.sort_values("doc_id")["x"].to_numpy(), d.sort_values("doc_id")["y"].to_numpy()
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    w = (dx * dx + dy * dy <= MORAN_EPS * MORAN_EPS)
    np.fill_diagonal(w, False)
    W = w.sum()
    assert p * 2 == W and n == len(x)
    z = v - v.mean()
    ref = (n / W) * (w * z[:, None] * z[None, :]).sum() / (z * z).sum()
    assert np.isclose(got, ref, rtol=1e-12)


def test_tile_pyramid_level_consistency(ray_session):
    """Every pyramid level partitions the corpus: per-level counts sum
    to n_docs, and each coarse cell's count equals the sum of its
    16 children at the next level down."""
    from locus_ray.entry import PYRAMID_LEVELS, _q_tile_pyramid
    from tests.conftest import SF

    out = _q_tile_pyramid(SF).to_pandas()
    n = out[out.level == PYRAMID_LEVELS[0]].n_docs.sum()
    for lvl in PYRAMID_LEVELS:
        assert out[out.level == lvl].n_docs.sum() == n
    # parent-child rollup between consecutive levels (axis doubles per
    # level step of 1; steps here are 2 -> 4x4 children)
    l4 = out[out.level == 4].set_index("cell_id").n_docs
    l6 = out[out.level == 6]
    parent = (l6.cell_id // 64 // 4) * 16 + (l6.cell_id % 64) // 4
    rolled = l6.assign(p=parent.to_numpy()).groupby("p").n_docs.sum()
    assert rolled.sort_index().equals(l4.sort_index())


def test_tile_top_lang_tie_break(ray_session):
    """Mode aggregate picks (count DESC, lang ASC) deterministically."""
    import pandas as pd

    from locus_ray.entry import _q_tile_top_lang
    from tests.conftest import SF

    out = _q_tile_top_lang(SF).to_pandas()
    assert out.cell_id.is_unique
    assert (out.n_docs >= 1).all()


def test_cosine_topk_carry_cols_alignment(ray_session):
    """carry_cols rides the candidate stream aligned with vec_id."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from locus_ray.stages.ann import CosineTopKActor

    rng = np.random.default_rng(51)
    m = rng.standard_normal((400, 16))
    ids = np.arange(400, dtype=np.int64)
    labels = ids * 3 + 2
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids), "embedding": list(m.astype(np.float32)),
        "label": pa.array(labels),
    }))
    ref = ray.put({"query_id": np.array([5, 9]), "matrix": m[[5, 9]]})
    out = ds.map_batches(
        CosineTopKActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"queries_ref": ref, "k": 4,
                               "carry_cols": ("label",)},
        concurrency=2, batch_size=64,
    ).to_pandas()
    assert len(out) >= 8
    assert (out.label == out.vec_id * 3 + 2).all()


def test_span_dedup_owner_and_counts(ray_session):
    """span_dedup's owners/counts match a pandas brute force over the
    exploded span stream."""
    from locus_ray.entry import _q_span_dedup, _q_span_texts

    stream = _q_span_texts("").to_pandas()
    out = _q_span_dedup("").to_pandas().set_index("text").sort_index()

    grp = stream.assign(owner=stream.doc_key * (1 << 20) + stream.span_pos)
    want = grp.groupby("text").agg(o=("owner", "min"), n=("owner", "size"))
    assert (out.n_copies.to_numpy() == want.sort_index().n.to_numpy()).all()
    assert (out.owner_doc.to_numpy() == (want.sort_index().o // (1 << 20)).to_numpy()).all()
    assert (out.owner_pos.to_numpy() == (want.sort_index().o % (1 << 20)).to_numpy()).all()


def test_knn_segments_to_boxes_vs_brute_force(ray_session):
    """Box->segment kNN matches a P8 brute force with the (d2, id)
    tie-break, including segments inside the box (d2 == 0 ties broken
    by smallest id)."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.kernels import box_segment_squared_distance
    from locus_ray.stages.spatial import knn_segments_to_boxes

    rng = np.random.default_rng(61)
    n = 400
    sx = rng.uniform(-170, 170, n)
    sy = rng.uniform(-80, 80, n)
    ex = sx + rng.uniform(-5, 5, n)
    ey = sy + rng.uniform(-5, 5, n)
    # three segments inside box 0 ([0,10]x[0,10]) -> d2==0 ties
    for i, (a, b) in enumerate(((1.0, 2.0), (3.0, 4.0), (5.0, 6.0))):
        sx[i], sy[i], ex[i], ey[i] = a, b, a + 1.0, b + 1.0
    ids = np.arange(n, dtype=np.int64)
    boxes = {"query_id": np.array([0, 1]),
             "min_x": np.array([0.0, 50.0]), "max_x": np.array([10.0, 60.0]),
             "min_y": np.array([0.0, -70.0]), "max_y": np.array([10.0, -60.0])}
    ds = rd.from_arrow(pa.table({
        "segment_id": pa.array(ids),
        "start_x": pa.array(sx), "start_y": pa.array(sy),
        "end_x": pa.array(ex), "end_y": pa.array(ey),
    })).repartition(6)
    k = 3
    out = knn_segments_to_boxes(ds, boxes, k=k).to_pandas()
    for qi in (0, 1):
        d2 = box_segment_squared_distance(
            boxes["min_x"][qi], boxes["max_x"][qi],
            boxes["min_y"][qi], boxes["max_y"][qi], sx, sy, ex, ey)
        exp = np.lexsort((ids, d2))[:k]
        g = out[out.query_id == qi].sort_values("rnk")
        assert np.array_equal(g.segment_id.to_numpy(), ids[exp])
        assert np.array_equal(g.d2.to_numpy(), d2[exp])
    assert np.array_equal(
        out[out.query_id == 0].sort_values("rnk").segment_id.to_numpy(),
        np.array([0, 1, 2]))


def test_dbscan_vs_reference(ray_session):
    """Distributed DBSCAN matches a driver-side reference (degree
    count, core union-find, border = min core-neighbor cluster)."""
    import duckdb

    from locus_ray.derive import sql_docs_geo
    from locus_ray.entry import CLUSTER_EPS, DBSCAN_MIN_PTS, _q_dbscan
    from tests.conftest import SF

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    d = con.execute(f"SELECT doc_id, x, y FROM ({sql_docs_geo()}) ORDER BY doc_id").df()
    ids = d.doc_id.to_numpy()
    x, y = d.x.to_numpy(), d.y.to_numpy()
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    adj = (dx * dx + dy * dy <= CLUSTER_EPS * CLUSTER_EPS)
    np.fill_diagonal(adj, False)
    deg = adj.sum(axis=1)
    core = deg >= DBSCAN_MIN_PTS

    parent = {int(i): int(i) for i in ids[core]}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    ci = np.nonzero(core)[0]
    for a in ci:
        for b in np.nonzero(adj[a] & core)[0]:
            ra, rb = find(int(ids[a])), find(int(ids[b]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for i in ci:
        want[int(ids[i])] = (find(int(ids[i])), 0)
    for i in np.nonzero(~core)[0]:
        nb = np.nonzero(adj[i] & core)[0]
        if len(nb):
            want[int(ids[i])] = (min(find(int(ids[j])) for j in nb), 1)

    out = _q_dbscan(SF).to_pandas()
    got = {int(r.doc_id): (int(r.cluster), int(r.role))
           for r in out.itertuples()}
    assert got == want


def test_hotspot_gi_vs_float_reference(ray_session):
    """Distributed Gi* equals the textbook float formula to rounding."""
    import duckdb

    from locus_ray.derive import sql_docs_geo
    from locus_ray.entry import MORAN_EPS, _q_hotspot_gi
    from tests.conftest import SF

    out = _q_hotspot_gi(SF).to_pandas().sort_values("doc_id")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    d = con.execute(f"""
        SELECT g.doc_id, g.x, g.y, doc.n_chars
        FROM ({sql_docs_geo()}) g JOIN documents doc USING (doc_id)
        ORDER BY doc_id""").df()
    x, y, v = d.x.to_numpy(), d.y.to_numpy(), d.n_chars.to_numpy().astype(float)
    n = len(v)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    w = (dx * dx + dy * dy <= MORAN_EPS * MORAN_EPS)  # self included
    wi = w.sum(axis=1)
    sumw = (w * v[None, :]).sum(axis=1)
    xbar = v.mean()
    s = np.sqrt((v * v).mean() - xbar * xbar)
    ref = (sumw - xbar * wi) / (s * np.sqrt((n * wi - wi * wi) / (n - 1.0)))
    assert np.array_equal(out.w_i.to_numpy(), wi)
    assert np.allclose(out.gi_z.to_numpy(), ref, rtol=1e-10)
    # the hot CLUSTER inflates W_i but n_chars is spatially random, so
    # z stays modest — the check is the formula, not significance
    assert out.w_i.max() > 5 and out.w_i.min() == 1


def test_tile_chars_median_vs_pandas(ray_session):
    """Grouped exact median matches a pandas groupby median (same
    mean-of-two-middles interpolation)."""
    import duckdb
    import pandas as pd

    from locus_ray.cells import cell_id
    from locus_ray.derive import sql_docs_geo
    from locus_ray.entry import TOP_LANG_RES, _q_tile_chars_median
    from tests.conftest import SF

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    d = con.execute(f"""
        SELECT g.doc_id, g.x, g.y, doc.n_chars
        FROM ({sql_docs_geo()}) g JOIN documents doc USING (doc_id)""").df()
    d["cell"] = cell_id(d.x.to_numpy(), d.y.to_numpy(), TOP_LANG_RES)
    want = d.groupby("cell").n_chars.median()

    out = _q_tile_chars_median(SF).to_pandas().set_index("cell_id").sort_index()
    assert (out.median_chars == want.sort_index()).all()
    assert out.n_docs.sum() == len(d)


def test_point_segment_within_join_vs_brute_force(ray_session):
    """Doc-near-segment buffer join matches the O(n*m) P6 brute force,
    closed at exactly r, exclusive just beyond."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.kernels import segment_point_squared_distance
    from locus_ray.stages.partitioned import point_segment_within_join

    rng = np.random.default_rng(81)
    nd, ns = 1200, 150
    x = rng.uniform(-170, 170, nd)
    y = rng.uniform(-80, 80, nd)
    sx = rng.uniform(-170, 170, ns)
    sy = rng.uniform(-80, 80, ns)
    ex = sx + rng.uniform(-6, 6, ns)
    ey = sy + rng.uniform(-6, 6, ns)
    r = 0.5
    # planted against segment 0 = (0,0)-(10,0)
    sx[0], sy[0], ex[0], ey[0] = 0.0, 0.0, 10.0, 0.0
    x[0], y[0] = 5.0, r                        # exactly at r (closed)
    x[1], y[1] = 5.0, np.nextafter(r, 1.0)     # just beyond
    did = np.arange(nd, dtype=np.int64)
    sid = np.arange(ns, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(did),
                                   "x": pa.array(x), "y": pa.array(y)}))
    segs = rd.from_arrow(pa.table({
        "segment_id": pa.array(sid),
        "start_x": pa.array(sx), "start_y": pa.array(sy),
        "end_x": pa.array(ex), "end_y": pa.array(ey),
    }))
    out = point_segment_within_join(docs, segs, radius=r,
                                    res=6).to_pandas()
    got = sorted(zip(out.doc_id, out.segment_id, out.d2))
    assert len(got) == len(set((a, b) for a, b, _ in got))

    d2 = segment_point_squared_distance(
        sx[None, :], sy[None, :], ex[None, :], ey[None, :],
        x[:, None], y[:, None])
    a, b = np.nonzero(d2 <= r * r)
    want = sorted(zip(did[a], sid[b], d2[a, b]))
    assert any(p[:2] == (0, 0) for p in want)
    assert not any(p[:2] == (1, 0) for p in want)
    assert got == want


def test_engine_empty_block_paths():
    """Zero-row / empty-side unit paths across the engines: these are
    the blocks filtered upstreams emit, and each of these call sites
    crashed on them before round 5 (broadcast-shape ValueError /
    ZeroDivisionError / IndexError)."""
    import pyarrow as pa

    from locus_ray.stages.ann import _as_matrix
    from locus_ray.stages.dedup import minhash_signatures  # noqa: F401
    from locus_ray.stages.pip import PipIndex
    from locus_ray.stages.spatial import AttachPayloadActor

    # _as_matrix: conformable (0, d)
    emb = pa.table({"embedding": pa.array([], type=pa.list_(pa.float64()))})
    assert _as_matrix(emb.column("embedding"), d=16).shape == (0, 16)

    # PipIndex.probe on a zero-row batch with a non-empty raster
    ring = {"polygon_id": 1,
            "ring_x": np.array([0.0, 1.0, 1.0, 0.0]),
            "ring_y": np.array([0.0, 0.0, 1.0, 1.0])}
    idx = PipIndex({"polygons": [ring]}, res=6)
    src, poly = idx.probe(np.empty(0), np.empty(0))
    assert len(src) == 0 and len(poly) == 0

    # AttachPayloadActor with an EMPTY payload drops all rows
    payload = pa.table({"doc_id": pa.array([], type=pa.int64()),
                        "spans": pa.array([], type=pa.list_(pa.int32()))})
    att = AttachPayloadActor(payload, key="doc_id", columns=("spans",))
    out = att(pa.table({"doc_id": pa.array([5], type=pa.int64())}))
    assert out.num_rows == 0 and "spans" in out.schema.names


def test_minhash_empty_batch_schema_stable(ray_session):
    """A zero-row batch must emit the SAME minhash column type as
    non-empty blocks (pa.array(list(...)) inferred type NULL)."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import dedup

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b"]),
        "text": pa.array(["one two three", "four five six"]),
    }))
    t_full = pa.concat_tables(
        dedup.minhash_signatures(ds).iter_batches(batch_size=None,
                                                  batch_format="pyarrow"))
    assert t_full.schema.field("minhash").type == pa.list_(pa.int64())
    # an EMPTY BLOCK flows through the map fn (a task fires per block
    # regardless of emptiness); the old pa.array(list(...)) emitted a
    # null-typed minhash there and the banded-LSH explode crashed on
    # NullArray.values.  Drive that exact consumption over a stream
    # containing an empty block.  (The full join funnel can't run on
    # this fixture: Ray 2.49's hash-shuffle join raises on mostly-empty
    # streams — the documented CLAUDE.md hazard the library's narrow
    # paths avoid with the union+groupby attach idiom.)
    emptied = rd.from_arrow(pa.table({
        "doc_id": pa.array(["x"]), "text": pa.array(["y z"]),
    })).map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")

    def consume(t: pa.Table) -> pa.Table:
        col = t.column("minhash")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _ = col.values  # NullArray has no .values
        return pa.table({"n": pa.array([len(col)], type=pa.int64())})

    total = (dedup.minhash_signatures(ds.union(emptied))
             .map_batches(consume, batch_format="pyarrow")
             .to_pandas()["n"].sum())
    assert total == 2


def test_checkpoint_concurrent_resume_keeps_winner(ray_session, tmp_path):
    """If another resumer publishes the marker while this run builds,
    run_shard must return the PUBLISHED record and discard its own tmp
    (the old shared _tmp-<shard> path let two runs corrupt each other)."""
    import json
    import os

    import ray.data as rd

    from locus_ray.state import checkpoint

    out = str(tmp_path / "out")
    marker_dir = os.path.join(out, "done")

    def build():
        # simulate a concurrent run winning mid-build
        os.makedirs(marker_dir, exist_ok=True)
        with open(os.path.join(marker_dir, "s1.json"), "w") as f:
            json.dump({"shard": "s1", "rows": 777}, f)
        return rd.range(10)

    rec = checkpoint.run_shard(out, "s1", build)
    assert rec["rows"] == 777  # the published record, not ours
    assert not any(n.startswith("_tmp-s1-") for n in os.listdir(out))


def test_segmental_tree_context_nearest_consistency():
    """nearest_item / nearest_to_point_item must route through the same
    context-aware engine as the k>1 family (they silently returned the
    euclidean winner under a manhattan context)."""
    from locus_ray.compat import SegmentalTree

    segs = [((0.0, 0.0), (0.0, 4.0)), ((2.9, 3.0), (6.0, 3.0))]
    st = SegmentalTree(segs, context="manhattan")
    q = ((3.0, 0.1), (3.1, 0.2))
    assert st.nearest_item(q) == st.n_nearest_items(1, q)[0]
    p = (3.0, 0.5)
    assert st.nearest_to_point_item(p) == st.n_nearest_to_point_items(1, p)[0]


def test_knn_shuffle_randomized_layers(ray_session):
    """Randomized-geometry differential sweep of the grouped-exchange
    shuffle kNN vs numpy brute force: uniform layers, a fully
    degenerate one-cell doc cluster, k > n_zones, and world-spanning
    zones (the dense-split path) — geometry shapes the fixed SF
    fixture never produces."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.kernels import box_point_squared_distance
    from locus_ray.stages import partitioned

    cases = [
        # (n_docs, n_zones, k, doc_mode, zone_mode, hot)
        (400, 60, 3, "uniform", "small", None),
        (600, 40, 3, "one_cell", "small", 50),   # degenerate cluster, salted
        (200, 4, 6, "uniform", "small", None),   # k > n_zones
        (300, 30, 2, "uniform", "with_world_spanners", None),
    ]
    for seed, (nd, nz, k, dmode, zmode, hot) in enumerate(cases):
        rng = np.random.default_rng(seed + 101)
        if dmode == "one_cell":
            x = np.full(nd, 12.3) + rng.uniform(0, 1e-4, nd)
            y = np.full(nd, -45.6) + rng.uniform(0, 1e-4, nd)
        else:
            x = rng.uniform(-179, 179, nd)
            y = rng.uniform(-89, 89, nd)
        mnx = rng.uniform(-179, 170, nz)
        mny = rng.uniform(-89, 80, nz)
        mxx = mnx + rng.uniform(0.01, 8.0, nz)
        mxy = mny + rng.uniform(0.01, 4.0, nz)
        if zmode == "with_world_spanners":
            mnx[:2], mxx[:2] = -180.0, 180.0  # dense-split candidates
            mny[:2], mxy[:2] = -90.0, 90.0
        zid = np.arange(nz, dtype=np.int64) * 7 + 3  # non-contiguous ids

        docs = rd.from_arrow(pa.table({
            "doc_id": np.arange(nd, dtype=np.int64),
            "x": x, "y": y})).repartition(3)
        zones = rd.from_arrow(pa.table({
            "zone_id": zid, "min_x": mnx, "max_x": mxx,
            "min_y": mny, "max_y": mxy})).repartition(2)
        payload = {"ids": zid, "min_x": mnx, "max_x": mxx,
                   "min_y": mny, "max_y": mxy}

        got = partitioned.knn_join_partitioned(
            docs, zones, payload, k=k, res=6, num_partitions=2,
            hot_threshold=hot,
        ).to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)

        d2 = box_point_squared_distance(mnx[None, :], mxx[None, :],
                                        mny[None, :], mxy[None, :],
                                        x[:, None], y[:, None])
        kk = min(k, nz)
        exp_rows = []
        for r in range(nd):
            order = np.lexsort((zid, d2[r]))[:kk]
            for rnk, j in enumerate(order, 1):
                exp_rows.append((r, zid[j], d2[r][j], rnk))
        assert len(got) == len(exp_rows), (seed, len(got), len(exp_rows))
        got_rows = list(zip(got["doc_id"], got["zone_id"],
                            got["d2"], got["rnk"]))
        assert got_rows == exp_rows, seed


def test_contain_join_randomized_layers(ray_session):
    """Randomized-geometry sweep of the grouped-exchange containment
    join vs the closed-containment brute force, including oversized
    zones (broadcast hybrid split) and a degenerate doc cluster."""
    import pyarrow as pa
    import ray.data as rd

    from locus_ray.stages import partitioned

    for seed, (nd, nz, dmode, big, hot) in enumerate([
        (500, 80, "uniform", False, None),
        (700, 50, "one_cell", False, 40),
        (300, 25, "uniform", True, None),   # oversized-zone hybrid path
    ]):
        rng = np.random.default_rng(seed + 2024)
        if dmode == "one_cell":
            x = np.full(nd, -100.1) + rng.uniform(0, 1e-4, nd)
            y = np.full(nd, 20.2) + rng.uniform(0, 1e-4, nd)
        else:
            x = rng.uniform(-179, 179, nd)
            y = rng.uniform(-89, 89, nd)
        mnx = rng.uniform(-179, 150, nz)
        mny = rng.uniform(-89, 70, nz)
        mxx = mnx + rng.uniform(0.5, 25.0, nz)
        mxy = mny + rng.uniform(0.5, 15.0, nz)
        if big:
            mnx[:3], mxx[:3] = -180.0, 180.0
            mny[:3], mxy[:3] = -90.0, 90.0
        if dmode == "one_cell":  # guarantee hits on the cluster
            mnx[0], mxx[0] = -101.0, -99.0
            mny[0], mxy[0] = 19.0, 21.0
        zid = np.arange(nz, dtype=np.int64) * 3 + 11

        got = partitioned.contain_join_partitioned(
            rd.from_arrow(pa.table({
                "doc_id": np.arange(nd, dtype=np.int64),
                "x": x, "y": y})).repartition(3),
            rd.from_arrow(pa.table({
                "zone_id": zid, "min_x": mnx, "max_x": mxx,
                "min_y": mny, "max_y": mxy})).repartition(2),
            res=6, num_partitions=2, hot_threshold=hot,
        ).to_pandas()
        inside = ((mnx[None, :] <= x[:, None]) & (x[:, None] <= mxx[None, :])
                  & (mny[None, :] <= y[:, None]) & (y[:, None] <= mxy[None, :]))
        r, c = np.nonzero(inside)
        exp = set(zip(r.tolist(), zid[c].tolist()))
        got_pairs = (set(zip(got["doc_id"], got["zone_id"]))
                     if len(got) else set())  # empty frames lose columns
        assert got_pairs == exp, seed
        assert len(got) == len(exp), seed
        assert exp, seed  # every case must actually exercise matches
