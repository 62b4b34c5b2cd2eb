"""Pipeline-level Spark tests: datagen → ingest → color/zonal/spatial."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapalgebra_spark import codecs, datagen, ingest
from mapalgebra_spark import cellindex as CI
from mapalgebra_spark import kernels as K
from mapalgebra_spark import raster as R
from mapalgebra_spark import spatial as SP
from mapalgebra_spark.operators import color as CO
from mapalgebra_spark.operators import focal as FO
from mapalgebra_spark.operators import zonal as Z

pytestmark = pytest.mark.spark


def test_datagen_deterministic_and_decodable(spark):
    df = datagen.generate_images_df(spark, 12).collect()
    assert len(df) == 12
    for row in df:
        pix = codecs.decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
        assert pix.shape[0] == row["h"] and pix.shape[1] == row["w"]
        # per-row invariant (input_hint): decode(bytes) == generator array
        rgba = int(row["image_id"][3:]) % 7 == 3
        ref = datagen.render_pixels(int(row["image_id"][3:]), row["w"], row["h"], rgba)
        assert np.array_equal(pix, ref)
        assert row["phash"] == codecs.phash64(ref)
        assert row["caption"] == f"synthetic terrain {int(row['image_id'][3:])} seed42"


def test_ingest_tiles_roundtrip(spark):
    images = datagen.generate_images_df(spark, 6)
    tr = ingest.tiles_from_images(images, tile_size=256)
    # raster 0 is 256x256 gray raw -> 1 tile
    arr = tr.collect_array("img00000000")
    ref = datagen.render_pixels(0, 256, 256, False)
    assert np.array_equal(arr, ref)
    # image 3 is RGBA (i%7==3): 4 bands
    bands = (
        tr.df.filter(F.col("raster_id") == "img00000003")
        .select("band").distinct().count()
    )
    assert bands == 4
    # partial tiles: image 2 is 300x200 -> 2x1 tile grid at 256
    t2 = tr.df.filter(F.col("raster_id") == "img00000002")
    assert t2.count() == 2
    arr2 = tr.collect_array("img00000002")
    assert arr2.shape == (200, 300)
    assert np.array_equal(arr2, datagen.render_pixels(2, 300, 200, False))


def test_flagship_focal_over_ingested_images(spark):
    """decode → tile → fmean+fgradient across image tile boundaries."""
    images = datagen.generate_images_df(spark, 3).filter(F.col("image_id") == "img00000001")
    tr = ingest.tiles_from_images(images, tile_size=256)  # 512² → 2x2 tiles
    outs = FO.focal_multi(tr, ["fmean", "fgradient"])
    ref_pix = datagen.render_pixels(1, 512, 512, False)
    np.testing.assert_allclose(
        outs["fmean"].collect_array("img00000001"),
        K.k_fmean(K.pad_block(ref_pix.astype(np.float64), K.BORDER_FILL, 0)),
    )
    np.testing.assert_allclose(
        outs["fgradient"].collect_array("img00000001"),
        K.k_gradient(K.pad_block(ref_pix.astype(np.float64), K.BORDER_REFLECT)),
        atol=1e-12,
    )


def test_histogram_breaks_colorize_png(spark):
    r, c = np.mgrid[0:512, 0:512]
    pix = ((r * 7 + c * 13) % 256).astype(np.uint8)
    tr = R.TileRaster.from_arrays(spark, {"g": pix}, tile_size=256)
    hist = CO.histogram_vector(tr)
    assert int(hist.sum()) == 262144
    bs = CO.breaks(hist)
    assert len(bs) == 10 and bs == sorted(bs)
    np.testing.assert_array_equal(hist, K.block_histogram(pix))
    cm = CO.ramp(CO.RAMP_COLOURS["spectrum"], bs)
    colored = CO.colorize(tr, cm)
    arr = colored.collect_array("g")
    assert arr.shape == (4, 512, 512)
    png_bytes = CO.render_png(colored, "g")
    back = codecs.png_decode(png_bytes)
    assert back.shape == (512, 512, 4)
    np.testing.assert_array_equal(np.moveaxis(back, -1, 0), arr)


def test_zonal_stats(spark):
    rng = np.random.default_rng(3)
    vals = rng.normal(size=(50, 60)) * 10
    zones = rng.integers(0, 5, size=(50, 60)).astype(np.int64)
    v = R.TileRaster.from_arrays(spark, {"r": vals}, tile_size=16)
    z = R.TileRaster.from_arrays(spark, {"r": zones}, tile_size=16)
    got = {r["zone"]: r for r in Z.zonal_stats(v, z).collect()}
    for zone in range(5):
        sel = vals[zones == zone]
        assert got[zone]["zcount"] == sel.size
        assert got[zone]["zsum"] == pytest.approx(sel.sum())
        assert got[zone]["zmean"] == pytest.approx(sel.mean())
        assert got[zone]["zmin"] == pytest.approx(sel.min())
        assert got[zone]["zmax"] == pytest.approx(sel.max())


def test_zonal_census(spark):
    """Categorical cross-tab (zone, val, n) == numpy reference; NaN
    value cells are excluded (finite-category contract)."""
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 4, size=(40, 50)).astype(np.float64)
    vals[3, 7] = np.nan
    zones = rng.integers(0, 3, size=(40, 50)).astype(np.int64)
    v = R.TileRaster.from_arrays(spark, {"r": vals}, tile_size=16)
    z = R.TileRaster.from_arrays(spark, {"r": zones}, tile_size=16)
    got = {(r["zone"], r["val"]): r["n"] for r in Z.zonal_census(v, z).collect()}
    exp = {}
    for zz in range(3):
        for vv in range(4):
            n = int(((zones == zz) & (vals == vv)).sum())
            if n:
                exp[(zz, float(vv))] = n
    assert got == exp


def _points_df(spark, n=400, seed=7):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "point_id": [f"p{i}" for i in range(n)],
            "lat": rng.uniform(-60, 60, n),
            "lng": rng.uniform(-170, 170, n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def _polys_df(spark, m=8, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for j in range(m):
        clat, clng = rng.uniform(-50, 50), rng.uniform(-150, 150)
        nv = rng.integers(5, 12)
        angs = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(3, 12)
        rows.append(
            {
                "poly_id": f"poly{j}",
                "ring_lat": (clat + rad * np.sin(angs)).tolist(),
                "ring_lng": (clng + rad * 1.3 * np.cos(angs)).tolist(),
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows)), rows


def test_point_in_polygon_join_vs_bruteforce(spark):
    points, pdf = _points_df(spark)
    polys, rows = _polys_df(spark)
    got = {
        (r["point_id"], r["poly_id"])
        for r in SP.point_in_polygon_join(points, polys, level=8).collect()
    }
    exp = set()
    for row in rows:
        inside = CI.point_in_polygon(
            pdf["lat"].to_numpy(), pdf["lng"].to_numpy(),
            np.asarray(row["ring_lat"]), np.asarray(row["ring_lng"]),
        )
        for pid in pdf["point_id"].to_numpy()[inside]:
            exp.add((pid, row["poly_id"]))
    assert got == exp


def test_knn_bruteforce_and_cells_agree(spark):
    points, pdf = _points_df(spark, n=500, seed=8)
    qrows = pd.DataFrame(
        {"query_id": ["q0", "q1", "q2"], "lat": [10.0, -30.0, 55.0], "lng": [20.0, -60.0, 100.0]}
    )
    queries = spark.createDataFrame(qrows)
    brute = SP.knn_bruteforce(queries, points, k=5).collect()
    # oracle: numpy brute force
    for q in qrows.itertuples():
        d = CI.haversine_km(q.lat, q.lng, pdf["lat"].to_numpy(), pdf["lng"].to_numpy())
        order = np.lexsort((pdf["point_id"].to_numpy(), d))[:5]
        exp = [pdf["point_id"].iloc[i] for i in order]
        got = [r["point_id"] for r in sorted(
            (r for r in brute if r["query_id"] == q.query_id), key=lambda r: r["rank"]
        )]
        assert got == exp
    cells = SP.knn_cells(spark, queries, points, k=5, level=5, max_ring=6).collect()
    bset = {(r["query_id"], r["point_id"], r["rank"]) for r in brute}
    cset = {(r["query_id"], r["point_id"], r["rank"]) for r in cells}
    assert bset == cset


def test_knn_partial_matches_window_plan(spark):
    """The per-partition numpy prefilter must be lossless: the partial
    path's (query_id, point_id, rank) AND its JVM-recomputed distances
    must equal the literal one-window plan's exactly."""
    points, _ = _points_df(spark, n=2000, seed=9)
    rng = np.random.default_rng(10)
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [f"q{i}" for i in range(25)],
                "lat": rng.uniform(-60, 60, 25),
                "lng": rng.uniform(-170, 170, 25),
            }
        )
    )
    a = SP.knn_bruteforce(queries, points, k=5, partial=True).collect()
    b = SP.knn_bruteforce(queries, points, k=5, partial=False).collect()
    ka = {(r["query_id"], r["point_id"]): (r["rank"], r["dist_km"]) for r in a}
    kb = {(r["query_id"], r["point_id"]): (r["rank"], r["dist_km"]) for r in b}
    assert ka == kb  # exact, including float64 distances (same JVM expr)


def test_zonal_by_polygon(spark):
    images = datagen.generate_images_df(spark, 8)
    tr = ingest.tiles_from_images(images, tile_size=256, cell_level=3)
    polys, _ = _polys_df(spark, m=4, seed=12)
    out = SP.zonal_stats_by_polygon(tr, polys, level=3).collect()
    # structural check + exact check against a driver-side recomputation
    rolled = {r["cell_id"]: r for r in Z.zonal_stats_by_cell(tr).withColumnRenamed("zone", "cell_id").collect()}
    cover = SP.polygon_cover_df(polys, 3).collect()
    exp = {}
    for c in cover:
        if c["cell_id"] in rolled:
            e = exp.setdefault(c["poly_id"], [0.0, 0])
            e[0] += rolled[c["cell_id"]]["zsum"]
            e[1] += rolled[c["cell_id"]]["zcount"]
    got = {r["poly_id"]: (r["zsum"], r["zcount"]) for r in out}
    assert set(got) == set(exp)
    for pid in exp:
        assert got[pid][0] == pytest.approx(exp[pid][0])
        assert got[pid][1] == exp[pid][1]


def test_band_algebra_over_rgba_image(spark):
    """NDVI-style fused band math on an ingested RGBA image — bands are
    TileRasters sharing (raster_id, ty, tx), so the zip join aligns."""
    from mapalgebra_spark.raster import TileRaster

    images = datagen.generate_images_df(spark, 4).filter(
        F.col("image_id") == "img00000003"  # the RGBA one (i % 7 == 3)
    )
    tr = ingest.tiles_from_images(images, tile_size=256)
    b0 = TileRaster(tr.df.filter(F.col("band") == 0))
    b1 = TileRaster(tr.df.filter(F.col("band") == 1))
    ndvi = ((b0.astype("float64") - b1.astype("float64"))
            / (b0.astype("float64") + b1.astype("float64") + 1e-9))
    got = ndvi.collect_array("img00000003")
    pix = datagen.render_pixels(3, 256, 256, True).astype(np.float64)  # SIZES[3 % 3]
    ref = (pix[..., 0] - pix[..., 1]) / (pix[..., 0] + pix[..., 1] + 1e-9)
    np.testing.assert_allclose(got, ref)


def test_lossy_qdct_pipeline_psnr_gate(spark):
    """input_hint's lossy clause end-to-end: a qdct-format image table
    decodes through the real ingest stage with per-row PSNR >= 40 dB vs
    the generator pixels, caption preserved, and the tile pipeline
    (focal fmean) runs over the decoded tiles."""
    from mapalgebra_spark.tiles import assemble_from_tiles

    images = datagen.generate_images_df(spark, 6, fmts=["qdct"])
    rows = images.collect()
    for row in rows:
        i = int(row["image_id"][3:])
        rgba = i % 7 == 3
        ref = datagen.render_pixels(i, row["w"], row["h"], rgba)
        dec = codecs.decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
        assert codecs.psnr(ref, dec) >= 40.0
        assert row["caption"] == f"synthetic terrain {i} seed42"
    tr = ingest.tiles_from_images(images, tile_size=256)
    rid = rows[0]["image_id"]
    i0 = int(rid[3:])
    ref0 = datagen.render_pixels(i0, rows[0]["w"], rows[0]["h"], i0 % 7 == 3)
    if ref0.ndim == 3:
        ref0 = ref0[..., 0]
    got0 = tr.strict().collect_array(rid, band=0)
    assert codecs.psnr(ref0, got0) >= 40.0
    out = FO.focal(tr, "fmean")
    assert out.df.count() == tr.strict().df.count()
