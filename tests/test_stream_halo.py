"""Stream-halo engine (focal_multi halo="stream"): bit-identical to the
driver-validated join-halo path on every output, across edge shapes.

The stream path is the flagship's plan at scale (zero-join stencil over
a (raster_id, band)-partitioned, (ty, tx)-sorted table); the join path
carries the DuckDB-oracle validation in the driver window.  This suite
is the equivalence chain between them."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapalgebra_spark import datagen
from mapalgebra_spark.ingest import tiles_from_images
from mapalgebra_spark.operators import focal as FO
from mapalgebra_spark.raster import TileRaster
from mapalgebra_spark.tiles import TILE_SCHEMA, tile_rows_from_array

pytestmark = pytest.mark.spark

#: every border mode is hit: fill (fsum/fmean), edge (fmax), continue
#: (fmajority, fhillshade — the r5 Horn pair rides the same mode),
#: reflect (fgradient/fshape)
OPS = ["fsum", "fmean", "fmax", "fmajority", "fhillshade", "fgradient", "fshape"]


def _canon(outs):
    rows = {}
    for name, t in outs.items():
        for r in t.df.collect():
            rows[(name, r["raster_id"], r["band"], r["ty"], r["tx"])] = (
                r["dtype"], r["planes"], r["tile"], r["en"], r["cse"])
    return rows


def _assert_equal(tr, ops=OPS, **stream_kw):
    a = _canon(FO.focal_multi(tr, ops, persist_combined=False))
    b = _canon(FO.focal_multi(tr, ops, persist_combined=False,
                              halo="stream", **stream_kw))
    assert set(a) == set(b)
    bad = [k for k in a if a[k] != b[k]]
    assert not bad, f"{len(bad)} mismatched tiles, first: {bad[:3]}"


def test_stream_matches_join_on_images(spark):
    """Mixed image sizes (256^2, 512^2, 300x200 partial-edge tiles,
    RGBA multi-band) — the ingest-shaped table."""
    imgs = datagen.generate_images_df(spark, 8)
    _assert_equal(tiles_from_images(imgs, tile_size=256))


def test_stream_matches_join_small_tiles_many_groups(spark):
    """64px tiles over several rasters: interior tiles exist, groups
    interleave across partitions and Arrow batch boundaries."""
    imgs = datagen.generate_images_df(spark, 6)
    tr = tiles_from_images(imgs, tile_size=64)
    _assert_equal(tr, ops=["fmean", "fmax"])


def test_stream_matches_join_1px_tiles(spark):
    """1-px tiles: the reflect mirror source lives in a NEIGHBOUR's
    strip — the hardest assemble_halo case (its own test matrix)."""
    rng = np.random.default_rng(3)
    rows = []
    for rid, (h, w) in [("a", (4, 5)), ("b", (1, 7)), ("c", (6, 1))]:
        arr = rng.integers(0, 255, (h, w)).astype(np.float64)
        rows += tile_rows_from_array(rid, arr, tile_size=1)
    tr = TileRaster(spark.createDataFrame(rows, TILE_SCHEMA))
    _assert_equal(tr, ops=["fsum", "fmax", "fgradient"])


def test_stream_presorted_skips_relayout(spark):
    """presorted=True over an already partitioned+sorted df must give
    the same result (the bucketed-sorted-table-at-rest posture)."""
    imgs = datagen.generate_images_df(spark, 5)
    tr = tiles_from_images(imgs, tile_size=256)
    laid = (
        tr.strict().df
        .repartition(4, F.col("raster_id"), F.col("band"))
        .sortWithinPartitions("raster_id", "band", "ty", "tx")
    )
    a = _canon(FO.focal_multi(tr, ["fmean"], persist_combined=False))
    b = _canon(FO.focal_multi(TileRaster(laid), ["fmean"],
                              persist_combined=False, halo="stream",
                              presorted=True, repartition=False))
    assert a == b


def test_stream_checksum_sink_matches_tiles_sink(spark):
    """checksum sink through the stream path == per-tile sums of the
    tile sink (same kernels, reduce-in-place)."""
    imgs = datagen.generate_images_df(spark, 4)
    tr = tiles_from_images(imgs, tile_size=256)
    cs = FO.focal_multi(tr, ["fmean"], persist_combined=False,
                        sink="checksum", halo="stream")
    got = {
        (r["raster_id"], r["band"], r["ty"], r["tx"]): r["sum_fmean"]
        for r in cs.collect()
    }
    tiles = FO.focal_multi(tr, ["fmean"], persist_combined=False)["fmean"]
    from mapalgebra_spark.tiles import decode_block

    for r in tiles.df.collect():
        blk = decode_block(r["tile"], r["dtype"], r["h"], r["w"], r["planes"])
        key = (r["raster_id"], r["band"], r["ty"], r["tx"])
        assert got[key] == float(blk.sum(dtype=np.float64)), key


def test_stream_dense_grid_contract_enforced(spark):
    """A missing tile must raise the dense-grid contract error, not
    silently produce wrong border pixels."""
    arr = np.arange(12.0).reshape(3, 4)
    rows = tile_rows_from_array("r", arr, tile_size=1)
    rows = [r for r in rows if not (r["ty"] == 1 and r["tx"] == 2)]
    tr = TileRaster(spark.createDataFrame(rows, TILE_SCHEMA))
    with pytest.raises(Exception, match="dense-grid"):
        FO.focal_multi(tr, ["fsum"], persist_combined=False,
                       halo="stream")["fsum"].df.collect()


def test_stream_rejects_unknown_halo(spark):
    imgs = datagen.generate_images_df(spark, 1)
    tr = tiles_from_images(imgs, tile_size=256)
    with pytest.raises(ValueError, match="halo"):
        FO.focal_multi(tr, ["fsum"], halo="nope")
