"""Regression pins for the round-4 review findings (each a verified
failure mode found after the r4 features landed)."""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.spark


def test_keeper_recovery_after_mid_swap_crash(spark, tmp_path):
    """A crash between compaction's two renames leaves the keeper dir
    ABSENT (data in .compact.tmp).  The next batch must restore it and
    keep deduplicating — not read the absence as 'no keeper yet' and
    mint duplicate survivors (the silent-loss failure the r4 review
    found)."""
    import os

    from mapalgebra_spark.streaming import (
        _dir_has_parquet,
        _recover_keeper,
        stream_near_dedup_documents,
    )

    src = tmp_path / "in"
    src.mkdir()
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy riverbank under pale skies"
    )

    def write(name, rows):
        pdf = pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["s"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src / name))

    keeper = str(tmp_path / "keeper")
    write("b1", [(0, base)])
    q = stream_near_dedup_documents(
        spark, f"{src}/*", keeper, str(tmp_path / "out"),
        str(tmp_path / "ck1"), threshold=0.6,
    )
    q.awaitTermination(120)
    assert _dir_has_parquet(spark, keeper)

    # simulate the mid-swap crash: keeper renamed away, tmp holds it
    os.rename(keeper, keeper + ".compact.tmp")
    assert not _dir_has_parquet(spark, keeper)
    _recover_keeper(spark, keeper)
    assert _dir_has_parquet(spark, keeper)

    # crash again, then verify the STREAM itself recovers: a near-copy
    # arriving post-crash must still drop against the restored keeper
    os.rename(keeper, keeper + ".compact.old")
    write("b2", [(7, base.replace("pale", "grey"))])
    q = stream_near_dedup_documents(
        spark, f"{src}/*", keeper, str(tmp_path / "out"),
        str(tmp_path / "ck2"), threshold=0.6,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out") + "/batch=*")
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == [0]


def test_zonal_census_nan_zone_dropped_not_garbage(spark):
    """Float zone rasters use NaN as NoData: such cells must be
    EXCLUDED, not cast to a garbage int64 zone id."""
    from mapalgebra_spark import raster as R
    from mapalgebra_spark.operators import zonal as Z

    vals = np.ones((8, 8), dtype=np.float64)
    zones = np.zeros((8, 8), dtype=np.float64)
    zones[2, 3] = np.nan
    zones[5:, :] = 1.0
    v = R.TileRaster.from_arrays(spark, {"r": vals}, tile_size=4)
    z = R.TileRaster.from_arrays(spark, {"r": zones}, tile_size=4)
    got = {(r["zone"], r["val"]): r["n"] for r in Z.zonal_census(v, z).collect()}
    assert got == {(0, 1.0): 39, (1, 1.0): 24}  # 40 - 1 NaN cell


def test_zonal_census_zone_ids_above_2_53_exact(spark):
    """int64 zone ids above 2^53 must not be merged by a float64
    round-trip."""
    from mapalgebra_spark import raster as R
    from mapalgebra_spark.operators import zonal as Z

    big = (1 << 60) + 1
    vals = np.ones((4, 4), dtype=np.float64)
    zones = np.full((4, 4), big, dtype=np.int64)
    zones[0, :] = big + 1  # adjacent id: collapses to `big` in float64
    v = R.TileRaster.from_arrays(spark, {"r": vals}, tile_size=4)
    z = R.TileRaster.from_arrays(spark, {"r": zones}, tile_size=4)
    got = {r["zone"]: r["n"] for r in Z.zonal_census(v, z).collect()}
    assert got == {big: 12, big + 1: 4}


def test_stream_halo_rejects_duplicate_tiles(spark):
    """A duplicated (ty,tx) row must raise the dense-grid error in the
    stream path — silent last-wins would diverge from the join path's
    fan-out."""
    from mapalgebra_spark.operators import focal as FO
    from mapalgebra_spark.raster import TileRaster
    from mapalgebra_spark.tiles import TILE_SCHEMA, tile_rows_from_array

    arr = np.arange(16.0).reshape(4, 4)
    rows = tile_rows_from_array("r", arr, tile_size=2)
    rows.append(dict(rows[0]))  # duplicate tile (0,0)
    tr = TileRaster(spark.createDataFrame(rows, TILE_SCHEMA))
    with pytest.raises(Exception, match="duplicate tile"):
        FO.focal_multi(tr, ["fsum"], persist_combined=False,
                       halo="stream")["fsum"].df.collect()
