"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship pipeline on sf0.001: lineitem grid → tile table →
              fused fmean+fgradient over ONE halo join → zonal rollup.
``queries`` — one entry per implemented operator (SURVEY.md §2), each
              running the real tile/spatial engine and returning rows.
``oracle_sql`` — matching DuckDB SQL (border modes emulated relationally;
              see mapalgebra_spark/queries.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from mapalgebra_spark.gridq import grid_df, grid_to_tiles
    from mapalgebra_spark.operators import focal as FO
    from mapalgebra_spark.operators import zonal as Z
    from mapalgebra_spark import raster as R

    sf_dir = "/root/testdata/sf0.001"
    g, G = grid_df(spark, sf_dir)
    vals = grid_to_tiles(g, G, "val", "float64", "a")
    zones = grid_to_tiles(g, G, "zone", "int64", "a")
    outs = FO.focal_multi(vals, ["fmean", "fgradient"])
    # zonal rollup of the smoothed surface + mean slope per zone
    zm = Z.zonal_stats(outs["fmean"], zones).select(
        "zone",
        F.round("zmean", 6).alias("mean_smoothed"),
    )
    zg = Z.zonal_stats(outs["fgradient"], zones).select(
        "zone", F.round("zmean", 6).alias("mean_slope")
    )
    return zm.join(zg, on="zone").orderBy("zone")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mapalgebra_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mapalgebra_spark.queries import ORACLE

    return dict(ORACLE)
