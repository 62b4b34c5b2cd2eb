"""Hydrology GLOBAL ops: D8 flow direction + flow accumulation.

The reference's drainage surface is purely LOCAL — ``fdownstream`` /
``fupstream`` (MapAlgebra.hs:1199-1236) see one 3x3 window.  Flow
ACCUMULATION (how many cells drain through each cell — the op behind
stream extraction and watershed delineation) is inherently global:
a cell's value depends on an unbounded upstream region.

Distributed shape:

1. **Direction** — one ordinary focal pass (``kernels.k_flowdir``,
   Fill +inf border): integer-exact steepest-descent selection, no
   trig/sqrt, so a relational oracle picks identical neighbours.
2. **Edges** — the direction tiles explode to ``(cell, downstream
   cell)`` pairs inside the same mapInPandas (each tile row carries
   its raster dims, so no driver-side scalars are needed).  Strictly
   positive drops make the flow graph a DAG with out-degree ≤ 1.
3. **Accumulation** — ancestor-pair closure by PATH DOUBLING:
   ``R ← R ∪ (R ∘ R)`` until the pair count stops growing —
   O(log depth) rounds, 2 shuffles each, checkpointed per round like
   the CC loop (graph.py).  ``acc(c) = 1 + |{u : (u,c) ∈ R}|``.
   Closure size is Σ path-depth — bounded by depth·cells, and real
   terrain depths are tiny relative to cells (measured: depth 7 on
   the 244² test grid).  A plain one-step propagation would need
   depth rounds; doubling needs ⌈log₂ depth⌉.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels as K
from ..raster import TileRaster
from ..tiles import decode_block
from .focal import FocalSpec, focal

#: D8 direction spec: Fill +inf so off-raster cells never win
FLOWDIR_SPEC = FocalSpec(
    "flowdir", K.k_flowdir, K.BORDER_FILL, fill=float("inf"), cast="float64"
)


def flow_direction(tr: TileRaster) -> TileRaster:
    """Per-cell D8 direction code (0..7 in kernels.D8_OFFSETS order,
    −1 for pits/flats) as a float64 tile raster."""
    return focal(tr, FLOWDIR_SPEC)


_EDGE_SCHEMA = "gy int, gx int, u long, v long"


def _dir_rows(dirs: TileRaster, tile_pitch: int) -> DataFrame:
    """Explode direction tiles to (gy, gx, u, v) rows; v = −1 for
    cells with no outflow.  u/v are gy*rw + gx cell ids — computed
    per tile from its own rw field, no driver scalars."""
    src = dirs.strict().df
    offs = np.array(K.D8_OFFSETS, dtype=np.int64)

    def explode(batches):
        for pdf in batches:
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                h, w = int(row["h"]), int(row["w"])
                d = decode_block(
                    row["tile"], row["dtype"], h, w, int(row["planes"])
                ).astype(np.int64)
                gy0 = int(row["ty"]) * tile_pitch
                gx0 = int(row["tx"]) * tile_pitch
                rw = int(row["rw"])
                yy, xx = np.mgrid[0:h, 0:w]
                gys = (gy0 + yy).astype(np.int64)
                gxs = (gx0 + xx).astype(np.int64)
                u = gys * rw + gxs
                has = d >= 0
                dy = np.where(has, offs[np.clip(d, 0, 7), 0], 0)
                dx = np.where(has, offs[np.clip(d, 0, 7), 1], 0)
                v = np.where(has, (gys + dy) * rw + (gxs + dx), -1)
                yield pd.DataFrame(
                    {
                        "gy": gys.ravel().astype(np.int32),
                        "gx": gxs.ravel().astype(np.int32),
                        "u": u.ravel(),
                        "v": v.ravel(),
                    }
                )

    return src.mapInPandas(explode, _EDGE_SCHEMA)


def ancestor_closure(edges: DataFrame, max_iters: int = 30) -> DataFrame:
    """All reachability pairs of a graph with out-degree ≤ 1, by path
    doubling with an EXACT-power jump table: ``J_k`` holds pairs at
    distance exactly 2^k and ``A_k`` all pairs at distance ≤ 2^k, so

        delta = A ∘ J      (distances 2^k+1 .. 2^{k+1})
        A     = A ∪ delta
        J     = J ∘ J      (distance exactly 2^{k+1})

    Because out-degree ≤ 1 makes every path unique, each pair has ONE
    binary decomposition — delta never collides with A and neither
    join produces duplicates, so no round needs a ``distinct()``
    shuffle and the per-round count runs on the (shrinking) delta
    only.  Empty delta ⟹ no path longer than 2^k ⟹ A is the closure.
    ``max_iters`` rounds cover depth 2^30; hitting the bound means the
    input had a cycle, and raising beats looping forever."""
    from ..graph import _truncate

    spark = edges.sparkSession
    # Spark 4.1's UnionBase.rewriteConstraints crashes ("key not
    # found: <attr>") when a Union over checkpointed LogicalRDDs is
    # re-optimized — constraints preserved by the checkpoint reference
    # pre-checkpoint attribute ids.  Constraint propagation is an
    # optimizer inference heuristic (filters-from-constraints), not a
    # correctness feature; the closure loop joins on explicit keys, so
    # nothing is lost by switching it off for the loop's duration.
    cp_key = "spark.sql.constraintPropagation.enabled"
    cp_old = spark.conf.get(cp_key, "true")
    spark.conf.set(cp_key, "false")
    try:
        J = _truncate(edges.select("u", "v").distinct())
        A = J
        for _ in range(max_iters):
            delta = _truncate(
                A.alias("a")
                .join(J.alias("j"), F.col("a.v") == F.col("j.u"))
                .select(F.col("a.u").alias("u"), F.col("j.v").alias("v")),
                eager=False,
            )
            if delta.count() == 0:
                # materialize the union ITSELF while propagation is
                # off: the caller gets a plain constraint-free leaf,
                # safe to re-optimize under any session conf
                return _truncate(A)
            # A needs no checkpoint of its own: it is a union of
            # already-checkpointed deltas (lineage stays K unions deep)
            A = A.union(delta)
            J = _truncate(
                J.alias("p")
                .join(J.alias("q"), F.col("p.v") == F.col("q.u"))
                .select(F.col("p.u").alias("u"), F.col("q.v").alias("v")),
                eager=False,
            )
        raise RuntimeError(
            f"ancestor_closure: no fixpoint in {max_iters} doubling rounds "
            "(cycle in flow graph?)"
        )
    finally:
        spark.conf.set(cp_key, cp_old)


def flow_analysis(tr: TileRaster, tile_pitch: int = 256) -> DataFrame:
    """D8 flow accumulation + watershed labeling from ONE ancestor
    closure: rows (gy, gx, acc, basin) where

    * ``acc`` counts the cells draining through each cell, INCLUDING
      itself (every cell ≥ 1 — ESRI's convention excludes self;
      subtract 1 for that), and
    * ``basin`` is the cell id (gy·rw + gx) of the PIT each cell's
      flow path terminates at (pits label themselves) — the Basin /
      Watershed op.  Strictly-positive drops make every path end at a
      pit, so each cell has exactly one basin.

    Also carries ``cell`` (the cell's own gy·rw+gx id) and ``down``
    (the downstream cell id, −1 for pits) so downstream consumers —
    :func:`stream_network` — stay purely relational.

    See the module docstring for the distributed shape; the watershed
    half is one extra semi-join of the closure against the pit set."""
    rows = _dir_rows(flow_direction(tr), tile_pitch).persist()
    edges = rows.filter(F.col("v") >= 0).select("u", "v")
    closure = ancestor_closure(edges)
    counts = closure.groupBy("v").agg(F.count("*").alias("c")).select(
        F.col("v").alias("_tid"), "c"
    )
    pits = rows.filter(F.col("v") < 0).select(F.col("u").alias("_pit"))
    basins = closure.join(
        pits, closure["v"] == pits["_pit"]
    ).select(F.col("u").alias("_bu"), F.col("v").alias("_basin"))
    return (
        rows.join(counts, rows["u"] == counts["_tid"], "left")
        .join(basins, rows["u"] == basins["_bu"], "left")
        .select(
            "gy", "gx",
            F.col("u").alias("cell"),
            F.col("v").alias("down"),
            (F.lit(1) + F.coalesce(F.col("c"), F.lit(0)))
            .cast("long").alias("acc"),
            F.coalesce(F.col("_basin"), F.col("u")).alias("basin"),
        )
    )


def stream_network(fa: DataFrame, threshold: int) -> DataFrame:
    """Stream extraction: the D8 links whose SOURCE cell accumulates at
    least ``threshold`` cells — the standard acc-threshold stream
    definition.  (A stream cell's downstream neighbour accumulates at
    least as much, so segments chain into connected polylines by
    construction.)  Input is :func:`flow_analysis` output; this is one
    filter + one self equi-join, no pixel recompute.  Returns
    (gy, gx, gy2, gx2, acc) segments."""
    a = fa.filter((F.col("acc") >= threshold) & (F.col("down") >= 0)).select(
        "gy", "gx", "acc", "down"
    )
    b = fa.select(
        F.col("cell").alias("_c"),
        F.col("gy").alias("gy2"), F.col("gx").alias("gx2"),
    )
    return a.join(b, a["down"] == b["_c"]).select("gy", "gx", "gy2", "gx2", "acc")


def flow_accumulation(tr: TileRaster, tile_pitch: int = 256) -> DataFrame:
    """D8 flow accumulation alone: rows (gy, gx, acc) — see
    :func:`flow_analysis`."""
    return flow_analysis(tr, tile_pitch).select("gy", "gx", "acc")
