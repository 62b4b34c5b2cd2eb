"""Distributed focal (3x3 stencil) engine — the ``Raster DW`` analog.

The reference runs ``mapStencil <Border> <stencil>`` over an in-memory
array (MapAlgebra.hs:775-852, 1042-1263).  Distributed, a focal op
needs each tile's 1-px halo from its 8 neighbours.  Naive designs ship
whole neighbour tiles (9x read amplification) or shuffle per pixel; per
BASELINE.json north_star we instead materialize halos **via a self-join
of neighbouring tile keys**, shipping only edge strips:

1. ``strips``: a narrow ``mapInPandas`` over the tile table emits, per
   tile, up to 8 strips addressed to its in-range neighbours — 2 rows
   (1xW), 2 cols (Hx1), 4 corners (1x1).  For 256x256 tiles this is
   ~1.6% of the raster bytes; *only this* crosses the shuffle.
2. the strips collapse to one row per receiving tile with a JVM-side
   ``collect_list`` aggregation, and join back to the tile table on
   (raster_id, band, ty, tx) with a shuffle-hash hint: when the tile
   table is already hash-partitioned on the key (one ``repartition``
   that every downstream focal stage reuses, or a bucketed table at
   rest) Catalyst inserts **no exchange and no sort on the big side** —
   verified by plan assertion in tests.
3. one ``mapInPandas`` over the joined rows assembles the (h+2, w+2)
   block per tile (``tiles.assemble_halo`` — bit-identical to np.pad
   of the full raster, border mode per op) and runs **all requested
   kernels in one pass**, emitting one output column per op.  Running
   fmean+fgradient (the flagship metric) therefore costs ONE strip
   shuffle, not two.  (A per-key cogroup was measured at ~50 core-ms
   per tile of fixed overhead; the batched join path amortizes the
   Python/Arrow roundtrip over a whole 64-tile batch.)

Chained focal ops need a materialization barrier between stages —
mirroring the reference's ``fupstream . strict S . fdownstream``
(test/Test.hs:347) — via ``TileRaster.strict(persist=True)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels as K
from ..raster import TileRaster
from ..tiles import (
    KEY_COLS,
    TILE_SCHEMA,
    assemble_halo,
    decode_block,
    encode_block,
)


@dataclass(frozen=True)
class FocalSpec:
    """One focal operator: kernel over a padded block + its border mode."""

    name: str
    kernel: Callable[[np.ndarray], np.ndarray]
    mode: str
    fill: float = 0
    cast: str | None = None  # cast input before padding (e.g. float64)
    out_cast: str | None = None  # narrow the RESULT dtype (e.g. float32)


# Border modes per reference op (MapAlgebra.hs lines cited in kernels.py)
FOCAL_OPS: dict[str, FocalSpec] = {
    "fsum": FocalSpec("fsum", K.k_fsum, K.BORDER_FILL, 0),
    "fproduct": FocalSpec("fproduct", K.k_fproduct, K.BORDER_FILL, 1),
    "fmean": FocalSpec("fmean", K.k_fmean, K.BORDER_FILL, 0),
    "fmax": FocalSpec("fmax", K.k_fmax, K.BORDER_EDGE),
    "fmin": FocalSpec("fmin", K.k_fmin, K.BORDER_EDGE),
    "fvariety": FocalSpec("fvariety", K.k_fvariety, K.BORDER_EDGE),
    "fmajority": FocalSpec("fmajority", K.k_fmajority, K.BORDER_CONTINUE),
    "fminority": FocalSpec("fminority", K.k_fminority, K.BORDER_CONTINUE),
    "fmedian": FocalSpec("fmedian", K.k_fmedian, K.BORDER_CONTINUE),
    # gdaldem terrain-index family (TPI/TRI/roughness) — mirrored
    # (Continue) border like the neighbour-compare ops
    "ftpi": FocalSpec("ftpi", K.k_ftpi, K.BORDER_CONTINUE, cast="float64"),
    "ftri": FocalSpec("ftri", K.k_ftri, K.BORDER_CONTINUE, cast="float64"),
    "froughness": FocalSpec("froughness", K.k_froughness, K.BORDER_CONTINUE),
    "fslope": FocalSpec("fslope", K.k_fslope, K.BORDER_CONTINUE, cast="float64"),
    "fhillshade": FocalSpec(
        "fhillshade", K.k_fhillshade, K.BORDER_CONTINUE, cast="float64"
    ),
    "fvariance": FocalSpec("fvariance", K.k_fvariance, K.BORDER_CONTINUE, cast="float64"),
    "fstddev": FocalSpec("fstddev", K.k_fstddev, K.BORDER_CONTINUE, cast="float64"),
    "fpercentage": FocalSpec("fpercentage", K.k_fpercentage, K.BORDER_CONTINUE),
    "fpercentile": FocalSpec("fpercentile", K.k_fpercentile, K.BORDER_CONTINUE),
    # GaCM ops absent from the reference (README.md:129-130) — our
    # semantics, documented in kernels.k_frank / k_finsularity
    "frank": FocalSpec("frank", K.k_frank, K.BORDER_CONTINUE),
    "finsularity": FocalSpec("finsularity", K.k_finsularity, K.BORDER_CONTINUE),
    "flinkage": FocalSpec("flinkage", K.k_flinkage, K.BORDER_FILL, 0),
    "fpartition": FocalSpec("fpartition", K.k_fpartition, K.BORDER_REFLECT),
    "fshape": FocalSpec("fshape", K.k_fshape, K.BORDER_REFLECT),
    "fvolume": FocalSpec("fvolume", K.k_fvolume, K.BORDER_REFLECT, cast="float64"),
    "fgradient": FocalSpec("fgradient", K.k_gradient, K.BORDER_REFLECT, cast="float64"),
    "faspect": FocalSpec("faspect", K.k_aspect, K.BORDER_REFLECT, cast="float64"),
    "faspect_unsafe": FocalSpec(
        "faspect_unsafe", K.k_aspect_unsafe, K.BORDER_REFLECT, cast="float64"
    ),
    "fdownstream": FocalSpec(
        "fdownstream", K.k_fdownstream, K.BORDER_REFLECT, cast="float64"
    ),
    "fupstream": FocalSpec("fupstream", K.k_fupstream, K.BORDER_FILL, 0),
}

#: JVM-side strip routing: (aux column at sender, dty, dtx, pos at
#: receiver, strip height expr, strip width expr).  A tile's north edge
#: blob is its north neighbour's S strip, its NW corner pixel the
#: NW-diagonal neighbour's SE corner, etc. (see tiles.STRIP_SENDS for
#: the python-side equivalent used by tests).
_STRIP_ROUTES = (
    # (aux col, dty, dtx, pos, sh spec, sw spec); "h"/"w" = tile dims
    ("en", -1, 0, 1, "1", "w"),    # → north nbr's STRIP_S
    ("es", 1, 0, 0, "1", "w"),     # → south nbr's STRIP_N
    ("ew", 0, -1, 3, "h", "1"),    # → west nbr's STRIP_E
    ("ee", 0, 1, 2, "h", "1"),     # → east nbr's STRIP_W
    ("cnw", -1, -1, 7, "1", "1"),  # → NW nbr's STRIP_SE
    ("cne", -1, 1, 6, "1", "1"),   # → NE nbr's STRIP_SW
    ("csw", 1, -1, 5, "1", "1"),   # → SW nbr's STRIP_NE
    ("cse", 1, 1, 4, "1", "1"),    # → SE nbr's STRIP_NW
)


def _dim(spec: str):
    return F.lit(1) if spec == "1" else F.col(spec)


def _strips_jvm(src):
    """Edge-strip exchange as a pure JVM projection (no Python, no tile
    bytes read): explode the 8 addressed aux blobs, drop out-of-range
    destinations.  ~1.6% of the raster bytes; the ONLY shuffled data."""
    entries = [
        F.struct(
            (F.col("ty") + dty).alias("ty"),
            (F.col("tx") + dtx).alias("tx"),
            F.lit(pos).alias("pos"),
            _dim(sh).cast("int").alias("sh"),
            _dim(sw).cast("int").alias("sw"),
            F.col("dtype").alias("sdtype"),
            F.col("planes").alias("splanes"),
            F.col(aux).alias("strip"),
        )
        for aux, dty, dtx, pos, sh, sw in _STRIP_ROUTES
    ]
    return (
        src.select(
            "raster_id", "band", "nty", "ntx",
            F.explode(F.array(*entries)).alias("s"),
        )
        .filter(
            (F.col("s.ty") >= 0)
            & (F.col("s.ty") < F.col("nty"))
            & (F.col("s.tx") >= 0)
            & (F.col("s.tx") < F.col("ntx"))
        )
        .select(
            "raster_id",
            "band",
            F.col("s.ty").alias("ty"),
            F.col("s.tx").alias("tx"),
            F.struct("s.pos", "s.sh", "s.sw", "s.sdtype", "s.splanes", "s.strip").alias(
                "strip_entry"
            ),
        )
    )


def _apply_specs_to_tile(specs, core, strips_raw, at, checksum):
    """Apply every FocalSpec to one tile's core + received strips.

    Returns ``{name: float_sum}`` for the checksum sink, else
    ``{name: (blob, dtype_str, planes, aux_dict)}``.  Shared by the
    join-halo and stream-halo runners so the two paths cannot diverge
    semantically.  Interior tiles share ONE assembled block across ops
    with different border modes (the mode never fires there)."""
    padded_cache: dict[tuple, np.ndarray] = {}
    at_edge = any(at.values())
    out = {}
    for s in specs:
        ck = (
            (s.mode, s.fill if s.mode == K.BORDER_FILL else None, s.cast)
            if at_edge
            else ("interior", s.cast)
        )
        if ck not in padded_cache:
            # cast lazily, ONLY on a cache miss — on a hit (second op
            # sharing the assembled block) a core-sized astype would be
            # pure wasted memory traffic
            c = core.astype(np.dtype(s.cast)) if s.cast else core
            st = strips_raw
            if s.cast:
                st = {k: v.astype(np.dtype(s.cast)) for k, v in strips_raw.items()}
            padded_cache[ck] = assemble_halo(c, st, s.mode, s.fill, **at)
        res = np.asarray(s.kernel(padded_cache[ck]))
        if s.out_cast:
            res = res.astype(np.dtype(s.out_cast))
        if checksum:
            out[s.name] = float(res.sum(dtype=np.float64))
        else:
            from ..tiles import aux_blobs

            out[s.name] = (
                encode_block(res),
                str(res.dtype),
                res.shape[0] if res.ndim == 3 else 1,
                aux_blobs(res),
            )
    return out


def _pa_type(dt):
    """Arrow type for a Spark type — PySpark's own mapping, so any
    schema the join path handles the stream path handles too."""
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(dt)


def focal_multi(
    tr: TileRaster,
    ops: list[str | FocalSpec],
    num_partitions: int | None = None,
    repartition: bool = True,
    persist_combined: bool = True,
    out_dtype: str | None = None,
    sink: str = "tiles",
    halo: str = "join",
    presorted: bool = False,
) -> dict[str, TileRaster]:
    """Run several focal ops over ONE halo materialization.

    Returns {op_name: TileRaster}. The combined output df carries one
    binary column per op; each returned TileRaster selects its own and
    shares the underlying plan, so persisting the combined df (done here
    when >1 op) computes the halo join exactly once.

    ``out_dtype`` narrows every op's RESULT dtype after the (float64)
    kernel runs — e.g. "float32" for 8-bit imagery, where float64
    outputs would carry 8x the source bytes through every downstream
    stage for precision the data doesn't have.  Default None keeps the
    kernel's native dtype (the reference-exact float64 path used by all
    oracle-checked queries).

    ``sink="checksum"`` runs the identical halo join + kernels but the
    kernel stage REDUCES each tile's outputs to one float64 sum per op
    (columns ``sum_<op>``) instead of returning tile bytes; the return
    value is then a single DataFrame of (key cols, sums).  This is the
    compute-and-reduce form: on a real cluster full outputs stream to
    node-local storage (a per-node cost that scales with nodes), while
    in one-box local mode funnelling every output tile back through one
    JVM measures the box's memory system, not the engine.  The sums
    double as a cross-check against the tile sink (same values, either
    path).

    ``halo`` selects the halo-materialization strategy; both produce
    BIT-IDENTICAL outputs (pinned by tests/test_stream_halo.py):

    * ``"join"`` (default) — strip explode → collect_list agg →
      shuffle-hash join (module docstring).  Parallelism = #tiles;
      right for FEW LARGE rasters, and for tile tables partitioned on
      the full (raster_id, band, ty, tx) key.
    * ``"stream"`` — zero-join streaming stencil: the table is
      partitioned by (raster_id, band) and sorted (ty, tx) within
      partitions; one ``mapInArrow`` pass buffers <= 3 tile rows per
      raster and slices halo strips straight out of neighbour cores.
      No strip explode, no agg, no join — measured +45% flagship
      throughput at width 32 (BENCH/BASELINE.md).  Parallelism =
      #(raster_id, band) groups, so it needs MANY rasters (the 10^12-
      image posture: groups >> cores); a single huge raster would run
      on one core — use "join" there.  ``presorted=True`` skips the
      repartition+sort when the table at rest already has the layout
      (bucketed+sorted table, or a sort reused across stages).
    """
    if halo not in ("join", "stream"):
        raise ValueError(f"halo must be 'join' or 'stream', got {halo!r}")
    specs = [FOCAL_OPS[o] if isinstance(o, str) else o for o in ops]
    if out_dtype is not None:
        from dataclasses import replace as _dc_replace

        specs = [_dc_replace(sp, out_cast=out_dtype) for sp in specs]
    src = tr.strict().df
    if halo == "stream":
        # stream-halo contract: all tiles of one (raster_id, band) in
        # ONE partition, rows sorted (ty, tx) row-major, DENSE grid.
        # ``presorted=True`` asserts the caller's table already has this
        # layout (a bucketed+sorted tile table at rest — Hive/Iceberg
        # bucket-sort orders — or an upstream repartition+sort reused
        # across stages); otherwise it is established here.
        if not presorted:
            src = src.repartition(
                *([num_partitions] if num_partitions else []),
                F.col("raster_id"), F.col("band"),
            ).sortWithinPartitions(*KEY_COLS)
        # the stream runner slices halos from neighbour cores — the 8
        # precomputed aux strip blobs are dead weight here, and every
        # byte selected crosses the Arrow hop (the measured dominant
        # residual); a projection preserves partitioning + sort order
        from ..tiles import AUX_COLS as _AUX

        src = src.drop(*[c for c in _AUX if c in src.columns])
        joined = None
    else:
        if repartition:
            src = src.repartition(*(
                [num_partitions] if num_partitions else []
            ), *[F.col(c) for c in KEY_COLS])
        strips = _strips_jvm(src)
        halo_df = strips.groupBy(*KEY_COLS).agg(
            F.collect_list("strip_entry").alias("halo")
        )
        joined = src.join(halo_df.hint("shuffle_hash"), on=KEY_COLS, how="left")

    from ..tiles import AUX_COLS, aux_blobs

    computed = {"tile", "dtype", "planes", *AUX_COLS}
    plain_cols = [f.name for f in TILE_SCHEMA.fields if f.name not in computed]
    checksum = sink == "checksum"
    out_fields = [f for f in TILE_SCHEMA.fields if f.name not in computed]
    if checksum:
        out_fields = out_fields + [
            T.StructField(f"sum_{s.name}", T.DoubleType()) for s in specs
        ]
    else:
        for s in specs:
            out_fields = out_fields + [
                T.StructField(f"tile_{s.name}", T.BinaryType()),
                T.StructField(f"dtype_{s.name}", T.StringType()),
                T.StructField(f"planes_{s.name}", T.IntegerType()),
            ] + [T.StructField(f"{c}_{s.name}", T.BinaryType()) for c in AUX_COLS]
    out_schema = T.StructType(out_fields)

    import pyarrow as pa

    def _binary_views(arr: "pa.Array"):
        """Zero-copy per-row memoryviews of an Arrow binary array."""
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if isinstance(arr, pa.LargeBinaryArray):
            off = arr.buffers()[1]
            offs = np.frombuffer(off, dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
        else:
            off = arr.buffers()[1]
            offs = np.frombuffer(off, dtype=np.int32, count=len(arr) + 1, offset=arr.offset * 4)
        data = memoryview(arr.buffers()[2])
        return [data[offs[i]: offs[i + 1]] for i in range(len(arr))]

    def run(batches):
        for batch in batches:
            n = batch.num_rows
            cols = {
                c: batch.column(c).to_numpy(zero_copy_only=False)
                for c in ("ty", "tx", "nty", "ntx", "h", "w", "planes")
            }
            tiles_col = _binary_views(batch.column("tile"))
            dtype_col = batch.column("dtype").to_pylist()
            halo_col = batch.column("halo").to_pylist()  # small structs
            res_cols = {f"tile_{s.name}": [None] * n for s in specs}
            res_dt = {s.name: [None] * n for s in specs}
            res_pl = {s.name: [1] * n for s in specs}
            res_aux = {(s.name, c): [None] * n for s in specs for c in AUX_COLS}
            res_sum = {s.name: np.zeros(n, dtype=np.float64) for s in specs}
            for r in range(n):
                h, w, planes = int(cols["h"][r]), int(cols["w"][r]), int(cols["planes"][r])
                core = decode_block(tiles_col[r], dtype_col[r], h, w, planes)
                strips_raw = {}
                hl = halo_col[r]
                if hl is not None:
                    for srow in hl:
                        strips_raw[int(srow["pos"])] = decode_block(
                            srow["strip"], srow["sdtype"], int(srow["sh"]),
                            int(srow["sw"]), int(srow["splanes"]),
                        )
                ty, tx = int(cols["ty"][r]), int(cols["tx"][r])
                at = dict(
                    at_n=ty == 0,
                    at_s=ty == int(cols["nty"][r]) - 1,
                    at_w=tx == 0,
                    at_e=tx == int(cols["ntx"][r]) - 1,
                )
                per_op = _apply_specs_to_tile(specs, core, strips_raw, at, checksum)
                for s in specs:
                    if checksum:
                        # reduce in place of materializing: same kernel
                        # output (post out_cast), one double per tile
                        res_sum[s.name][r] = per_op[s.name]
                        continue
                    blob, dt, pl, aux = per_op[s.name]
                    res_cols[f"tile_{s.name}"][r] = blob
                    res_dt[s.name][r] = dt
                    res_pl[s.name][r] = pl
                    for c, v in aux.items():
                        res_aux[(s.name, c)][r] = v
            arrays, names = [], []
            for f in out_fields:
                nm = f.name
                names.append(nm)
                if nm in (c for c in batch.schema.names):
                    arrays.append(batch.column(nm))
                elif nm.startswith("sum_"):
                    arrays.append(pa.array(res_sum[nm[len("sum_"):]], type=pa.float64()))
                elif nm.startswith("tile_"):
                    arrays.append(pa.array(res_cols[nm], type=pa.binary()))
                elif nm.startswith("dtype_"):
                    arrays.append(pa.array(res_dt[nm[len("dtype_"):]], type=pa.string()))
                elif nm.startswith("planes_"):
                    arrays.append(
                        pa.array(res_pl[nm[len("planes_"):]], type=pa.int32())
                    )
                else:  # aux_{op}: "<aux>_<op>"
                    aux_name, op_name = nm.split("_", 1)
                    arrays.append(
                        pa.array(res_aux[(op_name, aux_name)], type=pa.binary())
                    )
            yield pa.RecordBatch.from_arrays(arrays, names)

    from ..tiles import STRIP_SENDS

    def run_stream(batches):
        """Stream-halo runner: ONE pass over a partition whose rows are
        sorted (raster_id, band, ty, tx).  Buffers at most 3 tile ROWS
        per raster-band group (a tile row is emitted once its south
        neighbour row is complete — detected when the first row of
        ty+2 arrives, or at group end), so worker memory is
        O(3 * ntx * tile_bytes) — never a whole raster.  Halo strips
        are SLICES of already-decoded neighbour cores: no aux columns,
        no strip explode, no collect_list agg, no join — the group
        partitioning is the only data movement, and over a
        bucketed+sorted table at rest even that is free."""
        group = None          # (raster_id, band)
        meta = None           # (nty, ntx) of the current group
        buf: dict[int, dict] = {}   # ty -> {tx: (plain_tuple, core)}
        next_emit = 0
        out_vals: dict[str, list] = {f.name: [] for f in out_fields}
        n_out = 0
        plain_idx = {c: i for i, c in enumerate(plain_cols)}

        def emit_tile(plain, core, ty, tx, nty, ntx):
            nonlocal n_out
            at = dict(at_n=ty == 0, at_s=ty == nty - 1,
                      at_w=tx == 0, at_e=tx == ntx - 1)
            strips_raw = {}
            missing = []
            for dty, dtx, pos, slicer in STRIP_SENDS:
                srow = buf.get(ty - dty)
                nb = srow.get(tx - dtx) if srow else None
                if nb is not None:
                    strips_raw[pos] = slicer(nb[1])
                elif 0 <= ty - dty < nty and 0 <= tx - dtx < ntx:
                    missing.append((ty - dty, tx - dtx))
            if missing:
                raise ValueError(
                    "stream halo: dense-grid contract violated — group "
                    f"{group} tile ({ty},{tx}) is missing neighbour "
                    f"tiles {missing}"
                )
            per_op = _apply_specs_to_tile(specs, core, strips_raw, at, checksum)
            for c in plain_cols:
                out_vals[c].append(plain[plain_idx[c]])
            for s in specs:
                if checksum:
                    out_vals[f"sum_{s.name}"].append(per_op[s.name])
                else:
                    blob, dt, pl, aux = per_op[s.name]
                    out_vals[f"tile_{s.name}"].append(blob)
                    out_vals[f"dtype_{s.name}"].append(dt)
                    out_vals[f"planes_{s.name}"].append(pl)
                    for cn, v in aux.items():
                        out_vals[f"{cn}_{s.name}"].append(v)
            n_out += 1

        def emit_ty_row(t):
            row = buf.get(t)
            if row is None:
                return
            nty, ntx = meta
            if len(row) != ntx:
                raise ValueError(
                    "stream halo: dense-grid contract violated — group "
                    f"{group} row ty={t} has {len(row)}/{ntx} tiles"
                )
            for tx in sorted(row):
                plain, core = row[tx]
                emit_tile(plain, core, t, tx, nty, ntx)

        def finish_group():
            nonlocal next_emit
            for t in sorted(k for k in buf if k >= next_emit):
                emit_ty_row(t)
            buf.clear()
            next_emit = 0

        def pop_batch():
            nonlocal n_out
            arrays = [
                pa.array(out_vals[f.name], type=_pa_type(f.dataType))
                for f in out_fields
            ]
            for f in out_fields:
                out_vals[f.name].clear()
            n_out = 0
            return pa.RecordBatch.from_arrays(
                arrays, [f.name for f in out_fields]
            )

        for batch in batches:
            pcols = {}
            for c in plain_cols:
                col = batch.column(c)
                pcols[c] = (
                    col.to_pylist() if pa.types.is_string(col.type)
                    else col.to_numpy(zero_copy_only=False)
                )
            tiles_col = _binary_views(batch.column("tile"))
            dtype_col = batch.column("dtype").to_pylist()
            planes_col = batch.column("planes").to_numpy(zero_copy_only=False)
            for r in range(batch.num_rows):
                key = (pcols["raster_id"][r], int(pcols["band"][r]))
                if key != group:
                    finish_group()
                    group = key
                    meta = (int(pcols["nty"][r]), int(pcols["ntx"][r]))
                ty, tx = int(pcols["ty"][r]), int(pcols["tx"][r])
                core = decode_block(
                    tiles_col[r], dtype_col[r],
                    int(pcols["h"][r]), int(pcols["w"][r]),
                    int(planes_col[r]),
                )
                plain = tuple(pcols[c][r] for c in plain_cols)
                row_buf = buf.setdefault(ty, {})
                if tx in row_buf:
                    # silent last-wins would diverge from the join
                    # path (which fans out duplicates) — refuse loudly
                    raise ValueError(
                        "stream halo: dense-grid contract violated — "
                        f"group {group} has duplicate tile ({ty},{tx})"
                    )
                row_buf[tx] = (plain, core)
                # rows <= ty-2 have their south neighbour row complete
                while next_emit <= ty - 2:
                    emit_ty_row(next_emit)
                    buf.pop(next_emit - 1, None)
                    next_emit += 1
            if n_out >= 256:
                yield pop_batch()
        finish_group()
        if n_out:
            yield pop_batch()

    if halo == "stream":
        combined = src.mapInArrow(run_stream, out_schema)
    else:
        combined = joined.mapInArrow(run, out_schema)
    if checksum:
        return combined  # (key cols, sum_<op> doubles) — see docstring
    if len(specs) > 1 and persist_combined:
        # share one halo+kernel pass across the per-op selections; for
        # count-only or write-through consumers pass persist_combined=
        # False and consume `_combined` directly (caching multi-GB tile
        # outputs thrashes memory at scale)
        combined = combined.persist()
    result = {}
    for s in specs:
        sel = combined.select(
            *plain_cols,
            F.col(f"dtype_{s.name}").alias("dtype"),
            F.col(f"planes_{s.name}").alias("planes"),
            F.col(f"tile_{s.name}").alias("tile"),
            *[F.col(f"{c}_{s.name}").alias(c) for c in AUX_COLS],
        ).select(*[f.name for f in TILE_SCHEMA.fields])
        result[s.name] = TileRaster(sel)
        result[s.name]._combined = combined  # for lifecycle management
    return result


def focal(tr: TileRaster, op: str | FocalSpec, **kw) -> TileRaster:
    """Single focal op (fsum/fmean/fgradient/... — see FOCAL_OPS)."""
    spec = FOCAL_OPS[op] if isinstance(op, str) else op
    return focal_multi(tr, [spec], **kw)[spec.name]


# convenience wrappers mirroring the reference API surface ------------------


def fsum(tr):  # MapAlgebra.hs:775-777
    return focal(tr, "fsum")


def fproduct(tr):  # MapAlgebra.hs:780-782
    return focal(tr, "fproduct")


def fmean(tr):  # MapAlgebra.hs:794-796
    return focal(tr, "fmean")


def fmax(tr):  # MapAlgebra.hs:799-801
    return focal(tr, "fmax")


def fmin(tr):  # MapAlgebra.hs:804-806
    return focal(tr, "fmin")


def fvariety(tr):  # MapAlgebra.hs:809-812
    return focal(tr, "fvariety")


def fmajority(tr):  # MapAlgebra.hs:815-818
    return focal(tr, "fmajority")


def fminority(tr):  # MapAlgebra.hs:821-824
    return focal(tr, "fminority")


def fmedian(tr):  # GaCM focal statistics — omitted by the reference;
    # exact 5th order statistic of the 9-value window (kernels.k_fmedian)
    return focal(tr, "fmedian")


def ftpi(tr):  # gdaldem tpi: focus - mean(8 neighbours)
    return focal(tr, "ftpi")


def ftri(tr):  # gdaldem tri (Riley): sqrt(sum (nbr - focus)^2)
    return focal(tr, "ftri")


def froughness(tr):  # gdaldem roughness: max - min of the 3x3 window
    return focal(tr, "froughness")


def fvariance(tr):  # focal population variance, exact integer identity
    return focal(tr, "fvariance")


def fstddev(tr):  # focal population std dev: sqrt of the exact variance
    return focal(tr, "fstddev")


def fslope(tr):  # gdaldem slope -p: Horn gradient, percent
    return focal(tr, "fslope")


def fhillshade(tr):  # gdaldem hillshade: Horn, az 315 / alt 45
    return focal(tr, "fhillshade")


def fpercentage(tr):  # MapAlgebra.hs:828-838
    return focal(tr, "fpercentage")


def fpercentile(tr):  # MapAlgebra.hs:842-852
    return focal(tr, "fpercentile")


def frank(tr):  # GaCM Focal Ranking — omitted by the reference
    # (README.md:129-130); our semantics in kernels.k_frank
    return focal(tr, "frank")


def finsularity(tr):  # GaCM Focal Insularity — omitted by the reference
    # (README.md:129-130); our semantics in kernels.k_finsularity
    return focal(tr, "finsularity")


def flinkage(tr):  # MapAlgebra.hs:860-880
    return focal(tr, "flinkage")


def flength(tr):  # MapAlgebra.hs:888-900 — local map over Line blocks
    return tr.map(K.k_flength)


def fpartition(tr):  # MapAlgebra.hs:989-1000
    return focal(tr, "fpartition")


def fshape(tr):  # MapAlgebra.hs:1007-1013
    return focal(tr, "fshape")


def ffrontage(tr):  # MapAlgebra.hs:1019-1021 — local map over Corners
    return tr.map(K.k_ffrontage)


def farea(tr):  # MapAlgebra.hs:1036-1038 — local map over Corners
    return tr.map(K.k_farea)


def fvolume(tr):  # MapAlgebra.hs:1042-1065
    return focal(tr, "fvolume")


def fgradient(tr):  # MapAlgebra.hs:1111-1113
    return focal(tr, "fgradient")


def faspect(tr):  # MapAlgebra.hs:1145-1151 (NaN plane = Nothing)
    return focal(tr, "faspect")


def faspect_unsafe(tr):  # MapAlgebra.hs:1155-1159
    return focal(tr, "faspect_unsafe")


def fdownstream(tr):  # MapAlgebra.hs:1232-1248
    return focal(tr, "fdownstream")


def fupstream(tr):  # MapAlgebra.hs:1253-1263; caller must strict() the
    # fdownstream result first (barrier, test/Test.hs:347)
    return focal(tr, "fupstream")


def _valid_mask(a: np.ndarray, nodata) -> np.ndarray:
    if isinstance(nodata, float) and np.isnan(nodata):
        return ~np.isnan(a)
    return a != nodata


def fsum_nodata(tr: TileRaster, nodata=0.0) -> TileRaster:
    """NoData-aware focal sum — the engine form of the reference's
    README.md:141-152 ``nodatafsum`` idiom (``fmap check`` 0→Nothing,
    ``fmonoid`` over Maybe(Sum) with Fill-mempty border, then
    ``maybe 0 getSum``): 3x3 sum over cells ≠ ``nodata`` (NaN
    supported), 0 where the whole window is nodata.  Border Fill
    nodata, so cells past the raster edge contribute nothing."""

    def kernel(p):
        acc = np.zeros((p.shape[0] - 2, p.shape[1] - 2), dtype=np.float64)
        for s in K.shifts(p):
            acc += np.where(_valid_mask(s, nodata), s, 0.0)
        return acc

    return focal(tr, FocalSpec("fsum_nodata", kernel, K.BORDER_FILL, nodata, cast="float64"))


def fmean_nodata(tr: TileRaster, nodata=0.0) -> TileRaster:
    """NoData-aware focal mean: mean over the valid (≠ nodata) cells of
    the 3x3 window; NaN (the engine's Nothing) where no cell is valid.
    Extension of the README.md:141-152 NoData pattern."""

    def kernel(p):
        shape = (p.shape[0] - 2, p.shape[1] - 2)
        tot = np.zeros(shape, dtype=np.float64)
        cnt = np.zeros(shape, dtype=np.float64)
        for s in K.shifts(p):
            v = _valid_mask(s, nodata)
            tot += np.where(v, s, 0.0)
            cnt += v
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(cnt > 0, tot / np.maximum(cnt, 1.0), np.nan)

    return focal(tr, FocalSpec("fmean_nodata", kernel, K.BORDER_FILL, nodata, cast="float64"))


def fmonoid(tr, combine: Callable, fill_value) -> TileRaster:
    """fmonoid (MapAlgebra.hs:789-791): user-pluggable 3x3 fold with the
    focus left-most and Fill mempty border — the engine's focal
    extension point (numpy binop over the 9 shifted planes)."""

    def kernel(p):
        ss = K.shifts(p)
        # focus first, then the others in neighbourhood order
        order = [4, 0, 1, 2, 3, 5, 6, 7, 8]
        acc = ss[order[0]]
        for i in order[1:]:
            acc = combine(acc, ss[i])
        return acc

    return focal(tr, FocalSpec("fmonoid", kernel, K.BORDER_FILL, fill_value))


def fconvolve(
    tr: TileRaster,
    weights,
    mode: str = K.BORDER_FILL,
    fill: float = 0.0,
    cast: str | None = "float64",
) -> TileRaster:
    """Weighted 3x3 convolution (correlation form: out[y,x] =
    sum_{dy,dx} weights[dy+1, dx+1] * in[y+dy, x+dx]) — the general
    LINEAR focal filter behind Gaussian smoothing, sharpening, Sobel
    edge maps and emboss.  The reference's focal family is
    fixed-function (MapAlgebra.hs:775-852); this is the linear
    companion to the :func:`fmonoid` fold extension point, running on
    the same halo engines with any border mode.

    IEEE determinism contract: terms accumulate in row-major window
    order (nw, no, ne, we, fo, ea, sw, so, se), zero weights skipped —
    a relational twin summing the same terms in the same order
    reproduces the doubles bit-for-bit (see ORACLE["fconvolve_grid"]).
    """
    w = np.asarray(weights, dtype=np.float64)
    if w.shape != (3, 3):
        raise ValueError(f"fconvolve weights must be 3x3, got {w.shape}")
    wflat = [float(x) for x in w.ravel()]

    def kernel(p):
        ss = K.shifts(p)
        acc = None
        for i in range(9):
            if wflat[i] == 0.0:
                continue
            term = wflat[i] * ss[i]
            acc = term if acc is None else acc + term
        if acc is None:
            acc = np.zeros_like(ss[4], dtype=np.float64)
        return acc

    return focal(tr, FocalSpec("fconvolve", kernel, mode, fill, cast=cast))
