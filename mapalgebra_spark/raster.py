"""TileRaster — the engine's analog of the reference's ``Raster D``.

The reference fuses element-wise ("local") operations by composing
closures over a delayed array and evaluating the whole tree in one
parallel sweep on ``strict`` (MapAlgebra.hs:47-65, 489-505).  Here the
same idea is Spark-native: a :class:`TileRaster` wraps

- ``df``    — a tile-table DataFrame (tiles.TILE_SCHEMA, plus extra
              binary columns after zip-joins),
- ``cols``  — the binary columns feeding the pending kernel chain,
- ``fn``    — the composed numpy kernel (or None = identity),

and every local op just composes ``fn`` without touching Spark.  Only
``strict()`` runs a single ``mapInPandas`` stage that decodes each
Arrow batch, applies the whole fused chain block-at-a-time, and
re-encodes — zero shuffles for any chain of unary local ops, one
equi-join per genuinely-two-raster zip (Catalyst picks the join
strategy; co-partitioned tile tables co-locate).

Size mismatches between zipped rasters are a *compile error* in the
reference (type-level nats, MapAlgebra.hs:363-383); here they fail fast
inside the first Arrow batch that disagrees.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import kernels as K
from .tiles import TILE_SCHEMA, decode_block, encode_block

ZIP_KEYS = ["raster_id", "ty", "tx"]  # band-agnostic alignment keys
_TILE_COL_NAMES = [f.name for f in TILE_SCHEMA.fields]


class TileRaster:
    """A (possibly delayed) distributed raster collection.

    ``cols[0]`` is always the left-most lineage's ``tile`` column whose
    dtype/planes come from the row's own ``dtype``/``planes`` fields;
    columns appended by zip-joins read theirs from ``_m{i}_*`` columns
    carried through the join.
    """

    def __init__(
        self,
        df: DataFrame,
        cols: list[str] | None = None,
        fn: Callable | None = None,
    ):
        self.df = df
        self.cols = cols or ["tile"]
        self.fn = fn

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_arrays(spark, arrays: dict[str, np.ndarray], tile_size: int = 256) -> "TileRaster":
        """Driver-side helper (tests/small fixtures): name → 2-D array."""
        from .tiles import tile_rows_from_array

        rows = []
        for rid, arr in arrays.items():
            rows.extend(tile_rows_from_array(rid, arr, tile_size=tile_size))
        return TileRaster(spark.createDataFrame(rows, TILE_SCHEMA))

    @staticmethod
    def from_function(
        spark,
        raster_id: str,
        height: int,
        width: int,
        fn: Callable,
        dtype: str = "float64",
        tile_size: int = 256,
    ) -> "TileRaster":
        """Distributed ``fromFunction`` (MapAlgebra.hs:514-518): build a
        raster from f(row_idx_plane, col_idx_plane) → plane, evaluated
        per tile over ``spark.range`` of tile keys — no driver-side
        pixel materialization, so 10^6 x 10^6 rasters plan fine."""
        import pandas as pd

        from .tiles import aux_blobs, encode_block

        nty = (height + tile_size - 1) // tile_size
        ntx = (width + tile_size - 1) // tile_size

        def gen(batches):
            for pdf in batches:
                rows = []
                for k in pdf["id"]:
                    ty, tx = int(k) // ntx, int(k) % ntx
                    h = min(tile_size, height - ty * tile_size)
                    w = min(tile_size, width - tx * tile_size)
                    yy, xx = np.mgrid[0:h, 0:w]
                    block = np.asarray(
                        fn(yy + ty * tile_size, xx + tx * tile_size)
                    ).astype(np.dtype(dtype))
                    rows.append(
                        dict(
                            raster_id=raster_id, band=0, ty=ty, tx=tx, h=h, w=w,
                            nty=nty, ntx=ntx, rh=height, rw=width, dtype=dtype,
                            planes=1, cell_id=0, tile=encode_block(block),
                            **aux_blobs(block),
                        )
                    )
                yield pd.DataFrame(rows)

        n = nty * ntx
        return TileRaster(
            spark.range(0, n, numPartitions=max(1, min(n, 256))).mapInPandas(
                gen, TILE_SCHEMA
            )
        )

    @staticmethod
    def constant(
        spark, raster_id: str, height: int, width: int, value, dtype: str = "float64",
        tile_size: int = 256,
    ) -> "TileRaster":
        """Distributed ``constant`` (MapAlgebra.hs:508-510)."""
        return TileRaster.from_function(
            spark, raster_id, height, width,
            lambda yy, xx: np.full(yy.shape, value), dtype, tile_size,
        )

    # -- local (element-wise) algebra ---------------------------------------

    def map(self, g: Callable) -> "TileRaster":
        """Unary local op — composes with the pending chain (Raster D
        Functor, MapAlgebra.hs:416-426). No Spark work happens here."""
        f = self.fn
        fn = g if f is None else (lambda *xs: g(f(*xs)))
        return TileRaster(self.df, self.cols, fn)

    def zip_with(self, other: "TileRaster", g: Callable) -> "TileRaster":
        """Binary local op (zipWith, MapAlgebra.hs:769-772).

        Same underlying df+cols on both sides (e.g. ``r + r``) → fuse
        with no join.  Otherwise one equi-join on (raster_id, ty, tx) —
        the only shuffle local algebra ever needs.
        """
        fa, fb = self.fn, other.fn
        if other.df is self.df and other.cols == self.cols:
            fn = lambda *xs: g(  # noqa: E731
                xs[0] if fa is None else fa(*xs),
                xs[0] if fb is None else fb(*xs),
            )
            return TileRaster(self.df, self.cols, fn)
        if len(other.cols) != 1:
            # materialize a multi-join right side first (rare)
            other = other.strict()
            fb = None
        i = len(self.cols)
        right = other.df.select(
            *[F.col(k) for k in ZIP_KEYS],
            F.col(other.cols[0]).alias(f"_m{i}_tile"),
            F.col("dtype").alias(f"_m{i}_dtype"),
            F.col("planes").alias(f"_m{i}_planes"),
            F.col("rh").alias(f"_m{i}_rh"),
            F.col("rw").alias(f"_m{i}_rw"),
        )
        joined = self.df.join(right, on=ZIP_KEYS, how="inner")
        na = i
        fn = lambda *xs: g(  # noqa: E731
            xs[0] if fa is None else fa(*xs[:na]),
            xs[na] if fb is None else fb(*xs[na:]),
        )
        return TileRaster(joined, self.cols + [f"_m{i}_tile"], fn)

    # operator sugar (Num/Fractional instances, MapAlgebra.hs:447-471)
    def _binop(self, other, g, flipped=False):
        if isinstance(other, TileRaster):
            return self.zip_with(other, (lambda a, b: g(b, a)) if flipped else g)
        return self.map((lambda a: g(other, a)) if flipped else (lambda a: g(a, other)))

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binop(other, lambda a, b: a - b, flipped=True)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: np.divide(a, b, dtype=np.float64))

    def __rtruediv__(self, other):
        return self._binop(other, lambda a, b: np.divide(a, b, dtype=np.float64), flipped=True)

    def __abs__(self):
        return self.map(np.abs)

    def signum(self):
        return self.map(np.sign)

    def astype(self, dtype: str) -> "TileRaster":
        return self.map(lambda a: a.astype(np.dtype(dtype)))

    def classify(self, breaks_map: dict, default) -> "TileRaster":
        """LocalClassification (MapAlgebra.hs:679-682): greatest break
        key <= v via searchsorted into the closured ramp (broadcast to
        executors with the serialized kernel chain)."""
        keys = sorted(breaks_map)
        vals = [breaks_map[k] for k in keys]
        return self.map(lambda a: K.classify_block(a, keys, vals, default))

    # -- materialization -----------------------------------------------------

    def strict(self, raster_suffix: str | None = None, persist: bool = False) -> "TileRaster":
        """Evaluate the fused chain in ONE mapInPandas stage (the
        reference's ``strict``, MapAlgebra.hs:503-505)."""
        if self.fn is None and self.cols == ["tile"]:
            out = self.df
        else:
            out = self._run_map(raster_suffix)
        if persist:
            out = out.persist()
        return TileRaster(out)

    def _run_map(self, raster_suffix: str | None) -> DataFrame:
        cols = list(self.cols)
        fn = self.fn
        suffix = raster_suffix

        def run(batches):
            from .tiles import AUX_COLS, aux_blobs

            computed = {"tile", "dtype", "planes", *AUX_COLS}
            for pdf in batches:
                n = len(pdf)
                out_tiles, out_dt, out_pl = [], [], []
                out_aux = {c: [] for c in AUX_COLS}
                for r in range(n):
                    row = pdf.iloc[r]
                    h, w = int(row["h"]), int(row["w"])
                    arrays = []
                    for c in cols:
                        if c == "tile":
                            dt, pl = row["dtype"], int(row["planes"])
                        else:
                            pre = c[: -len("tile")]  # "_m{i}_"
                            if int(row[pre + "rh"]) != int(row["rh"]) or int(
                                row[pre + "rw"]
                            ) != int(row["rw"]):
                                raise ValueError(
                                    "raster size mismatch in zip: "
                                    f"{int(row['rh'])}x{int(row['rw'])} vs "
                                    f"{int(row[pre + 'rh'])}x{int(row[pre + 'rw'])} "
                                    f"(raster {row['raster_id']})"
                                )
                            dt, pl = row[pre + "dtype"], int(row[pre + "planes"])
                        arrays.append(decode_block(row[c], dt, h, w, pl))
                    res = np.asarray(arrays[0] if fn is None else fn(*arrays))
                    out_tiles.append(encode_block(res))
                    out_dt.append(str(res.dtype))
                    out_pl.append(res.shape[0] if res.ndim == 3 else 1)
                    for k, v in aux_blobs(res).items():
                        out_aux[k].append(v)
                out = pdf[[c for c in _TILE_COL_NAMES if c not in computed]].copy()
                out["tile"] = out_tiles
                out["dtype"] = out_dt
                out["planes"] = out_pl
                for k in AUX_COLS:
                    out[k] = out_aux[k]
                if suffix:
                    out["raster_id"] = out["raster_id"].astype(str) + suffix
                yield out[_TILE_COL_NAMES]

        return self.df.mapInPandas(run, TILE_SCHEMA)

    # -- driver-side collection (tests / small results only) -----------------

    def collect_array(self, raster_id: str, band: int = 0) -> np.ndarray:
        """Assemble one raster to a numpy array on the driver. Test/debug
        helper — NOT for the hot path."""
        from .tiles import assemble_from_tiles

        rows = [
            r.asDict()
            for r in self.strict()
            .df.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
            .collect()
        ]
        if not rows:
            raise KeyError(f"no tiles for {raster_id!r} band {band}")
        return assemble_from_tiles(rows, band=band)


# ---------------------------------------------------------------------------
# N-ary local ops over collections of rasters (NonEmpty (Raster D ...))
# ---------------------------------------------------------------------------


def _stack_zip(rasters: list[TileRaster], g: Callable) -> TileRaster:
    """Feed all rasters' blocks to one stack kernel: fold zip_with into a
    list accumulator, then apply g once. N-1 joins collapse into one
    multi-way join stage under Catalyst when inputs share partitioning."""
    first = rasters[0]
    f0 = first.fn
    out = TileRaster(
        first.df,
        first.cols,
        (lambda *xs: [f0(*xs)]) if f0 is not None else (lambda *xs: [xs[0]]),
    )
    for r in rasters[1:]:
        out = out.zip_with(r, lambda acc, b: acc + [b])
    return out.map(g)


def lmax(a: TileRaster, b: TileRaster) -> TileRaster:
    """Per-index max of two rasters (MapAlgebra.hs:690-692)."""
    return a.zip_with(b, np.maximum)


def lmin(a: TileRaster, b: TileRaster) -> TileRaster:
    """Per-index min (MapAlgebra.hs:685-687)."""
    return a.zip_with(b, np.minimum)


def lsum(rasters: list[TileRaster]) -> TileRaster:
    """Element-wise sum over N rasters (Num fold over the NonEmpty)."""
    return _stack_zip(rasters, lambda planes: np.sum(np.stack(planes), axis=0))


def lmean(rasters: list[TileRaster]) -> TileRaster:
    """lmean (MapAlgebra.hs:695-700)."""
    return _stack_zip(rasters, K.stack_mean)


def lvariety(rasters: list[TileRaster]) -> TileRaster:
    """lvariety (MapAlgebra.hs:703-705)."""
    return _stack_zip(rasters, K.stack_variety)


def lmajority(rasters: list[TileRaster]) -> TileRaster:
    """lmajority, tie → smallest (MapAlgebra.hs:708-721)."""
    return _stack_zip(rasters, K.stack_majority)


def lminority(rasters: list[TileRaster]) -> TileRaster:
    """lminority, tie → smallest (MapAlgebra.hs:724-737)."""
    return _stack_zip(rasters, K.stack_minority)


def lvariance(rasters: list[TileRaster]) -> TileRaster | None:
    """lvariance, sample (n-1) denominator; None for a single raster
    (MapAlgebra.hs:741-758)."""
    if len(rasters) < 2:
        return None
    return _stack_zip(rasters, K.stack_variance)
