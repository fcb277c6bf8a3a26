"""Geo aggregation: point-in-polygon region assignment and
count-by-region — the engine side of the reference's choropleth map
views (geo/PolygonSet.java:39 loads shapefile polygons; the UI then
counts rows per region). Shapefile parsing is I/O tooling, not engine
work, so regions here are plain (name, vertex-list) pairs; plug a
fiona/geopandas loader in where available.

Scale shape: the polygon set is tiny (hundreds of shapes) and
broadcasts inside the Arrow-batched closure; point assignment is a
vectorized ray-casting test per batch (numpy, no per-row Python), so
the whole operator is one scan + one groupBy. The bounding-box
pre-filter is pure Catalyst and reaches the parquet scan as
PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# region: (name, [(x0, y0), (x1, y1), ...]) — closed automatically.
Region = tuple[str, list[tuple[float, float]]]


def bbox_filter(
    lon_col: str, lat_col: str,
    min_lon: float, min_lat: float, max_lon: float, max_lat: float,
) -> Column:
    """Bounding-box predicate (PolygonSet.boundingBox / shrink):
    plain range conjunction — pushdown-eligible."""
    return (
        (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon)
        & (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
    )


def assign_region(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    regions: list[Region],
    out_col: str = "region",
) -> DataFrame:
    """Append the name of the first region containing each point
    (even-odd ray casting; points outside every region get NULL).
    Vectorized: each Arrow batch tests all points against all edges
    of a region in one broadcasting expression."""
    import numpy as np

    polys = [
        (name, np.asarray(vertices, dtype=np.float64))
        for name, vertices in regions
    ]
    # fail fast AT CALL TIME with the region's name: an empty vertex
    # list otherwise surfaces as an opaque numpy IndexError inside the
    # Arrow worker (shape (0,) has no second axis), and a 1-2 vertex
    # "polygon" silently matches nothing
    for name, V in polys:
        if V.ndim != 2 or V.shape[1] != 2 or V.shape[0] < 3:
            raise ValueError(
                f"region {name!r}: need >= 3 (x, y) vertex pairs, got "
                f"array of shape {V.shape}"
            )

    def contains(V: "np.ndarray", px: "np.ndarray", py: "np.ndarray"):
        x1, y1 = V[:, 0], V[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        # (n_points, n_edges) crossing test
        cond = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) / (
                y2 - y1
            )[None, :] + x1[None, :]
        crossing = cond & (px[:, None] < xs)
        return crossing.sum(axis=1) % 2 == 1

    from pyspark.sql.types import StringType, StructField, StructType

    # withColumn-style REPLACEMENT when out_col already exists (e.g.
    # re-assignment or input data carrying a 'region' column) — naive
    # append would emit a duplicate field and break every downstream
    # F.col(out_col)
    base_fields = [f for f in df.schema.fields if f.name != out_col]
    out_fields = [f.name for f in base_fields] + [out_col]
    if len(base_fields) != len(df.schema.fields):
        df = df.drop(out_col)
    # build the output schema as a StructType (string-munging
    # simpleString breaks on column names that need quoting and
    # drops nullability)
    schema = StructType(base_fields + [StructField(out_col, StringType())])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            px = pdf[lon_col].to_numpy(dtype=np.float64)
            py = pdf[lat_col].to_numpy(dtype=np.float64)
            assigned = np.full(len(pdf), None, dtype=object)
            # a point with a NULL/NaN/±Inf coordinate is in NO region
            # (engine-wide non-finite rule). numpy's IEEE comparisons
            # would exclude NaN anyway, but ±Inf can make an edge
            # cross evaluate 0*inf = NaN — and a SQL engine whose
            # comparisons rank NaN ABOVE zero (DuckDB) would then
            # call the point INSIDE. Masking here makes the contract
            # explicit on both sides (the oracle guards isfinite()).
            todo = np.isfinite(px) & np.isfinite(py)
            for name, V in polys:
                if not todo.any():
                    break
                hit = np.zeros(len(pdf), dtype=bool)
                hit[todo] = contains(V, px[todo], py[todo])
                assigned[hit] = name
                todo &= ~hit
            out = pdf.copy()
            out[out_col] = assigned
            yield out[out_fields]

    return df.mapInPandas(run, schema)


def count_by_region(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    regions: list[Region],
) -> DataFrame:
    """Choropleth counts: rows per containing region (NULL = outside
    all regions, dropped — matching the map view, which only shades
    known shapes). One scan + one small groupBy. The projection down
    to the two coordinate columns happens BEFORE the Arrow map:
    mapInPandas is a pruning barrier (the worker's input schema is
    whatever reaches it), so without the select every table column
    would be scanned and shipped through Python just to be counted."""
    return (
        assign_region(df.select(lon_col, lat_col), lon_col, lat_col, regions)
        .where(F.col("region").isNotNull())
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
