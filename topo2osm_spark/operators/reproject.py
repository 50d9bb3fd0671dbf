"""UTM -> WGS84 reprojection operator (SURVEY.md §2 op 11).

Vectorized pandas UDF over coordinate ARRAYS: the whole Arrow batch's
coordinates are flattened into one numpy array, reprojected with a
single Krueger-series call, and re-split by offsets — per-batch cost
is two ufunc passes regardless of row count. Zone comes from each
row's SOSI KOORDSYS (mixed UTM 32/33/35 batches supported).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from topo2osm_spark.functions import proj

_OUT = T.StructType([
    T.StructField("lats", T.ArrayType(T.DoubleType())),
    T.StructField("lons", T.ArrayType(T.DoubleType())),
])


@F.pandas_udf(_OUT)
def _reproject_coords(coords: pd.Series, koordsys: pd.Series) -> pd.DataFrame:
    lens = coords.map(lambda c: 0 if c is None else len(c)).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return pd.DataFrame({"lats": [[] for _ in lens], "lons": [[] for _ in lens]})
    flat_n = np.empty(total)
    flat_e = np.empty(total)
    zones = np.empty(total)
    zmap = proj.SOSI_KOORDSYS_TO_ZONE
    pos = 0
    for c, ks in zip(coords, koordsys):
        if c is None or len(c) == 0:
            continue
        m = len(c)
        arr = np.asarray([p[:2] for p in c], dtype=np.float64)
        flat_n[pos:pos + m] = arr[:, 0]
        flat_e[pos:pos + m] = arr[:, 1]
        zones[pos:pos + m] = zmap.get(int(ks), 33)
        pos += m
    lat, lon = proj.utm_inverse(flat_e, flat_n, zones)
    lats_out, lons_out = [], []
    pos = 0
    for m in lens:
        lats_out.append(lat[pos:pos + m].tolist())
        lons_out.append(lon[pos:pos + m].tolist())
        pos += m
    return pd.DataFrame({"lats": lats_out, "lons": lons_out})


def reproject(parsed: DataFrame) -> DataFrame:
    """PARSED_OBJECTS -> GEO_OBJECTS: adds parallel lats/lons arrays
    plus `height` — the first coordinate's NØH height in meters (null
    for 2-column NØ rows). Contours carry one constant height per
    curve (SURVEY.md §2.12 Høydekurve -> ele=*), so a scalar suffices;
    extraction is pure Catalyst (F.get), no Python."""
    return (parsed
            .withColumn("_ll", _reproject_coords("coords", "koordsys"))
            .withColumn("lats", F.col("_ll.lats"))
            .withColumn("lons", F.col("_ll.lons"))
            .withColumn("height", F.get(F.get("coords", 0), 2))
            .drop("_ll"))
