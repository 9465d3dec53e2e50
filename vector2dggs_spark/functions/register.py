"""SQL function registration — expose the cell ops to ``spark.sql``
users (SURVEY.md §4: "register cell ops via spark.udf.register for SQL
access").

Naming: ``v2d_<op>_<dggs>``; geohash point-encode also exists as the
pure-SQL expression generator (functions/sqlgen.py) which needs no
registration at all.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import available, get_backend


def register_sql_functions(spark: SparkSession, dggs_names: list[str] | None = None) -> list[str]:
    """Register per-backend SQL functions; returns the registered names.

    * ``v2d_cell_<dggs>(lat, lon, res)``      -> cell token
    * ``v2d_parent_<dggs>(cell, parent_res)`` -> parent token
    * ``v2d_center_lat_<dggs>(cell)`` / ``v2d_center_lon_<dggs>(cell)``
    """
    names: list[str] = []
    for name in dggs_names or available():
        backend = get_backend(name)
        _cell, _parent, _clat, _clon = _make_udfs(backend)
        for fn_name, fn in (
            (f"v2d_cell_{name}", _cell),
            (f"v2d_parent_{name}", _parent),
            (f"v2d_center_lat_{name}", _clat),
            (f"v2d_center_lon_{name}", _clon),
        ):
            spark.udf.register(fn_name, fn)
            names.append(fn_name)
    return names


def _make_udfs(backend):
    @F.pandas_udf("string")
    def _cell(lat: pd.Series, lon: pd.Series, res: pd.Series) -> pd.Series:
        r = int(res.iloc[0])
        return pd.Series(backend.point_to_cell(lat.to_numpy(), lon.to_numpy(), r))

    @F.pandas_udf("string")
    def _parent(cell: pd.Series, pres: pd.Series) -> pd.Series:
        p = int(pres.iloc[0])
        return pd.Series(backend.parent(cell.to_numpy(dtype=str), p))

    @F.pandas_udf("double")
    def _clat(cell: pd.Series) -> pd.Series:
        lat, _ = backend.cell_center(cell.to_numpy(dtype=str), None)
        return pd.Series(lat)

    @F.pandas_udf("double")
    def _clon(cell: pd.Series) -> pd.Series:
        _, lon = backend.cell_center(cell.to_numpy(dtype=str), None)
        return pd.Series(lon)

    return _cell, _parent, _clat, _clon
