"""Geocoding column functions (C8, C9, J6/F12 helpers).

C8 DMS lat/long parse — reference src/Geocoder.groovy:19-26, 96-112:
two full-match shapes (``DD sep DD sep DD[.d]`` twice, or packed
``DDDDDD sep DDDDDD``), ``,`` accepted as decimal point, longitude
*negated* (western-hemisphere corpus assumption,
src/Geocoder.groovy:106). Unparseable -> null (caller falls through to
gazetteer / external lookup, src/Geocoder.groovy:154-187).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NUM2 = r"(\d\d)"
NUM2D = r"(\d\d(?:[.,]\d*)?)"
SEP = r"\D{1,9}"
NOISE = r"\D*"

LAT_LONG_1 = f"^{NOISE}{NUM2}{SEP}{NUM2}{SEP}{NUM2D}{SEP}{NUM2}{SEP}{NUM2}{SEP}{NUM2D}{NOISE}$"
LAT_LONG_2 = f"^{NOISE}{NUM2}{NUM2}{NUM2}{SEP}{NUM2}{NUM2}{NUM2}{NOISE}$"

BAD_COORDINATE = -999.0
GAZETTEER_CSV = os.path.join(os.path.dirname(__file__), "..", "data", "countries.csv")


def _dotted(c: Column) -> Column:
    # src/Geocoder.groovy:55-57 — ',' decimal comma -> '.'
    return F.replace(c, F.lit(","), F.lit("."))


def _dms(d: Column, m: Column, s: Column) -> Column:
    return d.cast("double") + m.cast("double") / 60.0 + _dotted(s).cast("double") / 3600.0


def parse_lat(c: Column) -> Column:
    """C8 — latitude from a DMS string, null if not a coordinate string."""
    g = lambda pat, i: F.regexp_extract(c, pat, i)  # noqa: E731
    lat1 = _dms(g(LAT_LONG_1, 1), g(LAT_LONG_1, 2), g(LAT_LONG_1, 3))
    lat2 = _dms(g(LAT_LONG_2, 1), g(LAT_LONG_2, 2), g(LAT_LONG_2, 3))
    return (
        F.when(g(LAT_LONG_1, 1) != "", lat1)
        .when(g(LAT_LONG_2, 1) != "", lat2)
    )


def parse_lon(c: Column) -> Column:
    """C8 — longitude (negated, src/Geocoder.groovy:106)."""
    g = lambda pat, i: F.regexp_extract(c, pat, i)  # noqa: E731
    lon1 = -_dms(g(LAT_LONG_1, 4), g(LAT_LONG_1, 5), g(LAT_LONG_1, 6))
    lon2 = -_dms(g(LAT_LONG_2, 4), g(LAT_LONG_2, 5), g(LAT_LONG_2, 6))
    return (
        F.when(g(LAT_LONG_1, 1) != "", lon1)
        .when(g(LAT_LONG_2, 1) != "", lon2)
    )


def gazetteer(spark: SparkSession) -> DataFrame:
    """280-row Spanish country -> centroid seed table (data transcribed
    from src/Countries.groovy:19-301; it is a fact table, not code).

    Small enough that Catalyst always broadcasts it (J6).
    """
    path = os.path.abspath(GAZETTEER_CSV)
    return (
        spark.read.option("header", "true")
        .schema("country string, lat double, lon double")
        .csv(path)
    )


def gazetteer_rows() -> list[tuple[str, float, float]]:
    """The same seed table as plain Python rows (for oracle SQL VALUES)."""
    import csv

    with open(os.path.abspath(GAZETTEER_CSV)) as f:
        return [(r["country"], float(r["lat"]), float(r["lon"])) for r in csv.DictReader(f)]


# ---------------------------------------------------------------------------
# DuckDB oracle side
# ---------------------------------------------------------------------------

def _sql_dms(d: str, m: str, s: str) -> str:
    return (
        f"(CAST({d} AS DOUBLE) + CAST({m} AS DOUBLE)/60.0"
        f" + CAST(replace({s}, ',', '.') AS DOUBLE)/3600.0)"
    )


def sql_parse_lat(expr: str) -> str:
    p1, p2 = LAT_LONG_1.replace("'", "''"), LAT_LONG_2.replace("'", "''")
    g = lambda pat, i: f"regexp_extract({expr}, '{pat}', {i})"  # noqa: E731
    lat1 = _sql_dms(g(p1, 1), g(p1, 2), g(p1, 3))
    lat2 = _sql_dms(g(p2, 1), g(p2, 2), g(p2, 3))
    return (
        f"(CASE WHEN {g(p1, 1)} <> '' THEN {lat1}"
        f" WHEN {g(p2, 1)} <> '' THEN {lat2} END)"
    )


def sql_parse_lon(expr: str) -> str:
    p1, p2 = LAT_LONG_1.replace("'", "''"), LAT_LONG_2.replace("'", "''")
    g = lambda pat, i: f"regexp_extract({expr}, '{pat}', {i})"  # noqa: E731
    lon1 = _sql_dms(g(p1, 4), g(p1, 5), g(p1, 6))
    lon2 = _sql_dms(g(p2, 4), g(p2, 5), g(p2, 6))
    return (
        f"(CASE WHEN {g(p1, 1)} <> '' THEN -{lon1}"
        f" WHEN {g(p2, 1)} <> '' THEN -{lon2} END)"
    )


def sql_gazetteer_values(alias: str = "gazetteer") -> str:
    """Inline VALUES clause for the gazetteer (oracle has no extra views)."""
    rows = ", ".join(
        "('{}', CAST({!r} AS DOUBLE), CAST({!r} AS DOUBLE))".format(
            name.replace("'", "''"), lat, lon
        )
        for name, lat, lon in gazetteer_rows()
    )
    return f"(VALUES {rows}) AS {alias}(country, lat, lon)"
