"""Geocoding pipeline operator (SURVEY.md §2.11 resolver chain).

Reference: src/Geocoder.groovy:154-187 tries, per location entity, in
order: (1) parse the name as a DMS coordinate string, (2) exact
country-gazetteer lookup, (3) '... <COUNTRY>' suffix lookup, (4) OSM
Nominatim HTTP (off by default here — external service). First hit
wins; ``-999.0`` sentinel results are discarded
(src/Geocoder.groovy:27, 130-133).

Spark design: resolvers (1)-(3) are pure Column logic over ONE scan —
two broadcast joins against the 280-row gazetteer and a coalesce;
no UDF, no shuffle of the big side. The OSM stage, when enabled, runs
over ``dropDuplicates(name)`` only (the reference pushes limit=1 into
the URL; we push distinct-first so the external call count is the
number of *unique* unresolved names, not mentions — at 100 TB that is
the only viable shape).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import geo
from ..functions.normalize import cleanup_leading_dash


def resolve_locations(
    locations: DataFrame,
    gazetteer: DataFrame,
    name_col: str = "text",
    osm_fetch: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """locations(entity_id, <name_col>, ...) -> geolocations
    (entity_id, rank, latitude, longitude, name, country, source).

    ``osm_fetch``: optional external resolver taking a DataFrame of
    distinct unresolved (name) rows and returning (name, lat, lon,
    country) — plugged in behind the same seam the reference uses for
    OSMFetcher (src/OSMFetcher.groovy:9-37); disabled by default so
    the operator is deterministic and offline.
    """
    place = cleanup_leading_dash(F.col(name_col))
    locs = locations.select(
        "entity_id", F.col(name_col).alias("name"), place.alias("place")
    )

    exact = gazetteer.select(
        F.col("country").alias("x_country"),
        F.col("lat").alias("x_lat"),
        F.col("lon").alias("x_lon"),
    )
    locs = locs.join(F.broadcast(exact), locs["place"] == exact["x_country"], "left")

    sfx = gazetteer.select(
        F.col("country").alias("s_country"),
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
    )
    locs = locs.join(
        F.broadcast(sfx),
        locs["place"].endswith(F.concat(F.lit(" "), sfx["s_country"])),
        "left",
    )
    # Suffix-nested gazetteer names ('COREA' vs 'REPUBLICA DE COREA')
    # can both match one place; the reference resolver returns ONE
    # location per entity (src/Geocoder.groovy:154-187), so keep only
    # the most specific (longest) matching suffix. entity_id is the
    # entity-table key, so the window dedupes per input row.
    sfx_rank = Window.partitionBy("entity_id").orderBy(
        F.length("s_country").desc_nulls_last(), F.col("s_country").asc_nulls_last()
    )
    locs = (
        locs.withColumn("__sfx_rn", F.row_number().over(sfx_rank))
        .filter(F.col("__sfx_rn") == 1)
        .drop("__sfx_rn")
    )

    p_lat, p_lon = geo.parse_lat(F.col("place")), geo.parse_lon(F.col("place"))
    lat = F.coalesce(p_lat, F.col("x_lat"), F.col("s_lat"))
    lon = F.coalesce(p_lon, F.col("x_lon"), F.col("s_lon"))
    source = (
        F.when(p_lat.isNotNull(), "coordinates")
        .when(F.col("x_lat").isNotNull(), "gazetteer_exact")
        .when(F.col("s_lat").isNotNull(), "gazetteer_suffix")
    )
    resolved = locs.select(
        "entity_id",
        "name",
        "place",
        lat.alias("latitude"),
        lon.alias("longitude"),
        F.coalesce(F.col("x_country"), F.col("s_country")).alias("country"),
        source.alias("source"),
    )

    if osm_fetch is not None:
        unresolved = resolved.filter(F.col("latitude").isNull())
        hits = osm_fetch(unresolved.select("place").dropDuplicates(["place"]))
        hits = hits.select(
            F.col("name").alias("o_place"),
            F.col("lat").alias("o_lat"),
            F.col("lon").alias("o_lon"),
            F.col("country").alias("o_country"),
        )
        resolved = (
            resolved.join(
                F.broadcast(hits), resolved["place"] == hits["o_place"], "left"
            )
            .select(
                "entity_id",
                "name",
                "place",
                F.coalesce("latitude", "o_lat").alias("latitude"),
                F.coalesce("longitude", "o_lon").alias("longitude"),
                F.coalesce("country", "o_country").alias("country"),
                F.coalesce(
                    "source",
                    F.when(F.col("o_lat").isNotNull(), "osm"),
                ).alias("source"),
            )
        )

    # F11 bad-coordinate guard + drop unresolved; rank mirrors the
    # geolocation table's per-entity result ordering
    # (src/GraphDBToH2.groovy:149-159) — single result per resolver here
    return (
        resolved.filter(
            F.col("latitude").isNotNull()
            & (F.col("latitude") != geo.BAD_COORDINATE)
            & (F.col("longitude") != geo.BAD_COORDINATE)
        )
        .withColumn("rank", F.lit(0))
        .select(
            "entity_id", "rank", "latitude", "longitude", "name", "country", "source"
        )
    )
