"""Scalar-function queries (SURVEY.md §2.8): Spanish date
normalization, DMS coordinate parsing, gazetteer joins, and the
geocode resolver chain.

Test inputs are *constructed deterministically from table data* in
both engines (Spanish date strings rendered from ``orders`` dates,
DMS strings from ``lineitem`` keys) so the functions are exercised
over real volume, then parsed back — any semantic drift between the
Spark and DuckDB implementations breaks the hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dates as dt
from ..session import read_table as _read_table
from ..functions import geo
from ..functions.dates import MONTH_LONG, MONTH_SHORT
from ..functions.normalize import cleanup_leading_dash

GAZ_N = 279  # unique gazetteer rows


# --- Spanish dates --------------------------------------------------------

def _spanish_date_str() -> "F.Column":
    d = F.dayofmonth("o_orderdate").cast("string")
    y = F.year("o_orderdate").cast("string")
    y2 = F.lpad((F.year("o_orderdate") % 100).cast("string"), 2, "0")
    longm = F.element_at(F.array(*[F.lit(m) for m in MONTH_LONG]), F.month("o_orderdate"))
    shortm = F.element_at(F.array(*[F.lit(m) for m in MONTH_SHORT]), F.month("o_orderdate"))
    v = F.col("o_orderkey") % 4
    return (
        F.when(v == 0, F.concat(d, F.lit(" de "), longm, F.lit(" de "), y))
        .when(v == 1, F.concat(F.lit("el día "), d, F.lit("/"), shortm, F.lit("/"), y2))
        .when(v == 2, F.concat(longm, F.lit(" "), d, F.lit(" del "), y))
        .otherwise(
            F.concat(F.lit("reunión el "), d, F.lit(" de "), longm,
                     F.lit(" de "), y, F.lit(" en la ciudad"))
        )
    )


def q_date_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 — render orders dates as 4 Spanish text shapes, parse back."""
    o = _read_table(spark, os.path.join(sf_dir, "orders.parquet"))
    return o.select(
        "o_orderkey",
        _spanish_date_str().alias("date_str"),
    ).select(
        "o_orderkey", "date_str", dt.normalize_date(F.col("date_str")).alias("norm_date")
    )


def _sql_spanish_date_str() -> str:
    d = "CAST(extract(day FROM o_orderdate) AS VARCHAR)"
    y = "CAST(extract(year FROM o_orderdate) AS VARCHAR)"
    y2 = "lpad(CAST(extract(year FROM o_orderdate) % 100 AS VARCHAR), 2, '0')"
    months_l = "[" + ", ".join(f"'{m}'" for m in MONTH_LONG) + "]"
    months_s = "[" + ", ".join(f"'{m}'" for m in MONTH_SHORT) + "]"
    longm = f"list_extract({months_l}, extract(month FROM o_orderdate))"
    shortm = f"list_extract({months_s}, extract(month FROM o_orderdate))"
    return f"""(CASE o_orderkey % 4
      WHEN 0 THEN {d} || ' de ' || {longm} || ' de ' || {y}
      WHEN 1 THEN 'el día ' || {d} || '/' || {shortm} || '/' || {y2}
      WHEN 2 THEN {longm} || ' ' || {d} || ' del ' || {y}
      ELSE 'reunión el ' || {d} || ' de ' || {longm} || ' de ' || {y} || ' en la ciudad'
      END)"""


ORACLE_DATE_NORMALIZE = f"""
WITH rendered AS (
  SELECT o_orderkey, {_sql_spanish_date_str()} AS date_str FROM orders
)
SELECT o_orderkey, date_str, {dt.sql_normalize_date('date_str')} AS norm_date
FROM rendered
"""


# --- DMS coordinates ------------------------------------------------------

def _dms_place() -> "F.Column":
    p2 = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    g1 = p2(F.col("l_partkey") % 90)
    g2 = p2((F.col("l_suppkey") * 3) % 60)
    g3 = p2((F.col("l_linenumber") * 7) % 60)
    g4 = p2(F.col("l_partkey") % 80)
    g5 = p2((F.col("l_suppkey") * 5) % 60)
    g6 = p2((F.col("l_linenumber") * 11) % 60)
    sp = F.lit(" ")
    v = F.col("l_orderkey") % 5
    return (
        F.when(v == 0, F.concat(g1, sp, g2, sp, g3, F.lit(".5 "), g4, sp, g5, sp, g6))
        .when(v == 1, F.concat(g1, F.lit("-"), g2, F.lit("-"), g3, F.lit(" / "),
                               g4, F.lit("-"), g5, F.lit("-"), g6, F.lit(",25")))
        .when(v == 2, F.concat(g1, g2, g3, sp, g4, g5, g6))
        .when(v == 3, F.concat(F.lit("COORD "), g1, sp, g2, sp, g3, sp, g4, sp, g5, sp, g6, F.lit(" FIN")))
        .otherwise(F.concat(F.lit("LUGAR "), F.col("l_partkey").cast("string")))
    )


def q_dms_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 — construct DMS strings from lineitem keys, parse lat/lon.
    Variant 4 is a plain place name and must yield nulls."""
    li = _read_table(spark, os.path.join(sf_dir, "lineitem.parquet"))
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("row_id"),
        _dms_place().alias("place"),
    ).select(
        "row_id", "place",
        geo.parse_lat(F.col("place")).alias("lat"),
        geo.parse_lon(F.col("place")).alias("lon"),
    )


def _sql_dms_place() -> str:
    p2 = lambda e: f"lpad(CAST({e} AS VARCHAR), 2, '0')"  # noqa: E731
    g1 = p2("l_partkey % 90")
    g2 = p2("(l_suppkey * 3) % 60")
    g3 = p2("(l_linenumber * 7) % 60")
    g4 = p2("l_partkey % 80")
    g5 = p2("(l_suppkey * 5) % 60")
    g6 = p2("(l_linenumber * 11) % 60")
    return f"""(CASE l_orderkey % 5
      WHEN 0 THEN {g1} || ' ' || {g2} || ' ' || {g3} || '.5 ' || {g4} || ' ' || {g5} || ' ' || {g6}
      WHEN 1 THEN {g1} || '-' || {g2} || '-' || {g3} || ' / ' || {g4} || '-' || {g5} || '-' || {g6} || ',25'
      WHEN 2 THEN {g1} || {g2} || {g3} || ' ' || {g4} || {g5} || {g6}
      WHEN 3 THEN 'COORD ' || {g1} || ' ' || {g2} || ' ' || {g3} || ' ' || {g4} || ' ' || {g5} || ' ' || {g6} || ' FIN'
      ELSE 'LUGAR ' || CAST(l_partkey AS VARCHAR)
      END)"""


ORACLE_DMS_PARSE = f"""
WITH places AS (
  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS row_id,
         {_sql_dms_place()} AS place
  FROM lineitem
)
SELECT row_id, place,
       {geo.sql_parse_lat('place')} AS lat,
       {geo.sql_parse_lon('place')} AS lon
FROM places
"""


# --- gazetteer ------------------------------------------------------------

def _indexed_gazetteer(spark: SparkSession) -> DataFrame:
    g = geo.gazetteer(spark)
    w = Window.orderBy("country")
    return g.withColumn("rn", F.row_number().over(w).cast("long"))


_GAZ_INDEXED_SQL = (
    "(SELECT country, lat, lon,"
    " CAST(row_number() OVER (ORDER BY country) AS BIGINT) AS rn"
    f" FROM {geo.sql_gazetteer_values('gaz_raw')})"
)


def _locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic location mentions from customer keys: exact
    country names, '... <COUNTRY>' suffix forms, and non-matching."""
    c = _read_table(spark, os.path.join(sf_dir, "customer.parquet"))
    gaz = _indexed_gazetteer(spark)
    c = c.withColumn("rn", (F.col("c_custkey") % GAZ_N + 1).cast("long"))
    j = c.join(F.broadcast(gaz), "rn")
    v = F.col("c_custkey") % 3
    name = (
        F.when(v == 0, F.col("country"))
        .when(v == 1, F.concat(F.lit("PUERTO DE "), F.col("country")))
        .otherwise(F.concat(F.lit("LUGAR_"), F.col("c_custkey").cast("string")))
    )
    return j.select(F.col("c_custkey").alias("loc_id"), name.alias("name"))


SQL_LOCATIONS = f"""
locations AS (
  SELECT c_custkey AS loc_id,
         CASE c_custkey % 3
           WHEN 0 THEN country
           WHEN 1 THEN 'PUERTO DE ' || country
           ELSE 'LUGAR_' || CAST(c_custkey AS VARCHAR)
         END AS name
  FROM customer
  JOIN {_GAZ_INDEXED_SQL} g ON (c_custkey % {GAZ_N} + 1) = g.rn
)"""


def q_gazetteer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — exact-name broadcast join against the country gazetteer."""
    locs = _locations(spark, sf_dir)
    gaz = geo.gazetteer(spark)
    return locs.join(
        F.broadcast(gaz), locs["name"] == gaz["country"]
    ).select("loc_id", "name", "lat", "lon")


ORACLE_GAZETTEER_JOIN = f"""
WITH {SQL_LOCATIONS.strip()}
SELECT loc_id, name, g2.lat, g2.lon
FROM locations JOIN {geo.sql_gazetteer_values('g2')} ON locations.name = g2.country
"""


def q_country_suffix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — token-safe country-suffix match (endswith ' '+country,
    src/Countries.groovy:9-17)."""
    locs = _locations(spark, sf_dir)
    gaz = geo.gazetteer(spark)
    return locs.join(
        F.broadcast(gaz),
        locs["name"].endswith(F.concat(F.lit(" "), gaz["country"])),
    ).select("loc_id", "name", "country", "lat", "lon")


ORACLE_COUNTRY_SUFFIX = f"""
WITH {SQL_LOCATIONS.strip()}
SELECT loc_id, name, g2.country, g2.lat, g2.lon
FROM locations JOIN {geo.sql_gazetteer_values('g2')}
  ON ends_with(locations.name, ' ' || g2.country)
"""


def q_geo_resolver_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 — ordered resolver chain: DMS parse, else exact gazetteer,
    else suffix gazetteer, else not found (src/Geocoder.groovy:154-187),
    with C9 leading-dash cleanup applied first."""
    c = _read_table(spark, os.path.join(sf_dir, "customer.parquet"))
    gaz = _indexed_gazetteer(spark)
    cc = c.withColumn("rn", (F.col("c_custkey") % GAZ_N + 1).cast("long"))
    j = cc.join(F.broadcast(gaz), "rn")
    v = F.col("c_custkey") % 4
    raw = (
        F.when(v == 0, F.concat(F.lit("- "), F.col("country")))
        .when(v == 1, F.lit("12 30 15 045 10 05"))
        .when(v == 2, F.concat(F.lit("BAHIA DE "), F.col("country")))
        .otherwise(F.concat(F.lit("SITIO_"), F.col("c_custkey").cast("string")))
    )
    locs = j.select(F.col("c_custkey").alias("loc_id"), raw.alias("raw"))
    locs = locs.withColumn("place", cleanup_leading_dash(F.col("raw"))).drop("raw")
    exact = gaz.select(
        F.col("country").alias("x_country"),
        F.col("lat").alias("x_lat"),
        F.col("lon").alias("x_lon"),
    )
    locs = locs.join(F.broadcast(exact), locs["place"] == exact["x_country"], "left")
    sfx = gaz.select(
        F.col("country").alias("s_country"),
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
    )
    locs = locs.join(
        F.broadcast(sfx),
        locs["place"].endswith(F.concat(F.lit(" "), sfx["s_country"])),
        "left",
    )
    # first-hit-wins like the reference resolver: keep only the most
    # specific (longest) matching suffix per location row
    sfx_rank = Window.partitionBy("loc_id").orderBy(
        F.length("s_country").desc_nulls_last(), F.col("s_country").asc_nulls_last()
    )
    locs = (
        locs.withColumn("sfx_rn", F.row_number().over(sfx_rank))
        .filter(F.col("sfx_rn") == 1)
        .drop("sfx_rn")
    )
    lat = F.coalesce(geo.parse_lat(F.col("place")), F.col("x_lat"), F.col("s_lat"))
    lon = F.coalesce(geo.parse_lon(F.col("place")), F.col("x_lon"), F.col("s_lon"))
    source = (
        F.when(geo.parse_lat(F.col("place")).isNotNull(), "coordinates")
        .when(F.col("x_lat").isNotNull(), "gazetteer_exact")
        .when(F.col("s_lat").isNotNull(), "gazetteer_suffix")
        .otherwise("notfound")
    )
    return locs.select(
        "loc_id", "place", lat.alias("lat"), lon.alias("lon"), source.alias("source")
    )


ORACLE_GEO_RESOLVER = f"""
WITH raw_locs AS (
  SELECT c_custkey AS loc_id,
         CASE c_custkey % 4
           WHEN 0 THEN '- ' || g.country
           WHEN 1 THEN '12 30 15 045 10 05'
           WHEN 2 THEN 'BAHIA DE ' || g.country
           ELSE 'SITIO_' || CAST(c_custkey AS VARCHAR)
         END AS raw
  FROM customer
  JOIN {_GAZ_INDEXED_SQL} g ON (c_custkey % {GAZ_N} + 1) = g.rn
),
locs AS (
  SELECT loc_id, regexp_replace(raw, '^[- ]', '') AS place FROM raw_locs
),
resolved AS (
  SELECT l.loc_id, l.place,
         x.lat AS x_lat, x.lon AS x_lon,
         s.lat AS s_lat, s.lon AS s_lon,
         {geo.sql_parse_lat('l.place')} AS p_lat,
         {geo.sql_parse_lon('l.place')} AS p_lon
  FROM locs l
  LEFT JOIN {geo.sql_gazetteer_values('x')} ON l.place = x.country
  LEFT JOIN {geo.sql_gazetteer_values('s')} ON ends_with(l.place, ' ' || s.country)
  QUALIFY row_number() OVER (
    PARTITION BY l.loc_id
    ORDER BY length(s.country) DESC NULLS LAST, s.country ASC NULLS LAST
  ) = 1
)
SELECT loc_id, place,
       coalesce(p_lat, x_lat, s_lat) AS lat,
       coalesce(p_lon, x_lon, s_lon) AS lon,
       CASE WHEN p_lat IS NOT NULL THEN 'coordinates'
            WHEN x_lat IS NOT NULL THEN 'gazetteer_exact'
            WHEN s_lat IS NOT NULL THEN 'gazetteer_suffix'
            ELSE 'notfound' END AS source
FROM resolved
"""


# --- OSM Nominatim response parsing (S11 + C12) ---------------------------

_OSM_TYPES = ["city", "town", "village", "hamlet"]
_OSM_CCS = ["co", "pe", "ve", "br", "mx"]


def _osm_place_xml(i: int) -> "F.Column":
    """One deterministic ``<place>`` element for rank ``i`` of a
    customer's synthetic response. Quarter-unit lat/lon keep every
    double exact through the string round-trip, so the Spark
    parse-back and the DuckDB direct computation are bit-identical."""
    c = F.col("c_custkey")
    lat = ((c * 7 + i * 13) % 720).cast("double") / 4 - 90
    lon = ((c * 11 + i * 17) % 1440).cast("double") / 4 - 180
    f2 = lambda x: F.format_string("%.2f", x)  # noqa: E731
    osm_type = F.element_at(
        F.array(*[F.lit(t) for t in _OSM_TYPES]), ((c + i) % 4 + 1).cast("int")
    )
    cc = F.element_at(
        F.array(*[F.lit(x) for x in _OSM_CCS]), ((c + i) % 5 + 1).cast("int")
    )
    head = F.concat(
        F.lit(f'<place place_id="{i}1'), c.cast("string"),
        F.lit('" lat="'), f2(lat), F.lit('" lon="'), f2(lon),
        F.lit('" display_name="Ciudad '), c.cast("string"),
        F.lit(f" #{i} &amp; alrededores"),
        F.lit('" class="place" type="'), osm_type,
        F.lit('" boundingbox="'),
        f2(lat - 0.25), F.lit(","), f2(lat + 0.25), F.lit(","),
        f2(lon - 0.25), F.lit(","), f2(lon + 0.25), F.lit('"'),
    )
    # every 7th place is attribute-only (no addressdetails children ->
    # country must come back NULL); the rest carry children incl. a
    # self-closing decoy before the close tag
    return F.when((c + i) % 7 == 0, F.concat(head, F.lit("/>"))).otherwise(
        F.concat(
            head, F.lit("><city>C</city><county/><country_code>"),
            cc, F.lit("</country_code></place>"),
        )
    )


def q_osm_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/C12 — render Nominatim-shaped XML responses (0-2 ``<place>``
    elements per customer, entities, self-closing variants, optional
    country_code) plus the C12 url-encoded request URL, then parse the
    XML back with ``parse_nominatim_xml``. The oracle computes every
    field directly from the keys, so the whole encode->parse path is
    under the hash gate (src/OSMFetcher.groovy:9-37)."""
    from ..operators import geocode as gc

    c = _read_table(spark, os.path.join(sf_dir, "customer.parquet"))
    n_places = F.col("c_custkey") % 3
    places = F.slice(
        F.array(_osm_place_xml(0), _osm_place_xml(1)), 1, n_places.cast("int")
    )
    resp = c.withColumn("p", places).select(
        F.concat(
            F.lit("PLAZA & DISTRITO "), F.col("c_custkey").cast("string")
        ).alias("name"),
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8" ?>\n'
                  '<searchresults timestamp="x" querystring="q">\n'),
            F.concat_ws("\n", F.col("p")),
            F.lit("\n</searchresults>"),
        ).alias("xml"),
    )
    parsed = gc.parse_nominatim_xml(resp)
    return parsed.withColumn("url", gc.nominatim_search_url(F.col("name")))


ORACLE_OSM_PARSE = f"""
WITH ranks(i) AS (VALUES (0), (1)),
expanded AS (
  SELECT c_custkey AS c, i FROM customer JOIN ranks ON i < c_custkey % 3
)
SELECT 'PLAZA & DISTRITO ' || CAST(c AS VARCHAR) AS name,
       i AS rank,
       ((c*7 + i*13) % 720) / 4.0 - 90 AS latitude,
       ((c*11 + i*17) % 1440) / 4.0 - 180 AS longitude,
       ((c*7 + i*13) % 720) / 4.0 - 90 - 0.25 AS latitude_south,
       ((c*7 + i*13) % 720) / 4.0 - 90 + 0.25 AS latitude_north,
       ((c*11 + i*17) % 1440) / 4.0 - 180 - 0.25 AS longitude_west,
       ((c*11 + i*17) % 1440) / 4.0 - 180 + 0.25 AS longitude_east,
       'Ciudad ' || CAST(c AS VARCHAR) || ' #' || CAST(i AS VARCHAR) || ' & alrededores' AS display_name,
       list_extract({_OSM_TYPES!r}, CAST((c + i) % 4 + 1 AS INTEGER)) AS osm_type,
       CASE WHEN (c + i) % 7 = 0 THEN NULL
            ELSE list_extract({_OSM_CCS!r}, CAST((c + i) % 5 + 1 AS INTEGER)) END AS country,
       'http://open.mapquestapi.com/nominatim/v1/search.php?format=xml&q=PLAZA+%26+DISTRITO+'
         || CAST(c AS VARCHAR) || '&addressdetails=1&limit=1' AS url
FROM expanded
"""


QUERIES = {
    "date_normalize": q_date_normalize,
    "dms_parse": q_dms_parse,
    "gazetteer_join": q_gazetteer_join,
    "country_suffix_join": q_country_suffix_join,
    "geo_resolver_chain": q_geo_resolver_chain,
    "osm_parse_nominatim": q_osm_parse,
}

ORACLES = {
    "date_normalize": ORACLE_DATE_NORMALIZE,
    "dms_parse": ORACLE_DMS_PARSE,
    "gazetteer_join": ORACLE_GAZETTEER_JOIN,
    "country_suffix_join": ORACLE_COUNTRY_SUFFIX,
    "geo_resolver_chain": ORACLE_GEO_RESOLVER,
    "osm_parse_nominatim": ORACLE_OSM_PARSE,
}
