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
from ..functions.text import xml_unescape

#: Reference service endpoint (src/OSMFetcher.groovy:7). Kept only to
#: build byte-identical request URLs; nothing here performs network IO.
NOMINATIM_BASE_URL = "http://open.mapquestapi.com/nominatim/v1/search.php"

#: One `<place .../>` element — attribute form or open/close form with
#: child elements (addressdetails=1 adds children like <country_code>).
#: Quoted attribute values are consumed atomically (so a '>' inside a
#: display_name can't end the tag) and the attribute span is LAZY: a
#: greedy span backtracks `...attrs/` + `>.*?</place>` and merges a
#: self-closing place with the next open one into a single match
#: (7 rows vanished at sf0.001 exactly where (c%7==0, c%3==2)).
_PLACE_RE = r'(?s)<place\b(?:"[^"]*"|[^>"])*?(?:/>|>.*?</place>)'


def _xml_unescape(c: "F.Column") -> "F.Column":
    return xml_unescape(c)


def nominatim_search_url(name: "F.Column", base_url: str = NOMINATIM_BASE_URL,
                         limit: int = 1) -> "F.Column":
    """Request URL for one place name — C12 url-encode + the reference's
    query-string shape (src/OSMFetcher.groovy:10:
    ``?format=xml&q=<urlencoded>&addressdetails=1&limit=1``).

    ``F.url_encode`` is application/x-www-form-urlencoded, the same
    codec as the reference's ``URLEncoder.encode(location, 'UTF-8')``
    (spaces become ``+``). Pure Column logic — at 100 TB the URL column
    is built in the scan stage for however many *distinct* unresolved
    names survive ``resolve_locations``' dropDuplicates.
    """
    return F.concat(
        F.lit(base_url + "?format=xml&q="),
        F.url_encode(name),
        F.lit(f"&addressdetails=1&limit={limit}"),
    )


def parse_nominatim_xml(
    responses: DataFrame, name_col: str = "name", xml_col: str = "xml"
) -> DataFrame:
    """Parse Nominatim ``<searchresults>`` XML into ranked geolocation
    rows — the response half of src/OSMFetcher.groovy:18-37 (XmlSlurper
    over ``place`` elements -> GeoLocation(lat, lon, bbox, displayName,
    osmType, countryCode); rank = element order, the multiplicity the H2
    geolocation table stores per entity, src/GraphDBToH2.groovy:146-159).

    Input: (``name_col``, ``xml_col``) — one recorded response body per
    queried name. Output: (name, rank, latitude, longitude,
    latitude_south, latitude_north, longitude_west, longitude_east,
    display_name, osm_type, country) with one row per ``<place>``;
    responses with zero places produce zero rows (the reference returns
    ``[]``).

    Spark design: everything is JVM Column logic — ``regexp_extract_all``
    isolates each place element (keeping per-place child lookups aligned
    when optional children are missing), ``posexplode`` assigns rank,
    and per-field regexps read attributes/children. Spark's builtin
    ``xpath_*`` expressions are deliberately NOT used: their JAXP
    factory lookup is not thread-safe under concurrent stages in one
    JVM (observed ``Error loading expression`` failures mid-sweep that
    vanish when the query runs alone), while regexp evaluation is pure
    codegen. No Python UDF, no shuffle: parsing happens in the scan
    stage of however many responses were fetched.
    """
    frags = F.regexp_extract_all(F.col(xml_col), F.lit(_PLACE_RE), 0)
    per_place = responses.select(
        F.col(name_col).alias("name"), F.posexplode(frags).alias("rank", "frag")
    )

    def attr(a: str) -> "F.Column":
        # the leading [ \t\n] anchor keeps `type=` from matching inside
        # `osm_type=` in real Nominatim responses
        return _xml_unescape(
            F.regexp_extract("frag", f'[ \\t\\n]{a}="([^"]*)"', 1)
        )

    bbox = F.split(attr("boundingbox"), ",")
    # boundingbox attribute order is latS,latN,lonW,lonE
    # (src/OSMFetcher.groovy:24, GeoLocation.groovy bbox field comment)
    return per_place.select(
        "name",
        "rank",
        attr("lat").cast("double").alias("latitude"),
        attr("lon").cast("double").alias("longitude"),
        bbox[0].cast("double").alias("latitude_south"),
        bbox[1].cast("double").alias("latitude_north"),
        bbox[2].cast("double").alias("longitude_west"),
        bbox[3].cast("double").alias("longitude_east"),
        attr("display_name").alias("display_name"),
        attr("type").alias("osm_type"),
        F.nullif(
            _xml_unescape(
                F.regexp_extract("frag", "<country_code>([^<]*)</country_code>", 1)
            ),
            F.lit(""),
        ).alias("country"),
    )


def live_osm_fetch(
    http_get: Callable[[str], str] | None = None,
    base_url: str = NOMINATIM_BASE_URL,
    limit: int = 1,
    min_interval_s: float | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Build an ``osm_fetch`` implementation for the resolver seam —
    the live half of src/OSMFetcher.groovy:9-17 that the sandbox
    cannot exercise (no network).

    Gating: with no ``http_get`` injected, a real ``urllib`` transport
    is used ONLY when ``SPARK_GRAFT_ALLOW_NETWORK=1`` — default-off so
    tests and the driver stay deterministic and offline; CI exercises
    the full chain by injecting a recorded-response ``http_get``
    (tests/test_geocode.py), which needs no flag.

    Spark design: request URLs are built Column-side
    (``nominatim_search_url``); the HTTP round-trips run executor-side
    in an Arrow-batched ``mapInPandas`` over the DISTINCT unresolved
    names the seam supplies — the fetch count is bounded by unique
    names, never mentions. Responses parse via
    ``parse_nominatim_xml`` (JVM regex), and the reference's ``-999``
    sentinel results are discarded (src/Geocoder.groovy:27,130-133).

    Rate limiting (r5 ADVICE): the public Nominatim endpoint's usage
    policy caps clients at 1 request/second TOTAL — so with the real
    urllib transport the fetch runs on a single partition
    (``coalesce(1)``; per-executor throttles cannot bound a
    cluster-wide aggregate rate) with ``min_interval_s`` (default
    1.0 s) of sleep between requests. An injected ``http_get``
    (recorded responses, or a self-hosted Nominatim) defaults to no
    throttle and full executor parallelism; pass ``min_interval_s``
    explicitly to throttle a custom transport too.
    """
    import os as _os

    if http_get is None and min_interval_s is None:
        min_interval_s = 1.0  # nominatim.org usage policy
    throttled = bool(min_interval_s)
    interval = float(min_interval_s or 0.0)

    if http_get is None:
        if _os.environ.get("SPARK_GRAFT_ALLOW_NETWORK") != "1":
            raise RuntimeError(
                "live_osm_fetch performs network IO: set "
                "SPARK_GRAFT_ALLOW_NETWORK=1, or inject http_get "
                "(e.g. recorded responses) for offline use"
            )

        def http_get(url: str) -> str:
            import urllib.request

            req = urllib.request.Request(
                url, headers={"User-Agent": "vizlinc-ingester-spark"}
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.read().decode("utf-8", "replace")

    def fetch(names: DataFrame) -> DataFrame:
        from ..session import ship_package

        ship_package(names.sparkSession)
        name_c = names.columns[0]
        urls = names.select(
            F.col(name_c).alias("name"),
            nominatim_search_url(F.col(name_c), base_url, limit).alias("url"),
        )
        if throttled:
            # a global rate cap needs a single stream of requests:
            # N throttled executors would still issue N req/s total
            urls = urls.coalesce(1)

        def run(batches):
            import time as _time

            last = 0.0
            for pdf in batches:
                xmls = []
                for u in pdf["url"]:
                    if interval:
                        wait = last + interval - _time.monotonic()
                        if wait > 0:
                            _time.sleep(wait)
                        last = _time.monotonic()
                    xmls.append(http_get(u))
                pdf = pdf.assign(xml=xmls)
                yield pdf[["name", "xml"]]

        responses = urls.mapInPandas(run, "name string, xml string")
        parsed = parse_nominatim_xml(responses)
        return parsed.filter(
            (F.col("latitude") != geo.BAD_COORDINATE)
            & (F.col("longitude") != geo.BAD_COORDINATE)
        ).select(
            "name",
            F.col("latitude").alias("lat"),
            F.col("longitude").alias("lon"),
            "country",
            "rank",
            "latitude_south", "latitude_north",
            "longitude_west", "longitude_east",
            "display_name", "osm_type",
        )

    return fetch


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
    the operator is deterministic and offline. The fetcher MAY also
    return the full OSM result shape (rank, latitude_south,
    latitude_north, longitude_west, longitude_east, display_name,
    osm_type — e.g. ``parse_nominatim_xml`` over recorded responses);
    multiple ranked rows per name are preserved, mirroring the
    multi-result geolocation table (src/GraphDBToH2.groovy:146-159).
    Missing optional columns are filled with nulls / rank 0.
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

    # Geolocation-table extras (src/GraphDBToH2.groovy:149-159): bbox,
    # display_name, osm_type only exist for OSM results; rank > 0 only
    # when the fetcher returns multiple places per name.
    _OSM_OPTIONAL = [
        ("rank", "int"),
        ("latitude_south", "double"),
        ("latitude_north", "double"),
        ("longitude_west", "double"),
        ("longitude_east", "double"),
        ("display_name", "string"),
        ("osm_type", "string"),
    ]
    null_extras = [
        F.lit(None).cast(typ).alias(f"o_{c}") for c, typ in _OSM_OPTIONAL
    ]
    if osm_fetch is not None:
        unresolved = resolved.filter(F.col("latitude").isNull())
        hits = osm_fetch(unresolved.select("place").dropDuplicates(["place"]))
        for c, typ in _OSM_OPTIONAL:
            if c not in hits.columns:
                default = F.lit(0) if c == "rank" else F.lit(None)
                hits = hits.withColumn(c, default.cast(typ))
        hits = hits.select(
            F.col("name").alias("o_place"),
            F.col("lat").alias("o_lat"),
            F.col("lon").alias("o_lon"),
            F.col("country").alias("o_country"),
            *[F.col(c).alias(f"o_{c}") for c, _ in _OSM_OPTIONAL],
        )
        # Places in `hits` are exactly the stage-1..3-unresolved ones and
        # resolution is a function of the place string, so already-resolved
        # rows never match — multi-rank hits fan out ONLY unresolved rows.
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
                *[F.col(f"o_{c}") for c, _ in _OSM_OPTIONAL],
            )
        )
    else:
        resolved = resolved.select("*", *null_extras)

    # F11 bad-coordinate guard + drop unresolved; rank mirrors the
    # geolocation table's per-entity result ordering
    # (src/GraphDBToH2.groovy:146-159): 0 for single-result resolvers,
    # the fetcher's place order for multi-result OSM lookups.
    return (
        resolved.filter(
            F.col("latitude").isNotNull()
            & (F.col("latitude") != geo.BAD_COORDINATE)
            & (F.col("longitude") != geo.BAD_COORDINATE)
        )
        .withColumn("rank", F.coalesce(F.col("o_rank"), F.lit(0)))
        .select(
            "entity_id", "rank", "latitude", "longitude",
            F.col("o_latitude_south").alias("latitude_south"),
            F.col("o_latitude_north").alias("latitude_north"),
            F.col("o_longitude_west").alias("longitude_west"),
            F.col("o_longitude_east").alias("longitude_east"),
            "name",
            F.col("o_display_name").alias("display_name"),
            F.col("o_osm_type").alias("osm_type"),
            "country", "source",
        )
    )
