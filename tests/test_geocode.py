"""Geocode resolver chain operator: ordering, sentinel guard, OSM seam
(operators/geocode.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vizlinc_ingester_spark.functions import geo
from vizlinc_ingester_spark.operators import geocode


def _gaz(spark):
    return spark.createDataFrame(
        [("COLOMBIA", 4.0, -72.0), ("PERU", -10.0, -76.0)],
        "country string, lat double, lon double",
    )


def test_resolver_order_and_guard(spark):
    locs = spark.createDataFrame(
        [
            (1, "12 30 15 45 10 05"),    # coordinates win (DD SEP DD SEP DD x2)
            (2, "COLOMBIA"),             # exact gazetteer
            (3, "BAHIA DE PERU"),        # suffix gazetteer
            (4, "-COLOMBIA"),            # C9 cleanup (one char) then exact
            (5, "NOWHERE SPECIAL"),      # unresolved -> dropped
        ],
        "entity_id long, text string",
    )
    out = {r["entity_id"]: r for r in
           geocode.resolve_locations(locs, _gaz(spark)).collect()}
    assert out[1]["source"] == "coordinates"
    assert abs(out[1]["latitude"] - (12 + 30 / 60 + 15 / 3600)) < 1e-9
    assert out[1]["longitude"] < 0  # western-hemisphere negation
    assert out[2]["source"] == "gazetteer_exact" and out[2]["latitude"] == 4.0
    assert out[3]["source"] == "gazetteer_suffix" and out[3]["country"] == "PERU"
    assert out[4]["source"] == "gazetteer_exact"
    assert 5 not in out  # unresolved dropped (F11 guard semantics)


def test_osm_seam(spark):
    locs = spark.createDataFrame(
        [(1, "COLOMBIA"), (2, "ATLANTIS"), (3, "ATLANTIS"), (4, "EL DORADO")],
        "entity_id long, text string",
    )

    fetched_names = []

    def fake_osm(names_df):
        rows = [r["place"] for r in names_df.collect()]
        fetched_names.extend(rows)
        hits = [(n, 1.5, -2.5, "MYTH") for n in rows if n == "ATLANTIS"]
        return spark.createDataFrame(
            hits or [(None, None, None, None)],
            "name string, lat double, lon double, country string",
        ).filter(F.col("name").isNotNull())

    out = {r["entity_id"]: r for r in
           geocode.resolve_locations(locs, _gaz(spark), osm_fetch=fake_osm).collect()}
    # only unresolved distinct names hit the external service
    assert sorted(set(fetched_names)) == ["ATLANTIS", "EL DORADO"]
    assert out[1]["source"] == "gazetteer_exact"
    assert out[2]["source"] == "osm" and out[2]["latitude"] == 1.5
    assert out[3]["source"] == "osm"
    assert 4 not in out  # external miss stays unresolved


def test_bad_coordinate_sentinel(spark):
    locs = spark.createDataFrame([(1, "SOMEWHERE")], "entity_id long, text string")

    def fake_osm(names_df):
        return spark.createDataFrame(
            [("SOMEWHERE", geo.BAD_COORDINATE, geo.BAD_COORDINATE, "XX")],
            "name string, lat double, lon double, country string",
        )

    out = geocode.resolve_locations(locs, _gaz(spark), osm_fetch=fake_osm)
    assert out.count() == 0  # -999 sentinel rows discarded (F11)
