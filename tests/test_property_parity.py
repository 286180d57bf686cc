"""Property-based parity: the Column functions and their DuckDB SQL
mirrors must agree on adversarial inputs, not just corpus data
(SURVEY.md §5 — the normalization chain is where silent drift would
corrupt every downstream cluster).

Each test draws ONE list of strings (hypothesis) and runs a single
Spark job + a single DuckDB query over it — per-example Spark jobs
would be unusably slow.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vizlinc_ingester_spark.functions import dates, normalize

# characters the reference's chains specifically treat: accents, junk
# chars, digits, NBSP, quotes, whitespace runs, hyphens
_ALPHABET = (
    "ABCDEFGHI abcdefghi ÁÉÍÓÚÜÑ áéíóúüñ àâêîôû 0123456789"
    '  \t ^"<>_ -.\'(),'
)

texts = st.lists(
    st.text(alphabet=_ALPHABET, min_size=0, max_size=40), min_size=1, max_size=200
)

dateish = st.lists(
    st.one_of(
        st.text(alphabet=_ALPHABET, max_size=30),
        st.builds(
            lambda d, m, y, sep: f"{d}{sep}{m}{sep}{y}",
            st.integers(0, 35).map(str),
            st.sampled_from(dates.MONTH_LONG + dates.MONTH_SHORT + ["xxx"]),
            st.integers(0, 2030).map(str),
            st.sampled_from(["/", "-", " de ", " "]),
        ),
        st.builds(
            lambda d, m, y: f"{d} de {m} del año {y}",
            st.integers(1, 31).map(str),
            st.sampled_from(dates.MONTH_LONG),
            st.integers(1890, 2030).map(str),
        ),
    ),
    min_size=1,
    max_size=150,
)


def _spark_vs_duck(spark, values, spark_col_fn, sql_fn):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, s string")
    got = {
        r["i"]: r["out"]
        for r in df.select("i", spark_col_fn(df["s"]).alias("out")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(values)))
    want = dict(con.execute(f"SELECT i, {sql_fn('s')} FROM t").fetchall())
    con.close()
    mismatches = {
        i: (repr(values[i]), got.get(i), want.get(i))
        for i in range(len(values))
        if got.get(i) != want.get(i)
    }
    assert not mismatches, f"{len(mismatches)} mismatches: {list(mismatches.items())[:5]}"


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=texts)
def test_normalize_str_parity(spark, vals):
    _spark_vs_duck(
        spark, vals, normalize.normalize_str, normalize.sql_normalize_str
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=texts)
def test_twitter_normalize_parity(spark, vals):
    _spark_vs_duck(
        spark, vals,
        normalize.twitter_normalize_str, normalize.sql_twitter_normalize_str,
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=dateish)
def test_date_normalize_parity(spark, vals):
    # the reference lowercases + collapses whitespace before matching
    import pyspark.sql.functions as F

    vals = [v.lower() for v in vals]
    _spark_vs_duck(spark, vals, dates.normalize_date, dates.sql_normalize_date)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=texts)
def test_token_count_parity(spark, vals):
    import pyspark.sql.functions as F

    _spark_vs_duck(
        spark,
        vals,
        lambda c: normalize.token_count(c).cast("long"),
        lambda e: f"CAST({normalize.sql_token_count(e)} AS BIGINT)",
    )


# --- distributed sorted-neighborhood == window islands (hypothesis) -------

_NAMEISH = st.lists(
    st.text(
        alphabet="AB C12ÁÑ-'",  # tiny alphabet -> dense near-collisions
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=_NAMEISH)
def test_sorted_neighborhood_matches_islands_on_random_names(spark, names):
    """The distributed form must equal the single-window form on
    adversarial name lists — dense near-duplicates force boundary
    merges and multi-partition chains that corpus data rarely hits."""
    from pyspark.sql import functions as F

    from vizlinc_ingester_spark.operators import coref
    from vizlinc_ingester_spark.operators.neighborhood import (
        sorted_neighborhood_clusters,
    )

    rows = [(i, "T", n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, type string, norm string")
    got_df = sorted_neighborhood_clusters(
        df, ["type"], "norm", "id", num_partitions=5
    )
    want_df = coref._islands(df, ["type"], "norm", "id")

    def sets(d, col):
        by = {}
        for r in d.collect():
            by.setdefault(r[col], set()).add(r["id"])
        return sorted((frozenset(v) for v in by.values()), key=min)

    assert sets(got_df, "cluster_id") == sets(want_df, "cluster_seq")
