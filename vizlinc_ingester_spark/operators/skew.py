"""Skew mitigation: salted equi-join.

AQE's skew-join handles hot keys only for sort-merge joins it can
split at runtime; it does NOT help shuffle-hash joins, stream-static
joins, or any shuffle Spark has already committed to a partitioning
for. The manual fallback is salting: widen the join key with a salt
derived from the big side's rows, and replicate the small side once
per salt value — the hot key's rows spread over ``buckets``
partitions and every replica still finds its match.

The reference's analog is the celebrity-person skew in the
co-occurrence self-join (`/root/reference/src/SocialNetworkDCO.groovy:63-78`
loops persons-per-doc; one mega-doc serializes that loop) — there we
rely on AQE because the join is SMJ; this operator covers the shapes
AQE can't.

Cost model: small side payload is duplicated ``buckets``× (only its
join columns + selected values — project first), big side gets one
extra int column. Worth it iff the hot key's row share exceeds
~1/shuffle-partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
    salt_from: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the shuffle key widened
    to ``on + salt`` so a hot key spreads over ``buckets`` reducers.

    The salt is deterministic: ``pmod(hash(salt_from), buckets)`` from
    a stable big-side column (default: the first non-key column, which
    keeps repeated runs identical for testing). The small side is
    replicated ``buckets``× via ``explode``; results are row-identical
    to the plain join for inner/left joins.
    """
    on = list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how}")
    if salt_from is None:
        non_key = [c for c in big.columns if c not in on]
        if not non_key:
            raise ValueError("big side needs a non-key column to salt from")
        salt_from = non_key[0]

    salted_big = big.withColumn(_SALT, F.pmod(F.hash(F.col(salt_from)), F.lit(buckets)))
    salted_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_big.join(salted_small, [*on, _SALT], how).drop(_SALT)
