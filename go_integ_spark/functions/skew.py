"""Skew-resistant join helper.

AQE's skew-join optimization already splits oversized sort-merge
partitions at runtime (enabled in session.py) — prefer it. Explicit
salting is for the cases AQE can't rescue: a follow-up aggregation
that re-partitions on the same hot key, streaming joins (no AQE), or
a hot key so large that even split partitions overwhelm one executor.

``salted_join`` spreads each left-side key over ``num_salts``
sub-keys (deterministic row hash) and replicates the right side once
per salt — turning one hot partition into ``num_salts`` even ones at
the cost of a ``num_salts``-times-larger right side. Use when the
right side is small-ish but above the broadcast threshold and the
left side is skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the shuffle key
    widened to (on..., salt). Row-deterministic salt (hash of the full
    left row), so results are reproducible across runs and retries.
    Supports inner/left joins (the replicated right side would
    duplicate unmatched right rows under right/full joins).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    l_salted = left.withColumn(SALT_COL, salt)
    r_salted = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return l_salted.join(r_salted, [*on, SALT_COL], how).drop(SALT_COL)
