"""Vector column functions: dot product, norm, cosine — built from
JVM higher-order functions (zip_with / aggregate), so similarity math
runs inside whole-stage codegen with no Python in the loop.

Computation is in float64 (embeddings are float32 on disk) with
left-to-right sequential folds — the same association order DuckDB's
list_cosine_similarity uses, so oracle comparisons agree to the last
ulp and rounding to 4 decimals is bulletproof.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the double-cast vector and its L2 norm once; every
    downstream pair computation then costs one dot product. At scale
    this is the difference between O(pairs * dim) and
    O(pairs * dim + 2 * n * dim) with the norms amortized.
    """
    e = as_double(vec_col)
    return df.withColumn("e", e).withColumn("e_norm", norm(F.col("e")))


def cosine_sim(alias_a: str, alias_b: str) -> Column:
    """Cosine between two with_norm'd sides of a join."""
    return dot(F.col(f"{alias_a}.e"), F.col(f"{alias_b}.e")) / (
        F.col(f"{alias_a}.e_norm") * F.col(f"{alias_b}.e_norm")
    )
