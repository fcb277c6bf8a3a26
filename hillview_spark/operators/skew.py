"""Skew mitigation utilities — manual salting for when AQE's runtime
skew-join splitting isn't available (e.g., aggregation skew, or
broadcast-ineligible joins on power-law keys).

At 100 TB a handful of hot keys (the `en` language, the null user,
the default partkey) can pin a whole stage on one task. Salting
spreads a hot key across `salt` sub-keys at the cost of a second
(tiny) aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_group_count(
    df: DataFrame, keys: list[str], salt: int = 16
) -> DataFrame:
    """Two-phase count aggregation: groupBy (key, salt_bucket) spreads
    hot keys over `salt` partial groups, then the partials (tiny)
    re-aggregate. Result identical to a plain groupBy().count()."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__pc")
    )
    return partial.groupBy(*keys).agg(F.sum("__pc").alias("cnt"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: the (large, skewed) left side gets a
    random salt in [0, salt); the (smaller) right side is replicated
    `salt` times with every salt value. The join key becomes
    (key, salt) — a hot key's rows now land on `salt` different
    reducers. Semantics identical to the plain join."""
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=7) * salt).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    replicated_right = right.select("*", salts)
    # dataframe-qualified refs: unqualified F.col(left_key) resolves
    # against BOTH join children when the two sides share the key
    # name (the common equi-join shape) and raises AMBIGUOUS_REFERENCE
    out = salted_left.join(
        replicated_right,
        (salted_left[left_key] == replicated_right[right_key])
        & (salted_left["__salt"] == replicated_right["__salt"]),
    )
    return out.drop("__salt")
