"""Skew-handling primitives: salted aggregation and salted joins.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in our
session) covers sort-merge joins automatically; these explicit operators
are for the cases AQE can't see — skewed hash aggregations and
hot-key broadcast-unfriendly joins — and make the technique available as a
first-class engine operator. Results are exactly equal to the unsalted
plans (tests pin this); only the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_by(df: DataFrame, key_cols: list[str], salt: int = 16) -> DataFrame:
    """Two-phase count: a hot key is split across `salt` reducers in phase
    one (partial counts per (key, salt)), then the tiny phase-two shuffle
    combines per key. Output: key_cols + cnt."""
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").cast("long").alias("cnt"))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salt: int = 16, how: str = "inner"
) -> DataFrame:
    """Equi-join where `big` has skewed keys and `small` is too large to
    broadcast: each big row picks one of `salt` virtual keys; `small` is
    replicated `salt` times so every virtual key finds its match. The hot
    key's rows spread across `salt` reducers instead of one.

    Output columns = big's columns + small's non-key columns."""
    big_salted = big.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_exploded, [key, "_salt"], how)
    return out.drop("_salt")
