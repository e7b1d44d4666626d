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


def skew_report(df: DataFrame, key_cols: list[str], k: int = 10) -> DataFrame:
    """Key-distribution diagnostic: the top-k heaviest keys with their row
    counts and global fraction — the number you read BEFORE choosing a
    join strategy (broadcast? salt? AQE skew split?). A key holding >1%
    of 100 TB is a straggler task in any keyed shuffle.

    One partial-aggregated count shuffle; the top-k is a TakeOrdered
    (never a full sort) and the grand total folds off the same counts —
    both subtrees reuse the one exchange. Deterministic ties by key.
    Returns (rank, <key_cols>, cnt, frac DECIMAL(18,6))."""
    from pyspark.sql import Window

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.groupBy().agg(F.sum("cnt").alias("_total"))
    top = counts.orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols]).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols])
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            *key_cols,
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("cnt") / F.col("_total"), 6).cast("decimal(18,6)").alias("frac"),
        )
    )
