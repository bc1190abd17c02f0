"""Skew-handling utilities — salting for hot join keys.

AQE's skew-join split (spark.sql.adaptive.skewJoin) handles moderate
skew at runtime; salting is the explicit fallback when one key dominates
so badly that even split partitions overwhelm a task, or when AQE is
unavailable (streaming joins, some join types).

salted_join: big side gets a random-ish salt in [0, S); the (small)
build side is replicated S× with every salt value; the join key becomes
(key, salt). One hot key now spreads across S tasks. Results are
IDENTICAL to the unsalted join — only the partitioning changes — which
the tests assert.

The "salt" is deterministic (xxhash64 of a row discriminator mod S) so
plans stay replayable; true randomness buys nothing here. xxhash64 is
the cheap JVM hash — the first implementation used md5→hex-substring→
conv, and on wide discriminator columns the salt derivation alone cost
more than the skew it removed (measured: 27.9 s salted vs 13.5 s plain
on 30M×130-byte rows; the xxhash64 form is ~free per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    discriminator: str | None = None,
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, salted S ways.

    `discriminator`: a big-side column whose per-key values vary (used to
    derive the salt); defaults to the first non-key column. The small
    side is replicated S× — keep it genuinely small (dimension-sized)."""
    discriminator = discriminator or next(c for c in big.columns if c != on)
    # NULL discriminator must still land in a salt partition: hash(NULL)
    # is NULL and an inner join on (key, NULL) would silently drop the row.
    disc = F.coalesce(F.col(discriminator).cast("string"), F.lit(""))
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(disc), F.lit(salt)).cast("int")
    )
    small_s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return big_s.join(small_s, on=[on, "__salt"], how=how).drop("__salt")
