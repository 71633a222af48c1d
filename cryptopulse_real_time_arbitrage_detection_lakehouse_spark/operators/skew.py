"""Skew mitigation: salted equi-join for pathological hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
the session factory) handles most skew by subdividing oversized shuffle
partitions at runtime. It cannot help when ONE key dominates so heavily
that a single (key, right-row-group) pairing exceeds a task: the classic
fix is salting — spread the hot key's left rows over N sub-keys and
replicate the right side's matching rows N times, so the hot key's work
lands on N tasks instead of one.

Trade-off made explicit: the right side is replicated ``salt`` times
(shuffle volume x salt), so salt ONLY the joins whose left side is truly
skewed and whose right side is much smaller — exactly the fact-dim shape
where a dim is too big to broadcast but a few customer/symbol keys carry
half the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with ``salt``-way key
    spreading (inner or left joins — the shapes where salting is sound).

    The left side gets a deterministic sub-key from a hash of the WHOLE
    row's join-independent distribution (``spark_partition_id`` +
    ``monotonically_increasing_id`` would be non-deterministic under
    retries; a hash of all left columns is stable): hot keys spread over
    ``salt`` tasks. The right side is exploded to every sub-key so each
    left row still finds its match exactly once. Result equals the plain
    join row-for-row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    # deterministic per-row salt: stable under task retries (unlike
    # rand()/partition-id), uniform via xxhash64 of all left columns
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    lsalted = left.withColumn("__salt", salt_col)
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(salt)]))
    )
    return lsalted.join(rsalted, [*keys, "__salt"], how).drop("__salt")
