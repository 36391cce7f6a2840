"""Skew mitigation for hot join keys.

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime, but only for the sizes it can observe; a pathologically hot
key joined against a non-broadcastable middle-sized table still lands
on one task.  ``salted_join`` is the explicit lever: the big side gets
a deterministic salt in [0, n_salts) derived from row content, the
small side is exploded × n_salts, and the join runs on (key, salt) —
the hot key's rows spread over n_salts tasks.

Determinism matters under task retries (same reason the repo avoids
``monotonically_increasing_id``): the salt is a content hash, not
``rand()``, so a recomputed partition salts identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__gs_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across
    ``n_salts`` shuffle tasks.

    ``small`` is replicated ×n_salts (keep it middle-sized: too big to
    broadcast, small enough that ×n_salts replication beats one
    straggler task).  Result equals ``big.join(small, on, how)``
    exactly (asserted in tests/test_operators.py).

    Only big-side-preserving join types are allowed: under
    right/full/right_semi the replicated small side would emit its
    unmatched rows once per salt.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r}"
        )
    salt = F.pmod(
        F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in big.columns]),
        F.lit(n_salts),
    ).cast("int")
    b = big.withColumn(_SALT, salt)
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [*on, _SALT], how).drop(_SALT)
