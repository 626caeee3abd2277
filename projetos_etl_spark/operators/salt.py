"""Key-salting for skewed joins (SURVEY.md §2B scale posture).

AQE's skew-join splitting handles most skew at runtime, but when one key
dominates (the classic null-key / celebrity-user case) pre-salting is the
deterministic fix: the big side's rows scatter across ``n_salts``
sub-keys, the small side replicates once per salt, and the join key
becomes ``(key, salt)`` — the hot key's rows now spread over ``n_salts``
shuffle partitions instead of one straggler task.

Result-identical to the plain join for inner/left joins: every big-side
row meets exactly the same small-side matches (under exactly one salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``on`` with ``n_salts``-way salting.

    The big side gets a deterministic per-row salt (hash of the whole
    row); the small side is exploded ``n_salts``-fold. Any salt
    assignment yields the same join result — determinism just keeps runs
    reproducible. Cost: small side inflates n_salts x (keep it for
    genuinely small/dim sides); win: the hottest key's fan-in drops by
    n_salts x.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_salted = big.withColumn(SALT_COL, salt.cast("int"))
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_salted, on + [SALT_COL], how).drop(SALT_COL)
