"""Skew-aware join: key salting for hot keys.

AQE's skew-join split (enabled in the session defaults) handles most
skew at runtime; salting is the explicit fallback when one key is so
hot a single post-split partition still overwhelms an executor — or
when AQE is unavailable (streaming joins). Pattern:

    big side:   salt = hash(row) % n_salts         (split the hot key)
    small side: replicated n_salts times           (one copy per salt)
    join key:   (key, salt)                        (uniform shuffle)

Result is row-identical to the unsalted join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join on ``key`` with the big side salted ``n_salts`` ways.

    ``small`` is exploded n_salts× (only acceptable when it is the
    small side — the explosion is the price of the uniform shuffle).

    Only ``inner`` and ``left`` preserve unsalted-join semantics: with
    right/full outer, an unmatched small-side row would surface once
    per salt replica (ADVICE r1), so those modes are rejected.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, "
            f"got how={how!r} (small side is replicated {n_salts}x — "
            f"unmatched small rows would appear {n_salts} times)"
        )
    salted_big = big.withColumn(
        "__salt", (F.abs(F.hash(*big.columns)) % n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
