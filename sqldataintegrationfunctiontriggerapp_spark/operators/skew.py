"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles most runtime skew; these
operators are the explicit variants for the cases AQE can't see:

- salted_agg: a groupBy where one key holds a large share of all rows (the
  zipfian hot key). Phase 1 aggregates on (key, salt) so the hot key's rows
  spread over n_salt reducers; phase 2 combines the n_salt partials. Works
  for any algebraic aggregate (sum/count/min/max combine associatively).
- salted_join: a shuffle join where the BIG side's key distribution is
  skewed. The big side gets a deterministic per-row salt; the small side is
  replicated n_salt times so every (key, salt) pair still matches. Shuffle
  size grows by |small| * (n_salt - 1) -- cheap when small is dimension-like
  but too big to broadcast.

Both are drop-in equivalents of the unsalted op (tests assert equality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"

# (phase1, phase2) aggregate pairs for algebraic functions
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
    salt_from: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted groupBy. ``aggs`` maps output-column -> (fn, input
    column) with fn in {sum, count, min, max}. ``salt_from`` (default: a
    uniform hash of the whole row) determines the salt deterministically."""
    for name, (fn, _col) in aggs.items():
        if fn not in _COMBINERS:
            raise ValueError(f"{name}: '{fn}' is not algebraic-combinable")
    salt_src = (
        F.col(salt_from) if isinstance(salt_from, str)
        else salt_from if salt_from is not None
        else F.concat_ws("\x00", *[F.col(c).cast("string") for c in df.columns])
    )
    salted = df.withColumn(_SALT, F.pmod(F.hash(salt_src), F.lit(n_salt)))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[_COMBINERS[fn][0](c).alias(out) for out, (fn, c) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[_COMBINERS[fn][1](out).alias(out) for out, (fn, _c) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over n_salt reducers.
    The small side is replicated n_salt times (explode of a literal range),
    so every (key, salt) bucket joins locally. Only inner/left preserve
    semantics (each big row carries exactly one salt; the replicated small
    side would duplicate right/full unmatched rows)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics only for inner/left")
    big_salted = big.withColumn(
        _SALT,
        F.pmod(
            F.hash(F.concat_ws("\x00", *[F.col(c).cast("string") for c in big.columns])),
            F.lit(n_salt),
        ),
    )
    small_rep = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return big_salted.join(small_rep, [*on, _SALT], how).drop(_SALT)
