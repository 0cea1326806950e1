"""Vector column expressions (array<float>/array<double>).

All JVM-side (`zip_with` + `aggregate`), sequential evaluation order —
deterministic and bit-reproducible across runs and engines. Used by
operators.similarity and operators.dedup; public API for users writing
their own vector queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    """Sequential-order double dot product (deterministic)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )


def norm(a: str) -> Column:
    return F.expr(f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (s, v) -> s + v * v))")


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_bucket(vec_col: str, n_planes: int = 12) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign(v · r_p), packed
    into a bigint. The planes are pseudo-random but fully deterministic:
    plane p, dimension d gets weight (pmod(xxhash64(p*4099+d), 2001) -
    1000)/1000 — reproducible with zero driver-side state."""
    bits = []
    for p in range(n_planes):
        plane_dot = (
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
            f"(x, d) -> x * ((pmod(xxhash64({p} * 4099 + d), 2001) - 1000) / 1000.0)), "
            f"CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        )
        bits.append(
            f"CASE WHEN {plane_dot} > 0 THEN shiftleft(CAST(1 AS BIGINT), {p}) ELSE CAST(0 AS BIGINT) END"
        )
    return F.expr(" + ".join(bits))
