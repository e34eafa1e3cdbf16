"""Non-vacuousness guard: every ORACLED key must return >0 rows at the
driver's check SF.  Motivated by the r05 audit that found four
hash-green-with-zero-rows keys (dedup_near_exactjacc — rare-word blocking
can't fire on a 31-word vocabulary; dedup_embedding_cosine — threshold
above the corpus's max off-diagonal cosine; pattern_match_strict_seq —
3-step chain occurs 0 times at sf0.01; q22_dormant_customers — the
generator leaves no order-less customers): 0 = 0 passes the hash gate
while verifying nothing.  The sweep runs oracle-side only (DuckDB,
milliseconds per key) — hash parity with Spark is test_differential's
job; together the two imply the Spark side is non-empty too."""

from __future__ import annotations

import pytest

from bigdatawork_spark.registry import ORACLES


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_registered_oracle_nonvacuous(key, duck):
    n = len(duck.execute(ORACLES[key]).fetchall())
    assert n > 0, (
        f"{key}: oracle returns 0 rows at sf0.01 — the hash gate passes "
        "vacuously; re-tune the operator to fire on this corpus or move "
        "it to rows-only with an engine-side equivalence test"
    )


# The separate staged-oracle sweep is gone with the staging module (r15
# fold): the round-6 keys register inline now, so the registered sweep
# above covers them.
