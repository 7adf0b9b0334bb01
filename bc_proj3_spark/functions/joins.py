"""Shared broadcast gate for data-dependent dimension tables.

A vocabulary/index/adjacency table derived from the corpus is only
"dimension-sized" while the data cooperates: a web-scale crawl has 1e8+
distinct noise tokens, and an unconditional ``F.broadcast`` hint on such
a table OOMs executors the day the data grows (VERDICT r5 flagged tc1's
adjacency; the corpus-LM vocab tables carry the same latent hazard).

:func:`gated_broadcast` is the one shared defense (the pattern d7 and
tc1 already use): persist the table, pay ONE count on the
materialization the downstream join reuses anyway, and attach the
broadcast hint only while the measured row count is under the
threshold. Above it the join degrades to a shuffle join — and AQE may
still convert it back to broadcast at runtime if the materialized size
turns out small, so the gate only ever removes a *wrong* hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ~2M rows of (token, count) / (edge, neighbor) pairs ≈ tens of MB —
#: inside executor broadcast comfort on any reasonable cluster. Shared
#: default across d7 / tc1 / the corpus-LM family.
BROADCAST_MAX_ROWS = 2_000_000


def gated_broadcast(
    df: DataFrame,
    max_rows: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Broadcast-hint ``df`` only if its materialized count <= max_rows.

    Persists (MEMORY_AND_DISK) before counting so the count is the same
    materialization the subsequent join consumes — the gate costs one
    extra job, not one extra scan. Callers that already persisted can
    pass ``persist=False``.
    """
    from pyspark import StorageLevel

    if max_rows is None:
        # read at call time so tests can force the shuffle path
        max_rows = BROADCAST_MAX_ROWS
    if persist:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    n = df.count()
    return F.broadcast(df) if n <= max_rows else df
