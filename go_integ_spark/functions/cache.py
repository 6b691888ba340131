"""Single-slot persisted-frame caches.

Several operators persist a mid-pipeline frame that feeds multiple
subtrees of ONE returned plan (Catalyst does not share subplans
across DataFrame references). A bare ``.persist()`` inside the
operator leaks: a long gate/bench session re-invokes operators and
each call pins a fresh copy in executor storage memory, never
releasing the previous one (r7 review found six such sites).

This is the ``_cached_doc_sets`` pattern (operators/dedup.py)
generalized: exactly ONE live persisted handle per named slot, keyed
by the input plan's semantic hash — the same corpus reuses the
cached frame, a different corpus evicts and replaces it. Bounded by
construction; assumes the backing files are immutable for the life
of the cache (true for the analytics tables).

Thread-safety: the module-global slot table assumes a SINGLE-THREADED
driver (true for the gate/bench/test harnesses, which run queries
sequentially). Concurrent drivers would need a lock AND a different
eviction story — eviction unpersists a frame a still-running job may
be reading (Spark tolerates this by recomputing, but the cache win is
lost), so the single-slot design is only correct where invocations
are serialized.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

# slot -> (semanticHash, analyzed-plan string, persisted frame).
# semanticHash is 32-bit, so two different corpora CAN collide; the
# analyzed plan string (which embeds the input file paths) is the
# verifying discriminator — a collision rebuilds instead of silently
# serving the wrong corpus's frame.
_slots: dict[str, tuple[int, str, DataFrame]] = {}


def _plan_key(df: DataFrame) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def cached_persist(
    slot: str, key_df: DataFrame, build: Callable[[], DataFrame]
) -> DataFrame:
    key = key_df.semanticHash()
    plan = _plan_key(key_df)
    cached = _slots.get(slot)
    if cached is not None:
        if cached[0] == key and cached[1] == plan:
            return cached[2]
        cached[2].unpersist()
    frame = build().persist()
    _slots[slot] = (key, plan, frame)
    return frame
