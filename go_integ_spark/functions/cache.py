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
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_slots: dict[str, tuple[int, DataFrame]] = {}


def cached_persist(
    slot: str, key_df: DataFrame, build: Callable[[], DataFrame]
) -> DataFrame:
    key = key_df.semanticHash()
    cached = _slots.get(slot)
    if cached is not None:
        if cached[0] == key:
            return cached[1]
        cached[1].unpersist()
    frame = build().persist()
    _slots[slot] = (key, frame)
    return frame
