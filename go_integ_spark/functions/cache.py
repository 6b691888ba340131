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

# slot -> (semanticHash, source-path tuple, persisted frame).
# semanticHash is 32-bit and canonicalized (stable across expression
# IDs), so two different corpora CAN collide; the sorted source-path
# list is the verifying discriminator — a collision rebuilds instead
# of silently serving the wrong corpus's frame.
#
# Two rejected discriminators, both found broken empirically (r9):
# - analyzed().toString(): embeds per-read expression IDs (fresh on
#   every spark.read) and NO file paths — never matches across
#   invocations, silently defeating every cross-query reuse.
# - df.inputFiles(): reads the OPTIMIZED plan, and once the built
#   frame is persisted Spark's CacheManager substitutes
#   InMemoryRelation into semantically-equal fresh reads, so the
#   second invocation sees [] — again never matching.
# The analyzed plan's leaf relations keep their root paths regardless
# of cache substitution, so that's what we key on.
_slots: dict[str, tuple[int, tuple[str, ...], DataFrame, object]] = {}


def _plan_key(df: DataFrame) -> tuple[str, ...]:
    """Sorted root paths of every file-backed leaf in the ANALYZED
    plan (pre-cache-substitution, no expression IDs). Non-file leaves
    (LocalRelation, streaming sources) contribute only their class
    name — for those, discrimination rests on semanticHash alone
    (whose canonicalized plan does include LocalRelation data), i.e.
    a 32-bit backstop rather than the path check. Every current slot
    is keyed by a load_table-derived (file-backed) frame; key a slot
    by an in-memory frame only if a 1-in-4-billion silent collision
    is acceptable for it."""
    keys: list[str] = []
    leaves = df._jdf.queryExecution().analyzed().collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        try:
            roots = leaf.relation().location().rootPaths()
            keys.extend(str(roots.apply(j)) for j in range(roots.size()))
        except Exception:
            keys.append(leaf.getClass().getName())
    return tuple(sorted(keys))


def cached_persist(
    slot: str,
    key_df: DataFrame,
    build: Callable[[], DataFrame],
    token: object = None,
) -> DataFrame:
    """``token`` carries any non-plan parameter the built frame bakes
    in (a block-size cap, a threshold): it is part of the verifying
    key, so a parameter change EVICTS and rebuilds in place. Folding
    the parameter into the slot NAME instead (the r13 entity.py form)
    forked a new slot per value and left the old value's frame
    persisted for the life of the session — a bounded storage-memory
    leak contrary to the one-live-handle intent (ADVICE r13)."""
    key = key_df.semanticHash()
    plan = _plan_key(key_df)
    cached = _slots.get(slot)
    if cached is not None:
        if cached[0] == key and cached[1] == plan and cached[3] == token:
            return cached[2]
        cached[2].unpersist()
    frame = build().persist()
    _slots[slot] = (key, plan, frame, token)
    return frame
