"""Session-lifetime registry for persisted helper DataFrames.

Operators that reference one projection many times in a single plan
(banded LSH self-joins, bucketed near-dup self-joins) persist that
projection so its pandas-UDF kernel runs ONCE instead of once per plan
reference (measured 16x at 8 bands — the difference between 93 s and
387 s on a 640k-doc sweep).  persist() alone is a leak across a long
driver run or a serve process: the MEMORY_AND_DISK blocks outlive the
query that created them and a module-global strong reference would stop
the ContextCleaner reclaiming them.  Every such cache is therefore
registered HERE, and callers release it the moment the downstream result
is materialized (checkpointed / written / collected):

  * ``scoped_caches()`` — the preferred form: everything registered inside
    the ``with`` block is unpersisted on exit.  The body must MATERIALIZE
    its result (eager localCheckpoint / write / collect) before the block
    ends; unpersist is always safe (a still-referenced plan recomputes),
    but releasing before materialization forfeits the single-computation
    guarantee.
  * ``release_caches()`` — drain everything; for ad-hoc callers that own
    the whole lifecycle (the bench sweep).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_LIVE_CACHES: list[tuple[str, DataFrame]] = []


def register_cache(df: DataFrame, kind: str = "generic") -> DataFrame:
    """Track a just-persisted DataFrame for later release; returns it.

    ``kind`` scopes bulk release: ``release_caches("signatures")`` drains
    only the MinHash signature projections, so a caller following one
    operator's release contract cannot unpersist another operator's
    still-unmaterialized cache (and silently reintroduce its N-reference
    recompute)."""
    _LIVE_CACHES.append((kind, df))
    return df


def release_caches(kind: str | None = None) -> None:
    """Unpersist live registered caches — all of them, or only ``kind``."""
    keep = []
    while _LIVE_CACHES:
        k, df = _LIVE_CACHES.pop()
        if kind is None or k == kind:
            df.unpersist(blocking=False)
        else:
            keep.append((k, df))
    _LIVE_CACHES.extend(reversed(keep))


@contextmanager
def scoped_caches() -> Iterator[None]:
    """Release every cache registered inside the block on exit — including
    on error paths.  Only caches registered AFTER entry are touched, so
    scopes nest and never release an outer scope's still-needed cache.

    Entry membership is tracked by IDENTITY, not list position: a
    kind-filtered ``release_caches`` inside the scope may remove entries
    registered BEFORE it, which would shift a positional mark and let
    inner entries escape the scope.  The snapshot holds REFERENCES (not
    bare id() ints) so a pre-entry object released and garbage-collected
    mid-scope cannot donate its recycled address to an inner entry."""
    before = [df for _, df in _LIVE_CACHES]
    try:
        yield
    finally:
        keep = []
        for k, df in _LIVE_CACHES:
            if any(df is b for b in before):
                keep.append((k, df))
            else:
                df.unpersist(blocking=False)
        _LIVE_CACHES[:] = keep
