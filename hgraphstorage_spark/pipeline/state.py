"""Deterministic release of pipeline-persisted intermediates.

Several operators legitimately ``persist()`` an intermediate that multiple
plan branches consume (LSH signature tables, quantized embedding preps) or
``localCheckpoint()`` iterative state. Per job that is correct — the
session's end releases the blocks. A LONG-LIVED service calling these
operators in a loop, though, accumulates executor storage unless it
releases blocks between calls (VERDICT r3 task 7).

Every pipeline operator that persists an intermediate registers it here
via :func:`track`. Callers with a loop wrap each materialization in
:func:`released`::

    with released(minhash_lsh_pairs(docs)) as pairs:
        pairs.write.parquet(out)       # action runs with blocks warm
    # exiting unpersists every intermediate the op registered

or call :func:`release_tracked` at their own cadence. Releases are
non-blocking (``unpersist(False)``) and idempotent; an unpersist on an
already-released or dead DataFrame is swallowed.

Scope note: the registry is THREAD-LOCAL (ADVICE r4): in a
multi-threaded service, one thread's ``released`` block releasing only
what that thread tracked cannot unpersist intermediates another
in-flight operator on a sibling thread is still computing on. Within a
thread, ``released`` still releases everything that thread tracked at
EXIT time — don't interleave the construction of two tracked operators
across a ``released`` boundary; build-act-release each one.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCAL = threading.local()
# every thread's registry, for the cross-thread release escape hatch —
# appended once per thread under the lock, entries are the same list
# objects the thread-local holds
_ALL_REGISTRIES: list[list[DataFrame]] = []
_ALL_LOCK = threading.Lock()


def _tracked() -> list[DataFrame]:
    reg = getattr(_LOCAL, "tracked", None)
    if reg is None:
        reg = _LOCAL.tracked = []
        with _ALL_LOCK:
            _ALL_REGISTRIES.append(reg)
    return reg


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later deterministic release."""
    df.persist()
    _tracked().append(df)
    return df


def tracked_count() -> int:
    return len(_tracked())


def release_tracked() -> int:
    """Unpersist every intermediate registered by THIS thread (LIFO);
    returns how many."""
    n = 0
    reg = _tracked()
    while reg:
        df = reg.pop()
        try:
            df.unpersist(False)
            n += 1
        except Exception:
            pass  # session gone or block already dropped — release is best-effort
    return n


def release_all_tracked() -> int:
    """Cross-thread escape hatch: unpersist EVERY registry's
    intermediates, including those tracked by worker threads that have
    since exited (a main thread draining a ThreadPoolExecutor's work
    would otherwise leak their persisted frames forever — the
    thread-local scoping protects in-flight siblings, but something
    must be able to sweep at quiesce time). Call only when no tracked
    operator is still computing on any thread."""
    n = 0
    with _ALL_LOCK:
        regs = list(_ALL_REGISTRIES)
    for reg in regs:
        while reg:
            df = reg.pop()
            try:
                df.unpersist(False)
                n += 1
            except Exception:
                pass  # best-effort, same contract as release_tracked
    return n


@contextmanager
def released(df: DataFrame):
    """Yield ``df`` for its action, then release all tracked intermediates."""
    try:
        yield df
    finally:
        release_tracked()
