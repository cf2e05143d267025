"""Scoped cache release for operators that persist() intermediates.

Several operators pin an intermediate DataFrame in executor storage
because it feeds multiple plan branches of the RETURNED (lazy) DataFrame
— e.g. the shingle table in ``ngram_jaccard_pairs`` or the MinHash
signature table in ``minhash_lsh_dups``. The operator cannot unpersist
before returning (the cache must survive until the caller's terminal
action), so by default the pin outlives the action and a pipeline
composing many such operators accumulates storage-memory pressure
(round-2 verdict wart 3).

``cache_scope`` makes the release deterministic without giving up
laziness: every ``scoped_persist`` issued while a scope is active is
recorded, and the scope unpersists them all on exit — run the terminal
action inside the scope, and executor storage is returned the moment the
block ends, whatever operators executed inside it:

    with cache_scope():
        ngram_jaccard_pairs(docs, ...).write.parquet(out)
    # shingle cache released here

Scopes nest (inner scopes release only their own pins) and are
thread-local-safe via contextvars, so concurrent query threads (the
crawl's staging pool, the bench suite) never release each other's
caches. Outside any scope, ``scoped_persist`` degrades to a plain
``persist()`` — the round-2 behavior — and ``spark.catalog.clearCache()``
remains the blunt fallback.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar

from pyspark.sql import DataFrame

_SCOPES: ContextVar[tuple[list[DataFrame], ...]] = ContextVar(
    "fcs_cache_scopes", default=()
)


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() that registers with the innermost active cache_scope
    (no-op registration when no scope is active)."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    scopes = _SCOPES.get()
    if scopes:
        scopes[-1].append(df)
    return df


@contextmanager
def cache_scope():
    """Unpersist every scoped_persist() issued inside the block on exit."""
    pins: list[DataFrame] = []
    token = _SCOPES.set(_SCOPES.get() + (pins,))
    try:
        yield pins
    finally:
        _SCOPES.reset(token)
        for df in pins:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
