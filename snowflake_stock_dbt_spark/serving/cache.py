"""Keyed result cache — the engine-side ``st.cache_data`` analog.

The reference caches interactive results per widget state and invalidates
on refresh (reference app/streamlit_app.py:106,114,156,311-312,340-344).
Spark has no automatic cross-query result cache (SURVEY.md §4), so the
serving layer provides one: build functions register under a key, results
persist (MEMORY_AND_DISK) on first use, and refresh drops everything —
exactly the cache-key + invalidate-on-button contract of the app.

At scale the persisted DataFrames live in executor storage memory and
spill; eviction is Spark's LRU block manager, so a forgotten entry
degrades to recompute, never to OOM.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class ResultCache:
    """Memoize DataFrame builders by explicit key (hashable widget state)."""

    def __init__(self, storage: StorageLevel = StorageLevel.MEMORY_AND_DISK):
        self._storage = storage
        self._entries: dict[object, DataFrame] = {}

    def get(self, key: object, build: Callable[[], DataFrame]) -> DataFrame:
        """Return the persisted result for ``key``, building it on miss."""
        if key not in self._entries:
            df = build().persist(self._storage)
            self._entries[key] = df
        return self._entries[key]

    def invalidate(self, key: object | None = None) -> None:
        """Drop one key (or all) — the refresh-button path; unpersists
        eagerly so storage memory returns immediately."""
        keys = [key] if key is not None else list(self._entries)
        for k in keys:
            df = self._entries.pop(k, None)
            if df is not None:
                df.unpersist(blocking=False)

    def __len__(self) -> int:
        return len(self._entries)
