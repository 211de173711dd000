"""LRU search-result cache (SURVEY.md §2.9 C1).

Reference semantics (reference ``core/cache.py:18-169``): SHA-256 key over
(sorted index names, query, top_k, filter params), OrderedDict LRU with
max 100 entries, thread-safe; the cache is BYPASSED when fragments or path
filters are requested (reference ``api.py:277``).

This is driver-side state (it caches the ≤k collected result rows, not
DataFrames) — identical role to the reference's.
"""

from __future__ import annotations

import hashlib
import json
import threading
from collections import OrderedDict


class SearchCache:
    def __init__(self, max_size: int = 100):
        self.max_size = max_size
        self._data: OrderedDict[str, list] = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def make_key(
        indices: list[str],
        query: str,
        top_k: int,
        extra: dict | None = None,
    ) -> str:
        payload = json.dumps(
            {
                "indices": sorted(indices),
                "query": query,
                "top_k": top_k,
                "extra": extra or {},
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()

    def get(self, key: str):
        with self._lock:
            if key in self._data:
                self._data.move_to_end(key)
                self.hits += 1
                return self._data[key]
            self.misses += 1
            return None

    def set(self, key: str, value: list) -> None:
        with self._lock:
            self._data[key] = value
            self._data.move_to_end(key)
            while len(self._data) > self.max_size:
                self._data.popitem(last=False)

    def clear(self) -> None:
        with self._lock:
            self._data.clear()

    def stats(self) -> dict:
        with self._lock:
            total = self.hits + self.misses
            return {
                "size": len(self._data),
                "max_size": self.max_size,
                "hits": self.hits,
                "misses": self.misses,
                "hit_rate": (self.hits / total) if total else 0.0,
            }
