"""TTL-bounded lookup cache (ST5 parity).

The reference memoizes external entity-lookup calls with a 1-hour TTL
(DBpedia Spotlight, docs/PHASE3_COMPLETION_REPORT.md:223-229).  The Ray
rebuild has no external API, but the cache SHAPE matters for the plug
point: a per-worker lookup cache that (a) expires entries after ``ttl_s``
so a long-running actor eventually re-resolves against a refreshed KB,
and (b) bounds memory with FIFO eviction.  The clock is injectable so
expiry is unit-testable; cache hits never change RESULTS (lookups are
deterministic), only work, so pipeline determinism is unaffected.
"""

from __future__ import annotations

import time
from collections import OrderedDict

DEFAULT_TTL_S = 3600.0
DEFAULT_MAX_ENTRIES = 200_000


class TTLCache:
    """dict-like get/set with per-entry expiry and bounded size."""

    def __init__(self, ttl_s: float = DEFAULT_TTL_S,
                 max_entries: int = DEFAULT_MAX_ENTRIES, clock=time.monotonic):
        self.ttl_s = ttl_s
        self.max_entries = max_entries
        self._clock = clock
        self._data: OrderedDict = OrderedDict()

    def get(self, key, default=None):
        hit = self._data.get(key)
        if hit is None:
            return default
        value, stamp = hit
        if self._clock() - stamp > self.ttl_s:
            del self._data[key]
            return default
        return value

    def __setitem__(self, key, value) -> None:
        if key not in self._data and len(self._data) >= self.max_entries:
            self._data.popitem(last=False)  # FIFO eviction
        self._data[key] = (value, self._clock())

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key) -> bool:
        return self.get(key) is not None
