"""Build-once gate fixtures, memoized per (process, key).

Several driver gates need an expensive prebuilt fixture (a session
store, a durable search index) whose construction must not be timed
into every bench rep: rep 1 pays the build, the reported best-of-2
times the serve/update path. The pattern is always the same — probe a
cached handle, rebuild if it vanished — and lived as three hand-rolled
copies (tag store, BM25/ANN indexes, z-order store) before this
module unified them.
"""

from __future__ import annotations

from collections.abc import Callable


def memoized_fixture(cache: dict, key, exists: Callable, build: Callable):
    """cache[key] if `exists(value)` still holds, else `build()` anew.
    The existence probe guards against an external drop (warehouse
    cleanup, tmpdir reaper) invalidating the cached handle; `build`
    must return the handle to cache."""
    val = cache.get(key)
    if val is not None and exists(val):
        return val
    val = build()
    cache[key] = val
    return val
