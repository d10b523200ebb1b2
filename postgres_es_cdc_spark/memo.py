"""Shared registry for per-(session, corpus) stage-memo caches.

Several modules memoize expensive loop-invariant stages (edge tables,
shingle scans, char bigrams, trained quantizers) as lazily
localCheckpointed frames keyed by ``(applicationId, sf_dir, ...)``.
That is the right shape for the driver's run-a-registry-once pattern,
but a long-lived session touching many corpora would pin every
checkpointed frame's executor storage for the session lifetime.

``clear_stage_caches`` is the explicit release hook: it empties every
registered cache (optionally only keys of one applicationId) so the
frames become unreferenced and their checkpoint blocks eligible for
cleanup. Call it between corpora in long-lived sessions; the driver's
one-shot runs never need to.
"""

from __future__ import annotations

_ALL_CACHES: list[dict] = []


def register(cache: dict) -> dict:
    """Register a stage-memo dict (returns it, for inline use)."""
    _ALL_CACHES.append(cache)
    return cache


def clear_stage_caches(app_id: str | None = None) -> int:
    """Drop memoized stage frames; returns the number of entries
    released. ``app_id=None`` clears everything; otherwise only keys
    whose first element is that applicationId (every registered cache
    keys by applicationId first)."""
    n = 0
    for cache in _ALL_CACHES:
        if app_id is None:
            n += len(cache)
            cache.clear()
        else:
            stale = [k for k in cache if k and k[0] == app_id]
            n += len(stale)
            for k in stale:
                del cache[k]
    return n
