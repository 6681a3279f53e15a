"""Cache-lifetime plumbing for library functions that return a LAZY
DataFrame built on top of internally ``.persist()``-ed dependency
frames (bm25_terms, the near-dup shingle pipelines, …).

Those persists are load-bearing plan boundaries — several consumers
read each dep, and without the boundary Catalyst re-inlines the
expensive expression into every leg (see CLAUDE.md / functions/
dedup.py) — so they cannot be dropped. But the library cannot
unpersist them before returning either: the caller has not run an
action yet, and unpersisting reverts the plan to the raw (re-inlined)
form. Left alone, every call pins more executor storage for the life
of the session (round-8 VERDICT finding).

``pin_latest(site, *deps)`` bounds the leak with GENERATION EVICTION:
each call of a library function releases the deps pinned by that call
site's PREVIOUS invocation and pins its own. Steady state is one
generation of caches per call site — a serving session that re-runs
the same query keeps its caches warm; a new query naturally evicts the
stale ones. The only cost case is interleaving two calls of the same
function and materializing the first after issuing the second: the
first recomputes without its boundary (correct, just slower).

For callers that know they are done, ``release_pinned(site)`` /
``release_all_pinned()`` free everything deterministically (the
PatchBatch.unpersist discipline) — e.g. at the end of a request, or in
tests asserting no cached RDDs remain.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import DataFrame

_PINNED: Dict[str, Tuple[DataFrame, ...]] = {}


def _unpersist_all(deps: Tuple[DataFrame, ...]) -> None:
    for d in deps:
        try:
            d.unpersist(False)
        except Exception:
            # session already stopped / JVM gone — nothing to free
            pass


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    try:
        return bool(
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        return False


def pin_latest(site: str, *deps: DataFrame) -> None:
    """Pin ``deps`` as call site ``site``'s current cache generation,
    releasing whatever the site pinned last time. Call AFTER
    ``.persist()`` on each dep, before returning the lazy result.

    Plan-identical deps are NOT released: Spark's CacheManager dedupes
    cache entries by logical plan, so a repeat call with the same
    arguments re-persists the SAME entry — unpersisting the old
    generation would evict the new one's (warm) cache with it. Skipping
    them keeps repeated queries warm while still evicting on any
    argument change."""
    prev = _PINNED.get(site, ())
    stale = tuple(
        d for d in prev if not any(_same_plan(d, new) for new in deps)
    )
    _unpersist_all(stale)
    _PINNED[site] = tuple(deps)


def release_pinned(site: str) -> None:
    """Explicitly release one call site's pinned generation."""
    _unpersist_all(_PINNED.pop(site, ()))


def release_all_pinned() -> None:
    """Release every pinned cache generation (end-of-request hook)."""
    for site in list(_PINNED):
        release_pinned(site)
