"""Shared registry state for the query modules (split from the flat
queries.py in round 9): the (callable, oracle) REGISTRY, the
``@register`` decorator, and the scratch-dir helper every module uses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _scratch_dir(prefix: str) -> str:
    """Process-scoped scratch directory for queries that exercise table/
    index artifacts (snapshot MERGE replay, persisted IVF cells): unique
    per call so repeated runs never collide, removed at interpreter exit
    so bench/driver loops don't accrete /tmp state. NOT removed earlier —
    the returned DataFrame's scan reads these files lazily."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco



def flatten_namespaces(modules) -> dict[str, object]:
    """Merge the public (non-dunder) names of ``modules`` into one dict —
    the package-flatten behind ``queries.__init__`` that preserves the old
    flat ``queries.py`` attribute surface.

    Collision guard (ADVICE r09 #3): a name bound to DIFFERENT objects in
    two modules raises instead of silently shadowing — two modules growing
    divergent same-named helpers is a real-divergence hazard the old
    ``globals().update`` loop masked. Shared imports (``F``, ``register``,
    module cross-imports, …) are the SAME object in every module, so the
    identity check admits them for free."""
    seen_from: dict[str, str] = {}
    out: dict[str, object] = {}
    for m in modules:
        for k, v in vars(m).items():
            if k.startswith("__"):
                continue
            if k in out and out[k] is not v:
                raise RuntimeError(
                    f"queries namespace collision: {k!r} is bound to "
                    f"different objects in {seen_from[k]} and {m.__name__} "
                    "— rename one or hoist the shared definition into "
                    "queries._shared"
                )
            seen_from[k] = m.__name__
            out[k] = v
    return out
