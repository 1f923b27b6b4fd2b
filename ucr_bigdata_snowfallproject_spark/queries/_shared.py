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

