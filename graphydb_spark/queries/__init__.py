"""The declared query catalog: SURVEY.md §2 inventory as runnable queries.

Split across ordered part modules (round 7 — single queries.py reached
19.5k lines); see _shared.py for the catalog-wide ground rules.  The
QUERIES dict (in _registry) keeps its frozen insertion order — the
driver's first-50 correctness window depends on it.
"""
from __future__ import annotations

from . import _shared, _graph_core, _relational, _pipeline, _analytics_a, _analytics_b, _analytics_c, _analytics_d, _oracle_table, _retrieval_ann, _registry  # noqa: F401
from ._shared import *  # noqa: F401,F403
from ._graph_core import *  # noqa: F401,F403
from ._relational import *  # noqa: F401,F403
from ._pipeline import *  # noqa: F401,F403
from ._analytics_a import *  # noqa: F401,F403
from ._analytics_b import *  # noqa: F401,F403
from ._analytics_c import *  # noqa: F401,F403
from ._analytics_d import *  # noqa: F401,F403
from ._oracle_table import *  # noqa: F401,F403
from ._retrieval_ann import *  # noqa: F401,F403
from ._registry import *  # noqa: F401,F403

# Single-namespace backfill: the original module resolved EVERY
# call-time global in one namespace, including forward references
# (e.g. q_dedup_resolve reads QUERIES, defined at the very end).  Give
# each part module any name it doesn't already have so function bodies
# keep resolving exactly as before the split.  Existing attributes are
# never overridden — a part that imported or defined a name keeps its
# own binding.
_parts = (_shared, _graph_core, _relational, _pipeline, _analytics_a, _analytics_b, _analytics_c, _analytics_d, _oracle_table, _retrieval_ann, _registry)
_final = {k: v for k, v in globals().items() if not k.startswith("__")}
for _m in _parts:
    for _k, _v in _final.items():
        if not hasattr(_m, _k):
            setattr(_m, _k, _v)
del _parts, _final, _m, _k, _v
