"""The judged query surface.

Importing this package populates `registry.QUERIES` / `registry.ORACLE`
with every operator id from SURVEY.md §2 plus the large-scale
training-data operators (dedup / similarity / text / multimodal).
"""

from . import (  # noqa: F401
    analytics,
    curation,
    graph_q,
    interop,
    llmops,
    relational,
    semistruct,
    streaming_q,
    subqueries,
    tpch_ps,
    wspr,
)
from .registry import ORACLE, QUERIES

__all__ = ["ORACLE", "QUERIES"]
