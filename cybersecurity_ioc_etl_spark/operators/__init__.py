"""Operator/query modules.  Importing this package registers every query
and its DuckDB oracle in :mod:`.registry`."""

from . import (  # noqa: F401
    ioc_queries,
    relational,
    relational_ext,
    relational_tpch3,
    events_queries,
    text_queries,
    dedup,
    bpe,
    curation,
    graph,
    corpus_prep,
    sampling,
    similarity,
    advanced,
    classify,
    analytics,
    profiling,
    pruning,
    linkage,
)
from ..multimodal import columns as _multimodal_columns  # noqa: F401,E402
from .registry import ORACLES, QUERIES  # noqa: F401
