"""Retrieval-layer data models, query translation, temporal analysis."""

from .results import KeyframeMetadata, SearchResult
from .translator import UniversalQueryTranslator
from .temporal import TemporalAnalyzer
from .validator import DataConsistencyValidator

__all__ = [
    "KeyframeMetadata",
    "SearchResult",
    "UniversalQueryTranslator",
    "TemporalAnalyzer",
    "DataConsistencyValidator",
]
