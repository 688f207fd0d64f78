"""Retrieval-layer data models, query translation, temporal analysis."""

from .results import KeyframeMetadata, SearchResult
from .textproc import TextAnalysis, analyze_text
from .translator import UniversalQueryTranslator
from .temporal import TemporalAnalyzer
from .validator import DataConsistencyValidator

__all__ = [
    "KeyframeMetadata",
    "SearchResult",
    "TextAnalysis",
    "analyze_text",
    "UniversalQueryTranslator",
    "TemporalAnalyzer",
    "DataConsistencyValidator",
]
