"""Orchestration layer: embedder service, facade, health monitoring.

TPU counterpart of the reference's ``system.py`` (L3½ in SURVEY.md §1).
"""

from .embedder import CLIPEmbedder
from .facade import EnhancedRetrievalSystem, SearchOptions, create_system, quick_search
from .health import SystemHealthMonitor

__all__ = [
    "CLIPEmbedder",
    "EnhancedRetrievalSystem",
    "SearchOptions",
    "SystemHealthMonitor",
    "create_system",
    "quick_search",
]
