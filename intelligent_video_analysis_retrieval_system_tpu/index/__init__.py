"""Index/storage engine: the `.rvdb` single-file format, TPU edition.

Replaces the reference's ``unified_index.py`` (L3 in SURVEY.md §1) with a
layout designed for device upload: the embedding matrix is stored as raw
rows (bf16 bits) so index load is one bulk read + one host->HBM transfer —
no FAISS deserialization step exists because search runs on TPU
(``ops.topk``) directly over the embedding matrix.
"""

from .container import IndexContainer
from .unified import UnifiedIndex, UnifiedIndexConfig
from .builder import RAGBuilder, BuildReport
from .metadata import MetadataManager
from .portable import PortableIndex
from .fastloader import FastLoader

__all__ = [
    "IndexContainer",
    "UnifiedIndex",
    "UnifiedIndexConfig",
    "RAGBuilder",
    "BuildReport",
    "MetadataManager",
    "PortableIndex",
    "FastLoader",
]
