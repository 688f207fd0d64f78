"""Foundation layer: config, logging, caching, perf monitoring, file I/O.

TPU-native counterpart of the reference's ``utils.py`` (L0 in SURVEY.md §1).
Pure host-side Python — no device code lives here.
"""

from .config import Config, get_config
from .logging import Logger, get_logger
from .cache import CacheManager
from .perf import PerformanceMonitor
from .files import FileManager
from .paths import SmartPathResolver
from .dataproc import DataProcessor

__all__ = [
    "Config",
    "get_config",
    "Logger",
    "get_logger",
    "CacheManager",
    "PerformanceMonitor",
    "FileManager",
    "SmartPathResolver",
    "DataProcessor",
]
