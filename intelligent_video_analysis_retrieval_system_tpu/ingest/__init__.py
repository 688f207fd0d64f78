"""Ingest layer: video decode -> keyframe extraction -> filtering.

Replaces the reference's three ingest CLIs (``video_frame_filter.py``,
``filter.py``, ``filter_research_update.py``) with one batched pipeline:
host decode workers feed whole-batch device calls for embedding, quality
metrics, perceptual hashing, and dedup decisions.
"""

from .frames import FrameFilter, FrameFilterConfig, ExtractReport, FilterReport
from .video import VideoReader, probe_video

__all__ = [
    "FrameFilter",
    "FrameFilterConfig",
    "ExtractReport",
    "FilterReport",
    "VideoReader",
    "probe_video",
]
