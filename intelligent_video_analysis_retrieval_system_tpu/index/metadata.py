"""MetadataManager: in-memory metadata DB with temporal & similarity graphs.

Parity with the reference ``MetadataManager`` (``core.py:3013-3557``):
``folder -> {image -> KeyframeMetadata}`` store, per-folder temporal index
sorted by frame_id, prev/next temporal graph, per-folder top-k
cosine-similarity graph (threshold 0.7), gap-based scene boundaries, and
verified JSON save/load.

The similarity graph is one batched device matmul per folder
(``ops.topk.topk_exact_reference``) instead of the reference's sklearn
``cosine_similarity`` over Python loops (``core.py:3493-3531``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Iterable, Sequence

import numpy as np

from ..retrieval.results import KeyframeMetadata
from ..utils.files import FileManager

__all__ = ["MetadataManager"]


class MetadataManager:
    def __init__(
        self,
        similarity_threshold: float = 0.7,   # core.py:3507
        similarity_top_k: int = 10,           # core.py:3493-3531
        scene_gap_threshold: int = 5,         # core.py:3242-3276
        file_manager: FileManager | None = None,
    ) -> None:
        self.similarity_threshold = similarity_threshold
        self.similarity_top_k = similarity_top_k
        self.scene_gap_threshold = scene_gap_threshold
        self.fm = file_manager or FileManager()
        self.by_folder: dict[str, dict[str, KeyframeMetadata]] = {}
        self.temporal_index: dict[str, list[str]] = {}
        self.similarity_graph: dict[str, dict[str, list[tuple[str, float]]]] = {}

    # -- building -----------------------------------------------------------

    def build_metadata(
        self,
        metadata: Iterable[KeyframeMetadata],
        features: np.ndarray | None = None,
        build_similarity: bool = True,
    ) -> None:
        """Index records by folder; optionally build the per-folder
        similarity graph from the embedding matrix (row_id-aligned)."""
        self.by_folder = {}
        rows: dict[str, list[KeyframeMetadata]] = {}
        for meta in metadata:
            self.by_folder.setdefault(meta.folder, {})[meta.image] = meta
            rows.setdefault(meta.folder, []).append(meta)
        self.temporal_index = {
            folder: [
                m.image
                for m in sorted(metas, key=lambda m: (m.frame_id, m.image))
            ]
            for folder, metas in rows.items()
        }
        self.similarity_graph = {}
        if build_similarity and features is not None:
            for folder, metas in rows.items():
                self._build_similarity_for(folder, metas, features)

    def _build_similarity_for(
        self, folder: str, metas: Sequence[KeyframeMetadata], features: np.ndarray
    ) -> None:
        import jax.numpy as jnp

        from ..ops.normalize import l2_normalize
        from ..ops.topk import topk_exact_reference

        ids = [m.row_id for m in metas]
        if any(i < 0 or i >= len(features) for i in ids) or len(ids) < 2:
            return
        feats = l2_normalize(jnp.asarray(features[np.asarray(ids)], jnp.float32))
        k = min(self.similarity_top_k + 1, len(ids))
        result = topk_exact_reference(feats, feats, k)
        scores = np.asarray(result.scores)
        indices = np.asarray(result.indices)
        graph: dict[str, list[tuple[str, float]]] = {}
        for i, meta in enumerate(metas):
            neighbors = []
            for score, j in zip(scores[i], indices[i]):
                if j == i:
                    continue
                if score < self.similarity_threshold:
                    break  # scores descend
                neighbors.append((metas[j].image, float(score)))
                if len(neighbors) >= self.similarity_top_k:
                    break
            graph[meta.image] = neighbors
        self.similarity_graph[folder] = graph

    # -- queries ------------------------------------------------------------

    def get(self, folder: str, image: str) -> KeyframeMetadata | None:
        return self.by_folder.get(folder, {}).get(image)

    def folders(self) -> list[str]:
        return sorted(self.by_folder)

    def count(self) -> int:
        return sum(len(v) for v in self.by_folder.values())

    def get_temporal_neighbors(
        self, folder: str, image: str, window: int = 3
    ) -> list[KeyframeMetadata]:
        """+-window neighbours in frame order (reference core.py:3160-3204)."""
        order = self.temporal_index.get(folder, [])
        try:
            pos = order.index(image)
        except ValueError:
            return []
        out = []
        for offset in range(-window, window + 1):
            if offset == 0:
                continue
            idx = pos + offset
            if 0 <= idx < len(order):
                meta = self.by_folder[folder][order[idx]]
                out.append(meta)
        return out

    def get_similar_frames(
        self, folder: str, image: str
    ) -> list[tuple[str, float]]:
        return self.similarity_graph.get(folder, {}).get(image, [])

    def get_scene_boundaries(self, folder: str) -> list[int]:
        """Positions where frame_id gaps exceed the threshold (reference
        gap>5 scene split, core.py:3242-3276). Returns start offsets."""
        order = self.temporal_index.get(folder, [])
        if not order:
            return []
        frame_ids = [self.by_folder[folder][img].frame_id for img in order]
        boundaries = [0]
        for i in range(1, len(frame_ids)):
            if frame_ids[i] - frame_ids[i - 1] > self.scene_gap_threshold:
                boundaries.append(i)
        return boundaries

    # -- persistence (verified JSON, reference core.py:3316-3404) ------------

    def save(self, path: str | Path) -> None:
        payload = {
            "version": "2.0",
            "folders": {
                folder: {img: m.to_dict() for img, m in images.items()}
                for folder, images in self.by_folder.items()
            },
            "similarity_graph": self.similarity_graph,
        }
        raw = json.dumps(payload, ensure_ascii=False)
        self.fm.safe_write(Path(path), raw)
        # post-write verification (reference core.py:3533-3557)
        reread = json.loads(Path(path).read_text(encoding="utf-8"))
        count = sum(len(v) for v in reread.get("folders", {}).values())
        if count != self.count():
            raise IOError(
                f"metadata save verification failed: wrote {count}, "
                f"expected {self.count()}"
            )

    def load(self, path: str | Path) -> None:
        data = json.loads(Path(path).read_text(encoding="utf-8"))
        metas: list[KeyframeMetadata] = []
        for folder_data in data.get("folders", {}).values():
            for record in folder_data.values():
                metas.append(KeyframeMetadata.from_dict(record))
        self.build_metadata(metas, features=None, build_similarity=False)
        graph = data.get("similarity_graph", {})
        self.similarity_graph = {
            folder: {
                img: [(n, float(s)) for n, s in pairs]
                for img, pairs in folder_graph.items()
            }
            for folder, folder_graph in graph.items()
        }

    def stats(self) -> dict[str, Any]:
        return {
            "folders": len(self.by_folder),
            "keyframes": self.count(),
            "similarity_edges": sum(
                len(pairs)
                for g in self.similarity_graph.values()
                for pairs in g.values()
            ),
        }
