"""EnhancedRetrievalSystem: the user-facing facade.

API parity with the reference ``EnhancedRetrievalSystem``
(``system.py:403-2744``): ``build_system`` / ``load_system`` / ``search`` /
``search_by_image`` / ``chat`` / ``chat_search`` / ``export_data`` /
``export_portable_index`` / ``load_portable_index`` / ``start_server`` /
``optimize`` / ``cleanup`` / ``get_system_stats`` + ``SearchOptions`` with
modes ``clip_only`` / ``llm_enhanced`` / ``hybrid`` and the module helpers
``create_system`` / ``quick_search``.

Search path (reference call stack SURVEY.md §3.2, redesigned):
cache -> translate (offline dictionary/LLM-pluggable) -> CLIP text encode
(TPU) -> fused top-k over the device-resident index (+ remote index fan-in
when attached) -> mode-specific post-processing -> cache. The LLM never
sits on the hot path unless explicitly enabled.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Sequence

import numpy as np

from ..index.builder import RAGBuilder
from ..index.metadata import MetadataManager
from ..index.portable import PortableIndex
from ..index.unified import UnifiedIndex, UnifiedIndexConfig
from ..retrieval.translator import UniversalQueryTranslator
from ..retrieval.validator import DataConsistencyValidator
from ..utils.cache import CacheManager
from ..utils.config import Config
from ..utils.dataproc import DataProcessor
from ..utils.files import FileManager
from ..utils.logging import Logger, get_logger
from ..utils.perf import PerformanceMonitor
from .embedder import CLIPEmbedder
from .health import SystemHealthMonitor

__all__ = ["SearchOptions", "EnhancedRetrievalSystem", "create_system", "quick_search"]

VALID_MODES = ("clip_only", "llm_enhanced", "hybrid")


@dataclass(slots=True)
class SearchOptions:
    """Validated search parameters (reference ``system.py:72-92``)."""

    mode: str = "clip_only"
    limit: int = 20
    include_temporal: bool = False
    temporal_window: int = 3
    include_explanations: bool = False
    min_similarity: float = -1.0
    folder_filter: str | None = None
    use_cache: bool = True
    translate: bool = True

    def validate(self) -> None:
        if self.mode not in VALID_MODES:
            raise ValueError(f"mode must be one of {VALID_MODES}, got {self.mode!r}")
        if not 1 <= self.limit <= 1000:  # reference cap (system.py:83)
            raise ValueError(f"limit must be in [1, 1000], got {self.limit}")
        if self.temporal_window < 0:
            raise ValueError("temporal_window must be >= 0")


class EnhancedRetrievalSystem:
    """Build / load / search / chat / serve — the one-stop entry point."""

    def __init__(
        self,
        config: Config | None = None,
        embedder: CLIPEmbedder | None = None,
        logger: Logger | None = None,
        mesh: Any | None = None,
    ) -> None:
        """``mesh``: optional ``jax.sharding.Mesh`` with an "index" axis —
        every index this system builds or loads shards its rows across the
        mesh devices (bf16/f32 and int8 capacity mode alike), replacing the
        reference's LAN fan-out (``system.py:1715-1757``) with ICI merge."""
        self.config = config or Config(config_file=None)
        self.mesh = mesh
        self.logger = logger or get_logger(
            "ivars",
            logs_dir=self.config.path("logs_dir")
            if self.config.get("logging.file") else None,
        )
        perf_cfg = self.config.section("performance")
        self.perf = PerformanceMonitor(
            logger=self.logger,
            slow_op_threshold_s=perf_cfg.get("slow_op_threshold_s", 5.0),
            profile_dir=perf_cfg.get("profile_dir"),
        )
        self.cache = CacheManager(
            cache_dir=self.config.path("cache_dir"),
            memory_budget_mb=perf_cfg.get("cache_memory_mb", 512),
            default_ttl_s=perf_cfg.get("cache_ttl_s", 3600),
        )
        self.fm = FileManager(temp_dir=self.config.path("temp_dir"))
        self.dp = DataProcessor()
        self.validator = DataConsistencyValidator()
        self.translator = UniversalQueryTranslator(cache=self.cache)
        self.embedder = embedder or CLIPEmbedder(
            model_path=self.config.get("model.path"),
            compute_dtype=self.config.get("device.compute_dtype", "bfloat16"),
            parity_mode=bool(self.config.get("device.parity_mode", False)),
            image_batch_size=int(self.config.get("model.image_batch_size", 256)),
            logger=self.logger,
            # vocab-only upgrade path: dropping merges.txt(+vocab.json) into
            # model.vocab_dir swaps the hash-fallback tokenizer for the real
            # CLIP BPE without a weight checkpoint (models.tokenizer)
            vocab_dir=self.config.get("model.vocab_dir"),
        )
        self.index: UnifiedIndex | None = None
        self.metadata = MetadataManager(file_manager=self.fm)
        self.health = SystemHealthMonitor(self)
        self.llm_processor: Any | None = None  # agents.LLMProcessor, lazy
        self.remote_indexes: list[Any] = []    # serve.p2p.RemoteUnifiedIndex
        self._callbacks: dict[str, list[Callable[..., None]]] = {}
        self._lock = threading.RLock()
        self._server = None
        self.is_built = False

    # -- events (reference system.py:2609-2622) ------------------------------

    def on(self, event: str, callback: Callable[..., None]) -> None:
        self._callbacks.setdefault(event, []).append(callback)

    def _emit(self, event: str, **payload: Any) -> None:
        for cb in self._callbacks.get(event, []):
            try:
                cb(**payload)
            except Exception:
                self.logger.warning(f"event callback failed: {event}")

    # -- build / load ---------------------------------------------------------

    def build_system(
        self,
        keyframe_folder: str | Path,
        map_dir: str | Path | None = None,
        output_path: str | Path | None = None,
        resume: bool = True,
    ) -> dict[str, Any]:
        """Validated end-to-end build (reference 6-step pipeline,
        ``system.py:521-648``)."""
        with self.perf.timer("build_system"):
            keyframe_folder = Path(keyframe_folder)
            # step 1: pre-build validation
            folder_report = self.validator.validate_keyframes_folder(keyframe_folder)
            if not folder_report.ok:
                raise ValueError(f"invalid keyframes folder: {folder_report.errors}")
            self._emit("build_progress", stage="validate", done=1, total=6)
            # step 2-3: embed + write index (chunked, resumable)
            if output_path is None:
                output_path = self.config.path("index_dir") / "index.rvdb"
            if map_dir is None:
                candidate = self.config.path("map_dir")
                map_dir = candidate if candidate.is_dir() else None
            index_cfg = self._index_config()
            self.embedder.ensure_loaded()
            builder = RAGBuilder(
                self.embedder.as_embed_fn(),
                self.embedder.embed_dim,
                input_size=self.embedder.input_size,
                config=index_cfg,
                progress_fn=lambda stage, done, total: self._emit(
                    "build_progress", stage=stage, done=done, total=total
                ),
                mesh=self.mesh,
            )
            index, report = builder.build_index(
                keyframe_folder, output_path, map_dir=map_dir, resume=resume
            )
            with self._lock:
                if self.index is not None:
                    self.index.close()
                self.index = index
            self._emit("build_progress", stage="index", done=4, total=6)
            # step 4: metadata graphs
            self._rebuild_metadata()
            # step 5: consistency validation (reference step, core.py:834-841)
            consistency = self.validator.validate_index_metadata_consistency(
                index.ntotal, index._metadata
            )
            if not consistency.ok:
                raise RuntimeError(f"post-build inconsistency: {consistency.errors}")
            # step 6: finalize
            self.is_built = True
            self._wire_act_scale_persistence(output_path, import_existing=False)
            self._maybe_tune_ann()
            self._emit("build_progress", stage="done", done=6, total=6)
            self.logger.info("build complete", **report.as_dict())
            return {"report": report.as_dict(), "index_path": str(output_path)}

    def index_videos(
        self,
        videos: Sequence[str | Path],
        output_path: str | Path | None = None,
        filter_config: Any | None = None,
        resume: bool = True,
    ) -> dict[str, Any]:
        """One-shot pipeline: videos -> keyframes -> searchable index.

        Composes FrameFilter.extract_frames (batched decode + streaming
        dedup) with build_system; keyframes and map CSVs land in the
        configured paths so later incremental runs resume naturally.
        """
        from ..ingest import FrameFilter, FrameFilterConfig

        keyframes_dir = self.config.path("keyframes_dir")
        map_dir = self.config.path("map_dir")
        ingest_cfg = filter_config
        if ingest_cfg is None:
            sec = self.config.section("ingest")
            ingest_cfg = FrameFilterConfig(
                dedup_threshold=sec.get("dedup_threshold", 0.98),
                frame_batch=sec.get("frame_batch", 128),
            )
        ff = FrameFilter(ingest_cfg)
        extract_reports = []
        with self.perf.timer("index_videos_extract"):
            for video in videos:
                extract_reports.append(
                    ff.extract_frames(video, keyframes_dir, map_dir).as_dict()
                )
        build = self.build_system(
            keyframes_dir, map_dir=map_dir, output_path=output_path,
            resume=resume,
        )
        return {"extract": extract_reports, **build}

    def load_system(self, index_path: str | Path, writable: bool = False) -> None:
        """Validated load + temporal/metadata rebuild
        (reference ``system.py:650-729,1491-1530``)."""
        with self.perf.timer("load_system"):
            index = UnifiedIndex(self._index_config(), mesh=self.mesh)
            index.load_unified_index(index_path, mode="a" if writable else "r")
            with self._lock:
                if self.index is not None:
                    self.index.close()
                self.index = index
            self._rebuild_metadata()
            self.is_built = True
            self._wire_act_scale_persistence(index_path, import_existing=True)
            self._maybe_tune_ann()
            self.logger.info(
                "system loaded", ntotal=index.ntotal,
                load_time_s=round(index.load_time_s or 0, 3),
            )

    def _maybe_tune_ann(self) -> None:
        """Self-tuning ANN: when ``index.ann_target_recall`` is configured
        and the ANN mode is active, pick the smallest nprobe hitting the
        target on this corpus (seconds of work; see
        ``UnifiedIndex.tune_nprobe``). Failures degrade to the configured
        nprobe — tuning is an optimization, never a load blocker."""
        target = self.config.section("index").get("ann_target_recall")
        if not target or self.index is None or not self.index.ann_active:
            return
        try:
            rep = self.index.tune_nprobe(target_recall=float(target))
            self.logger.info(
                "ANN self-tuned", nprobe=rep["nprobe"],
                recall=round(rep["recall"], 4), target=float(target),
            )
        except Exception:
            self.logger.exception("ANN self-tuning failed; keeping "
                                  "configured ann_nprobe")

    def _wire_act_scale_persistence(
        self, index_path: str | Path, import_existing: bool
    ) -> None:
        """int8_static: persist calibrated activation scales next to the
        index (``<index>.act_scales.json``) so a restarted server starts
        static immediately instead of re-observing calibration batches.

        ``import_existing`` is True only on LOAD: a fresh BUILD must never
        import the previous build's sidecar (its scales were calibrated
        for a different corpus/checkpoint and would silently override the
        ones just observed) — the stale file is removed instead."""
        if getattr(self.embedder, "compute_dtype", None) != "int8_static":
            return
        scales_path = Path(f"{index_path}.act_scales.json")
        if import_existing:
            try:
                if self.embedder.import_act_scales(scales_path):
                    self.logger.info(
                        "int8_static scales loaded", path=str(scales_path)
                    )
            except Exception:
                self.logger.exception(
                    "act-scales import failed — recalibrating"
                )
        else:
            scales_path.unlink(missing_ok=True)
        self.embedder.on_scales_frozen = (
            lambda: self.embedder.export_act_scales(scales_path)
        )
        # towers may have frozen BEFORE wiring (e.g. during the build's own
        # embedding batches) — export what exists now, not just future
        # freezes, or a build-then-exit flow persists nothing
        if self.embedder.export_act_scales(scales_path):
            self.logger.info(
                "int8_static scales saved", path=str(scales_path)
            )

    def _index_config(self) -> UnifiedIndexConfig:
        sec = self.config.section("index")
        return UnifiedIndexConfig(
            chunk_size=sec.get("chunk_size", 1024),
            checkpoint_every_chunks=sec.get("checkpoint_every_chunks", 5),
            store_thumbnails=sec.get("store_thumbnails", True),
            thumbnail_size=sec.get("thumbnail_size", 224),
            store_full_images=sec.get("store_full_images", False),
            dtype=sec.get("dtype", "bfloat16"),
            incremental_rebuild_threshold=sec.get(
                "incremental_rebuild_threshold", 0.10
            ),
            ann=self._resolve_index_type(sec.get("index_type", "flat")),
            ann_nlist=sec.get("ann_nlist"),
            ann_nprobe=int(sec.get("ann_nprobe", 32)),
            ann_max_batch=int(sec.get("ann_max_batch", 4)),
            # None in the config section means "use the dataclass default"
            # (0.95, the default-on build-time recall guard); set an
            # explicit number to retune, or 0/false to disable. NB: the
            # default must come from __dataclass_fields__ — class-attribute
            # access on a slots=True dataclass returns the member
            # DESCRIPTOR (truthy, not float()-able), which made the guard
            # error out and silently skip on every facade-built index
            ann_target_recall=(
                UnifiedIndexConfig.__dataclass_fields__[
                    "ann_target_recall"
                ].default
                if sec.get("ann_target_recall") is None
                else (float(sec["ann_target_recall"])
                      or None)
            ),
            int8_rescore=bool(sec.get("int8_rescore", False)),
            int8_rescore_factor=int(sec.get("int8_rescore_factor", 4)),
            int8_rescore_cache=bool(sec.get("int8_rescore_cache", False)),
            # "exact" (native spelling) forces exact-only serving even if
            # the container carries a persisted ANN; reference FAISS
            # names keep FAISS's the-file-is-the-index-type behavior
            ann_restore=str(sec.get("index_type", "flat")) != "exact",
        )

    def _resolve_index_type(self, index_type: str) -> bool:
        """Map the configured index type to exact/ANN, honoring the
        reference's FAISS type names (``core.py:1204-1218``). The
        reference silently converted IVF requests to exact Flat; here the
        approximate types genuinely activate the IVF latency mode
        (``ops.ann``), and unknown names fall back to exact with the same
        warning the reference logged."""
        name = str(index_type or "flat")
        exact_names = {"flat", "exact", "IndexFlatIP", "IndexFlatL2"}
        ann_names = {"ivf", "ann", "IndexIVFFlat", "IndexHNSW", "IndexLSH"}
        if name in exact_names:
            return False
        if name in ann_names:
            if name in ("IndexHNSW", "IndexLSH"):
                self.logger.info(
                    "index_type served by the IVF ANN mode (graph/hash "
                    "indexes are hostile to TPUs; same approximate-search "
                    "capability)", index_type=name,
                )
            return True
        self.logger.warning(
            f"Unknown index type: {name}, using exact flat search"
        )
        return False

    def _rebuild_metadata(self) -> None:
        if self.index is None or self.index.ntotal == 0:
            return
        # similarity graphs are O(folder^2) matmuls — cheap on device, but
        # skip for very large indexes (graph is an enrichment, not core).
        # Gate BEFORE the bulk read: materializing a 4M x 768 f32 matrix on
        # host just to discard it would cost ~12 GB per load.
        build_similarity = self.index.ntotal <= 200_000
        feats = (
            self.index._container.read_embeddings(as_float32=True)
            if build_similarity
            else None
        )
        self.metadata.build_metadata(
            list(self.index._metadata), feats, build_similarity=build_similarity
        )

    # -- search ---------------------------------------------------------------

    def search(
        self, query: str, options: SearchOptions | None = None
    ) -> list[dict[str, Any]]:
        """Text search. Never raises; returns [] on failure
        (reference guarantee, ``system.py:821-826``)."""
        options = options or SearchOptions(
            limit=self.config.get("retrieval.default_top_k", 20)
        )
        try:
            options.validate()
        except ValueError:
            raise  # invalid options ARE a caller bug; surface them
        try:
            with self.perf.timer("search_query", query_len=len(query)):
                return self._search_impl(query, options)
        except Exception:
            self.logger.exception("search failed", query=query[:100])
            self.perf.record_error("search_query")
            return []

    @staticmethod
    def _cache_mode_key(options: SearchOptions) -> str:
        """Cache key must cover every result-shaping option — a bare
        (query, mode, limit) key serves folder-filtered results to
        unfiltered requests and vice versa."""
        return (
            f"{options.mode}|f={options.folder_filter}|t={options.include_temporal}"
            f"|w={options.temporal_window}|e={options.include_explanations}"
            f"|m={options.min_similarity}|tr={options.translate}"
        )

    def _cache_index_key(self) -> str:
        """Index identity + mutation generation: cached results must never
        survive deletes/appends/compaction or an index swap."""
        index = self.index
        if index is None:
            return "none"
        return f"{index.path}#{index.generation}#{index.ntotal}"

    def _search_impl(self, query: str, options: SearchOptions) -> list[dict[str, Any]]:
        query = query.strip()
        if not query or self.index is None:
            return []
        mode_key = f"{self._cache_mode_key(options)}::{self._cache_index_key()}"
        if options.use_cache:
            cached = self.cache.get_cached_results(query, mode_key, options.limit)
            if cached is not None:
                return cached

        # translation (confidence-gated, reference system.py:775-778)
        clip_query = query
        translation = None
        if options.translate:
            translation = self.translator.translate_query(query)
            if translation.confidence >= self.translator.min_confidence:
                clip_query = translation.clip_prompt

        if options.mode == "clip_only":
            results = self._search_clip(clip_query, options)
        elif options.mode == "llm_enhanced":
            results = self._search_llm_enhanced(query, clip_query, options)
        else:  # hybrid: 0.7 clip + 0.3 enhanced (reference system.py:1868-1897)
            clip_r = self._search_clip(clip_query, options)
            llm_r = self._search_llm_enhanced(query, clip_query, options)
            results = self.dp.blend_results(
                clip_r, llm_r,
                self.config.get("retrieval.hybrid_clip_weight", 0.7),
                self.config.get("retrieval.hybrid_llm_weight", 0.3),
                limit=options.limit,
            )

        results = self._post_process(results, options, translation)
        if options.use_cache:
            self.cache.cache_query_results(query, mode_key, options.limit, results)
        return results

    def _encode_query(self, text: str) -> np.ndarray:
        return self.embedder.encode_text([text])[0]

    def _search_clip(self, clip_query: str, options: SearchOptions) -> list[dict]:
        qvec = self._encode_query(clip_query)
        return self._vector_search(qvec, options)

    def _search_llm_enhanced(
        self, query: str, clip_query: str, options: SearchOptions
    ) -> list[dict]:
        """Query expansion search: multiple prompt variants, max-merged.

        Without an LLM this uses the translator's keyword variants (the
        reference's LLM ``expand_query`` collapsed to identity anyway,
        ``core.py:2901-2913``); an attached LLM processor can supply real
        expansions via ``expand_query``.
        """
        variants = [clip_query]
        if self.llm_processor is not None:
            try:
                variants = self.llm_processor.expand_query(query)[:4] or variants
            except Exception:
                pass
        else:
            translation = self.translator.translate_query(query)
            for kw in translation.keywords[:2]:
                variants.append(f"a photo of {kw}")
        qvecs = self.embedder.encode_text(variants)
        merged = [
            self._vector_search(qvecs[i], options) for i in range(len(variants))
        ]
        return self.dp.merge_results(merged, limit=options.limit)

    def _vector_search(self, qvec: np.ndarray, options: SearchOptions) -> list[dict]:
        filter_fn = None
        if options.folder_filter:
            target = options.folder_filter
            filter_fn = lambda m: m.folder == target
        hits = self.index.search(qvec, top_k=options.limit, filter_fn=filter_fn)
        # remote fan-in (reference system.py:1715-1757)
        if self.remote_indexes:
            remote_hits: list[list[dict]] = [[h.to_dict("rich") for h in hits]]
            for remote in list(self.remote_indexes):
                try:
                    remote_hits.append(
                        remote.search_vector(qvec, top_k=options.limit)
                    )
                except Exception:
                    self.logger.warning("remote index failed; skipping")
            return self.dp.merge_results(remote_hits, limit=options.limit)
        return [h.to_dict("rich") for h in hits]

    def _post_process(
        self,
        results: list[dict],
        options: SearchOptions,
        translation: Any,
    ) -> list[dict]:
        out = []
        for r in results:
            if r.get("similarity_score", 0.0) < options.min_similarity:
                continue
            r = dict(r)
            r["rank"] = len(out) + 1  # contiguous ranks AFTER filtering
            if options.include_temporal and self.index is not None:
                row = self.index.row_for(r.get("folder", ""), r.get("image", ""))
                if row is not None:
                    r["temporal_context"] = self.index.get_temporal_context(
                        row, options.temporal_window
                    )
            if options.include_explanations:
                r["explanation"] = self._explain(r, translation)
            out.append(r)
            if len(out) >= options.limit:
                break
        return out

    @staticmethod
    def _explain(result: dict, translation: Any) -> str:
        score = result.get("similarity_score", 0.0)
        strength = (
            "strong" if score > 0.3 else "moderate" if score > 0.25 else "weak"
        )
        prompt = getattr(translation, "clip_prompt", None) if translation else None
        base = (
            f"{strength} visual match (cosine {score:.3f}) for "
            f"{prompt!r}" if prompt else f"{strength} visual match (cosine {score:.3f})"
        )
        return base

    def search_batch(
        self, queries: Sequence[str], options: SearchOptions | None = None
    ) -> list[list[dict[str, Any]]]:
        """Batched text search: ONE text-tower forward and ONE top-k sweep
        for the whole batch, so the HBM sweep cost amortizes across queries
        (the serving-throughput lever the reference's per-request FAISS
        loop never had, ``api.py:2553-2617``). Per-query results are
        identical to :meth:`search` in ``clip_only`` mode — same
        translation, cache, filtering and post-processing. Other modes (or
        remote fan-in) fall back to per-query :meth:`search`. Never raises;
        failed batches return ``[]`` per query.
        """
        options = options or SearchOptions(
            limit=self.config.get("retrieval.default_top_k", 20)
        )
        options.validate()
        queries = [q.strip() for q in queries]
        if not queries:
            return []
        if options.mode != "clip_only" or self.remote_indexes:
            return [self.search(q, options) for q in queries]
        try:
            with self.perf.timer("search_batch", n_queries=len(queries)):
                return self._search_batch_impl(queries, options)
        except Exception:
            self.logger.exception("batch search failed")
            self.perf.record_error("search_batch")
            return [[] for _ in queries]

    def _search_batch_impl(
        self, queries: list[str], options: SearchOptions
    ) -> list[list[dict[str, Any]]]:
        mode_key = f"{self._cache_mode_key(options)}::{self._cache_index_key()}"
        out: list[list[dict[str, Any]] | None] = [None] * len(queries)
        todo: list[int] = []
        for i, q in enumerate(queries):
            if not q or self.index is None:
                out[i] = []
                continue
            if options.use_cache:
                cached = self.cache.get_cached_results(q, mode_key, options.limit)
                if cached is not None:
                    out[i] = cached
                    continue
            todo.append(i)
        if todo:
            clip_queries: list[str] = []
            translations: list[Any] = []
            for i in todo:
                cq, translation = queries[i], None
                if options.translate:
                    translation = self.translator.translate_query(cq)
                    if translation.confidence >= self.translator.min_confidence:
                        cq = translation.clip_prompt
                clip_queries.append(cq)
                translations.append(translation)
            qvecs = self.embedder.encode_text(clip_queries)
            filter_fn = None
            if options.folder_filter:
                target = options.folder_filter
                filter_fn = lambda m: m.folder == target
            hit_lists = self.index.search_vectors(
                qvecs, top_k=options.limit, filter_fn=filter_fn
            )
            for j, i in enumerate(todo):
                results = self._post_process(
                    [h.to_dict("rich") for h in hit_lists[j]],
                    options, translations[j],
                )
                if options.use_cache:
                    self.cache.cache_query_results(
                        queries[i], mode_key, options.limit, results
                    )
                out[i] = results
        return out  # type: ignore[return-value]

    def search_by_image(
        self, image: np.ndarray | str | Path, options: SearchOptions | None = None
    ) -> list[dict[str, Any]]:
        """Image-to-image search (reference ``system.py`` search_by_image)."""
        options = options or SearchOptions()
        options.validate()
        try:
            with self.perf.timer("search_by_image"):
                if isinstance(image, (str, Path)):
                    emb, ok = self.embedder.encode_image_files([image])
                    if not ok:
                        return []
                    qvec = emb[0]
                else:
                    qvec = self.embedder.encode_images(np.asarray(image))[0]
                results = self._vector_search(qvec, options)
                return self._post_process(results, options, None)
        except Exception:
            self.logger.exception("search_by_image failed")
            return []

    # -- chat (LLM off the hot path; graceful degradation chain) --------------

    def chat(self, message: str, context_frames: Sequence[dict] | None = None) -> dict:
        """Conversational entry. Greeting short-circuit -> LLM processor ->
        canned fallback (reference chain, ``system.py:976-1015``,
        ``core.py:1917-2127``)."""
        message = message.strip()
        greetings = {"hi", "hello", "hey", "xin chào", "chào", "chào bạn"}
        if message.lower() in greetings:
            return {
                "response": (
                    "Hello! Ask me to find scenes, e.g. 'a red car at night', "
                    "or ask about selected frames."
                ),
                "search_results": [],
                "method": "greeting",
            }
        if self.llm_processor is not None:
            try:
                return self.llm_processor.chat_with_user(message, context_frames)
            except Exception:
                self.logger.exception("llm chat failed; falling back")
        return self.chat_search(message)

    def chat_search(self, message: str) -> dict:
        """RAG-ish loop: search + templated answer
        (reference ``system.py:906-974``)."""
        results = self.search(message, SearchOptions(limit=5))
        if results:
            top = results[0]
            response = (
                f"I found {len(results)} matching keyframes. Best match: "
                f"{top['folder']}/{top['image']} "
                f"(similarity {top['similarity_score']:.3f})."
            )
        else:
            response = (
                "I couldn't find matching keyframes. Try different wording "
                "or check that an index is loaded."
            )
        return {"response": response, "search_results": results, "method": "search"}

    def enable_llm(self, complete_fn: Any | None = None) -> Any:
        """Attach the conversational agent (chat + llm_enhanced expansion).

        ``complete_fn`` injects a provider (OpenAI chat-completions shape);
        without one, the processor auto-detects OPENAI_API_KEY and otherwise
        stays in deterministic local fallback mode.
        """
        from ..agents import LLMConfig, LLMProcessor

        sec = self.config.section("llm")
        self.llm_processor = LLMProcessor(
            self,
            complete_fn=complete_fn,
            config=LLMConfig(
                model=sec.get("model", "gpt-4o"),
                timeout_base_s=sec.get("timeout_base_s", 15.0),
                timeout_per_image_s=sec.get("timeout_per_image_s", 8.0),
                max_images=sec.get("max_images", 5),
                session_clear_every=sec.get("session_clear_every", 5),
            ),
        )
        return self.llm_processor

    # -- export ---------------------------------------------------------------

    def export_data(
        self,
        results: Sequence[dict],
        output_path: str | Path,
        fmt: str | None = None,
    ) -> Path:
        """CSV/JSON/XLSX export (reference ``system.py:1994-2145``)."""
        output_path = Path(output_path)
        fmt = (fmt or output_path.suffix.lstrip(".") or "json").lower()
        output_path.parent.mkdir(parents=True, exist_ok=True)
        rows = [dict(r) for r in results]
        if fmt == "json":
            self.fm.safe_write(
                output_path, json.dumps(rows, ensure_ascii=False, indent=2)
            )
        elif fmt == "csv":
            import csv as _csv
            import io as _io

            buf = _io.StringIO()
            if rows:
                keys = sorted({k for r in rows for k in r if not isinstance(
                    r[k], (list, dict))})
                writer = _csv.DictWriter(buf, fieldnames=keys, extrasaction="ignore")
                writer.writeheader()
                writer.writerows(rows)
            self.fm.safe_write(output_path, buf.getvalue())
        elif fmt == "xlsx":
            import pandas as pd

            pd.DataFrame(rows).to_excel(output_path, index=False)
        else:
            raise ValueError(f"unsupported export format: {fmt}")
        return output_path

    def export_portable_index(self, package_dir: str | Path) -> Path:
        if self.index is None or self.index.path is None:
            raise RuntimeError("no index loaded")
        meta_path = self.index.path.with_suffix(".metadata.json")
        try:
            self.metadata.save(meta_path)
        except Exception:
            meta_path = None
        return PortableIndex().create_package(
            self.index.path, package_dir, metadata_path=meta_path
        )

    def load_portable_index(self, package_dir: str | Path) -> None:
        index = PortableIndex().load_package(package_dir)
        with self._lock:
            if self.index is not None:
                self.index.close()
            self.index = index
        self._rebuild_metadata()
        self.is_built = True

    # -- serving / gui ---------------------------------------------------------

    def start_server(self, host: str | None = None, port: int | None = None,
                     block: bool = True):
        """REST+WebSocket server over this system (serve layer)."""
        from ..serve.rest import RetrievalServer

        server = RetrievalServer(
            self,
            host=host or self.config.get("api.host", "0.0.0.0"),
            port=port or self.config.get("api.port", 5000),
        )
        self._server = server
        server.run(block=block)
        return server

    def start_gui(self) -> None:
        """Desktop GUI is intentionally replaced by the web console served
        at the server root (reference gui.py is 6.2k LoC of PyQt5)."""
        self.start_server(block=True)

    # -- maintenance -----------------------------------------------------------

    def optimize(self) -> dict[str, Any]:
        """Cache trim + temp cleanup (reference ``system.py:1121-1213``)."""
        removed = self.fm.cleanup_temp()
        stats = self.cache.get_stats()
        return {"temp_removed": removed, "cache": stats}

    def cleanup(self) -> None:
        with self._lock:
            if self.index is not None:
                self.index.close()
                self.index = None
            if self._server is not None:
                try:
                    self._server.stop()
                except Exception:
                    pass
            self.is_built = False

    def get_system_stats(self) -> dict[str, Any]:
        stats: dict[str, Any] = {
            "built": self.is_built,
            "embedder": self.embedder.get_stats(),
            "cache": self.cache.get_stats(),
            "performance": self.perf.get_stats(),
            "metadata": self.metadata.stats(),
            "remote_indexes": len(self.remote_indexes),
        }
        if self.index is not None:
            stats["index"] = self.index.get_stats()
        return stats


def create_system(
    config_file: str | Path | None = None,
    mesh: Any | None = None,
    **overrides: Any,
):
    """Convenience factory (reference ``system.py:2663``). Pass ``mesh``
    to shard every built/loaded index across a device mesh."""
    return EnhancedRetrievalSystem(
        Config(config_file=config_file, overrides=overrides or None),
        mesh=mesh,
    )


def quick_search(index_path: str | Path, query: str, limit: int = 10):
    """One-shot search helper (reference ``system.py:2671``)."""
    system = create_system()
    system.load_system(index_path)
    try:
        return system.search(query, SearchOptions(limit=limit))
    finally:
        system.cleanup()
