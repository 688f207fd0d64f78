"""FrameFilter: keyframe extraction and refinement (the ingest pipeline).

Public API per BASELINE.json: ``FrameFilter.extract_frames`` /
``FrameFilter.apply_filters``.

Stage 1 — ``extract_frames`` (replaces ``video_frame_filter.py``):
video -> batched decode -> (optional phash prefilter) -> batched embedding
-> streaming cosine dedup (keep iff cos < threshold vs last kept, carried
across batches) -> ``keyframes/<video>/<n>.jpg`` + ``map/<video>.csv``
(``n,pts_time,fps,frame_idx`` — the reference's schema,
``video_frame_filter.py:51``).

Stage 2 — ``apply_filters`` (replaces ``filter.py`` /
``filter_research_update.py``): per-folder quality percentile drop
(Laplacian blur + edge density), embedding scene segmentation, in-scene
windowed dedup — all whole-batch device calls instead of per-frame Python.

The embedder is injected; by default a cheap on-device pixel-statistics
embedder is used (rough analog of the reference's DINO dedup tower — any
consistent embedding works for near-duplicate detection; the system facade
wires the CLIP tower when available so ingest embeddings are reusable for
indexing).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import numpy as np

from ..utils.files import FileManager
from .video import VideoReader

__all__ = ["FrameFilter", "FrameFilterConfig", "ExtractReport", "FilterReport"]

EmbedFn = Callable[[np.ndarray], np.ndarray]


@dataclass(slots=True)
class FrameFilterConfig:
    # stage 1 (video_frame_filter.py:63-70)
    dedup_threshold: float = 0.98
    frame_batch: int = 128
    sample_every: int = 1
    jpeg_quality: int = 95
    use_phash_prefilter: bool = False
    phash_threshold: int = 5           # filter_research_update.py:43
    # host-side shrink edge before device upload for dedup embedding/phash
    # (full-res frames only matter for the written JPEGs; shipping them to
    # the device wastes host->HBM bandwidth — dedup embedders downsample
    # anyway). Set to the embedder's input size for DINO (224); 0 disables.
    dedup_resize: int = 64
    # stage 2 (filter.py:16-21,178-316)
    blur_drop_percentile: float = 10.0
    edge_drop_percentile: float = 10.0
    scene_threshold: float = 0.75
    min_scene_length: int = 5
    in_scene_similarity: float = 0.95
    dedup_window: int = 5
    # alternative stage-2 similarity mode: per-scene density clustering with
    # centroid-nearest representatives (filter_research_update.py:113-155)
    use_clustering: bool = False
    cluster_eps: float = 0.05
    # presets mirroring the reference CLI modes (filter.py:648-739)
    @classmethod
    def gentle(cls) -> "FrameFilterConfig":
        return cls(blur_drop_percentile=5.0, edge_drop_percentile=5.0,
                   in_scene_similarity=0.97)

    @classmethod
    def ultra_gentle(cls) -> "FrameFilterConfig":
        return cls(blur_drop_percentile=2.0, edge_drop_percentile=2.0,
                   in_scene_similarity=0.99)

    @classmethod
    def similarity_only(cls) -> "FrameFilterConfig":
        return cls(blur_drop_percentile=0.0, edge_drop_percentile=0.0)


@dataclass(slots=True)
class ExtractReport:
    video: str
    frames_seen: int = 0
    frames_kept: int = 0
    phash_dropped: int = 0
    fps: float = 0.0
    duration_s: float = 0.0
    frames_per_s: float = 0.0

    def as_dict(self) -> dict[str, Any]:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}  # type: ignore[attr-defined]


@dataclass(slots=True)
class FilterReport:
    folders: int = 0
    frames_in: int = 0
    frames_out: int = 0
    dropped_quality: int = 0
    dropped_similarity: int = 0
    per_folder: dict[str, dict[str, int]] = field(default_factory=dict)

    def as_dict(self) -> dict[str, Any]:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}  # type: ignore[attr-defined]


def default_pixel_embedder(size: int = 8) -> EmbedFn:
    """Cheap on-device embedding: downsampled grayscale + color moments.

    Good enough for near-duplicate detection (the only job of the stage-1
    tower); swap in the CLIP image tower for semantically-aware dedup.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from ..ops.preprocess import resize_bilinear

    @functools.partial(jax.jit, static_argnames=())
    def _embed(x: jnp.ndarray) -> jnp.ndarray:
        small = resize_bilinear(x, size, size)            # (B, s, s, 3)
        flat = small.reshape(x.shape[0], -1)
        return flat - jnp.mean(flat, axis=1, keepdims=True)

    def embed(batch: np.ndarray) -> np.ndarray:
        return np.asarray(_embed(jnp.asarray(batch, jnp.float32)),
                          dtype=np.float32)

    # jittable device-side path: lets extract_frames fuse embed+dedup into
    # one dispatch per batch and fetch only the keep mask
    embed.device_fn = lambda batch: _embed(batch.astype(jnp.float32))
    return embed


def dino_embedder(
    model_path: str | None = None, dtype: str = "bfloat16", batch_pad: int = 8
) -> EmbedFn:
    """DINO ViT-S/16 embedding function (the reference's dedup tower,
    ``video_frame_filter.py:24-33``) — preprocessing + tower in one jit.

    Loads converted ``facebook/dino-vits16`` weights from ``model_path``
    when present (parity with reference dedup decisions); random init
    otherwise (still a consistent near-duplicate metric).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from ..models.dino import (
        DINO_IMAGE_MEAN,
        DINO_IMAGE_STD,
        DINOConfig,
        DINOTower,
        convert_hf_vit_params,
    )
    from ..ops.preprocess import normalize_images, resize_bilinear

    cfg = DINOConfig.vit_s_16()
    params = None
    if model_path is not None:
        try:
            import transformers

            hf = transformers.ViTModel.from_pretrained(
                str(model_path), local_files_only=True, add_pooling_layer=False
            )
            params = convert_hf_vit_params(hf.state_dict(), cfg)
        except Exception:
            params = None
    compute = jnp.float32 if dtype == "float32" else jnp.bfloat16
    tower = DINOTower(cfg, dtype=compute)
    if params is None:
        params = tower.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )["params"]

    @jax.jit
    def _embed(params, batch):
        x = resize_bilinear(batch, cfg.image_size, cfg.image_size,
                            method="bicubic")
        x = normalize_images(x, mean=DINO_IMAGE_MEAN, std=DINO_IMAGE_STD,
                             dtype=compute, use_pallas=False)
        out = tower.apply({"params": params}, x).astype(jnp.float32)
        return out

    def embed(batch: np.ndarray) -> np.ndarray:
        b = len(batch)
        b_pad = -(-max(b, batch_pad) // batch_pad) * batch_pad
        if b_pad != b:
            batch = np.concatenate(
                [batch, np.zeros((b_pad - b, *batch.shape[1:]), batch.dtype)]
            )
        import jax.numpy as jnp

        return np.asarray(
            _embed(params, jnp.asarray(batch, jnp.float32))
        )[:b].astype(np.float32)

    embed.device_fn = lambda batch: _embed(params, batch.astype(jnp.float32))
    return embed


class FrameFilter:
    """Keyframe extraction + refinement over batched device ops."""

    def __init__(
        self,
        config: FrameFilterConfig | None = None,
        embed_fn: EmbedFn | None = None,
        file_manager: FileManager | None = None,
    ) -> None:
        self.config = config or FrameFilterConfig()
        self.embed_fn = embed_fn or default_pixel_embedder()
        self.fm = file_manager or FileManager()
        self._fused_steps: dict[tuple, Any] = {}

    # -- stage 1: extraction ------------------------------------------------

    def extract_frames(
        self,
        video_path: str | Path,
        keyframes_dir: str | Path,
        map_dir: str | Path | None = None,
        video_name: str | None = None,
    ) -> ExtractReport:
        """One video -> deduplicated keyframe JPEGs + frame map CSV."""
        import time

        import cv2
        import jax.numpy as jnp

        from ..ops.dedup import sequential_dedup_carry
        from ..ops.phash import perceptual_hash

        cfg = self.config
        video_path = Path(video_path)
        name = video_name or video_path.stem
        out_dir = Path(keyframes_dir) / name
        out_dir.mkdir(parents=True, exist_ok=True)

        reader = VideoReader(
            video_path, batch_size=cfg.frame_batch, sample_every=cfg.sample_every
        )
        fps = reader.info.fps
        report = ExtractReport(video=name, fps=fps)
        t0 = time.perf_counter()

        carry: Any = None
        last_hash: np.ndarray | None = None
        kept_n = 0
        map_rows: list[dict[str, Any]] = []

        # fused fast path: when the embedder exposes a jittable device_fn,
        # embed + dedup-scan run as ONE device dispatch per batch and only
        # the (B,) keep mask is fetched — per-batch host<->device roundtrips
        # dominate ingest on tunneled backends
        device_fn = getattr(self.embed_fn, "device_fn", None)
        fused_step = None
        if device_fn is not None:
            # built once per (embedder, threshold) and cached on the filter:
            # a fresh @jit closure per extract_frames call would recompile
            # the whole embed+scan program for every video
            fused_key = (id(device_fn), cfg.dedup_threshold)
            fused_step = self._fused_steps.get(fused_key)
            if fused_step is None:
                import jax

                @jax.jit
                def fused_step(batch, carry):  # noqa: F811
                    emb = device_fn(batch).astype(jnp.float32)
                    keep, new_carry = sequential_dedup_carry(
                        emb, carry, threshold=cfg.dedup_threshold
                    )
                    return keep, new_carry

                self._fused_steps[fused_key] = fused_step
        for indices, frames in reader:
            report.frames_seen += len(frames)
            batch = frames
            batch_indices = indices
            # shrink on host before any device upload: device ops only need
            # the small view; full-res frames stay host-side for JPEG output
            small = self._host_shrink(batch, cfg.dedup_resize)
            if cfg.use_phash_prefilter:
                hashes = np.asarray(perceptual_hash(jnp.asarray(
                    small.astype(np.float32))))
                keep_hash = self._phash_keep(hashes, last_hash, cfg.phash_threshold)
                if keep_hash.any():
                    last_hash = hashes[np.nonzero(keep_hash)[0][-1]]
                report.phash_dropped += int((~keep_hash).sum())
                batch = batch[keep_hash]
                small = small[keep_hash]
                batch_indices = batch_indices[keep_hash]
                if len(batch) == 0:
                    continue
            # pad to the fixed batch size: a different trailing-batch shape
            # would force a fresh device compile (seconds each on
            # remote-compile backends)
            b = len(small)
            if b < cfg.frame_batch:
                pad = np.repeat(small[-1:], cfg.frame_batch - b, axis=0)
                emb_in = np.concatenate([small, pad])
            else:
                emb_in = small
            # keep the padded shape through the dedup scan too (fixed-shape
            # compile); pad rows duplicate the last frame, so they can never
            # be "kept" and never perturb the carry
            if fused_step is not None:
                import jax

                if carry is None:
                    dim = jax.eval_shape(
                        device_fn,
                        jax.ShapeDtypeStruct(emb_in.shape, jnp.dtype(emb_in.dtype)),
                    ).shape[1]
                    carry = jnp.zeros((dim,), jnp.float32)
                keep_dev, carry = fused_step(jnp.asarray(emb_in), carry)
                keep = np.asarray(keep_dev)[:b]
            else:
                emb = np.asarray(self.embed_fn(emb_in), dtype=np.float32)
                if carry is None:
                    carry = jnp.zeros((emb.shape[1],), jnp.float32)
                keep, carry = sequential_dedup_carry(
                    jnp.asarray(emb), carry, threshold=cfg.dedup_threshold
                )
                keep = np.asarray(keep)[:b]
            for i in np.nonzero(keep)[0]:
                frame_idx = int(batch_indices[i])
                bgr = cv2.cvtColor(batch[i], cv2.COLOR_RGB2BGR)
                cv2.imwrite(
                    str(out_dir / f"{kept_n}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, cfg.jpeg_quality],
                )
                map_rows.append(
                    {
                        "n": kept_n,
                        "pts_time": frame_idx / fps if fps > 0 else -1.0,
                        "fps": fps,
                        "frame_idx": frame_idx,
                    }
                )
                kept_n += 1
        report.frames_kept = kept_n
        if map_dir is not None:
            Path(map_dir).mkdir(parents=True, exist_ok=True)
            self.fm.save_csv_mapping(Path(map_dir) / f"{name}.csv", map_rows)
        report.duration_s = time.perf_counter() - t0
        if report.duration_s > 0:
            report.frames_per_s = report.frames_seen / report.duration_s
        return report

    def extract_frames_batch(
        self,
        video_paths: list[str | Path],
        keyframes_dir: str | Path,
        map_dir: str | Path | None = None,
        workers: int = 0,
    ) -> list[ExtractReport]:
        """Multi-video driver (reference ``process_videos`` analog).

        ``workers >= 2`` runs the multi-process decode pipeline
        (``ingest.pipeline``): worker processes decode/shrink/write while
        this process runs every device dispatch — decisions are identical
        to the sequential path.
        """
        # Uniquify output names up front: two inputs with the same filename
        # in different directories ("a/clip.mp4", "b/clip.mp4") must not
        # write into the same keyframes/<stem>/ dir (the parallel path
        # would interleave their frames within one run).
        names: list[str] = []
        seen: dict[str, int] = {}
        for p in video_paths:
            stem = Path(p).stem
            seen[stem] = seen.get(stem, 0) + 1
            names.append(stem if seen[stem] == 1 else f"{stem}_{seen[stem]}")

        if workers >= 2 and len(video_paths) > 1:
            from .pipeline import extract_frames_parallel

            return extract_frames_parallel(
                self, video_paths, keyframes_dir, map_dir, workers=workers,
                names=names,
            )
        return [
            self.extract_frames(p, keyframes_dir, map_dir, video_name=n)
            for p, n in zip(video_paths, names)
        ]

    @staticmethod
    def _host_shrink(batch: np.ndarray, edge: int) -> np.ndarray:
        """cv2 downscale on host (SIMD, ~0.1 ms/frame) — cuts device-upload
        bytes by ~(H*W)/(edge^2) for the dedup path."""
        if not edge or (batch.shape[1] <= edge and batch.shape[2] <= edge):
            return batch
        import cv2

        out = np.empty((len(batch), edge, edge, 3), batch.dtype)
        for i, frame in enumerate(batch):
            out[i] = cv2.resize(frame, (edge, edge), interpolation=cv2.INTER_AREA)
        return out

    @staticmethod
    def _phash_keep(
        hashes: np.ndarray, last_hash: np.ndarray | None, threshold: int
    ) -> np.ndarray:
        keep = np.ones(len(hashes), dtype=bool)
        prev = last_hash
        for i in range(len(hashes)):
            if prev is not None and int(np.sum(hashes[i] != prev)) <= threshold:
                keep[i] = False
            else:
                prev = hashes[i]
        return keep

    # -- stage 2: refinement --------------------------------------------------

    def apply_filters(
        self,
        keyframes_dir: str | Path,
        output_dir: str | Path | None = None,
        map_dir: str | Path | None = None,
        output_map_dir: str | Path | None = None,
    ) -> FilterReport:
        """Refine extracted keyframes: drop low-quality frames and in-scene
        near-duplicates. In-place when ``output_dir`` is None (originals of
        dropped frames are deleted); otherwise survivors copy to
        ``output_dir`` and sources are untouched."""
        import jax.numpy as jnp
        from PIL import Image

        from ..ops.dedup import windowed_dedup_mask
        from ..ops.quality import adaptive_quality_mask, quality_metrics

        cfg = self.config
        keyframes_dir = Path(keyframes_dir)
        in_place = output_dir is None
        report = FilterReport()
        scanned = self.fm.scan_keyframes(keyframes_dir)

        for folder, images in scanned.items():
            report.folders += 1
            report.frames_in += len(images)
            paths = [keyframes_dir / folder / img for img in images]
            pixels = self._load_uniform(paths)
            keep = np.ones(len(images), dtype=bool)

            # quality stage (skipped entirely at 0 percentiles)
            dropped_q = 0
            if cfg.blur_drop_percentile > 0 or cfg.edge_drop_percentile > 0:
                metrics = quality_metrics(jnp.asarray(pixels.astype(np.float32)))
                qmask = np.asarray(
                    adaptive_quality_mask(
                        metrics["blur"], metrics["edges"],
                        cfg.blur_drop_percentile, cfg.edge_drop_percentile,
                    )
                )
                dropped_q = int((~qmask).sum())
                keep &= qmask

            # similarity stage over survivors
            dropped_s = 0
            survivor_idx = np.nonzero(keep)[0]
            if len(survivor_idx) > 1:
                emb = np.asarray(
                    self.embed_fn(pixels[survivor_idx]), dtype=np.float32
                )
                if cfg.use_clustering:
                    smask = self._cluster_dedup(emb, cfg)
                else:
                    smask = np.asarray(
                        windowed_dedup_mask(
                            jnp.asarray(emb),
                            threshold=cfg.in_scene_similarity,
                            window=cfg.dedup_window,
                        )
                    )
                dropped_s = int((~smask).sum())
                keep[survivor_idx[~smask]] = False

            report.dropped_quality += dropped_q
            report.dropped_similarity += dropped_s
            kept_images = [img for img, k in zip(images, keep) if k]
            report.frames_out += len(kept_images)
            report.per_folder[folder] = {
                "in": len(images),
                "out": len(kept_images),
                "dropped_quality": dropped_q,
                "dropped_similarity": dropped_s,
            }

            self._write_survivors(
                keyframes_dir, folder, images, keep, output_dir, in_place
            )
            # in place: the source maps must track the filtered sources.
            # copy mode: ONLY write maps to output_map_dir — the sources
            # (and their maps) stay untouched.
            map_dest = map_dir if in_place else output_map_dir
            self._rewrite_map(folder, images, keep, map_dir, map_dest)
        return report

    @staticmethod
    def _cluster_dedup(emb: np.ndarray, cfg: FrameFilterConfig) -> np.ndarray:
        """Scene-aware density clustering: split frames into scenes by
        adjacent cosine, then keep one centroid-nearest representative per
        in-scene cluster (filter_research_update semantics)."""
        import jax.numpy as jnp

        from ..ops.dedup import cluster_representatives_mask
        from ..ops.normalize import l2_normalize

        n = len(emb)
        normed = np.asarray(l2_normalize(jnp.asarray(emb)))
        adjacent = np.sum(normed[:-1] * normed[1:], axis=-1) if n > 1 else []
        boundaries = [0] + [
            i + 1 for i, sim in enumerate(adjacent) if sim < cfg.scene_threshold
        ] + [n]
        keep = np.zeros(n, bool)
        for start, end in zip(boundaries[:-1], boundaries[1:]):
            if end > start:
                keep[start:end] = cluster_representatives_mask(
                    emb[start:end], eps=cfg.cluster_eps
                )
        return keep

    def _load_uniform(self, paths: list[Path]) -> np.ndarray:
        """Decode images to a uniform (N, S, S, 3) stack (S = max dim 256)."""
        from PIL import Image

        arrays = []
        for p in paths:
            with Image.open(p) as img:
                img = img.convert("RGB")
                if img.size != (256, 256):
                    img = img.resize((256, 256), Image.BILINEAR)
                arrays.append(np.asarray(img, np.uint8))
        return np.stack(arrays) if arrays else np.zeros((0, 256, 256, 3), np.uint8)

    def _write_survivors(
        self,
        keyframes_dir: Path,
        folder: str,
        images: list[str],
        keep: np.ndarray,
        output_dir: str | Path | None,
        in_place: bool,
    ) -> None:
        if in_place:
            for img, k in zip(images, keep):
                if not k:
                    (keyframes_dir / folder / img).unlink(missing_ok=True)
        else:
            out = Path(output_dir) / folder
            out.mkdir(parents=True, exist_ok=True)
            for img, k in zip(images, keep):
                if k:
                    shutil.copy2(keyframes_dir / folder / img, out / img)

    def _rewrite_map(
        self,
        folder: str,
        images: list[str],
        keep: np.ndarray,
        map_dir: str | Path | None,
        output_map_dir: str | Path | None,
    ) -> None:
        """Drop rows of removed frames from the folder's CSV map
        (reference rewrites the CSV too, ``filter.py:456-486``)."""
        if map_dir is None or output_map_dir is None:
            return
        mapping = self.fm.load_folder_mapping(map_dir, folder)
        if not mapping:
            return
        kept_ordinals = set()
        for img, k in zip(images, keep):
            if k:
                stem = Path(img).stem
                digits = "".join(c for c in stem if c.isdigit())
                if digits:
                    kept_ordinals.add(int(digits))
        rows = [
            {"n": n, **fields}
            for n, fields in sorted(mapping.items())
            if n in kept_ordinals
        ]
        Path(output_map_dir).mkdir(parents=True, exist_ok=True)
        self.fm.save_csv_mapping(Path(output_map_dir) / f"{folder}.csv", rows)
