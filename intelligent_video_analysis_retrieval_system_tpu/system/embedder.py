"""CLIPEmbedder: the embedding service wiring model + tokenizer + device.

Parity with the reference ``CLIPFeatureExtractor`` (``core.py:1384-1794``):
batched text encode with 77-token truncation and L2 normalization, batched
image encode with failure tolerance, a load-time self-test with dummy
inputs (``core.py:1476-1502``), and folder-level feature extraction.

TPU specifics:
- jitted encode functions are compiled once per (padded) batch signature;
  batches pad to fixed buckets so arbitrary caller batch sizes never
  trigger recompiles;
- params stay f32 on device; activations run bf16 (or f32 in parity mode);
- when no local HF checkpoint exists the towers are randomly initialized
  (still deterministic + useful for self-retrieval; drop a checkpoint
  directory in ``model.path`` for CLIP-quality search).
"""

from __future__ import annotations

import functools
import threading
import time
from pathlib import Path
from typing import Any, Callable, Sequence

import numpy as np

from ..utils.logging import Logger

__all__ = ["CLIPEmbedder"]

_BATCH_BUCKETS = (8, 32, 128, 256)

# int8_static mode: batches observed through the dynamic path (accumulating
# activation maxima) before scales freeze and the static path takes over
_CAL_BATCHES = 4
# clipping headroom over the observed calibration maxima
_CAL_MARGIN = 1.1


def _bucket(n: int) -> int:
    for b in _BATCH_BUCKETS:
        if n <= b:
            return b
    return -(-n // _BATCH_BUCKETS[-1]) * _BATCH_BUCKETS[-1]


def _flatten_scale_tree(tree: Any, prefix: tuple = ()):
    """Yield (keypath, scalar) pairs from a nested act-scales dict."""
    for key, val in tree.items():
        if isinstance(val, dict):
            yield from _flatten_scale_tree(val, prefix + (key,))
        else:
            yield prefix + (key,), np.asarray(val).item()


class CLIPEmbedder:
    def __init__(
        self,
        model_path: str | Path | None = None,
        config: Any | None = None,          # models.CLIPConfig
        compute_dtype: str = "bfloat16",
        parity_mode: bool = False,
        image_batch_size: int = 256,
        logger: Logger | None = None,
        vocab_dir: str | Path | None = None,
    ) -> None:
        self.model_path = model_path
        self._config_override = config
        self.compute_dtype = "float32" if parity_mode else compute_dtype
        self.parity_mode = parity_mode
        self.image_batch_size = image_batch_size
        self.logger = logger
        self.vocab_dir = vocab_dir
        self._lock = threading.RLock()
        self._loaded = False
        self.model = None
        self.params = None
        self.config = None
        self.tokenizer = None
        self.load_time_s: float | None = None
        self.using_pretrained = False
        # int8_static calibration state (per tower): accumulated act_stats
        # host trees and the frozen act_scales collection once ready
        self._cal_stats: dict[str, Any] = {"vision": None, "text": None}
        self._cal_seen: dict[str, int] = {"vision": 0, "text": 0}
        self._act_scales: dict[str, Any] = {}
        self._cal_paused = False  # self_test runs excluded from calibration
        # called whenever a tower's scales freeze (facade persists them)
        self.on_scales_frozen: Callable[[], Any] | None = None

    # -- lifecycle -----------------------------------------------------------

    def ensure_loaded(self) -> None:
        with self._lock:
            if self._loaded:
                return
            t0 = time.perf_counter()
            import jax.numpy as jnp
            from jax import lax

            from ..models.clip import CLIPModel
            from ..models.convert import load_clip
            from ..models.tokenizer import load_tokenizer

            cfg, params = load_clip(self.model_path, config=self._config_override)
            self.using_pretrained = (
                self.model_path is not None
                and Path(str(self.model_path)).exists()
            )
            dtype = jnp.float32 if self.compute_dtype == "float32" else jnp.bfloat16
            precision = (
                lax.Precision.HIGHEST if self.parity_mode else lax.Precision.DEFAULT
            )
            self.config = cfg
            # compute_dtype "int8" = W8A8 dense layers on the int8 MXU with
            # bf16 everything-else (same param tree; ops.quant.w8a8_dense).
            # "int8_static" additionally swaps the per-token activation
            # scales for calibrated constants (2.9x the quant pass,
            # benchmarks/exp_w8a8_static.py): the first _CAL_BATCHES batches
            # per tower run the dynamic path while accumulating activation
            # maxima, then scales freeze and the static path takes over.
            self.model = CLIPModel(
                cfg, dtype=dtype, precision=precision,
                w8a8=self.compute_dtype in ("int8", "int8_static"),
                w8a8_static=self.compute_dtype == "int8_static",
            )
            self.params = params
            vocab = self.vocab_dir or (
                self.model_path if self.using_pretrained else None
            )
            self.tokenizer = load_tokenizer(vocab, vocab_size=cfg.text.vocab_size)
            self._loaded = True
            self.load_time_s = time.perf_counter() - t0
            if self.logger:
                self.logger.log_performance(
                    "clip_model_load", self.load_time_s,
                    pretrained=self.using_pretrained,
                )
            self.self_test()

    def self_test(self) -> bool:
        """Dummy text+image forward at load (reference core.py:1476-1502).

        The dummy inputs (fixed string, all-black image) are deliberately
        excluded from int8_static calibration — their activation maxima
        are unrepresentative and counting them would freeze the static
        scales prematurely on junk data.
        """
        self._cal_paused = True
        try:
            txt = self.encode_text(["self test"])
            img = self.encode_images(
                np.zeros(
                    (1, self.config.vision.image_size,
                     self.config.vision.image_size, 3),
                    np.uint8,
                ),
                preprocessed=False,
            )
        finally:
            self._cal_paused = False
        ok = (
            txt.shape == (1, self.config.text.projection_dim)
            and img.shape == (1, self.config.vision.projection_dim)
            and np.isfinite(txt).all()
            and np.isfinite(img).all()
        )
        if not ok:
            raise RuntimeError("CLIP self-test failed: non-finite embeddings")
        return ok

    def load_params(self, params: Any, config: Any | None = None) -> None:
        """Adopt externally-produced tower params (e.g. a CLIPTrainer
        checkpoint after fine-tuning) — completes the train -> deploy loop.

        ``params`` is the CLIPModel param tree ({vision, text, logit_scale});
        ``config`` overrides the model config when the checkpoint's
        architecture differs from the current one.
        """
        import jax
        import jax.numpy as jnp
        from jax import lax

        from ..models.clip import CLIPModel

        with self._lock:
            if config is not None:
                self._config_override = config
            if not self._loaded:
                self.ensure_loaded()
            if config is not None:
                dtype = (
                    jnp.float32 if self.compute_dtype == "float32"
                    else jnp.bfloat16
                )
                precision = (
                    lax.Precision.HIGHEST if self.parity_mode
                    else lax.Precision.DEFAULT
                )
                self.config = config
                self.model = CLIPModel(
                    config, dtype=dtype, precision=precision,
                    w8a8=self.compute_dtype in ("int8", "int8_static"),
                    w8a8_static=self.compute_dtype == "int8_static",
                )
            # gather to single-device host values (trainer params may be
            # mesh-sharded) and drop cached jitted encoders
            self.params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.asarray(x)), params
            )
            for cached in (
                "_encode_text_jit", "_encode_image_jit",
                "_encode_text_static_jit", "_encode_image_static_jit",
                "_encode_text_cal_jit", "_encode_image_cal_jit",
                "_dynamic_model",
            ):
                self.__dict__.pop(cached, None)
            # new params invalidate calibrated activation ranges
            self._cal_stats = {"vision": None, "text": None}
            self._cal_seen = {"vision": 0, "text": 0}
            self._act_scales = {}
            self.using_pretrained = True
        self.self_test()

    @property
    def embed_dim(self) -> int:
        self.ensure_loaded()
        return self.config.vision.projection_dim

    @property
    def input_size(self) -> int:
        self.ensure_loaded()
        return self.config.vision.image_size

    # -- int8_static calibration ---------------------------------------------

    @functools.cached_property
    def _dynamic_model(self):
        """Dynamic-scale twin used for calibration passes (same params)."""
        import jax.numpy as jnp
        from jax import lax

        from ..models.clip import CLIPModel

        dtype = jnp.float32 if self.compute_dtype == "float32" else jnp.bfloat16
        precision = (
            lax.Precision.HIGHEST if self.parity_mode else lax.Precision.DEFAULT
        )
        return CLIPModel(self.config, dtype=dtype, precision=precision,
                         w8a8=True, w8a8_static=False)

    def _static_ready(self, tower: str) -> bool:
        return (
            self.compute_dtype == "int8_static" and tower in self._act_scales
        )

    def _accumulate_cal(self, tower: str, stats_tree: Any) -> None:
        """Merge one calibration batch's act_stats (host maxima); freeze
        the tower's scales after _CAL_BATCHES batches."""
        if self._cal_paused:
            return
        import jax

        host = jax.tree.map(np.asarray, stats_tree)
        prev = self._cal_stats[tower]
        self._cal_stats[tower] = (
            host if prev is None
            else jax.tree.map(np.maximum, prev, host)
        )
        self._cal_seen[tower] += 1
        if self._cal_seen[tower] >= _CAL_BATCHES:
            self._freeze_scales(tower)

    def _freeze_scales(self, tower: str) -> None:
        from ..models.calibrate import act_stats_to_scales

        if self._cal_stats[tower] is None:
            return
        scales = act_stats_to_scales(
            self._cal_stats[tower], margin=_CAL_MARGIN
        )["act_scales"]
        # stats tree from apply(method=encode_*) is rooted at the tower
        # submodule name already ({"vision": ...} / {"text": ...})
        self._act_scales[tower] = scales[tower]
        if self.logger:
            self.logger.info(
                f"int8_static: froze {tower} activation scales after "
                f"{self._cal_seen[tower]} calibration batches"
            )
        if self.on_scales_frozen is not None:
            try:
                self.on_scales_frozen()
            except Exception:  # persistence must never break encoding
                if self.logger:
                    self.logger.exception("act-scales persistence failed")

    def calibrate(self) -> None:
        """Freeze int8_static scales NOW from whatever has been observed
        (otherwise they freeze automatically after _CAL_BATCHES batches)."""
        for tower in ("vision", "text"):
            if self._cal_seen[tower] > 0 and tower not in self._act_scales:
                self._freeze_scales(tower)

    def export_act_scales(self, path: str | Path) -> bool:
        """Persist frozen int8_static scales as JSON so a restarted server
        starts static immediately instead of re-observing _CAL_BATCHES
        batches per tower. Returns False if nothing is frozen yet."""
        import json

        if not self._act_scales:
            return False
        flat = {
            tower: {
                "/".join(str(k) for k in keypath): float(leaf)
                for keypath, leaf in _flatten_scale_tree(tree)
            }
            for tower, tree in self._act_scales.items()
        }
        payload = {"format": "ivars-act-scales-v1", "towers": flat}
        tmp = Path(str(path) + ".tmp")
        tmp.write_text(json.dumps(payload, indent=1, sort_keys=True))
        tmp.replace(path)
        return True

    def import_act_scales(self, path: str | Path) -> bool:
        """Load scales exported by :meth:`export_act_scales`; the matching
        towers start static immediately. Returns False when the file is
        missing (callers treat that as 'calibrate lazily as usual')."""
        import json

        import jax.numpy as jnp

        path = Path(path)
        if not path.is_file():
            return False
        payload = json.loads(path.read_text())
        if payload.get("format") != "ivars-act-scales-v1":
            raise ValueError(f"{path}: not an act-scales file")
        for tower, flat in payload["towers"].items():
            tree: dict[str, Any] = {}
            for joined, value in flat.items():
                node = tree
                parts = joined.split("/")
                for part in parts[:-1]:
                    node = node.setdefault(part, {})
                node[parts[-1]] = jnp.float32(value)
            self._act_scales[tower] = tree
        if self.logger:
            self.logger.info(
                f"int8_static: imported frozen activation scales for "
                f"{sorted(payload['towers'])} from {path}"
            )
        return True

    # -- jitted encoders (cached per padded signature) -----------------------

    @functools.cached_property
    def _encode_text_jit(self):
        import jax

        from ..models.clip import CLIPModel

        model = self.model

        @jax.jit
        def fn(params, tokens, eot_positions):
            out = model.apply(
                {"params": params}, tokens, eot_positions,
                method=CLIPModel.encode_text,
            ).astype("float32")
            return out / jax.numpy.maximum(
                jax.numpy.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )

        return fn

    @functools.cached_property
    def _encode_text_static_jit(self):
        import jax

        from ..models.clip import CLIPModel

        model = self.model

        @jax.jit
        def fn(params, act_scales, tokens, eot_positions):
            out = model.apply(
                {"params": params, "act_scales": act_scales},
                tokens, eot_positions, method=CLIPModel.encode_text,
            ).astype("float32")
            return out / jax.numpy.maximum(
                jax.numpy.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )

        return fn

    @functools.cached_property
    def _encode_text_cal_jit(self):
        """Dynamic-path text encode that also returns activation maxima."""
        import jax

        from ..models.clip import CLIPModel

        model = self._dynamic_model

        @jax.jit
        def fn(params, tokens, eot_positions):
            out, mut = model.apply(
                {"params": params}, tokens, eot_positions,
                method=CLIPModel.encode_text, mutable=["act_stats"],
            )
            out = out.astype("float32")
            out = out / jax.numpy.maximum(
                jax.numpy.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
            return out, mut["act_stats"]

        return fn

    @functools.cached_property
    def _encode_image_jit(self):
        """Fused preprocess + tower + normalize in ONE jit (eager dispatch
        between stages is expensive on tunneled TPU backends)."""
        import jax
        import jax.numpy as jnp

        from ..models.clip import CLIPModel
        from ..ops.preprocess import normalize_images, preprocess_images

        model = self.model
        s = self.config.vision.image_size
        dtype = jnp.float32 if self.compute_dtype == "float32" else jnp.bfloat16

        @functools.partial(jax.jit, static_argnames=("mode",))
        def fn(params, pixels, mode: str):
            if mode == "preprocessed":
                px = pixels.astype(dtype)
            elif mode == "normalize":
                px = normalize_images(pixels, dtype=dtype,
                                      use_pallas=False)
            else:  # full resize + crop + normalize
                px = preprocess_images(pixels, image_size=s, dtype=dtype,
                                       use_pallas=False)
            out = model.apply(
                {"params": params}, px, method=CLIPModel.encode_image
            ).astype("float32")
            return out / jax.numpy.maximum(
                jax.numpy.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )

        return fn

    @functools.cached_property
    def _encode_image_static_jit(self):
        import jax
        import jax.numpy as jnp

        from ..models.clip import CLIPModel
        from ..ops.preprocess import normalize_images, preprocess_images

        model = self.model
        s = self.config.vision.image_size
        dtype = jnp.float32 if self.compute_dtype == "float32" else jnp.bfloat16

        @functools.partial(jax.jit, static_argnames=("mode",))
        def fn(params, act_scales, pixels, mode: str):
            if mode == "preprocessed":
                px = pixels.astype(dtype)
            elif mode == "normalize":
                px = normalize_images(pixels, dtype=dtype, use_pallas=False)
            else:
                px = preprocess_images(pixels, image_size=s, dtype=dtype,
                                       use_pallas=False)
            out = model.apply(
                {"params": params, "act_scales": act_scales}, px,
                method=CLIPModel.encode_image,
            ).astype("float32")
            return out / jax.numpy.maximum(
                jax.numpy.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )

        return fn

    @functools.cached_property
    def _encode_image_cal_jit(self):
        """Dynamic-path image encode that also returns activation maxima."""
        import jax
        import jax.numpy as jnp

        from ..models.clip import CLIPModel
        from ..ops.preprocess import normalize_images, preprocess_images

        model = self._dynamic_model
        s = self.config.vision.image_size
        dtype = jnp.float32 if self.compute_dtype == "float32" else jnp.bfloat16

        @functools.partial(jax.jit, static_argnames=("mode",))
        def fn(params, pixels, mode: str):
            if mode == "preprocessed":
                px = pixels.astype(dtype)
            elif mode == "normalize":
                px = normalize_images(pixels, dtype=dtype, use_pallas=False)
            else:
                px = preprocess_images(pixels, image_size=s, dtype=dtype,
                                       use_pallas=False)
            out, mut = model.apply(
                {"params": params}, px,
                method=CLIPModel.encode_image, mutable=["act_stats"],
            )
            out = out.astype("float32")
            out = out / jax.numpy.maximum(
                jax.numpy.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
            return out, mut["act_stats"]

        return fn

    # -- text ---------------------------------------------------------------

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        """(B,) strings -> (B, D) L2-normalized f32 embeddings."""
        self.ensure_loaded()
        if len(texts) == 0:
            return np.zeros((0, self.config.text.projection_dim), np.float32)
        import jax.numpy as jnp

        t0 = time.perf_counter()
        tokens = self.tokenizer(list(texts), self.config.text.max_length)
        eot = self.tokenizer.eot_positions(tokens)
        b = len(texts)
        b_pad = _bucket(b)
        if b_pad != b:
            pad_tok = np.zeros((b_pad - b, tokens.shape[1]), tokens.dtype)
            pad_tok[:, 0] = self.tokenizer.sot_id
            pad_tok[:, 1] = self.tokenizer.eot_id
            tokens = np.concatenate([tokens, pad_tok])
            eot = np.concatenate([eot, np.ones(b_pad - b, eot.dtype)])
        if self.compute_dtype != "int8_static":
            out = self._encode_text_jit(
                self.params, jnp.asarray(tokens), jnp.asarray(eot)
            )
        elif self._static_ready("text"):
            out = self._encode_text_static_jit(
                self.params, {"text": self._act_scales["text"]},
                jnp.asarray(tokens), jnp.asarray(eot),
            )
        else:
            out, stats = self._encode_text_cal_jit(
                self.params, jnp.asarray(tokens), jnp.asarray(eot)
            )
            self._accumulate_cal("text", stats)
        result = np.asarray(out)[:b]
        if self.logger:
            self.logger.log_performance(
                "clip_text_encoding", time.perf_counter() - t0, batch=b
            )
        return result

    # -- images --------------------------------------------------------------

    def encode_images(
        self, images: np.ndarray, preprocessed: bool = False
    ) -> np.ndarray:
        """(B, H, W, 3) uint8 (or preprocessed floats) -> (B, D) normalized.

        Arbitrary batch size; internally chunks to ``image_batch_size`` and
        pads to buckets. H=W=input_size expected when ``preprocessed`` is
        False and sizes already match; otherwise on-device resize applies.
        """
        self.ensure_loaded()
        import jax.numpy as jnp

        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        n = len(images)
        if n == 0:
            return np.zeros((0, self.config.vision.projection_dim), np.float32)
        t0 = time.perf_counter()
        s = self.config.vision.image_size
        if preprocessed:
            mode = "preprocessed"
        elif images.shape[1] == s and images.shape[2] == s:
            mode = "normalize"
        else:
            mode = "full"
        outs = []
        for start in range(0, n, self.image_batch_size):
            chunk = images[start : start + self.image_batch_size]
            b = len(chunk)
            b_pad = _bucket(b)
            if b_pad != b:
                chunk = np.concatenate(
                    [chunk, np.zeros((b_pad - b, *chunk.shape[1:]), chunk.dtype)]
                )
            if self.compute_dtype != "int8_static":
                out = self._encode_image_jit(
                    self.params, jnp.asarray(chunk), mode
                )
            elif self._static_ready("vision"):
                out = self._encode_image_static_jit(
                    self.params, {"vision": self._act_scales["vision"]},
                    jnp.asarray(chunk), mode,
                )
            else:
                out, stats = self._encode_image_cal_jit(
                    self.params, jnp.asarray(chunk), mode
                )
                self._accumulate_cal("vision", stats)
            outs.append(np.asarray(out)[:b])
        result = np.concatenate(outs)
        if self.logger:
            self.logger.log_performance(
                "clip_image_encoding", time.perf_counter() - t0, batch=n
            )
        return result

    def encode_image_files(
        self, paths: Sequence[str | Path]
    ) -> tuple[np.ndarray, list[int]]:
        """Decode + encode image files; tolerates failures.

        Returns (embeddings, ok_indices) — parity with the reference's
        per-image validation + failure tolerance (core.py:1585-1641).
        """
        from PIL import Image

        self.ensure_loaded()
        s = self.config.vision.image_size
        pixels, ok = [], []
        for i, p in enumerate(paths):
            try:
                with Image.open(p) as img:
                    img = img.convert("RGB")
                    w, h = img.size
                    if w <= h:
                        nw, nh = s, max(s, round(h * s / w))
                    else:
                        nw, nh = max(s, round(w * s / h)), s
                    img = img.resize((nw, nh), Image.BICUBIC)
                    left, top = (nw - s) // 2, (nh - s) // 2
                    img = img.crop((left, top, left + s, top + s))
                    pixels.append(np.asarray(img, np.uint8))
                    ok.append(i)
            except Exception:
                continue
        if not pixels:
            return np.zeros((0, self.config.vision.projection_dim), np.float32), []
        return self.encode_images(np.stack(pixels)), ok

    # -- adapters ------------------------------------------------------------

    def as_embed_fn(self) -> Callable[[np.ndarray], np.ndarray]:
        """Adapter for RAGBuilder / FrameFilter (uint8 batch -> embeddings)."""
        self.ensure_loaded()
        return lambda batch: self.encode_images(batch)

    def get_stats(self) -> dict[str, Any]:
        return {
            "loaded": self._loaded,
            "pretrained": self.using_pretrained,
            "load_time_s": self.load_time_s,
            "compute_dtype": self.compute_dtype,
            "parity_mode": self.parity_mode,
            "embed_dim": self.config.vision.projection_dim if self._loaded else None,
            "act_scales_calibrated": sorted(self._act_scales.keys()),
            # "clip_bpe" or "hash_fallback" — degraded text semantics must be
            # visible in health checks, not silent (see models.tokenizer)
            "tokenizer": self.tokenizer.kind if self._loaded else None,
        }
