"""REST + WebSocket server over an EnhancedRetrievalSystem.

Replaces the reference's Flask ``RESTAPIServer`` (``api.py:2946-3178``) and
eventlet ``SocketIOServer`` (``api.py:2419-2932``) with one aiohttp app:

REST (reference route parity):
    GET  /api/health
    POST /api/search            {query, mode?, limit?, detail_level?, folder?}
    POST /api/search_batch      {queries: [..], mode?, limit?, detail_level?}
    POST /api/image_search      {image_base64, limit?, detail_level?}
    POST /api/chat              {message, context_frames?}
    POST /api/translate         {text}
    GET  /api/metadata/{folder}/{image}
    GET  /api/thumbnail/{folder}/{image}      (JPEG)
    GET  /api/image/{folder}/{image}          (JPEG)
    GET  /api/stats
    POST /api/export            {results, format}
    POST /api/build             {keyframes_dir, resume?}   (build wizard;
                                 progress via WS "build_progress" events —
                                 reference GUI smart build, gui.py:5021-5454)
    GET  /api/build/status
    POST /api/network/discover  {wait_s?}                  (peer panel —
                                 reference GUI network tab, gui.py:3248-4606)
    GET  /api/network/peers
    POST /api/network/connect   {host, port}
    POST /api/network/load_remote    {host, port, index_id}
    POST /api/network/unload_remote  {index_id?}

WebSocket at /ws: JSON messages {event, data, request_id?} with events
``search`` / ``chat`` / ``translate`` / ``system_stats`` / ``ping`` /
``image_search`` / ``metadata_query`` / ``semantic_search`` — the socketio
event surface (``api.py:2474-2551``) over plain websockets; the server also
pushes ``build_progress`` / ``build_done`` / ``build_error`` events to all
connected clients during a wizard build.

Search handlers run in a thread pool executor: device work releases the
GIL and the facade is thread-safe, so the event loop stays responsive.
"""

from __future__ import annotations

import asyncio
import base64
import io
import json
import threading
import time
from typing import TYPE_CHECKING, Any

try:
    from aiohttp import WSMsgType, web
except ImportError:  # pragma: no cover
    web = None
    WSMsgType = None

from .handlers import RateLimiter, RequestHandler, error_envelope, format_results

if TYPE_CHECKING:
    from ..system.facade import EnhancedRetrievalSystem

__all__ = ["RetrievalServer"]


def _with_ann_warm(index, action, **kwargs):
    """Run an ANN maintenance action, then pre-warm the ANN searcher
    buckets it (re)keys before returning: batch buckets 1..ann_max_batch
    (powers of two) x the common serving k values (limit 10 -> k-bucket
    16, the API default limit 20 -> 32). Otherwise the FIRST live query
    after a build/tune compiles the new program on the request path —
    the serve cold-start failure class (CLAUDE.md round 3). nprobe is a
    static compile arg too, which is why tune needs this as much as
    build."""
    import numpy as np

    report = action(**kwargs)
    if index.ann_active and index.ntotal:
        probe = np.zeros((1, index.dim), np.float32)
        probe[0, 0] = 1.0
        for top_k in (10, 20):
            b = 1
            while True:
                index.search_vectors(np.tile(probe, (b, 1)), top_k=top_k)
                if b >= max(index.config.ann_max_batch, 1):
                    break
                b *= 2
    return report


class RetrievalServer:
    def __init__(
        self,
        system: "EnhancedRetrievalSystem",
        host: str = "0.0.0.0",
        port: int = 5000,
        rate_limit_per_minute: int | None = None,
    ) -> None:
        if web is None:
            raise RuntimeError("aiohttp is required for RetrievalServer")
        self.system = system
        self.host = host
        self.port = port
        limit = rate_limit_per_minute or system.config.get(
            "api.rate_limit_per_minute", 100
        )
        self.handler = RequestHandler(RateLimiter(limit))
        self.batcher = None
        if system.config.get("api.batching", False):
            from .batching import QueryBatcher

            self.batcher = QueryBatcher(
                system,
                window_ms=float(system.config.get("api.batching_window_ms", 3.0)),
                max_batch=int(system.config.get("api.batching_max_batch", 64)),
            )
            self.batcher.start()
        self._executor = self._make_executor()
        self.app = web.Application(client_max_size=64 * 1024 * 1024)
        self._setup_routes()
        self._runner: web.AppRunner | None = None
        self._loop: asyncio.AbstractEventLoop | None = None
        self._thread: threading.Thread | None = None
        self._started = threading.Event()
        self.started_at = time.time()
        # console build wizard + network panel state (reference GUI
        # capabilities: build wizard gui.py:5021-5454, network panel
        # gui.py:3248-4606)
        self._ws_clients: set = set()
        self._build_lock = threading.Lock()
        self._build_state: dict[str, Any] = {"status": "idle"}
        self._build_thread: threading.Thread | None = None
        self._build_cb_registered = False
        self._discovery = None           # lazy serve.p2p.NetworkDiscovery
        self._net_client = None          # lazy serve.p2p.NetworkClient

    # -- routes ---------------------------------------------------------------

    def _setup_routes(self) -> None:
        app = self.app
        app.router.add_get("/api/health", self._health)
        app.router.add_post("/api/search", self._search)
        app.router.add_post("/api/search_batch", self._search_batch)
        app.router.add_post("/api/image_search", self._image_search)
        app.router.add_post("/api/chat", self._chat)
        app.router.add_post("/api/translate", self._translate)
        app.router.add_get("/api/metadata/{folder}/{image}", self._metadata)
        app.router.add_get("/api/thumbnail/{folder}/{image}", self._thumbnail)
        app.router.add_get("/api/image/{folder}/{image}", self._image)
        app.router.add_get("/api/similar/{folder}/{image}", self._similar)
        app.router.add_get("/api/stats", self._stats)
        app.router.add_post("/api/export", self._export)
        app.router.add_post("/api/build", self._build)
        app.router.add_get("/api/build/status", self._build_status)
        app.router.add_post("/api/filter", self._filter)
        app.router.add_post("/api/open", self._open)
        app.router.add_post("/api/maintenance", self._maintenance)
        app.router.add_post("/api/network/discover", self._net_discover)
        app.router.add_get("/api/network/peers", self._net_peers)
        app.router.add_post("/api/network/connect", self._net_connect)
        app.router.add_post("/api/network/load_remote", self._net_load_remote)
        app.router.add_post("/api/network/unload_remote",
                            self._net_unload_remote)
        app.router.add_get("/ws", self._websocket)
        # Socket.IO wire compatibility: reference clients (python-socketio
        # against api.py:2419-2941) connect to /socket.io/ unchanged
        from .socketio import SocketIOAdapter

        self._sio = SocketIOAdapter(self)
        self._sio.register(app)
        app.router.add_get("/", self._console)

    @staticmethod
    def _client_id(request: "web.Request") -> str:
        peer = request.remote or "unknown"
        return str(peer)

    async def _json(self, request: "web.Request") -> dict[str, Any] | None:
        try:
            data = await request.json()
            return data if isinstance(data, dict) else None
        except (json.JSONDecodeError, UnicodeDecodeError):
            return None

    def _make_executor(self):
        from concurrent.futures import ThreadPoolExecutor

        return ThreadPoolExecutor(
            max_workers=int(
                self.system.config.get("api.executor_workers", 128)
            ),
            thread_name_prefix="ivars-rest",
        )

    def _run_sync(self, fn, *args, **kwargs):
        """Run facade work off the event loop.

        Uses a dedicated wide thread pool, NOT asyncio's default executor:
        the default sizes at min(32, cpus+4) — 5 threads on a 1-core host —
        which caps concurrent blocking requests and starves the
        QueryBatcher (measured avg batch 4.9 instead of ~64 under
        64-concurrent load; requests mostly sit queued for a thread).
        Batched-search requests spend their life BLOCKED on the batcher's
        event, so many more threads than cores is correct here.
        """
        loop = asyncio.get_event_loop()
        return loop.run_in_executor(
            self._executor, lambda: fn(*args, **kwargs)
        )

    # -- REST handlers --------------------------------------------------------

    def _admin_denied(self, request: "web.Request") -> "web.Response | None":
        """Optional auth gate for the mutation surface (/api/open,
        /api/maintenance, /api/build).

        These endpoints can load arbitrary readable .rvdb paths, hold
        the index lock for minutes (compact), or burn chip-minutes of
        k-means (build_ann, off-lock) — a larger unauthenticated surface
        than search. When ``api.admin_token`` is
        configured, requests must carry it in ``X-Admin-Token`` or
        ``Authorization: Bearer``; unset keeps the reference's LAN-trust
        model (documented in docs/DEPLOYMENT.md).
        """
        token = self.system.config.get("api.admin_token")
        if not token:
            return None
        got = request.headers.get("X-Admin-Token")
        if got is None:
            auth = request.headers.get("Authorization", "")
            got = auth[7:] if auth.startswith("Bearer ") else None
        import hmac

        if got is not None and hmac.compare_digest(str(got), str(token)):
            return None
        return web.json_response(
            error_envelope("admin token required", 401), status=401
        )

    def _open_path_denied(self, path) -> "web.Response | None":
        """When ``api.open_root`` is configured, /api/open may only load
        paths under that directory (stops a LAN peer from walking the
        server's whole filesystem for readable containers)."""
        root = self.system.config.get("api.open_root")
        if not root:
            return None
        from pathlib import Path

        try:
            Path(path).resolve().relative_to(Path(root).resolve())
            return None
        except ValueError:
            return web.json_response(
                error_envelope(
                    f"path outside the configured api.open_root", 403
                ),
                status=403,
            )

    def _degraded_note(self) -> str | None:
        """One-line warning when text search runs with degraded semantics
        (hash-fallback tokenizer and/or random-init weights). Attached to
        search responses so a deployment can never serve semantically-
        garbage text search behind a green envelope (VERDICT r3 #4)."""
        emb = getattr(self.system, "embedder", None)
        if emb is None or not getattr(emb, "_loaded", False):
            return None
        notes = []
        if getattr(emb.tokenizer, "kind", None) == "hash_fallback":
            notes.append(
                "hash-fallback tokenizer (no CLIP vocab files) — text "
                "semantics do not match real CLIP; set model.vocab_dir"
            )
        if not emb.using_pretrained:
            notes.append(
                "random-initialized towers (no checkpoint at model.path)"
            )
        return "; ".join(notes) if notes else None

    async def _health(self, request: "web.Request") -> "web.Response":
        report = await self._run_sync(
            self.system.health.comprehensive_health_check
        )
        emb_stats = self.system.embedder.get_stats()
        return web.json_response(
            {
                "success": True,
                "status": report["overall"],
                "uptime_s": round(time.time() - self.started_at, 1),
                "index_loaded": self.system.index is not None
                and self.system.index.is_loaded,
                # first-class degradation fields (machine-checkable without
                # parsing component details): tokenizer kind + weight
                # provenance (None until the embedder lazily loads)
                "tokenizer_kind": emb_stats.get("tokenizer"),
                "weights": (
                    None if not emb_stats.get("loaded")
                    else ("pretrained" if emb_stats.get("pretrained")
                          else "random_init")
                ),
                # per-component status so degraded states (hash-fallback
                # tokenizer, int8_static calibration in progress, ...) are
                # visible to operators, not just a bare "warning"
                "components": {
                    name: {
                        "status": comp.get("status"),
                        "detail": comp.get("detail")
                        if isinstance(comp.get("detail"), (str, list))
                        else "ok",
                    }
                    for name, comp in report.get("components", {}).items()
                },
            }
        )

    async def _search(self, request: "web.Request") -> "web.Response":
        payload = await self._json(request)
        if payload is None:
            return web.json_response(error_envelope("invalid JSON body"), status=400)
        ok, err = self.handler.validate_request(
            "search", payload, self._client_id(request)
        )
        if not ok:
            status = 429 if err == "rate limit exceeded" else 400
            return web.json_response(error_envelope(err, status), status=status)

        from ..system.facade import SearchOptions

        options = SearchOptions(
            mode=payload.get("mode", "clip_only"),
            limit=payload.get("limit", 20),
            folder_filter=payload.get("folder"),
            include_temporal=payload.get("include_temporal", False),
        )
        t0 = time.perf_counter()
        # micro-batched fast path for plain clip_only queries under load
        try:
            if (
                self.batcher is not None
                and self.batcher.is_running
                and options.mode == "clip_only"
                and not options.folder_filter
                and not options.include_temporal
            ):
                results = await self._run_sync(
                    self.batcher.search, payload["query"], options.limit
                )
            else:
                results = await self._run_sync(
                    self.system.search, payload["query"], options
                )
        except Exception as exc:
            # a failed batch (e.g. the index being swapped mid-flight by
            # /api/open) must answer with a JSON envelope, not a raw 500
            return web.json_response(
                error_envelope(f"search unavailable: {exc}", 503), status=503
            )
        body = {
            "success": True,
            "query": payload["query"],
            "count": len(results),
            "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
            "results": format_results(
                results, payload.get("detail_level", "standard")
            ),
        }
        note = self._degraded_note()
        if note:
            body["warning"] = note
        return web.json_response(body)

    async def _search_batch(self, request: "web.Request") -> "web.Response":
        """Explicit client-side batch: ONE tower forward + ONE sweep for all
        queries (facade.search_batch); per-query result lists in order."""
        payload = await self._json(request)
        if payload is None:
            return web.json_response(error_envelope("invalid JSON body"), status=400)
        ok, err = self.handler.validate_request(
            "search_batch", payload, self._client_id(request)
        )
        if not ok:
            status = 429 if err == "rate limit exceeded" else 400
            return web.json_response(error_envelope(err, status), status=status)
        queries = payload["queries"]
        if not all(isinstance(q, str) for q in queries):
            return web.json_response(
                error_envelope("queries must be a list of strings"), status=400
            )
        if len(queries) > 256:
            return web.json_response(
                error_envelope("at most 256 queries per batch"), status=400
            )

        from ..system.facade import SearchOptions

        options = SearchOptions(
            mode=payload.get("mode", "clip_only"),
            limit=payload.get("limit", 20),
            folder_filter=payload.get("folder"),
        )
        t0 = time.perf_counter()
        batches = await self._run_sync(self.system.search_batch, queries, options)
        detail = payload.get("detail_level", "standard")
        body = {
            "success": True,
            "count": sum(len(b) for b in batches),
            "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
            "results": [format_results(b, detail) for b in batches],
        }
        note = self._degraded_note()
        if note:
            body["warning"] = note
        return web.json_response(body)

    async def _image_search(self, request: "web.Request") -> "web.Response":
        payload = await self._json(request)
        if payload is None:
            return web.json_response(error_envelope("invalid JSON body"), status=400)
        ok, err = self.handler.validate_request(
            "image_search", payload, self._client_id(request)
        )
        if not ok:
            status = 429 if err == "rate limit exceeded" else 400
            return web.json_response(error_envelope(err, status), status=status)
        try:
            raw = base64.b64decode(payload["image_base64"])
            import numpy as np
            from PIL import Image

            img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        except Exception:
            return web.json_response(
                error_envelope("image_base64 is not a decodable image"), status=400
            )
        from ..system.facade import SearchOptions

        options = SearchOptions(limit=payload.get("limit", 20))
        results = await self._run_sync(self.system.search_by_image, img, options)
        return web.json_response(
            {
                "success": True,
                "count": len(results),
                "results": format_results(
                    results, payload.get("detail_level", "standard")
                ),
            }
        )

    async def _chat(self, request: "web.Request") -> "web.Response":
        payload = await self._json(request)
        if payload is None:
            return web.json_response(error_envelope("invalid JSON body"), status=400)
        ok, err = self.handler.validate_request(
            "chat", payload, self._client_id(request)
        )
        if not ok:
            status = 429 if err == "rate limit exceeded" else 400
            return web.json_response(error_envelope(err, status), status=status)
        out = await self._run_sync(
            self.system.chat, payload["message"], payload.get("context_frames")
        )
        return web.json_response({"success": True, **out})

    async def _translate(self, request: "web.Request") -> "web.Response":
        payload = await self._json(request)
        if payload is None:
            return web.json_response(error_envelope("invalid JSON body"), status=400)
        ok, err = self.handler.validate_request(
            "translate", payload, self._client_id(request)
        )
        if not ok:
            status = 429 if err == "rate limit exceeded" else 400
            return web.json_response(error_envelope(err, status), status=status)
        result = await self._run_sync(
            self.system.translator.translate_query, payload["text"]
        )
        return web.json_response({"success": True, **result.to_dict()})

    async def _metadata(self, request: "web.Request") -> "web.Response":
        folder = request.match_info["folder"]
        image = request.match_info["image"]
        index = self.system.index
        if index is None:
            return web.json_response(error_envelope("no index loaded", 404), status=404)
        row = index.row_for(folder, image)
        if row is None:
            return web.json_response(
                error_envelope(f"unknown keyframe {folder}/{image}", 404), status=404
            )
        return web.json_response(
            {"success": True, "metadata": index.get_metadata(row).to_dict()}
        )

    async def _thumbnail(self, request: "web.Request") -> "web.Response":
        return await self._asset(request, full=False)

    async def _image(self, request: "web.Request") -> "web.Response":
        return await self._asset(request, full=True)

    async def _asset(self, request: "web.Request", full: bool) -> "web.Response":
        folder = request.match_info["folder"]
        image = request.match_info["image"]
        index = self.system.index
        if index is None:
            return web.json_response(error_envelope("no index loaded", 404), status=404)
        try:
            data = await self._run_sync(
                index.get_full_image if full else index.get_thumbnail, folder, image
            )
        except KeyError:
            return web.json_response(
                error_envelope(f"unknown keyframe {folder}/{image}", 404), status=404
            )
        if not data:
            return web.json_response(error_envelope("asset unavailable", 404),
                                     status=404)
        return web.Response(body=data, content_type="image/jpeg")

    async def _similar(self, request: "web.Request") -> "web.Response":
        """Frames similar to an indexed keyframe (search_by_row)."""
        folder = request.match_info["folder"]
        image = request.match_info["image"]
        index = self.system.index
        if index is None:
            return web.json_response(error_envelope("no index loaded", 404), status=404)
        row = index.row_for(folder, image)
        if row is None:
            return web.json_response(
                error_envelope(f"unknown keyframe {folder}/{image}", 404), status=404
            )
        try:
            limit = min(int(request.query.get("limit", 10)), 100)
        except ValueError:
            limit = 10
        hits = await self._run_sync(index.search_by_row, row, limit)
        return web.json_response(
            {
                "success": True,
                "count": len(hits),
                "results": [h.to_dict("standard") for h in hits],
            }
        )

    async def _stats(self, request: "web.Request") -> "web.Response":
        stats = await self._run_sync(self.system.get_system_stats)
        return web.json_response({"success": True, "stats": stats}, dumps=_dumps)

    async def _export(self, request: "web.Request") -> "web.Response":
        payload = await self._json(request)
        if payload is None or "results" not in payload:
            return web.json_response(
                error_envelope("body must include results"), status=400
            )
        fmt = payload.get("format", "json")
        if fmt not in ("json", "csv"):
            return web.json_response(
                error_envelope(f"unsupported export format {fmt}"), status=400
            )
        import tempfile
        from pathlib import Path

        with tempfile.TemporaryDirectory() as td:
            out = Path(td) / f"export.{fmt}"
            await self._run_sync(self.system.export_data, payload["results"], out, fmt)
            body = out.read_bytes()
        ctype = "application/json" if fmt == "json" else "text/csv"
        return web.Response(body=body, content_type=ctype)

    async def _open(self, request: "web.Request") -> "web.Response":
        """Open an existing index with smart autodetect (the reference GUI's
        open/smart-load, ``gui.py:5686-5818``): accepts a portable package
        dir (``manifest.json``), a ``.rvdb`` file, or a directory that is
        scanned (non-recursively, plus its ``index/`` subdir) for the
        newest ``.rvdb``. Same host-trust level as ``/api/build``."""
        denied = self._admin_denied(request)
        if denied is not None:
            return denied
        payload = await self._json(request)
        if payload is None or not payload.get("path"):
            return web.json_response(error_envelope("missing 'path'"), status=400)
        from pathlib import Path

        path = Path(str(payload["path"])).expanduser()
        denied = self._open_path_denied(path)
        if denied is not None:
            return denied
        writable = bool(payload.get("writable", False))

        def do_open() -> str:
            if path.is_dir() and (path / "manifest.json").is_file():
                self.system.load_portable_index(path)
                return "portable"
            if path.is_file() and path.suffix == ".rvdb":
                self.system.load_system(path, writable=writable)
                return "rvdb"
            if path.is_dir():
                candidates = [
                    p for pat in ("*.rvdb", "index/*.rvdb")
                    for p in path.glob(pat)
                ]
                if candidates:
                    newest = max(candidates, key=lambda p: p.stat().st_mtime)
                    self.system.load_system(newest, writable=writable)
                    return f"rvdb:{newest.name}"
            raise FileNotFoundError(f"no index found at {path}")

        try:
            kind = await self._run_sync(do_open)
        except FileNotFoundError as exc:
            return web.json_response(error_envelope(str(exc), 404), status=404)
        except Exception as exc:
            return web.json_response(
                error_envelope(f"{type(exc).__name__}: {exc}", 500), status=500
            )
        index = self.system.index
        return web.json_response({
            "success": True,
            "kind": kind,
            "ntotal": index.ntotal if index is not None else 0,
            "path": str(index.path) if index is not None and index.path
            else str(path),
        })

    async def _maintenance(self, request: "web.Request") -> "web.Response":
        """Maintenance actions (reference GUI maintenance menu ->
        ``system.py:1121-1213``): ``optimize`` (temp + cache trim),
        ``compact`` (physically drop tombstoned rows), ``clear_cache``."""
        denied = self._admin_denied(request)
        if denied is not None:
            return denied
        payload = await self._json(request) or {}
        action = payload.get("action")
        try:
            if action == "optimize":
                report = await self._run_sync(self.system.optimize)
            elif action == "compact":
                index = self.system.index
                if index is None:
                    return web.json_response(
                        error_envelope("no index loaded", 404), status=404
                    )
                report = await self._run_sync(index.compact)
            elif action == "clear_cache":
                await self._run_sync(self.system.cache.clear)
                report = {"cleared": True}
            elif action == "build_ann":
                # build/rebuild the IVF latency structure (ops.ann) on a
                # live server; persists in the container when writable.
                # The k-means runs OFF the index lock (snapshot → build →
                # generation-checked install), so searches keep serving;
                # only compact still wants a maintenance window.
                index = self.system.index
                if index is None:
                    return web.json_response(
                        error_envelope("no index loaded", 404), status=404
                    )
                kwargs = {}
                if payload.get("nlist"):
                    kwargs["nlist"] = int(payload["nlist"])

                report = await self._run_sync(
                    lambda: _with_ann_warm(index, index.build_ann, **kwargs)
                )
            elif action == "tune_ann":
                # auto-pick the smallest nprobe reaching a target recall
                # (sampled corpus queries vs the exact dense sweep)
                index = self.system.index
                if index is None:
                    return web.json_response(
                        error_envelope("no index loaded", 404), status=404
                    )
                kwargs = {}
                if payload.get("target_recall"):
                    kwargs["target_recall"] = float(payload["target_recall"])
                if payload.get("sample"):
                    kwargs["sample"] = int(payload["sample"])
                try:
                    report = await self._run_sync(
                        lambda: _with_ann_warm(
                            index, index.tune_nprobe, **kwargs
                        )
                    )
                except RuntimeError as exc:
                    # precondition (no ANN structure yet), not a server
                    # fault: 409 with the actionable message
                    return web.json_response(
                        error_envelope(str(exc), 409), status=409
                    )
            elif action == "measure_crossover":
                # measure the IVF/dense crossover batch size on THIS
                # corpus and install+persist it as ann_max_batch — the
                # search path's IVF/dense routing threshold stops being
                # a compiled-in guess (index.measure_ann_crossover)
                index = self.system.index
                if index is None:
                    return web.json_response(
                        error_envelope("no index loaded", 404), status=404
                    )
                kwargs = {}
                if payload.get("batch_sizes"):
                    try:
                        sizes = tuple(
                            int(b) for b in payload["batch_sizes"]
                        )
                    except (TypeError, ValueError):
                        sizes = ()
                    # bound the ladder: a hostile/typo'd payload must not
                    # compile giant programs or raise outside the handler
                    if (not sizes or len(sizes) > 12
                            or any(b < 1 or b > 1024 for b in sizes)):
                        return web.json_response(
                            error_envelope(
                                "batch_sizes must be 1-12 ints in 1..1024"
                            ),
                            status=400,
                        )
                    kwargs["batch_sizes"] = sizes
                if payload.get("repeats"):
                    reps = int(payload["repeats"])
                    if reps < 1 or reps > 16:
                        return web.json_response(
                            error_envelope("repeats must be in 1..16"),
                            status=400,
                        )
                    kwargs["repeats"] = reps
                try:
                    # warm-wrapped like build_ann/tune_ann: a measured
                    # crossover above the old cap routes new batch sizes
                    # to the IVF program — compile them here, not on the
                    # first live micro-batch (found by review, round 5)
                    report = await self._run_sync(
                        lambda: _with_ann_warm(
                            index, index.measure_ann_crossover, **kwargs
                        )
                    )
                except RuntimeError as exc:
                    return web.json_response(
                        error_envelope(str(exc), 409), status=409
                    )
            else:
                return web.json_response(
                    error_envelope(
                        "action must be optimize | compact | clear_cache"
                        " | build_ann | tune_ann | measure_crossover"
                    ),
                    status=400,
                )
        except PermissionError as exc:
            return web.json_response(error_envelope(str(exc), 403), status=403)
        except Exception as exc:
            return web.json_response(
                error_envelope(f"{type(exc).__name__}: {exc}", 500), status=500
            )
        return web.json_response(
            {"success": True, "action": action, "report": report}
        )

    async def _console(self, request: "web.Request") -> "web.Response":
        return web.Response(text=_CONSOLE_HTML, content_type="text/html")

    # -- build wizard (reference GUI smart build, gui.py:5021-5454) ------------

    def _broadcast(self, payload: dict[str, Any]) -> None:
        """Thread-safe push of an event to every live WS client."""
        loop = self._loop
        if loop is None or loop.is_closed():
            return

        def _send() -> None:
            for ws in list(self._ws_clients):
                if not ws.closed:
                    asyncio.ensure_future(ws.send_json(payload, dumps=_dumps))
            sio = getattr(self, "_sio", None)
            if sio is not None:  # same events over the socket.io wire
                sio.broadcast(payload.get("event", "message"), payload)

        loop.call_soon_threadsafe(_send)

    def _on_build_progress(self, **payload: Any) -> None:
        self._build_state.update(
            status="running", **{k: v for k, v in payload.items()}
        )
        self._broadcast({"event": "build_progress", **payload})

    def _build_worker(self, keyframes_dir: str, resume: bool) -> None:
        try:
            out = self.system.build_system(keyframes_dir, resume=resume)
            report = out.get("report", {})
            self._build_state.update(
                status="done",
                index_path=out.get("index_path"),
                processed=report.get("processed"),
                skipped=report.get("skipped_resume"),
                failed=report.get("failed"),
            )
            self._broadcast({"event": "build_done", **{
                k: self._build_state.get(k)
                for k in ("processed", "skipped", "failed", "index_path")
            }})
        except Exception as exc:
            self._build_state.update(status="error", error=str(exc))
            self._broadcast({"event": "build_error", "error": str(exc)})

    async def _build(self, request: "web.Request") -> "web.Response":
        denied = self._admin_denied(request)
        if denied is not None:
            return denied
        data = await self._json(request) or {}
        keyframes_dir = data.get("keyframes_dir")
        if not keyframes_dir or not isinstance(keyframes_dir, str):
            return web.json_response(
                error_envelope("keyframes_dir required"), status=400
            )
        from pathlib import Path

        if not Path(keyframes_dir).is_dir():
            return web.json_response(
                error_envelope(f"not a directory: {keyframes_dir}"), status=400
            )
        with self._build_lock:
            if self._build_state.get("status") == "running":
                return web.json_response(
                    error_envelope("a build is already running"), status=409
                )
            if not self._build_cb_registered:
                self.system.on("build_progress", self._on_build_progress)
                self._build_cb_registered = True
            self._build_state = {
                "status": "running", "keyframes_dir": keyframes_dir,
                "started_at": time.time(),
            }
            self._build_thread = threading.Thread(
                target=self._build_worker,
                args=(keyframes_dir, bool(data.get("resume", True))),
                daemon=True,
            )
            self._build_thread.start()
        return web.json_response({"success": True, "status": "running"})

    async def _build_status(self, request: "web.Request") -> "web.Response":
        return web.json_response({"success": True, **self._build_state})

    # -- filter-tool launcher (reference GUI gui.py:4967-5019) ----------------

    def _filter_worker(self, action: str, params: dict[str, Any]) -> None:
        from pathlib import Path

        from ..ingest import FrameFilter, FrameFilterConfig

        try:
            if action == "extract":
                exts = {".mp4", ".avi", ".mkv", ".mov", ".webm"}
                src = Path(params["input_dir"])
                videos = sorted(
                    p for p in src.iterdir()
                    if p.suffix.lower() in exts and p.is_file()
                )
                if not videos:
                    raise ValueError(f"no video files in {src}")
                kf = Path(params.get("keyframes_dir") or src / "keyframes")
                mp = Path(params.get("map_dir") or src / "map")
                ff = FrameFilter()
                saved = 0
                for i, v in enumerate(videos):
                    self._build_state.update(stage=f"extract {v.name}",
                                             done=i, total=len(videos))
                    self._broadcast({"event": "filter_progress",
                                     "stage": v.name, "done": i,
                                     "total": len(videos)})
                    rep = ff.extract_frames(v, kf, map_dir=mp)
                    saved += rep.frames_kept
                report = {"videos": len(videos), "frames_kept": saved,
                          "keyframes_dir": str(kf), "map_dir": str(mp)}
            else:  # refine
                preset = params.get("preset") or "default"
                if preset == "gentle":
                    cfg = FrameFilterConfig.gentle()
                elif preset == "ultra_gentle":
                    cfg = FrameFilterConfig.ultra_gentle()
                elif preset == "similarity_only":
                    cfg = FrameFilterConfig.similarity_only()
                else:
                    cfg = FrameFilterConfig()
                self._build_state.update(stage="refine", done=0, total=1)
                self._broadcast({"event": "filter_progress",
                                 "stage": "refine", "done": 0, "total": 1})
                rep = FrameFilter(cfg).apply_filters(
                    params["input_dir"],
                    output_dir=params.get("output_dir"),
                    map_dir=params.get("map_dir"),
                    output_map_dir=params.get("output_map_dir"),
                )
                report = rep.as_dict()
                report.pop("per_folder", None)
            self._build_state.update(status="done", job="filter", **report)
            self._broadcast({"event": "filter_done", **report})
        except Exception as exc:
            self._build_state.update(status="error", job="filter",
                                     error=str(exc))
            self._broadcast({"event": "filter_error", "error": str(exc)})

    async def _filter(self, request: "web.Request") -> "web.Response":
        """Launch the ingest filter tool on a server-side directory
        (reference GUI's filter launcher, ``gui.py:4967-5019``):
        ``action="extract"`` runs video -> keyframes + map CSVs over every
        video file in ``input_dir``; ``action="refine"`` runs the quality/
        dedup refinement (presets: default/gentle/ultra_gentle/
        similarity_only). Progress via WS ``filter_progress`` events;
        shares the build wizard's one-job-at-a-time mutex and admin gate.
        """
        denied = self._admin_denied(request)
        if denied is not None:
            return denied
        data = await self._json(request) or {}
        action = data.get("action", "extract")
        if action not in ("extract", "refine"):
            return web.json_response(
                error_envelope(f"unknown filter action: {action}"), status=400
            )
        input_dir = data.get("input_dir")
        from pathlib import Path

        if not input_dir or not Path(str(input_dir)).is_dir():
            return web.json_response(
                error_envelope(f"input_dir must be an existing directory"),
                status=400,
            )
        with self._build_lock:
            if self._build_state.get("status") == "running":
                return web.json_response(
                    error_envelope("a build/filter job is already running"),
                    status=409,
                )
            self._build_state = {
                "status": "running", "job": "filter", "action": action,
                "input_dir": str(input_dir), "started_at": time.time(),
            }
            self._build_thread = threading.Thread(
                target=self._filter_worker, args=(action, dict(data)),
                daemon=True,
            )
            self._build_thread.start()
        return web.json_response({"success": True, "status": "running"})

    # -- network panel (reference GUI network tab, gui.py:3248-4606) -----------

    def _get_net_client(self):
        if self._net_client is None:
            from .p2p import NetworkClient

            self._net_client = NetworkClient()
        return self._net_client

    async def _net_discover(self, request: "web.Request") -> "web.Response":
        data = await self._json(request) or {}
        try:
            wait_s = float(data.get("wait_s", 2.0))
        except (TypeError, ValueError):
            return web.json_response(
                error_envelope("wait_s must be a number"), status=400
            )
        # peers announce every 15 s, so allow waiting one full period
        wait_s = min(max(wait_s, 0.0), 20.0)
        if self._discovery is None:
            from .p2p import NetworkDiscovery

            # listen_only: this console serves no p2p endpoints, so it must
            # observe announcements, not make them (announcing the REST
            # port would invite peers to connect to /api/node/info -> 404).
            # Nodes accumulate in the background across discover clicks.
            self._discovery = NetworkDiscovery(
                service_port=self.port, listen_only=True
            )
            self._discovery.start_discovery()
        disc = self._discovery

        def probe():
            time.sleep(wait_s)
            return disc.get_nodes()

        nodes = await self._run_sync(probe)
        return web.json_response({"success": True, "nodes": nodes})

    async def _net_peers(self, request: "web.Request") -> "web.Response":
        nodes = self._discovery.get_nodes() if self._discovery else []
        connected = (
            list(self._net_client.connected.values())
            if self._net_client else []
        )
        remotes = [
            {"index_id": r.index_id, "base": r.base, "ntotal": r.ntotal}
            for r in self.system.remote_indexes
        ]
        return web.json_response({
            "success": True, "discovered": nodes, "connected": connected,
            "remote_indexes": remotes,
        })

    async def _net_connect(self, request: "web.Request") -> "web.Response":
        data = await self._json(request) or {}
        host, port = data.get("host"), data.get("port")
        if not host or not isinstance(port, int):
            return web.json_response(
                error_envelope("host (str) and port (int) required"),
                status=400,
            )
        client = self._get_net_client()
        try:
            info = await self._run_sync(client.connect_to_server, host, port)
            indexes = await self._run_sync(
                client.list_remote_indexes, host, port
            )
        except Exception as exc:
            return web.json_response(
                error_envelope(f"connect failed: {exc}"), status=502
            )
        return web.json_response(
            {"success": True, "node": info, "indexes": indexes}
        )

    async def _net_load_remote(self, request: "web.Request") -> "web.Response":
        data = await self._json(request) or {}
        host, port = data.get("host"), data.get("port")
        index_id = data.get("index_id")
        if not host or not isinstance(port, int) or not index_id:
            return web.json_response(
                error_envelope("host, port, index_id required"), status=400
            )
        base = f"http://{host}:{port}"
        for r in self.system.remote_indexes:
            if r.base == base and r.index_id == index_id:
                return web.json_response(
                    {"success": True, "already_loaded": True,
                     "ntotal": r.ntotal}
                )
        client = self._get_net_client()
        try:
            remote = await self._run_sync(
                client.load_remote_index, host, port, index_id
            )
        except Exception as exc:
            return web.json_response(
                error_envelope(f"load failed: {exc}"), status=502
            )
        self.system.remote_indexes.append(remote)
        return web.json_response(
            {"success": True, "index_id": index_id, "ntotal": remote.ntotal}
        )

    async def _net_unload_remote(self, request: "web.Request") -> "web.Response":
        data = await self._json(request) or {}
        index_id = data.get("index_id")
        before = len(self.system.remote_indexes)
        if index_id:
            self.system.remote_indexes[:] = [
                r for r in self.system.remote_indexes
                if r.index_id != index_id
            ]
        else:
            self.system.remote_indexes.clear()
        return web.json_response(
            {"success": True,
             "removed": before - len(self.system.remote_indexes)}
        )

    # -- websocket (socketio event surface) -----------------------------------

    async def _websocket(self, request: "web.Request"):
        ws = web.WebSocketResponse(heartbeat=30)
        await ws.prepare(request)
        client = self._client_id(request)
        self._ws_clients.add(ws)
        try:
            await self._ws_loop(ws, client)
        finally:
            self._ws_clients.discard(ws)
        return ws

    async def _ws_loop(self, ws, client: str) -> None:
        async for msg in ws:
            if msg.type != WSMsgType.TEXT:
                continue
            try:
                envelope = json.loads(msg.data)
                event = envelope.get("event")
                data = envelope.get("data") or {}
                request_id = envelope.get("request_id")
            except (json.JSONDecodeError, AttributeError):
                await ws.send_json(error_envelope("invalid message"))
                continue
            reply = await self._dispatch_ws(event, data, client)
            if request_id is not None:
                reply["request_id"] = request_id
            await ws.send_json(reply, dumps=_dumps)

    async def _dispatch_ws(
        self, event: str, data: dict[str, Any], client: str
    ) -> dict[str, Any]:
        from ..system.facade import SearchOptions

        if event == "ping":
            return {"event": "pong", "ts": time.time()}
        if event == "search":
            ok, err = self.handler.validate_request("search", data, client)
            if not ok:
                return {"event": "error", **error_envelope(err)}
            options = SearchOptions(
                mode=data.get("mode", "clip_only"), limit=data.get("limit", 20)
            )
            results = await self._run_sync(self.system.search, data["query"], options)
            return {
                "event": "result",
                "success": True,
                "count": len(results),
                "results": format_results(results, data.get("detail_level",
                                                            "standard")),
            }
        if event == "chat":
            ok, err = self.handler.validate_request("chat", data, client)
            if not ok:
                return {"event": "error", **error_envelope(err)}
            out = await self._run_sync(
                self.system.chat, data["message"], data.get("context_frames")
            )
            return {"event": "chat_response", "success": True, **out}
        if event == "translate":
            ok, err = self.handler.validate_request("translate", data, client)
            if not ok:
                return {"event": "error", **error_envelope(err)}
            result = await self._run_sync(
                self.system.translator.translate_query, data["text"]
            )
            return {"event": "translated_text", "success": True, **result.to_dict()}
        if event == "system_stats":
            stats = await self._run_sync(self.system.get_system_stats)
            return {"event": "system_stats", "success": True, "stats": stats}
        if event == "image_search":
            ok, err = self.handler.validate_request("image_search", data, client)
            if not ok:
                return {"event": "error", **error_envelope(err)}
            try:
                import numpy as np
                from PIL import Image

                raw = base64.b64decode(data["image_base64"])
                img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
            except Exception:
                return {"event": "error",
                        **error_envelope("image_base64 not decodable")}
            options = SearchOptions(limit=data.get("limit", 20))
            results = await self._run_sync(
                self.system.search_by_image, img, options
            )
            return {
                "event": "result",
                "success": True,
                "count": len(results),
                "results": format_results(results, data.get("detail_level",
                                                            "standard")),
            }
        if event == "metadata_query":
            ok, err = self.handler.validate_request("metadata", data, client)
            if not ok:
                return {"event": "error", **error_envelope(err)}
            index = self.system.index
            row = (
                index.row_for(data["folder"], data["image"])
                if index is not None else None
            )
            if row is None:
                return {"event": "error",
                        **error_envelope("unknown keyframe", 404)}
            return {
                "event": "metadata",
                "success": True,
                "metadata": index.get_metadata(row).to_dict(),
            }
        if event == "semantic_search":
            # reference alias: semantic search == llm_enhanced text search
            ok, err = self.handler.validate_request("search", data, client)
            if not ok:
                return {"event": "error", **error_envelope(err)}
            options = SearchOptions(mode="llm_enhanced",
                                    limit=data.get("limit", 20))
            results = await self._run_sync(self.system.search, data["query"],
                                           options)
            return {
                "event": "result",
                "success": True,
                "count": len(results),
                "results": format_results(results, data.get("detail_level",
                                                            "standard")),
            }
        return {"event": "error", **error_envelope(f"unknown event: {event}")}

    # -- lifecycle -------------------------------------------------------------

    def run(self, block: bool = True) -> None:
        """Start serving; non-blocking mode runs the loop in a thread."""
        if getattr(self._executor, "_shutdown", False):
            # restarting after stop(): fresh executor AND a fresh aiohttp
            # Application (aiohttp freezes an app to the loop it first ran
            # on; re-running the old one fails in runner.setup)
            self._executor = self._make_executor()
            self.app = web.Application(client_max_size=64 * 1024 * 1024)
            self._setup_routes()
        if self.batcher is not None and not self.batcher.is_running:
            self.batcher.start()
        self._started.clear()
        if block:
            asyncio.run(self._serve_forever())
        else:
            self._thread = threading.Thread(target=self._thread_main, daemon=True)
            self._thread.start()
            if not self._started.wait(timeout=10):
                raise RuntimeError("server failed to start within 10s")

    def _thread_main(self) -> None:
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        self._loop.run_until_complete(self._start())
        self._started.set()
        try:
            self._loop.run_forever()
        finally:
            self._loop.run_until_complete(self._shutdown())
            self._loop.close()

    async def _start(self) -> None:
        self._loop = asyncio.get_running_loop()  # for thread-safe broadcasts
        self._runner = web.AppRunner(self.app)
        await self._runner.setup()
        site = web.TCPSite(self._runner, self.host, self.port)
        await site.start()

    async def _serve_forever(self) -> None:
        await self._start()
        self._started.set()
        while True:  # pragma: no cover
            await asyncio.sleep(3600)

    async def _shutdown(self) -> None:
        if self._runner is not None:
            await self._runner.cleanup()
            self._runner = None

    def stop(self) -> None:
        if self.batcher is not None:
            self.batcher.stop()
        if self._loop is not None and self._loop.is_running():
            self._loop.call_soon_threadsafe(self._loop.stop)
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        self._executor.shutdown(wait=False, cancel_futures=True)


def _dumps(obj: Any) -> str:
    return json.dumps(obj, ensure_ascii=False, default=str)


_CONSOLE_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>IVARS-TPU Console</title>
<style>
 :root{--fg:#1a1a2e;--mut:#777;--acc:#3452c4;--bg:#f7f8fb;--card:#fff}
 body{font-family:system-ui;margin:0;background:var(--bg);color:var(--fg)}
 header{background:var(--card);padding:.8rem 1.5rem;border-bottom:1px solid #e3e6ef;
        display:flex;gap:1.5rem;align-items:center}
 header h1{font-size:1.05rem;margin:0}
 nav button{border:0;background:none;padding:.45rem .9rem;cursor:pointer;
            border-radius:6px;font-size:.95rem;color:var(--mut)}
 nav button.on{background:var(--acc);color:#fff}
 main{max-width:1040px;margin:1.2rem auto;padding:0 1rem}
 .panel{display:none}.panel.on{display:block}
 .row{display:flex;gap:.6rem;margin-bottom:1rem}
 input[type=text]{flex:1;padding:.55rem .8rem;border:1px solid #ccd2e0;
        border-radius:8px;font-size:1rem}
 select{padding:.45rem;border-radius:8px;border:1px solid #ccd2e0}
 button.go{background:var(--acc);color:#fff;border:0;border-radius:8px;
           padding:.55rem 1.2rem;cursor:pointer}
 .meta{color:var(--mut);font-size:.85rem;margin:.3rem 0 .8rem}
 .grid{display:grid;grid-template-columns:repeat(auto-fill,minmax(170px,1fr));gap:.8rem}
 .hit{background:var(--card);border-radius:10px;padding:.5rem;text-align:center;
      font-size:.78rem;box-shadow:0 1px 3px rgba(20,30,60,.08)}
 .hit img{width:100%;border-radius:6px;aspect-ratio:1;object-fit:cover}
 .hit .s{color:var(--acc);font-weight:600}
 #chatlog{background:var(--card);border-radius:10px;padding:1rem;min-height:220px;
          max-height:420px;overflow:auto;margin-bottom:.8rem}
 .msg{margin:.4rem 0;padding:.5rem .8rem;border-radius:10px;max-width:85%}
 .me{background:var(--acc);color:#fff;margin-left:auto;width:fit-content}
 .bot{background:#eef0f7;width:fit-content}
 pre{background:var(--card);border-radius:10px;padding:1rem;overflow:auto;
     font-size:.8rem}
</style></head>
<body>
<header><h1>IVARS-TPU</h1>
<nav>
 <button class="on" data-p="search">Search</button>
 <button data-p="image">Image search</button>
 <button data-p="chat">Chat</button>
 <button data-p="build">Build</button>
 <button data-p="staging">CSV list (<span id="stagecount">0</span>)</button>
 <button data-p="network">Network</button>
 <button data-p="stats">Stats</button>
</nav></header>
<main>
<section id="search" class="panel on">
 <div class="row"><input id="q" type="text" placeholder="a red car at night… / người đang chạy…">
 <select id="mode"><option>clip_only</option><option>hybrid</option>
 <option>llm_enhanced</option></select>
 <button class="go" onclick="doSearch()">Search</button></div>
 <div class="meta" id="smeta"></div><div class="grid" id="sout"></div>
</section>
<section id="image" class="panel">
 <div class="row"><input type="file" id="file" accept="image/*">
 <button class="go" onclick="doImage()">Find similar</button></div>
 <div class="meta" id="imeta"></div><div class="grid" id="iout"></div>
</section>
<section id="chat" class="panel">
 <div id="chatlog"></div>
 <div class="row"><input id="cmsg" type="text" placeholder="ask about the videos…">
 <button class="go" onclick="doChat()">Send</button></div>
</section>
<section id="build" class="panel">
 <div class="row"><input id="bdir" type="text" placeholder="/path/to/keyframes">
 <label><input id="bresume" type="checkbox" checked> resume</label>
 <button class="go" onclick="doBuild()">Build index</button></div>
 <div class="meta" id="bmeta">idle</div>
 <div style="background:#e3e6ef;border-radius:6px;height:10px;overflow:hidden">
  <div id="bbar" style="background:var(--acc);width:0%;height:100%"></div></div>
 <h3 style="margin-top:1.4rem">Open existing index</h3>
 <div class="row"><input id="opath" type="text"
  placeholder="/path/to/index.rvdb, portable package dir, or a folder to scan">
 <label><input id="owrit" type="checkbox"> writable</label>
 <button class="go" onclick="doOpen()">Open</button></div>
 <div class="meta" id="ometa">smart-load: .rvdb file, portable dir
  (manifest.json), or newest .rvdb inside a folder</div>
 <h3 style="margin-top:1.4rem">Filter tool</h3>
 <div class="row"><input id="fdir" type="text"
  placeholder="/path/to/videos (extract) or /path/to/keyframes (refine)">
 <select id="fact"><option value="extract">extract keyframes</option>
  <option value="refine">refine keyframes</option></select>
 <select id="fpreset"><option value="default">default</option>
  <option value="gentle">gentle</option>
  <option value="ultra_gentle">ultra gentle</option>
  <option value="similarity_only">similarity only</option></select>
 <button class="go" onclick="doFilter()">Run</button></div>
 <div class="meta" id="fmeta">extract: video files -&gt; keyframes/ + map/
  CSVs; refine: drop blurry + near-duplicate frames (preset applies to
  refine)</div>
</section>
<section id="staging" class="panel">
 <div class="meta">Staged frames ("+csv" on any result card — the
  reference GUI's CSV list, gui.py:756-1666). Export writes the
  competition submission format: <code>&lt;folder&gt;.csv,&lt;frame_idx&gt;
  [,"qa"]</code>. "Use in chat" sends staged frames as chat context.</div>
 <div class="row"><input id="qadata" type="text"
  placeholder='optional QA answer column (quoted in the CSV)'>
 <button class="go" onclick="exportStaged()">Export submission CSV</button>
 <button class="go" onclick="stageToChat()">Use in chat</button>
 <button class="go" onclick="clearStaged()">Clear all</button></div>
 <div class="grid" id="stout"></div>
</section>
<section id="network" class="panel">
 <div class="row"><button class="go" onclick="doDiscover()">Discover peers</button>
 <input id="nhost" type="text" placeholder="host" style="max-width:160px">
 <input id="nport" type="text" placeholder="port" style="max-width:90px">
 <button class="go" onclick="doConnect()">Connect</button></div>
 <div class="meta" id="nmeta"></div><pre id="nout">no peers yet</pre>
</section>
<section id="stats" class="panel">
 <div class="row">
  <button class="go" onclick="doExport('json')">Export JSON</button>
  <button class="go" onclick="doExport('csv')">Export CSV</button>
  <button class="go" onclick="doMaint('optimize')">Optimize</button>
  <button class="go" onclick="doMaint('compact')">Compact index</button>
  <button class="go" onclick="doMaint('clear_cache')">Clear cache</button>
  <button class="go" onclick="doMaint('build_ann')">Build ANN (IVF)</button>
  <button class="go" onclick="doMaint('tune_ann')">Tune ANN recall</button>
  <button class="go" onclick="doMaint('measure_crossover')">Measure ANN crossover</button></div>
 <pre id="statout">loading…</pre></section>
</main>
<div id="zoom" style="display:none;position:fixed;inset:0;z-index:50;
 background:rgba(10,14,30,.88);cursor:zoom-out;overflow:hidden">
 <img id="zoomimg" style="position:absolute;left:50%;top:48%;
  transform:translate(-50%,-50%) scale(1);max-width:92vw;max-height:86vh;
  border-radius:8px;transition:transform .08s">
 <div id="zoomcap" style="position:absolute;bottom:1rem;left:0;right:0;
  text-align:center;color:#dde3f5;font-size:.9rem"></div>
</div>
<script>
document.querySelectorAll('nav button').forEach(b=>b.onclick=()=>{
  document.querySelectorAll('nav button').forEach(x=>x.classList.remove('on'));
  document.querySelectorAll('.panel').forEach(x=>x.classList.remove('on'));
  b.classList.add('on');document.getElementById(b.dataset.p).classList.add('on');
  if(b.dataset.p==='stats')loadStats();
});
function esc(s){return String(s).replace(/[&<>"']/g,c=>({'&':'&amp;',
  '<':'&lt;','>':'&gt;','"':'&quot;',"'":'&#39;'}[c]));}
function card(h){
  // folder/image come from index metadata (untrusted at LAN trust level):
  // escape into data- attributes, never into inline JS
  const f=encodeURIComponent(h.folder),i=encodeURIComponent(h.image);
  return `<div class="hit"><img src="/api/thumbnail/${f}/${i}"
   class="zoomable" style="cursor:zoom-in"
   data-f="${esc(h.folder)}" data-i="${esc(h.image)}"
   onerror="this.style.display='none'">${esc(h.folder)}/${esc(h.image)}<br>
   <span class="s">${h.similarity_score.toFixed(3)}</span>
   <a href="#" class="sim" data-f="${esc(h.folder)}"
    data-i="${esc(h.image)}">similar</a>
   <a href="#" class="stage" data-f="${esc(h.folder)}"
    data-i="${esc(h.image)}">+csv</a></div>`;
}
let staged=[];
function renderStaged(){
  stagecount.textContent=staged.length;
  stout.innerHTML=staged.map((h,ix)=>{
    const f=encodeURIComponent(h.folder),i=encodeURIComponent(h.image);
    return `<div class="hit"><img src="/api/thumbnail/${f}/${i}"
     onerror="this.style.display='none'">${esc(h.folder)}/${esc(h.image)}<br>
     <a href="#" class="unstage" data-ix="${ix}">remove</a></div>`;}).join('');
  stout.querySelectorAll('a.unstage').forEach(a=>{a.onclick=e=>{
    e.preventDefault();staged.splice(parseInt(a.dataset.ix),1);renderStaged();};});
}
function stageFrame(f,i){
  if(staged.length>=100){fmeta&&(fmeta.textContent='CSV list full (100)');return;}
  if(staged.some(h=>h.folder===f&&h.image===i))return;
  staged.push({folder:f,image:i});renderStaged();
}
function exportStaged(){
  if(!staged.length)return;
  const qa=(qadata.value||'').trim();
  const lines=staged.map(h=>{
    const idx=h.image.replace(/\\.[^.]+$/,'');
    return qa?`${h.folder}.csv,${idx},"${qa.replace(/"/g,'""')}"`
             :`${h.folder}.csv,${idx}`;});
  const a=document.createElement('a');
  a.href=URL.createObjectURL(new Blob([lines.join('\\n')],{type:'text/csv'}));
  a.download='submission.csv';a.click();
}
let chatContext=null;
function stageToChat(){
  if(!staged.length)return;
  chatContext=staged.slice(0,5);
  document.querySelector('nav button[data-p=chat]').click();
  chatlog.innerHTML+=`<div class="msg bot">${chatContext.length} staged `
    +`frame(s) attached as context for your next message</div>`;
}
function clearStaged(){staged=[];renderStaged();}
async function post(url, body){
  const r=await fetch(url,{method:'POST',headers:{'content-type':'application/json'},
    body:JSON.stringify(body)});return r.json();
}
let lastResults=[];
async function doSearch(){
  const d=await post('/api/search',{query:q.value,limit:24,mode:mode.value});
  smeta.textContent=d.success?`${d.count} hits in ${d.latency_ms} ms`
    :JSON.stringify(d.error);
  lastResults=d.results||[];
  sout.innerHTML=lastResults.map(card).join('');
}
async function doExport(fmt){
  if(!lastResults.length){statout.textContent='run a search first — export '
    +'saves the last search results';return;}
  const r=await fetch('/api/export',{method:'POST',
    headers:{'content-type':'application/json'},
    body:JSON.stringify({results:lastResults,format:fmt})});
  const blob=await r.blob();const a=document.createElement('a');
  a.href=URL.createObjectURL(blob);a.download='results.'+fmt;a.click();
}
let bws=null;
function buildWS(){
  if(bws&&bws.readyState<2)return;
  bws=new WebSocket((location.protocol==='https:'?'wss':'ws')+'://'
    +location.host+'/ws');
  bws.onmessage=e=>{const d=JSON.parse(e.data);
    if(d.event==='build_progress'){
      bmeta.textContent=`${d.stage||''} ${d.done||0}/${d.total||0}`;
      if(d.total)bbar.style.width=(100*d.done/d.total)+'%';}
    if(d.event==='build_done'){bmeta.textContent=
      `done — processed ${d.processed}, skipped ${d.skipped}, failed ${d.failed}`;
      bbar.style.width='100%';}
    if(d.event==='build_error')bmeta.textContent='ERROR: '+d.error;
    if(d.event==='filter_progress')
      fmeta.textContent=`${d.stage||''} ${d.done||0}/${d.total||0}`;
    if(d.event==='filter_done')
      fmeta.textContent='done: '+JSON.stringify(d).slice(0,200);
    if(d.event==='filter_error')fmeta.textContent='ERROR: '+d.error;};
}
async function doFilter(){
  buildWS();
  const d=await post('/api/filter',{action:fact.value,input_dir:fdir.value,
    preset:fpreset.value});
  fmeta.textContent=d.success?'filter job started…'
    :JSON.stringify(d.error||d);
}
async function doBuild(){
  buildWS();
  const d=await post('/api/build',{keyframes_dir:bdir.value,
    resume:bresume.checked});
  bmeta.textContent=d.success?'build started…':JSON.stringify(d.error||d);
  if(d.success)bbar.style.width='2%';
}
async function doDiscover(){
  nmeta.textContent='listening for announcements…';
  const d=await post('/api/network/discover',{wait_s:2});
  nmeta.textContent=`${(d.nodes||[]).length} peer(s) discovered`;
  renderPeers(d.nodes||[],[]);
}
function renderPeers(nodes,indexes){
  // peer names/hosts/index ids arrive from UNAUTHENTICATED UDP/HTTP —
  // escape everything, and never splice ids into inline JS
  let html='';
  nodes.forEach(n=>{html+=`${esc(n.node_name||n.node_id)} @ `
    +`${esc(n.host||n.ip)}:${esc(n.service_port)}\\n`;});
  indexes.forEach(i=>{const id=String(i.index_id||i.id);
    html+=`  index ${esc(id)}: ${esc(i.ntotal||'?')} rows `
    +`<button data-idx="${esc(id)}" class="loadremote">load</button>\\n`;});
  nout.innerHTML=html||'no peers yet';
  nout.querySelectorAll('button.loadremote').forEach(b=>{
    b.onclick=()=>loadRemote(b.dataset.idx);});
}
async function doConnect(){
  const d=await post('/api/network/connect',
    {host:nhost.value,port:parseInt(nport.value)});
  if(!d.success){nmeta.textContent=JSON.stringify(d.error);return;}
  nmeta.textContent=`connected: ${(d.node||{}).node_name||nhost.value}`;
  renderPeers([],d.indexes||[]);
}
async function loadRemote(id){
  const d=await post('/api/network/load_remote',
    {host:nhost.value,port:parseInt(nport.value),index_id:id});
  nmeta.textContent=d.success?`remote index ${id} loaded (${d.ntotal} rows) — `
    +`searches now fan out to it`:JSON.stringify(d.error);
}
async function doImage(){
  const f=file.files[0];if(!f)return;
  const b64=await new Promise(res=>{const r=new FileReader();
    r.onload=()=>res(r.result.split(',')[1]);r.readAsDataURL(f);});
  const d=await post('/api/image_search',{image_base64:b64,limit:24});
  imeta.textContent=d.success?`${d.count} hits`:JSON.stringify(d.error);
  iout.innerHTML=(d.results||[]).map(card).join('');
}
async function doChat(){
  const m=cmsg.value;if(!m)return;cmsg.value='';
  chatlog.innerHTML+=`<div class="msg me">${esc(m)}</div>`;
  const body={message:m};
  if(chatContext){body.context_frames=chatContext;chatContext=null;}
  const d=await post('/api/chat',body);
  chatlog.innerHTML+=`<div class="msg bot">${esc(d.response||'(no reply)')}</div>`;
  if((d.search_results||[]).length)
    chatlog.innerHTML+=`<div class="grid">${d.search_results.slice(0,6)
      .map(card).join('')}</div>`;
  chatlog.scrollTop=chatlog.scrollHeight;
}
async function loadStats(){
  const r=await fetch('/api/stats');statout.textContent=
    JSON.stringify(await r.json(),null,2);
}
async function doOpen(){
  ometa.textContent='opening…';
  const d=await post('/api/open',{path:opath.value,writable:owrit.checked});
  ometa.textContent=d.success?
    `opened ${esc(d.kind)} — ${d.ntotal} rows (${esc(d.path)})`
    :('ERROR: '+JSON.stringify(d.error));
}
async function doMaint(action){
  statout.textContent=action+'…';
  const d=await post('/api/maintenance',{action});
  statout.textContent=JSON.stringify(d,null,2);
}
async function doSimilar(f,i){
  // similar-frame click-through (reference GUI similarity navigation):
  // results land in the Search panel grid
  document.querySelector('nav button[data-p=search]').click();
  smeta.textContent=`frames similar to ${f}/${i}…`;
  const r=await fetch(`/api/similar/${encodeURIComponent(f)}/`
    +`${encodeURIComponent(i)}?limit=24`);
  const d=await r.json();
  smeta.textContent=d.success?`${d.count} frames similar to ${f}/${i}`
    :JSON.stringify(d.error);
  lastResults=d.results||[];
  sout.innerHTML=lastResults.map(card).join('');
}
let zscale=1;
function openZoom(f,i){
  zscale=1;zoomimg.style.transform='translate(-50%,-50%) scale(1)';
  zoomimg.src=`/api/image/${encodeURIComponent(f)}/${encodeURIComponent(i)}`;
  zoomimg.onerror=()=>{zoomimg.onerror=null;
    zoomimg.src=`/api/thumbnail/${encodeURIComponent(f)}/`
      +`${encodeURIComponent(i)}`;};
  zoomcap.textContent=f+'/'+i+' — scroll to zoom, click or Esc to close';
  zoom.style.display='block';
}
zoom.addEventListener('click',e=>{if(e.target!==zoomimg)
  zoom.style.display='none';});
zoom.addEventListener('wheel',e=>{e.preventDefault();
  zscale=Math.min(8,Math.max(.3,zscale*(e.deltaY<0?1.15:1/1.15)));
  zoomimg.style.transform=`translate(-50%,-50%) scale(${zscale})`;},
  {passive:false});
document.addEventListener('keydown',e=>{if(e.key==='Escape')
  zoom.style.display='none';});
document.addEventListener('click',e=>{
  const z=e.target.closest&&e.target.closest('img.zoomable');
  if(z){openZoom(z.dataset.f,z.dataset.i);return;}
  const s=e.target.closest&&e.target.closest('a.sim');
  if(s){e.preventDefault();doSimilar(s.dataset.f,s.dataset.i);return;}
  const g=e.target.closest&&e.target.closest('a.stage');
  if(g){e.preventDefault();stageFrame(g.dataset.f,g.dataset.i);}
});
q.addEventListener('keydown',e=>{if(e.key==='Enter')doSearch()});
cmsg.addEventListener('keydown',e=>{if(e.key==='Enter')doChat()});
</script></body></html>
"""
