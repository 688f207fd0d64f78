"""REST + WebSocket server over an EnhancedRetrievalSystem.

Replaces the reference's Flask ``RESTAPIServer`` (``api.py:2946-3178``) and
eventlet ``SocketIOServer`` (``api.py:2419-2932``) with one aiohttp app:

REST (reference route parity):
    GET  /api/health
    POST /api/search            {query, mode?, limit?, detail_level?, folder?}
    POST /api/image_search      {image_base64, limit?, detail_level?}
    POST /api/chat              {message, context_frames?}
    POST /api/translate         {text}
    GET  /api/metadata/{folder}/{image}
    GET  /api/thumbnail/{folder}/{image}      (JPEG)
    GET  /api/image/{folder}/{image}          (JPEG)
    GET  /api/stats
    POST /api/export            {results, format}

WebSocket at /ws: JSON messages {event, data, request_id?} with events
``search`` / ``chat`` / ``translate`` / ``system_stats`` / ``ping`` —
the socketio event surface (``api.py:2474-2551``) over plain websockets.

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
        self.app = web.Application(client_max_size=64 * 1024 * 1024)
        self._setup_routes()
        self._runner: web.AppRunner | None = None
        self._loop: asyncio.AbstractEventLoop | None = None
        self._thread: threading.Thread | None = None
        self._started = threading.Event()
        self.started_at = time.time()

    # -- routes ---------------------------------------------------------------

    def _setup_routes(self) -> None:
        app = self.app
        app.router.add_get("/api/health", self._health)
        app.router.add_post("/api/search", self._search)
        app.router.add_post("/api/image_search", self._image_search)
        app.router.add_post("/api/chat", self._chat)
        app.router.add_post("/api/translate", self._translate)
        app.router.add_get("/api/metadata/{folder}/{image}", self._metadata)
        app.router.add_get("/api/thumbnail/{folder}/{image}", self._thumbnail)
        app.router.add_get("/api/image/{folder}/{image}", self._image)
        app.router.add_get("/api/similar/{folder}/{image}", self._similar)
        app.router.add_get("/api/stats", self._stats)
        app.router.add_post("/api/export", self._export)
        app.router.add_get("/ws", self._websocket)
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

    def _run_sync(self, fn, *args, **kwargs):
        """Run facade work off the event loop."""
        loop = asyncio.get_event_loop()
        return loop.run_in_executor(None, lambda: fn(*args, **kwargs))

    # -- REST handlers --------------------------------------------------------

    async def _health(self, request: "web.Request") -> "web.Response":
        report = await self._run_sync(
            self.system.health.comprehensive_health_check
        )
        return web.json_response(
            {
                "success": True,
                "status": report["overall"],
                "uptime_s": round(time.time() - self.started_at, 1),
                "index_loaded": self.system.index is not None
                and self.system.index.is_loaded,
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
        return web.json_response(
            {
                "success": True,
                "query": payload["query"],
                "count": len(results),
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
                "results": format_results(
                    results, payload.get("detail_level", "standard")
                ),
            }
        )

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

    async def _console(self, request: "web.Request") -> "web.Response":
        return web.Response(text=_CONSOLE_HTML, content_type="text/html")

    # -- websocket (socketio event surface) -----------------------------------

    async def _websocket(self, request: "web.Request"):
        ws = web.WebSocketResponse(heartbeat=30)
        await ws.prepare(request)
        client = self._client_id(request)
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
        return ws

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
<section id="stats" class="panel"><pre id="statout">loading…</pre></section>
</main>
<script>
document.querySelectorAll('nav button').forEach(b=>b.onclick=()=>{
  document.querySelectorAll('nav button').forEach(x=>x.classList.remove('on'));
  document.querySelectorAll('.panel').forEach(x=>x.classList.remove('on'));
  b.classList.add('on');document.getElementById(b.dataset.p).classList.add('on');
  if(b.dataset.p==='stats')loadStats();
});
function esc(s){const d=document.createElement('div');d.textContent=String(s);
  return d.innerHTML;}
function card(h){
  const f=encodeURIComponent(h.folder),i=encodeURIComponent(h.image);
  return `<div class="hit"><img src="/api/thumbnail/${f}/${i}"
   onerror="this.style.display='none'">${esc(h.folder)}/${esc(h.image)}<br>
   <span class="s">${h.similarity_score.toFixed(3)}</span></div>`;
}
async function post(url, body){
  const r=await fetch(url,{method:'POST',headers:{'content-type':'application/json'},
    body:JSON.stringify(body)});return r.json();
}
async function doSearch(){
  const d=await post('/api/search',{query:q.value,limit:24,mode:mode.value});
  smeta.textContent=d.success?`${d.count} hits in ${d.latency_ms} ms`
    :JSON.stringify(d.error);
  sout.innerHTML=(d.results||[]).map(card).join('');
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
  const d=await post('/api/chat',{message:m});
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
q.addEventListener('keydown',e=>{if(e.key==='Enter')doSearch()});
cmsg.addEventListener('keydown',e=>{if(e.key==='Enter')doChat()});
</script></body></html>
"""
