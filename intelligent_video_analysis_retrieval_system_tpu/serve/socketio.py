"""Socket.IO wire compatibility for the REST server.

The reference exposes its realtime surface through python-socketio
(``/root/reference/api.py:2419-2941``): events ``search``,
``translated_text``, ``translate``, ``image_search``, ``chat``,
``metadata_query``, ``semantic_search``, ``system_stats``; replies
emitted as ``connected`` / ``result`` / ``translation_result`` /
``image_search_result`` / ``chat_response`` / ``metadata_result`` /
``semantic_search_result`` / ``system_stats`` / ``error``. The TPU-native
server speaks plain JSON over ``/ws``; this module adds a
**wire-compatible** ``/socket.io/`` endpoint implementing the Engine.IO
v4 + Socket.IO v5 protocol (the one current python-socketio /
socket.io-client speak) so existing reference clients connect unchanged.

Supported transports: HTTP long-polling, direct WebSocket, and the
polling->websocket upgrade dance (``2probe``/``3probe``/``5``). Events
dispatch through the same ``RetrievalServer._dispatch_ws`` the plain-WS
endpoint uses, so behavior (validation, rate limits, degraded-mode
notes) is identical across both wire formats.

Engine.IO packet types: 0 open, 1 close, 2 ping, 3 pong, 4 message,
5 upgrade, 6 noop; polling payloads join packets with ``\\x1e``.
Socket.IO packets (inside EIO ``4``): 0 connect, 1 disconnect, 2 event
(``42<ack-id?>["name", data]``), 3 ack.
"""

from __future__ import annotations

import asyncio
import json
import secrets
import time
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:  # pragma: no cover
    from .rest import RetrievalServer

try:
    from aiohttp import WSMsgType, web
except ImportError:  # pragma: no cover
    web = None

__all__ = ["SocketIOAdapter"]

_RS = "\x1e"  # Engine.IO polling record separator
PING_INTERVAL_S = 25.0
PING_TIMEOUT_S = 20.0
SESSION_TTL_S = 120.0

# socket.io reply event name per request event (reference emit sites:
# api.py:2604 result, :2646 translation_result, :2684 image_search_result,
# :2716 chat_response, :2797 metadata_result, :2840 semantic_search_result,
# :2737 system_stats)
_REPLY_EVENT = {
    "search": "result",
    "translated_text": "result",
    "translate": "translation_result",
    "image_search": "image_search_result",
    "chat": "chat_response",
    "metadata_query": "metadata_result",
    "semantic_search": "semantic_search_result",
    "system_stats": "system_stats",
}


class _Session:
    __slots__ = ("sid", "queue", "ws", "upgraded", "connected_ns",
                 "last_seen", "client")

    def __init__(self, sid: str, client: str):
        self.sid = sid
        self.queue: asyncio.Queue[str] = asyncio.Queue()
        self.ws = None            # live WebSocketResponse once upgraded
        self.upgraded = False
        self.connected_ns = False  # socket.io "40" namespace connect seen
        self.last_seen = time.time()
        self.client = client


class SocketIOAdapter:
    """Engine.IO v4 / Socket.IO v5 endpoint bridging to the server's
    ``_dispatch_ws`` event surface."""

    def __init__(self, server: "RetrievalServer"):
        self.server = server
        self.sessions: dict[str, _Session] = {}

    def register(self, app) -> None:
        app.router.add_get("/socket.io/", self.handle_get)
        app.router.add_post("/socket.io/", self.handle_post)

    # -- helpers ------------------------------------------------------------

    def _open_packet(self, sid: str) -> str:
        return "0" + json.dumps({
            "sid": sid,
            "upgrades": ["websocket"],
            "pingInterval": int(PING_INTERVAL_S * 1000),
            "pingTimeout": int(PING_TIMEOUT_S * 1000),
            "maxPayload": 1_000_000,
        })

    def _dumps(self, obj: Any) -> str:
        from .rest import _dumps

        return _dumps(obj)

    def _emit_packet(self, event: str, data: Any) -> str:
        return "42" + self._dumps([event, data])

    async def _push(self, sess: _Session, packet: str) -> None:
        """Deliver one EIO packet to the session on its live transport."""
        if sess.upgraded and sess.ws is not None and not sess.ws.closed:
            await sess.ws.send_str(packet)
        else:
            sess.queue.put_nowait(packet)

    def broadcast(self, event: str, data: dict[str, Any]) -> None:
        """Fan a server-initiated event to every connected session
        (same payloads the plain /ws broadcast carries). Must run on the
        server's event loop."""
        packet = self._emit_packet(event, data)
        for sess in list(self.sessions.values()):
            if sess.connected_ns:
                asyncio.ensure_future(self._push(sess, packet))

    def _gc(self) -> None:
        now = time.time()
        for sid in [
            s for s, sess in self.sessions.items()
            if not sess.upgraded and now - sess.last_seen > SESSION_TTL_S
        ]:
            self.sessions.pop(sid, None)

    # -- socket.io packet handling -------------------------------------------

    async def _handle_sio(self, sess: _Session, payload: str) -> None:
        """One Socket.IO packet (the body of an EIO ``4`` message)."""
        if payload.startswith("0"):  # connect to namespace (default "/")
            sess.connected_ns = True
            await self._push(sess, "40" + json.dumps({"sid": sess.sid}))
            # reference greets on connect (api.py:2493-2498)
            await self._push(sess, self._emit_packet("connected", {
                "message": "Connected to Enhanced Retrieval System",
                "server_version": "2.0",
                "capabilities": ["search", "translate", "chat",
                                 "image_search"],
            }))
            return
        if payload.startswith("1"):  # namespace disconnect
            sess.connected_ns = False
            return
        if payload.startswith("2"):  # event: 2<ack-id?>["name", data?]
            body = payload[1:]
            i = 0
            while i < len(body) and body[i].isdigit():
                i += 1
            ack_id = body[:i] or None
            try:
                arr = json.loads(body[i:])
                if not isinstance(arr, list) or not arr \
                        or not isinstance(arr[0], str):
                    raise ValueError("socket.io event must be "
                                     '["name", data?]')
                event = arr[0]
                data = arr[1] if len(arr) > 1 else {}
                if not isinstance(data, dict):
                    data = {"value": data}
            except (json.JSONDecodeError, ValueError):
                await self._push(sess, self._emit_packet(
                    "error", {"success": False, "error": "invalid packet"}
                ))
                return
            reply = await self.server._dispatch_ws(event, data, sess.client)
            is_err = reply.get("event") == "error"
            name = "error" if is_err else _REPLY_EVENT.get(
                event, reply.get("event", "result")
            )
            out = {k: v for k, v in reply.items() if k != "event"}
            if ack_id is not None:
                await self._push(sess, "43" + ack_id + self._dumps([out]))
            await self._push(sess, self._emit_packet(name, out))

    async def _handle_eio(self, sess: _Session, packet: str) -> None:
        sess.last_seen = time.time()
        if not packet:
            return
        kind, body = packet[0], packet[1:]
        if kind == "4":      # message -> socket.io layer
            await self._handle_sio(sess, body)
        elif kind == "3":    # pong: liveness only
            pass
        elif kind == "2":    # client-initiated ping (EIO3 style): pong back
            await self._push(sess, "3" + body)
        elif kind == "1":    # close
            self.sessions.pop(sess.sid, None)

    # -- HTTP transports -------------------------------------------------------

    async def handle_post(self, request: "web.Request") -> "web.Response":
        sid = request.query.get("sid", "")
        sess = self.sessions.get(sid)
        if sess is None:
            return web.Response(status=400, text="unknown sid")
        body = await request.text()
        for packet in body.split(_RS):
            await self._handle_eio(sess, packet)
        return web.Response(text="ok")

    async def handle_get(self, request: "web.Request"):
        transport = request.query.get("transport", "polling")
        if transport == "websocket":
            return await self._websocket(request)
        self._gc()
        sid = request.query.get("sid", "")
        if not sid:  # handshake
            sess = _Session(secrets.token_urlsafe(16),
                            request.remote or "unknown")
            self.sessions[sess.sid] = sess
            return web.Response(
                text=self._open_packet(sess.sid),
                content_type="text/plain", charset="UTF-8",
            )
        sess = self.sessions.get(sid)
        if sess is None:
            return web.Response(status=400, text="unknown sid")
        if sess.upgraded:
            return web.Response(text="6", content_type="text/plain",
                                charset="UTF-8")
        # long-poll: first packet blocks (bounded), then drain
        packets = []
        try:
            packets.append(
                await asyncio.wait_for(sess.queue.get(),
                                       timeout=PING_INTERVAL_S)
            )
            while not sess.queue.empty():
                packets.append(sess.queue.get_nowait())
        except asyncio.TimeoutError:
            packets.append("2")  # server ping keeps the session alive
        sess.last_seen = time.time()
        return web.Response(text=_RS.join(packets),
                            content_type="text/plain", charset="UTF-8")

    async def _websocket(self, request: "web.Request"):
        ws = web.WebSocketResponse(heartbeat=None)
        await ws.prepare(request)
        sid = request.query.get("sid", "")
        if sid:
            # upgrade of an existing polling session: probe dance
            sess = self.sessions.get(sid)
            if sess is None:
                await ws.close()
                return ws
        else:
            sess = _Session(secrets.token_urlsafe(16),
                            request.remote or "unknown")
            self.sessions[sess.sid] = sess
            await ws.send_str(self._open_packet(sess.sid))
        ping_task = asyncio.ensure_future(self._ping_loop(sess, ws))
        try:
            async for msg in ws:
                if msg.type != WSMsgType.TEXT:
                    continue
                packet = msg.data
                sess.last_seen = time.time()
                if packet == "2probe":       # upgrade probe
                    await ws.send_str("3probe")
                elif packet == "5":          # upgrade commit
                    sess.ws = ws
                    sess.upgraded = True
                    while not sess.queue.empty():  # flush polled backlog
                        await ws.send_str(sess.queue.get_nowait())
                else:
                    if not sess.upgraded:
                        sess.ws = ws
                        sess.upgraded = True
                    await self._handle_eio(sess, packet)
        finally:
            ping_task.cancel()
            self.sessions.pop(sess.sid, None)
        return ws

    async def _ping_loop(self, sess: _Session, ws) -> None:
        try:
            while not ws.closed:
                await asyncio.sleep(PING_INTERVAL_S)
                if sess.upgraded and not ws.closed:
                    await ws.send_str("2")
        except asyncio.CancelledError:
            pass
