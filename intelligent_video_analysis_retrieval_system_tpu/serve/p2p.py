"""LAN P2P layer: discovery, peer serving, remote index access.

Capability parity with the reference's desktop-sharing mesh
(``api.py:305-1810``):

- :class:`NetworkDiscovery` — UDP broadcast ``node_announcement`` JSON on
  ``port+1``, periodic (15 s), 5-minute peer expiry, manual discovery
  trigger (``api.py:313-555``);
- :class:`NetworkServer` — HTTP peer endpoints: ping/info/status, shared
  index listing/info, **remote vector search** (client POSTs the query
  vector), per-frame thumbnail/full-image fetch (``api.py:642-1034``).
  Unlike the reference — which reloaded the ``.rvdb`` from disk on every
  remote search request (``api.py:877-930``, flagged in SURVEY.md §3.5) —
  shared indexes are opened once and kept device-resident;
- :class:`NetworkClient` / :class:`RemoteUnifiedIndex` — connect, list,
  and query remote indexes; ``RemoteUnifiedIndex`` mimics the local index
  API over HTTP and plugs into ``system.remote_indexes`` for fan-in merge.

Note: this layer exists for the reference's ad-hoc desktop sharing use
case. Pod-scale distribution is ``parallel.sharded_search`` over ICI.
"""

from __future__ import annotations

import hashlib
import json
import socket
import threading
import time
from typing import TYPE_CHECKING, Any, Callable

import numpy as np

if TYPE_CHECKING:
    from ..index.unified import UnifiedIndex

__all__ = [
    "NetworkDiscovery",
    "NetworkServer",
    "NetworkClient",
    "RemoteUnifiedIndex",
]


def _node_id(service_port: int = 0) -> str:
    """Stable node identity (reference api.py:338-361 hashes hostname_ip
    only — which collides for two nodes on one host, making each discard
    the other's announcements as its own; the service port disambiguates
    while staying stable across restarts)."""
    host = socket.gethostname()
    try:
        ip = socket.gethostbyname(host)
    except OSError:
        ip = "127.0.0.1"
    return hashlib.md5(f"{host}_{ip}_{service_port}".encode()).hexdigest()[:12]


DEFAULT_DISCOVERY_PORT = 5556  # reference legacy port (api.py:475-505)


class NetworkDiscovery:
    """UDP broadcast peer discovery (reference api.py:305-603)."""

    def __init__(
        self,
        service_port: int,
        discovery_port: int | None = None,
        interval_s: float = 15.0,
        node_timeout_s: float = 300.0,
        node_name: str | None = None,
        listen_only: bool = False,
    ) -> None:
        """``listen_only=True`` observes peer announcements without
        announcing this process — for consumers (e.g. the web console)
        that serve NO p2p endpoints: announcing their port would invite
        peers to connect to a server that cannot answer
        ``/api/node/info`` etc."""
        self.service_port = service_port
        self.discovery_port = discovery_port or service_port + 1
        # nodes on ARBITRARY service ports can only find each other through
        # a shared port — announce/listen on the well-known port too
        # (reference api.py:475-505 uses legacy 5556 alongside port+1)
        self.well_known_port = DEFAULT_DISCOVERY_PORT
        self.interval_s = interval_s
        self.node_timeout_s = node_timeout_s
        self.listen_only = listen_only
        self.node_id = _node_id(service_port)
        self.node_name = node_name or socket.gethostname()
        self.known_nodes: dict[str, dict[str, Any]] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self.on_node_discovered: Callable[[dict], None] | None = None

    def _announcement(self) -> bytes:
        return json.dumps(
            {
                "type": "node_announcement",
                "node_id": self.node_id,
                "node_name": self.node_name,
                "service_port": self.service_port,
                "ts": time.time(),
            }
        ).encode("utf-8")

    def start_discovery(self) -> None:
        self._stop.clear()
        targets = [self._listen_loop, self._expiry_loop]
        if not self.listen_only:
            targets.insert(0, self._broadcast_loop)
        for target in targets:
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)

    def stop_discovery(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2)
        self._threads.clear()

    @property
    def is_running(self) -> bool:
        return any(t.is_alive() for t in self._threads)

    def _announce_ports(self) -> list[int]:
        ports = [self.discovery_port]
        if self.well_known_port not in ports:
            ports.append(self.well_known_port)
        return ports

    def _send_announcements(self, sock: socket.socket) -> None:
        for port in self._announce_ports():
            sock.sendto(self._announcement(), ("255.255.255.255", port))
            sock.sendto(self._announcement(), ("127.0.0.1", port))

    def _broadcast_loop(self) -> None:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_BROADCAST, 1)
        try:
            while not self._stop.is_set():
                try:
                    self._send_announcements(sock)
                except OSError:
                    pass
                self._stop.wait(self.interval_s)
        finally:
            sock.close()

    def broadcast_once(self) -> None:
        """Manual discovery trigger (reference api.py:507-533)."""
        if self.listen_only:
            return
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_BROADCAST, 1)
        try:
            self._send_announcements(sock)
        except OSError:
            pass
        finally:
            sock.close()

    def _listen_loop(self) -> None:
        """Dual listeners (reference api.py:407-448): the node's own
        ``discovery_port`` plus the shared well-known port, so peers on
        arbitrary service ports are heard. The well-known bind is
        best-effort (SO_REUSEADDR lets co-hosted nodes share it; if the
        OS refuses, per-port discovery still works)."""
        socks: list[socket.socket] = []
        for port in self._announce_ports():
            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            # deliberately NO SO_REUSEPORT: a reuseport group delivers each
            # loopback *unicast* announcement to one hash-chosen member
            # (often the sender's own listener), making same-host discovery
            # nondeterministic. First binder of the well-known port wins;
            # everyone still has their per-port listener + LAN broadcast.
            sock.settimeout(0.5)
            try:
                sock.bind(("", port))
            except OSError:
                sock.close()
                continue
            socks.append(sock)
        if not socks:
            return
        try:
            while not self._stop.is_set():
                for sock in socks:
                    try:
                        data, addr = sock.recvfrom(4096)
                    except socket.timeout:
                        continue
                    except OSError:
                        return
                    self._handle_announcement(data, addr)
        finally:
            for sock in socks:
                sock.close()

    def _handle_announcement(self, data: bytes, addr: tuple[str, int]) -> None:
        try:
            msg = json.loads(data.decode("utf-8"))
        except (json.JSONDecodeError, UnicodeDecodeError):
            return
        if msg.get("type") != "node_announcement":
            return
        if msg.get("node_id") == self.node_id:
            return  # our own broadcast
        # sender-IP rewrite (reference api.py:450-473): trust the socket addr
        node = {
            "node_id": msg.get("node_id"),
            "node_name": msg.get("node_name", "unknown"),
            "host": addr[0],
            "service_port": msg.get("service_port"),
            "last_seen": time.time(),
        }
        with self._lock:
            is_new = node["node_id"] not in self.known_nodes
            self.known_nodes[node["node_id"]] = node
        if is_new and self.on_node_discovered is not None:
            try:
                self.on_node_discovered(node)
            except Exception:
                pass

    def _expiry_loop(self) -> None:
        while not self._stop.is_set():
            cutoff = time.time() - self.node_timeout_s
            with self._lock:
                dead = [
                    nid for nid, n in self.known_nodes.items()
                    if n["last_seen"] < cutoff
                ]
                for nid in dead:
                    del self.known_nodes[nid]
            self._stop.wait(5.0)

    def get_nodes(self) -> list[dict[str, Any]]:
        with self._lock:
            return list(self.known_nodes.values())


class NetworkServer:
    """HTTP peer server sharing local indexes (reference api.py:605-1270)."""

    def __init__(
        self,
        host: str = "0.0.0.0",
        port: int = 5001,
        node_name: str | None = None,
        enable_discovery: bool = True,
    ) -> None:
        try:
            from aiohttp import web  # noqa: F401
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError("aiohttp is required for NetworkServer") from exc
        self.host = host
        self.port = port
        self.node_name = node_name or socket.gethostname()
        self.discovery = NetworkDiscovery(port, node_name=self.node_name)
        self.enable_discovery = enable_discovery
        self.shared_indexes: dict[str, "UnifiedIndex"] = {}
        self.shared_folders: dict[str, "Path"] = {}
        self._lock = threading.RLock()
        self._thread: threading.Thread | None = None
        self._loop = None
        self._runner = None
        self._started = threading.Event()
        self.started_at: float | None = None

    # -- index registry (open once, serve many — unlike the reference) -------

    def register_index(self, index_id: str, index: "UnifiedIndex") -> None:
        with self._lock:
            self.shared_indexes[index_id] = index

    def register_index_file(self, index_id: str, path: str) -> None:
        from ..index.unified import UnifiedIndex

        index = UnifiedIndex()
        index.load_unified_index(path, mode="r")
        self.register_index(index_id, index)

    def remove_index(self, index_id: str) -> None:
        with self._lock:
            index = self.shared_indexes.pop(index_id, None)
        if index is not None:
            index.close()

    # -- shared folders (reference api.py:1188-1270) -----------------------

    def register_folder(self, folder_id: str, path: str) -> None:
        from pathlib import Path

        p = Path(path).resolve()
        if not p.is_dir():
            raise NotADirectoryError(p)
        with self._lock:
            self.shared_folders[folder_id] = p

    def remove_folder(self, folder_id: str) -> None:
        with self._lock:
            self.shared_folders.pop(folder_id, None)

    # -- lifecycle ------------------------------------------------------------

    def start_server(self) -> None:
        self._thread = threading.Thread(target=self._thread_main, daemon=True)
        self._thread.start()
        if not self._started.wait(timeout=10):
            raise RuntimeError("NetworkServer failed to start")
        if self.enable_discovery:
            self.discovery.start_discovery()
        self.started_at = time.time()

    def stop_server(self) -> None:
        self.discovery.stop_discovery()
        if self._loop is not None and self._loop.is_running():
            self._loop.call_soon_threadsafe(self._loop.stop)
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        with self._lock:
            for index in self.shared_indexes.values():
                index.close()
            self.shared_indexes.clear()

    @property
    def is_running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def _thread_main(self) -> None:
        import asyncio

        from aiohttp import web

        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        app = web.Application(client_max_size=64 * 1024 * 1024)
        app.router.add_get("/api/ping", self._ping)
        app.router.add_get("/api/node/info", self._info)
        app.router.add_get("/api/status", self._status)
        app.router.add_get("/api/indexes", self._list_indexes)
        app.router.add_get("/api/indexes/{index_id}/info", self._index_info)
        app.router.add_post("/api/indexes/{index_id}/search", self._index_search)
        app.router.add_get(
            "/api/indexes/{index_id}/thumbnail/{row_id}", self._index_thumbnail
        )
        app.router.add_get(
            "/api/indexes/{index_id}/image/{row_id}", self._index_image
        )
        app.router.add_get(
            "/api/indexes/{index_id}/metadata/{row_id}", self._index_metadata
        )
        app.router.add_get("/api/folders", self._list_folders)
        app.router.add_get("/api/folders/{folder_id}/files", self._folder_files)
        app.router.add_get("/api/folders/{folder_id}/file", self._folder_file)
        app.router.add_post("/api/folders/{folder_id}/upload", self._folder_upload)

        async def start():
            self._runner = web.AppRunner(app)
            await self._runner.setup()
            site = web.TCPSite(self._runner, self.host, self.port)
            await site.start()

        self._loop.run_until_complete(start())
        self._started.set()
        try:
            self._loop.run_forever()
        finally:
            self._loop.run_until_complete(self._runner.cleanup())
            self._loop.close()

    # -- handlers --------------------------------------------------------------

    async def _ping(self, request):
        from aiohttp import web

        return web.json_response(
            {
                "status": "ok",
                "node_id": self.discovery.node_id,
                "node_name": self.node_name,
                "ts": time.time(),
            }
        )

    async def _info(self, request):
        from aiohttp import web

        with self._lock:
            indexes = list(self.shared_indexes)
        return web.json_response(
            {
                "node_id": self.discovery.node_id,
                "node_name": self.node_name,
                "service_port": self.port,
                "shared_indexes": indexes,
            }
        )

    async def _status(self, request):
        from aiohttp import web

        return web.json_response(
            {
                "status": "running",
                "uptime_s": round(time.time() - (self.started_at or time.time()), 1),
                "known_nodes": len(self.discovery.get_nodes()),
                "shared_indexes": len(self.shared_indexes),
            }
        )

    async def _list_indexes(self, request):
        from aiohttp import web

        with self._lock:
            items = [
                {"index_id": iid, "ntotal": idx.ntotal, "dim": idx.dim}
                for iid, idx in self.shared_indexes.items()
            ]
        return web.json_response({"indexes": items})

    def _get_index(self, request):
        index_id = request.match_info["index_id"]
        with self._lock:
            return index_id, self.shared_indexes.get(index_id)

    async def _index_info(self, request):
        from aiohttp import web

        index_id, index = self._get_index(request)
        if index is None:
            return web.json_response({"error": "unknown index"}, status=404)
        return web.json_response(
            {"index_id": index_id, "ntotal": index.ntotal, "dim": index.dim}
        )

    async def _index_search(self, request):
        """Remote vector search: body {query_vector: [f32...], top_k}."""
        import asyncio

        from aiohttp import web

        _, index = self._get_index(request)
        if index is None:
            return web.json_response({"error": "unknown index"}, status=404)
        try:
            payload = await request.json()
            qvec = np.asarray(payload["query_vector"], dtype=np.float32)
            top_k = int(payload.get("top_k", 20))
        except Exception:
            return web.json_response({"error": "bad request"}, status=400)
        if qvec.ndim != 1 or qvec.shape[0] != index.dim:
            return web.json_response(
                {"error": f"query_vector must have dim {index.dim}"}, status=400
            )
        loop = asyncio.get_event_loop()
        hits = await loop.run_in_executor(
            None, lambda: index.search(qvec, top_k=min(top_k, 1000))
        )
        return web.json_response(
            {
                "results": [
                    {**h.to_dict("rich"), "row_id": h.metadata.row_id}
                    for h in hits
                ]
            }
        )

    async def _index_thumbnail(self, request):
        return await self._asset(request, full=False)

    async def _index_image(self, request):
        return await self._asset(request, full=True)

    async def _asset(self, request, full: bool):
        import asyncio

        from aiohttp import web

        _, index = self._get_index(request)
        if index is None:
            return web.json_response({"error": "unknown index"}, status=404)
        try:
            row_id = int(request.match_info["row_id"])
        except ValueError:
            return web.json_response({"error": "bad row id"}, status=400)
        if not 0 <= row_id < index.ntotal:
            return web.json_response({"error": "row out of range"}, status=404)
        loop = asyncio.get_event_loop()
        getter = index.get_full_image if full else index.get_thumbnail
        data = await loop.run_in_executor(None, getter, row_id)
        if not data:
            return web.json_response({"error": "asset unavailable"}, status=404)
        return web.Response(body=data, content_type="image/jpeg")

    async def _index_metadata(self, request):
        from aiohttp import web

        _, index = self._get_index(request)
        if index is None:
            return web.json_response({"error": "unknown index"}, status=404)
        try:
            row_id = int(request.match_info["row_id"])
            meta = index.get_metadata(row_id)
        except (ValueError, IndexError):
            return web.json_response({"error": "row out of range"}, status=404)
        return web.json_response({"metadata": meta.to_dict()})

    # -- shared folder handlers ---------------------------------------------

    async def _list_folders(self, request):
        from aiohttp import web

        with self._lock:
            items = [
                {"folder_id": fid, "path": str(p)}
                for fid, p in self.shared_folders.items()
            ]
        return web.json_response({"folders": items})

    def _resolve_shared(self, request):
        folder_id = request.match_info["folder_id"]
        with self._lock:
            return folder_id, self.shared_folders.get(folder_id)

    async def _folder_files(self, request):
        from aiohttp import web

        _, root = self._resolve_shared(request)
        if root is None:
            return web.json_response({"error": "unknown folder"}, status=404)
        files = []
        for p in sorted(root.rglob("*")):
            if p.is_file():
                files.append(
                    {
                        "path": str(p.relative_to(root)),
                        "bytes": p.stat().st_size,
                    }
                )
            if len(files) >= 10000:
                break
        return web.json_response({"files": files})

    async def _folder_file(self, request):
        from aiohttp import web

        _, root = self._resolve_shared(request)
        if root is None:
            return web.json_response({"error": "unknown folder"}, status=404)
        rel = request.query.get("path", "")
        target = (root / rel).resolve()
        # path traversal protection: target must stay inside the share
        if root.resolve() not in target.parents and target != root.resolve():
            return web.json_response({"error": "forbidden path"}, status=403)
        if not target.is_file():
            return web.json_response({"error": "file not found"}, status=404)
        return web.FileResponse(target)

    async def _folder_upload(self, request):
        """Peer file upload (reference api.py:1036+): body = raw bytes,
        ?path= destination relative path inside the shared folder."""
        from aiohttp import web

        _, root = self._resolve_shared(request)
        if root is None:
            return web.json_response({"error": "unknown folder"}, status=404)
        rel = request.query.get("path", "")
        if not rel:
            return web.json_response({"error": "path query required"}, status=400)
        target = (root / rel).resolve()
        if root.resolve() not in target.parents:
            return web.json_response({"error": "forbidden path"}, status=403)
        data = await request.read()
        target.parent.mkdir(parents=True, exist_ok=True)
        tmp = target.with_name(target.name + ".part")
        tmp.write_bytes(data)
        tmp.replace(target)
        return web.json_response(
            {"uploaded": str(target.relative_to(root)), "bytes": len(data)}
        )


class NetworkClient:
    """Synchronous HTTP client for peer servers (reference api.py:1311-1810)."""

    def __init__(self, timeout_s: float = 10.0):
        self.timeout_s = timeout_s
        self.connected: dict[str, dict[str, Any]] = {}

    def _get(self, base: str, path: str) -> dict[str, Any]:
        import urllib.request

        req = urllib.request.Request(f"{base}{path}", method="GET")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def _get_bytes(self, base: str, path: str) -> bytes:
        import urllib.request

        req = urllib.request.Request(f"{base}{path}", method="GET")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    def _post(self, base: str, path: str, payload: dict[str, Any]) -> dict[str, Any]:
        import urllib.request

        body = json.dumps(payload).encode("utf-8")
        req = urllib.request.Request(
            f"{base}{path}",
            data=body,
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def connect_to_server(self, host: str, port: int) -> dict[str, Any]:
        base = f"http://{host}:{port}"
        pong = self._get(base, "/api/ping")
        info = self._get(base, "/api/node/info")
        record = {"base": base, "ping": pong, "info": info}
        self.connected[f"{host}:{port}"] = record
        return record

    def health_check(self, host: str, port: int) -> bool:
        try:
            self._get(f"http://{host}:{port}", "/api/ping")
            return True
        except Exception:
            return False

    def list_remote_indexes(self, host: str, port: int) -> list[dict[str, Any]]:
        return self._get(f"http://{host}:{port}", "/api/indexes")["indexes"]

    def load_remote_index(
        self, host: str, port: int, index_id: str
    ) -> "RemoteUnifiedIndex":
        base = f"http://{host}:{port}"
        info = self._get(base, f"/api/indexes/{index_id}/info")
        return RemoteUnifiedIndex(self, base, index_id, info)

    def list_remote_folders(self, host: str, port: int) -> list[dict[str, Any]]:
        return self._get(f"http://{host}:{port}", "/api/folders")["folders"]

    def list_folder_files(
        self, host: str, port: int, folder_id: str
    ) -> list[dict[str, Any]]:
        return self._get(
            f"http://{host}:{port}", f"/api/folders/{folder_id}/files"
        )["files"]

    def download_file(
        self, host: str, port: int, folder_id: str, rel_path: str, dest: str
    ) -> str:
        from pathlib import Path
        from urllib.parse import quote

        data = self._get_bytes(
            f"http://{host}:{port}",
            f"/api/folders/{folder_id}/file?path={quote(rel_path)}",
        )
        dest_path = Path(dest)
        dest_path.parent.mkdir(parents=True, exist_ok=True)
        dest_path.write_bytes(data)
        return str(dest_path)

    def upload_file(
        self, host: str, port: int, folder_id: str, rel_path: str,
        local_path: str,
    ) -> dict[str, Any]:
        import urllib.request
        from pathlib import Path
        from urllib.parse import quote

        data = Path(local_path).read_bytes()
        req = urllib.request.Request(
            f"http://{host}:{port}/api/folders/{folder_id}/upload"
            f"?path={quote(rel_path)}",
            data=data,
            method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def search_all(
        self, servers: list[tuple[str, int, str]], qvec: np.ndarray, top_k: int
    ) -> list[dict[str, Any]]:
        """Fan-out search across servers, merged by similarity
        (reference api.py:1661-1695)."""
        merged: list[dict[str, Any]] = []
        for host, port, index_id in servers:
            try:
                remote = RemoteUnifiedIndex(
                    self, f"http://{host}:{port}", index_id, {}
                )
                merged.extend(remote.search_vector(qvec, top_k))
            except Exception:
                continue
        merged.sort(key=lambda r: r.get("similarity_score", 0.0), reverse=True)
        return merged[:top_k]


class RemoteUnifiedIndex:
    """Local-index-API facade over a remote peer (reference api.py:60-247).

    Plugs into ``EnhancedRetrievalSystem.remote_indexes``; the facade
    merges its results with local hits by similarity score.
    """

    def __init__(
        self,
        client: NetworkClient,
        base: str,
        index_id: str,
        info: dict[str, Any],
    ) -> None:
        self.client = client
        self.base = base
        self.index_id = index_id
        self.info = info

    @property
    def ntotal(self) -> int:
        return int(self.info.get("ntotal", 0))

    @property
    def dim(self) -> int:
        return int(self.info.get("dim", 0))

    def search_vector(self, qvec: np.ndarray, top_k: int = 20) -> list[dict[str, Any]]:
        out = self.client._post(
            self.base,
            f"/api/indexes/{self.index_id}/search",
            {"query_vector": np.asarray(qvec, np.float32).tolist(), "top_k": top_k},
        )
        results = out.get("results", [])
        for r in results:
            r["source"] = f"remote:{self.base}"
        return results

    def get_thumbnail(self, row_id: int) -> bytes:
        return self.client._get_bytes(
            self.base, f"/api/indexes/{self.index_id}/thumbnail/{row_id}"
        )

    def get_full_image(self, row_id: int) -> bytes:
        return self.client._get_bytes(
            self.base, f"/api/indexes/{self.index_id}/image/{row_id}"
        )

    def get_metadata(self, row_id: int) -> dict[str, Any]:
        return self.client._get(
            self.base, f"/api/indexes/{self.index_id}/metadata/{row_id}"
        )["metadata"]
