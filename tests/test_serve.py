"""Serving layer tests: REST, WebSocket, rate limiting, P2P mesh.

Servers run on localhost ephemeral ports with a real (tiny) system —
the pattern the reference used for multi-node testing without a cluster
(`final_validation_test.py`).
"""

import base64
import io
import json
import socket
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from intelligent_video_analysis_retrieval_system_tpu.models import CLIPConfig
from intelligent_video_analysis_retrieval_system_tpu.serve.handlers import (
    RateLimiter,
    RequestHandler,
    format_results,
)
from intelligent_video_analysis_retrieval_system_tpu.system import (
    CLIPEmbedder,
    EnhancedRetrievalSystem,
)
from intelligent_video_analysis_retrieval_system_tpu.utils.config import Config


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def http_json(url, payload=None, method=None):
    if payload is not None:
        body = json.dumps(payload).encode()
        req = urllib.request.Request(
            url, data=body, method=method or "POST",
            headers={"Content-Type": "application/json"},
        )
    else:
        req = urllib.request.Request(url, method=method or "GET")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


@pytest.fixture(scope="module")
def served_system(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(2)
    folder = root / "keyframes" / "vid0"
    folder.mkdir(parents=True)
    for n in range(8):
        arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
    cfg = Config(config_file=None, base_dir=root, create_dirs=True,
                 overrides={"index": {"dtype": "float32", "thumbnail_size": 32}})
    system = EnhancedRetrievalSystem(
        cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                   compute_dtype="float32")
    )
    system.build_system(root / "keyframes")
    port = free_port()
    server = system.start_server(host="127.0.0.1", port=port, block=False)
    yield root, system, port
    server.stop()
    system.cleanup()


class TestHandlers:
    def test_rate_limiter_window(self):
        rl = RateLimiter(limit_per_minute=3, window_s=0.2)
        assert all(rl.allow("c") for _ in range(3))
        assert not rl.allow("c")
        assert rl.allow("other")  # independent client
        time.sleep(0.25)
        assert rl.allow("c")  # window slid

    def test_remaining(self):
        rl = RateLimiter(limit_per_minute=5)
        rl.allow("c")
        rl.allow("c")
        assert rl.remaining("c") == 3

    def test_validation(self):
        h = RequestHandler(RateLimiter(1000))
        ok, err = h.validate_request("search", {"query": "cat"})
        assert ok
        ok, err = h.validate_request("search", {})
        assert not ok and "query" in err
        ok, err = h.validate_request("search", {"query": "x", "mode": "bogus"})
        assert not ok and "mode" in err
        ok, err = h.validate_request("search", {"query": "x", "limit": 9999})
        assert not ok and "limit" in err
        ok, err = h.validate_request("nope", {"a": 1})
        assert not ok

    def test_format_detail_levels(self):
        rich = [{
            "folder": "v", "image": "1.jpg", "similarity_score": 0.5, "rank": 1,
            "frame_id": 3, "pts_time": 0.1, "path": "/x", "fps": 25.0,
            "shot_id": 0, "tags": [], "source": "local", "explanation": "e",
        }]
        assert set(format_results(rich, "minimal")[0]) == {
            "folder", "image", "similarity_score", "rank"
        }
        assert "path" in format_results(rich, "standard")[0]
        assert "explanation" in format_results(rich, "rich")[0]
        assert format_results(rich, "full") == rich


class TestRESTServer:
    def test_health(self, served_system):
        _, _, port = served_system
        status, body = http_json(f"http://127.0.0.1:{port}/api/health")
        assert status == 200 and body["success"] and body["index_loaded"]

    def test_search_endpoint(self, served_system):
        _, _, port = served_system
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/search",
            {"query": "a person", "limit": 3, "detail_level": "minimal"},
        )
        assert status == 200 and body["success"]
        assert body["count"] == 3
        assert set(body["results"][0]) == {
            "folder", "image", "similarity_score", "rank"
        }
        assert body["latency_ms"] > 0

    def test_search_batch_endpoint(self, served_system):
        _, system, port = served_system
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/search_batch",
            {"queries": ["a person", "a car"], "limit": 3,
             "detail_level": "minimal"},
        )
        assert status == 200 and body["success"]
        assert len(body["results"]) == 2
        assert body["count"] == 6
        # per-query parity with the single-query endpoint
        s, single = http_json(
            f"http://127.0.0.1:{port}/api/search",
            {"query": "a person", "limit": 3, "detail_level": "minimal"},
        )
        assert s == 200 and body["results"][0] == single["results"]
        # validation: non-string entries and oversize batches rejected
        status, _ = http_json(
            f"http://127.0.0.1:{port}/api/search_batch", {"queries": [1, 2]}
        )
        assert status == 400
        status, _ = http_json(
            f"http://127.0.0.1:{port}/api/search_batch",
            {"queries": ["q"] * 257},
        )
        assert status == 400

    def test_degradation_surfaced(self, served_system):
        """Round-4 (VERDICT r3 #3): a deployment running the hash-fallback
        tokenizer / random-init weights must say so in /api/health
        (first-class fields) AND on every text-search response — never a
        green envelope over degraded semantics."""
        _, system, port = served_system
        system.embedder.ensure_loaded()
        status, body = http_json(f"http://127.0.0.1:{port}/api/health")
        assert status == 200
        assert body["tokenizer_kind"] == "hash_fallback"
        assert body["weights"] == "random_init"
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/search",
            {"query": "anything", "limit": 2},
        )
        assert status == 200 and body["success"]
        assert "hash-fallback tokenizer" in body.get("warning", "")
        assert "random-initialized" in body["warning"]

    def test_search_validation_errors(self, served_system):
        _, _, port = served_system
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/search", {"limit": 3}
        )
        assert status == 400 and not body["success"]
        status, _ = http_json(
            f"http://127.0.0.1:{port}/api/search", {"query": "x", "limit": 0}
        )
        assert status == 400

    def test_image_search_endpoint(self, served_system):
        root, _, port = served_system
        raw = (root / "keyframes" / "vid0" / "2.jpg").read_bytes()
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/image_search",
            {"image_base64": base64.b64encode(raw).decode(), "limit": 2},
        )
        assert status == 200
        assert body["results"][0]["image"] == "2.jpg"

    def test_image_search_bad_payload(self, served_system):
        _, _, port = served_system
        status, _ = http_json(
            f"http://127.0.0.1:{port}/api/image_search",
            {"image_base64": "bm90anBn"},
        )
        assert status == 400

    def test_metadata_and_thumbnail(self, served_system):
        _, _, port = served_system
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/metadata/vid0/1.jpg"
        )
        assert status == 200 and body["metadata"]["frame_id"] == 1
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/thumbnail/vid0/1.jpg"
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.headers["Content-Type"] == "image/jpeg"
            assert resp.read()[:2] == b"\xff\xd8"
        status, _ = http_json(f"http://127.0.0.1:{port}/api/metadata/vid0/nope.jpg")
        assert status == 404

    def test_chat_translate_stats(self, served_system):
        _, _, port = served_system
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/chat", {"message": "hello"}
        )
        assert status == 200 and body["method"] == "greeting"
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/translate", {"text": "con mèo"}
        )
        assert status == 200 and "cat" in body["clip_prompt"]
        status, body = http_json(f"http://127.0.0.1:{port}/api/stats")
        assert status == 200 and body["stats"]["index"]["ntotal"] == 8

    def test_export_endpoint(self, served_system):
        _, _, port = served_system
        results = [{"folder": "v", "image": "1.jpg", "similarity_score": 0.5}]
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/export",
            {"results": results, "format": "json"},
        )
        assert status == 200 and body == results

    def test_console_served(self, served_system):
        _, _, port = served_system
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=10) as r:
            page = r.read()
        assert b"IVARS-TPU" in page
        for tab in (b"Search", b"Image search", b"Chat", b"Stats"):
            assert tab in page

    def test_websocket_events(self, served_system):
        import asyncio

        import aiohttp

        _, _, port = served_system

        async def run():
            async with aiohttp.ClientSession() as session:
                async with session.ws_connect(
                    f"http://127.0.0.1:{port}/ws"
                ) as ws:
                    await ws.send_json(
                        {"event": "ping", "request_id": "r1"}
                    )
                    pong = await ws.receive_json()
                    assert pong["event"] == "pong" and pong["request_id"] == "r1"
                    await ws.send_json(
                        {"event": "search",
                         "data": {"query": "a cat", "limit": 2}}
                    )
                    result = await ws.receive_json()
                    assert result["event"] == "result"
                    assert result["count"] == 2
                    await ws.send_json({"event": "bogus", "data": {}})
                    err = await ws.receive_json()
                    assert err["event"] == "error"
            return True

        assert asyncio.run(run())


class TestConsoleBuildAndNetworkPanel:
    """Round-2 console surface (VERDICT r1 #7): build wizard with progress,
    peer/network panel, export button — every GUI-triggered capability from
    the reference reachable over HTTP (gui.py:5021-5454, 3248-4606)."""

    def test_build_endpoint_end_to_end(self, tmp_path):
        # own system+server: the build wizard rewrites the live index, so
        # it must not touch the shared module fixture
        rng = np.random.default_rng(9)
        kf = tmp_path / "keyframes" / "vidX"
        kf.mkdir(parents=True)
        for n in range(4):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(kf / f"{n}.jpg", quality=95)
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"dtype": "float32",
                                          "thumbnail_size": 32}})
        system = EnhancedRetrievalSystem(
            cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                       compute_dtype="float32")
        )
        port = free_port()
        server = system.start_server(host="127.0.0.1", port=port, block=False)
        try:
            base = f"http://127.0.0.1:{port}"
            code, out = http_json(
                f"{base}/api/build",
                {"keyframes_dir": str(tmp_path / "keyframes")},
            )
            assert code == 200 and out["success"]
            deadline = time.time() + 60
            status = {}
            while time.time() < deadline:
                _, status = http_json(f"{base}/api/build/status")
                if status.get("status") in ("done", "error"):
                    break
                time.sleep(0.3)
            assert status.get("status") == "done", status
            assert status.get("processed") == 4
            # the freshly built index is live for search
            code, res = http_json(f"{base}/api/search",
                                  {"query": "a scene", "limit": 2})
            assert code == 200 and res["success"]
        finally:
            server.stop()
            system.cleanup()

    def test_open_smart_load_and_maintenance(self, tmp_path):
        """Round-3 console surface: /api/open autodetect (rvdb path, folder
        scan, portable package — reference gui.py:5686-5818) and
        /api/maintenance actions (system.py:1121-1213)."""
        rng = np.random.default_rng(13)
        kf = tmp_path / "keyframes" / "vidY"
        kf.mkdir(parents=True)
        for n in range(4):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(kf / f"{n}.jpg", quality=95)
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"dtype": "float32",
                                          "thumbnail_size": 32}})
        system = EnhancedRetrievalSystem(
            cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                       compute_dtype="float32")
        )
        build = system.build_system(tmp_path / "keyframes")
        rvdb = build["index_path"]
        pkg = system.export_portable_index(tmp_path / "pkg")
        port = free_port()
        server = system.start_server(host="127.0.0.1", port=port, block=False)
        try:
            base = f"http://127.0.0.1:{port}"
            # exact .rvdb path
            code, out = http_json(f"{base}/api/open", {"path": rvdb})
            assert code == 200 and out["success"] and out["kind"] == "rvdb"
            assert out["ntotal"] == 4
            # folder scan picks the newest .rvdb
            code, out = http_json(
                f"{base}/api/open", {"path": str(Path(rvdb).parent)}
            )
            assert code == 200 and out["kind"].startswith("rvdb:")
            # portable package dir (manifest.json)
            code, out = http_json(f"{base}/api/open", {"path": str(pkg)})
            assert code == 200 and out["kind"] == "portable"
            assert out["ntotal"] == 4
            # searches work on the opened index
            code, res = http_json(f"{base}/api/search",
                                  {"query": "a scene", "limit": 2})
            assert code == 200 and res["success"] and res["count"] == 2
            # errors: missing path / nothing there
            code, _ = http_json(f"{base}/api/open", {})
            assert code == 400
            code, _ = http_json(f"{base}/api/open",
                                {"path": str(tmp_path / "nope")})
            assert code == 404
            # maintenance actions
            code, out = http_json(f"{base}/api/maintenance",
                                  {"action": "optimize"})
            assert code == 200 and "cache" in out["report"]
            code, out = http_json(f"{base}/api/maintenance",
                                  {"action": "clear_cache"})
            assert code == 200 and out["report"]["cleared"]
            # compact on a portable-loaded read-only index may 403; reopen
            # the rvdb writable first, then compact (0 tombstones -> no-op)
            code, out = http_json(f"{base}/api/open",
                                  {"path": rvdb, "writable": True})
            assert code == 200
            code, out = http_json(f"{base}/api/maintenance",
                                  {"action": "compact"})
            assert code == 200 and out["report"]["compacted"] == 0
            # build the IVF latency structure on the live server
            code, out = http_json(f"{base}/api/maintenance",
                                  {"action": "build_ann", "nlist": 2})
            assert code == 200 and out["report"]["nlist"] == 2
            assert system.index.ann_active
            code, res = http_json(f"{base}/api/search",
                                  {"query": "a scene", "limit": 2})
            assert code == 200 and res["success"] and res["count"] == 2
            # auto-tune nprobe to a recall target on the live server
            code, out = http_json(
                f"{base}/api/maintenance",
                {"action": "tune_ann", "target_recall": 0.9, "sample": 4},
            )
            assert code == 200
            rep = out["report"]
            assert rep["nprobe"] >= 1 and rep["ladder"]
            assert system.index.config.ann_nprobe == rep["nprobe"]
            # measure the IVF/dense crossover on the live server; the
            # result installs AND persists as ann_max_batch (round 5)
            code, out = http_json(
                f"{base}/api/maintenance",
                {"action": "measure_crossover", "batch_sizes": [1, 2],
                 "repeats": 1},
            )
            assert code == 200
            rep = out["report"]
            assert 0 <= rep["max_batch"] <= 2 and rep["ladder"]
            assert system.index.config.ann_max_batch == rep["max_batch"]
            assert system.index._ann_crossover_measured
            code, _ = http_json(f"{base}/api/maintenance",
                                {"action": "bogus"})
            assert code == 400
        finally:
            server.stop()
            system.cleanup()

    def test_server_stop_run_cycle(self, tmp_path):
        """stop() then run() must serve again: the dedicated executor and
        the batcher are recreated/restarted (regression: stop() shut the
        pool down permanently -> every handler failed after a restart)."""
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"api": {"batching": True}})
        system = EnhancedRetrievalSystem(
            cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                       compute_dtype="float32")
        )
        from intelligent_video_analysis_retrieval_system_tpu.serve.rest import (
            RetrievalServer,
        )

        port = free_port()
        server = RetrievalServer(system, host="127.0.0.1", port=port)
        server.run(block=False)
        code, out = http_json(f"http://127.0.0.1:{port}/api/stats")
        assert code == 200 and out["success"]
        server.stop()
        server.run(block=False)
        try:
            code, out = http_json(f"http://127.0.0.1:{port}/api/stats")
            assert code == 200 and out["success"], out
            # the search handler path (executor + batcher) works too
            code, out = http_json(f"http://127.0.0.1:{port}/api/search",
                                  {"query": "anything", "limit": 2})
            assert code == 200 and out["success"], out  # no index -> []
        finally:
            server.stop()
            system.cleanup()

    def test_search_survives_index_swap_under_load(self, tmp_path):
        """Soak: concurrent /api/search while /api/open hot-swaps the live
        index. Every response must be a JSON envelope (200 success or 503
        unavailable — never a raw 500), and the server must serve normally
        afterwards."""
        rng = np.random.default_rng(21)
        kf = tmp_path / "keyframes" / "vidZ"
        kf.mkdir(parents=True)
        for n in range(4):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(kf / f"{n}.jpg", quality=95)
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"dtype": "float32",
                                          "thumbnail_size": 32},
                                "api": {"batching": True,
                                        "rate_limit_per_minute": 10**9}})
        system = EnhancedRetrievalSystem(
            cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                       compute_dtype="float32")
        )
        build = system.build_system(tmp_path / "keyframes")
        rvdb = build["index_path"]
        port = free_port()
        server = system.start_server(host="127.0.0.1", port=port, block=False)
        base = f"http://127.0.0.1:{port}"
        stop = threading.Event()
        bad: list = []

        def hammer(tid: int) -> None:
            i = 0
            while not stop.is_set():
                i += 1
                try:
                    code, out = http_json(
                        f"{base}/api/search",
                        {"query": f"scene {tid} {i}", "limit": 2},
                    )
                except Exception as exc:  # non-JSON body = raw 500 leak
                    bad.append(f"t{tid}: {type(exc).__name__}: {exc}")
                    return
                if code == 200 and out.get("success"):
                    continue
                if code == 503 and out.get("error"):
                    continue
                bad.append(f"t{tid}: unexpected {code}: {out}")
                return

        threads = [threading.Thread(target=hammer, args=(t,))
                   for t in range(4)]
        try:
            for t in threads:
                t.start()
            for _ in range(6):  # hot-swap the index under fire
                code, out = http_json(f"{base}/api/open", {"path": rvdb})
                assert code == 200, out
                time.sleep(0.05)
            stop.set()
            for t in threads:
                t.join(timeout=30)
            assert not bad, bad
            code, out = http_json(f"{base}/api/search",
                                  {"query": "after swap", "limit": 2})
            assert code == 200 and out["success"] and out["count"] == 2
        finally:
            stop.set()
            server.stop()
            system.cleanup()

    def test_console_has_round3_controls(self, served_system):
        import urllib.request

        _, _, port = served_system
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read().decode()
        for needle in ("doOpen", "doMaint", "doSimilar", "openZoom",
                       "zoomable", "/api/open", "/api/maintenance"):
            assert needle in html, needle

    def test_build_validation_and_conflict(self, served_system):
        root, _, port = served_system
        base = f"http://127.0.0.1:{port}"
        code, out = http_json(f"{base}/api/build", {})
        assert code == 400
        code, out = http_json(f"{base}/api/build",
                              {"keyframes_dir": "/nonexistent/dir"})
        assert code == 400

    def test_network_panel_roundtrip(self, served_system):
        from intelligent_video_analysis_retrieval_system_tpu.serve.p2p import (
            NetworkServer,
        )

        root, system, port = served_system
        base = f"http://127.0.0.1:{port}"
        index_path = root / "index" / "index.rvdb"
        peer_port = free_port()
        peer = NetworkServer("127.0.0.1", peer_port, node_name="peerB",
                             enable_discovery=False)
        peer.register_index_file("sharedB", str(index_path))
        peer.start_server()
        try:
            # connect from the console API
            code, out = http_json(
                f"{base}/api/network/connect",
                {"host": "127.0.0.1", "port": peer_port},
            )
            assert code == 200 and out["success"], out
            assert out["indexes"][0]["index_id"] == "sharedB"

            code, out = http_json(
                f"{base}/api/network/load_remote",
                {"host": "127.0.0.1", "port": peer_port,
                 "index_id": "sharedB"},
            )
            assert code == 200 and out["success"] and out["ntotal"] >= 4

            # idempotent: second load reports already_loaded
            code, out = http_json(
                f"{base}/api/network/load_remote",
                {"host": "127.0.0.1", "port": peer_port,
                 "index_id": "sharedB"},
            )
            assert out.get("already_loaded")

            code, out = http_json(f"{base}/api/network/peers")
            assert out["remote_indexes"][0]["index_id"] == "sharedB"
            assert len(system.remote_indexes) == 1

            code, out = http_json(f"{base}/api/network/unload_remote",
                                  {"index_id": "sharedB"})
            assert out["removed"] == 1 and not system.remote_indexes
        finally:
            peer.stop_server()
            system.remote_indexes.clear()

    def test_network_discover_validates_wait_s(self, served_system):
        """Regression: bad wait_s used to 500 (uncaught ValueError /
        negative time.sleep); must be a 400 envelope."""
        root, _, port = served_system
        base = f"http://127.0.0.1:{port}"
        code, out = http_json(
            f"{base}/api/network/discover", {"wait_s": "abc"}
        )
        assert code == 400 and not out["success"]
        # negative values clamp to 0 and succeed (listen-only snapshot)
        code, out = http_json(
            f"{base}/api/network/discover", {"wait_s": -5}
        )
        assert code == 200 and out["success"]
        assert isinstance(out["nodes"], list)

    def test_console_escapes_peer_controlled_html(self, served_system):
        """The esc() helper must neutralize element AND attribute breakout
        (peer names/ids arrive from unauthenticated UDP/HTTP)."""
        root, _, port = served_system
        req = urllib.request.Request(f"http://127.0.0.1:{port}/")
        with urllib.request.urlopen(req, timeout=10) as resp:
            html = resp.read().decode()
        assert "&quot;" in html and "esc(n.node_name" in html
        assert "onclick=\"loadRemote('" not in html  # no inline-JS splicing

    def test_network_connect_failure_is_502(self, served_system):
        root, _, port = served_system
        base = f"http://127.0.0.1:{port}"
        code, out = http_json(
            f"{base}/api/network/connect",
            {"host": "127.0.0.1", "port": free_port()},
        )
        assert code == 502 and not out["success"]

    def test_concurrent_rest_search_during_append(self, served_system):
        """Serving-level soak: parallel /api/search requests racing a live
        incremental append must all succeed with valid payloads, and
        post-append searches must see the new rows (extends the
        index-level concurrency test to the full HTTP stack)."""
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.results import (
            KeyframeMetadata,
        )

        root, system, port = served_system
        url = f"http://127.0.0.1:{port}/api/search"
        before = system.index.ntotal
        dim = system.index.dim
        errors, codes = [], []
        lock = threading.Lock()

        def hammer(tid):
            for i in range(4):
                try:
                    code, out = http_json(
                        url, {"query": f"t{tid} q{i}", "limit": 3,
                              "detail_level": "minimal"},
                    )
                    with lock:
                        codes.append(code)
                    assert code == 200 and out["success"], (code, out)
                    assert len(out["results"]) == 3
                except Exception as exc:  # noqa: BLE001
                    with lock:
                        errors.append(exc)

        threads = [threading.Thread(target=hammer, args=(t,))
                   for t in range(6)]
        for t in threads:
            t.start()
        # appends race the in-flight searches
        rng = np.random.default_rng(9)
        for batch in range(3):
            rows = rng.standard_normal((2, dim)).astype(np.float32)
            rows /= np.linalg.norm(rows, axis=-1, keepdims=True)
            system.index.incremental_update(
                rows,
                [KeyframeMetadata(folder="appended",
                                  image=f"b{batch}_{j}.jpg",
                                  frame_id=100 + batch * 2 + j)
                 for j in range(2)],
            )
        for t in threads:
            t.join(timeout=30)
        assert not errors, errors
        assert len(codes) == 24 and all(c == 200 for c in codes)
        assert system.index.ntotal == before + 6
        # appended rows are searchable through REST
        code, out = http_json(url, {"query": "anything", "limit": 50,
                                    "detail_level": "minimal"})
        assert code == 200
        folders = {r["folder"] for r in out["results"]}
        assert "appended" in folders, folders
        # restore the shared fixture: tombstone the appended rows and
        # compact (also exercises delete+compact under the live server)
        removed = system.index.delete_keys(
            [("appended", f"b{b}_{j}.jpg") for b in range(3)
             for j in range(2)]
        )
        assert removed["deleted"] == 6
        system.index.compact()
        assert system.index.ntotal == before
        code, out = http_json(url, {"query": "anything", "limit": 50,
                                    "detail_level": "minimal"})
        assert "appended" not in {r["folder"] for r in out["results"]}

    def test_ann_soak_under_concurrent_mutation(self, tmp_path):
        """ANN serving soak: parallel /api/search racing a live build_ann
        rebuild, tune_ann, appends (tail registration) and deletes — every
        request must succeed and the final state must be consistent.
        Dedicated server: build_ann would change the shared fixture's
        routing for later tests."""
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.results import (
            KeyframeMetadata,
        )

        rng = np.random.default_rng(23)
        folder = tmp_path / "keyframes" / "v"
        folder.mkdir(parents=True)
        for n in range(24):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
        cfg = Config(
            config_file=None, base_dir=tmp_path, create_dirs=True,
            overrides={"index": {"dtype": "float32", "thumbnail_size": 32,
                                 "index_type": "ivf", "ann_nlist": 4,
                                 "ann_nprobe": 4}},
        )
        system = EnhancedRetrievalSystem(
            cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                       compute_dtype="float32")
        )
        system.build_system(tmp_path / "keyframes")
        assert system.index.ann_active
        port = free_port()
        server = system.start_server(host="127.0.0.1", port=port,
                                     block=False)
        base = f"http://127.0.0.1:{port}"
        errors, codes = [], []
        lock = threading.Lock()

        def hammer(tid):
            for i in range(5):
                try:
                    code, out = http_json(
                        f"{base}/api/search",
                        {"query": f"t{tid} q{i}", "limit": 2,
                         "detail_level": "minimal"},
                    )
                    with lock:
                        codes.append(code)
                    assert code == 200 and out["success"], (code, out)
                except Exception as exc:  # noqa: BLE001
                    with lock:
                        errors.append(exc)

        try:
            threads = [threading.Thread(target=hammer, args=(t,))
                       for t in range(4)]
            for t in threads:
                t.start()
            # mutations race the in-flight ANN searches
            dim = system.index.dim
            rows = rng.standard_normal((3, dim)).astype(np.float32)
            rows /= np.linalg.norm(rows, axis=-1, keepdims=True)
            system.index.incremental_update(
                rows,
                [KeyframeMetadata(folder="app", image=f"{j}.jpg",
                                  frame_id=200 + j) for j in range(3)],
            )
            code, out = http_json(f"{base}/api/maintenance",
                                  {"action": "build_ann", "nlist": 4})
            assert code == 200, out
            code, out = http_json(
                f"{base}/api/maintenance",
                {"action": "tune_ann", "target_recall": 0.9, "sample": 4},
            )
            assert code == 200, out
            system.index.delete_keys([("app", "0.jpg")])
            for t in threads:
                t.join(timeout=60)
            assert not errors, errors
            assert len(codes) == 20 and all(c == 200 for c in codes)
            assert system.index.ann_active
            # post-soak state: appended rows searchable, deleted row gone
            hits = system.index.search_vectors(rows, top_k=1)
            got = [h[0].metadata.folder if h else None for h in hits]
            assert got[1] == "app" and got[2] == "app"
            assert all(
                h.metadata.key != ("app", "0.jpg")
                for hs in system.index.search_vectors(rows[:1], top_k=5)
                for h in hs
            )
        finally:
            server.stop()
            system.cleanup()

    def test_console_has_new_panels(self, served_system):
        root, _, port = served_system
        req = urllib.request.Request(f"http://127.0.0.1:{port}/")
        with urllib.request.urlopen(req, timeout=10) as resp:
            html = resp.read().decode()
        for needle in ("doBuild", "doDiscover", "doConnect", "doExport",
                       "build_progress", "load_remote"):
            assert needle in html, needle

    def test_console_has_round4_controls(self, served_system):
        """CSV-list staging + filter-tool launcher (reference GUI
        gui.py:756-1666 and gui.py:4967-5019)."""
        root, _, port = served_system
        req = urllib.request.Request(f"http://127.0.0.1:{port}/")
        with urllib.request.urlopen(req, timeout=10) as resp:
            html = resp.read().decode()
        for needle in ("exportStaged", "stageToChat", "stageFrame",
                       "doFilter", "filter_progress", "submission.csv",
                       "context_frames"):
            assert needle in html, needle

    def test_filter_endpoint_extract_and_refine(self, served_system,
                                                tmp_path):
        """/api/filter launches extract and refine jobs with status
        transitions (the console filter launcher's backend)."""
        import cv2
        import time as _time

        root, _, port = served_system
        vids = tmp_path / "vids"
        vids.mkdir()
        w = cv2.VideoWriter(str(vids / "v.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 25, (48, 48))
        for scene in range(3):
            img = np.full((48, 48, 3), scene * 80, np.uint8)
            for _ in range(10):
                w.write(img)
        w.release()

        status, body = http_json(
            f"http://127.0.0.1:{port}/api/filter",
            {"action": "extract", "input_dir": str(vids)},
        )
        assert status == 200 and body["success"]
        for _ in range(100):
            _time.sleep(0.3)
            _, st = http_json(f"http://127.0.0.1:{port}/api/build/status")
            if st["status"] in ("done", "error"):
                break
        assert st["status"] == "done", st
        assert st["frames_kept"] >= 3  # 3 distinct scenes survive dedup
        kf = vids / "keyframes"
        assert (kf / "v").is_dir() and (vids / "map" / "v.csv").is_file()

        status, body = http_json(
            f"http://127.0.0.1:{port}/api/filter",
            {"action": "refine", "input_dir": str(kf),
             "preset": "similarity_only"},
        )
        assert status == 200 and body["success"]
        for _ in range(100):
            _time.sleep(0.3)
            _, st = http_json(f"http://127.0.0.1:{port}/api/build/status")
            if st["status"] in ("done", "error"):
                break
        assert st["status"] == "done", st
        assert st["frames_in"] >= st["frames_out"] > 0

        status, body = http_json(
            f"http://127.0.0.1:{port}/api/filter",
            {"action": "bogus", "input_dir": str(vids)},
        )
        assert status == 400


class TestP2P:
    def test_same_host_discovery_via_well_known_port(self):
        """Regression: with DEFAULT ports, a listen-only consumer on one
        service port must hear a peer announcing from another — requires
        (a) the shared well-known discovery port (per-port offsets never
        meet), (b) per-(host,port) node ids (hostname-only ids made
        same-host nodes discard each other as 'self'), and (c) no
        SO_REUSEPORT (loopback unicast goes to one hash-chosen member)."""
        from intelligent_video_analysis_retrieval_system_tpu.serve.p2p import (
            NetworkDiscovery,
        )

        console = NetworkDiscovery(service_port=free_port(), listen_only=True,
                                   interval_s=0.2)
        console.start_discovery()
        peer = NetworkDiscovery(service_port=free_port(), interval_s=0.2,
                                node_name="wkp-peer")
        assert console.node_id != peer.node_id
        peer.start_discovery()
        try:
            deadline = time.time() + 5
            while time.time() < deadline:
                if any(n["node_name"] == "wkp-peer"
                       for n in console.get_nodes()):
                    break
                time.sleep(0.1)
            nodes = console.get_nodes()
            assert any(n["node_name"] == "wkp-peer" and
                       n["service_port"] == peer.service_port
                       for n in nodes), nodes
            # listen-only: the peer never hears the console
            assert not any(n["node_id"] == console.node_id
                           for n in peer.get_nodes())
        finally:
            console.stop_discovery()
            peer.stop_discovery()

    def test_two_node_mesh(self, served_system, tmp_path):
        """Two peer servers in one process (reference final_validation_test
        pattern): share an index, remote search, merge into local results."""
        from intelligent_video_analysis_retrieval_system_tpu.serve.p2p import (
            NetworkClient,
            NetworkServer,
        )

        root, system, _ = served_system
        index_path = root / "index" / "index.rvdb"
        port_a = free_port()
        server_a = NetworkServer("127.0.0.1", port_a, node_name="nodeA",
                                 enable_discovery=False)
        server_a.register_index_file("shared", str(index_path))
        server_a.start_server()
        try:
            client = NetworkClient()
            record = client.connect_to_server("127.0.0.1", port_a)
            assert record["ping"]["status"] == "ok"
            listed = client.list_remote_indexes("127.0.0.1", port_a)
            assert listed[0]["index_id"] == "shared"
            assert listed[0]["ntotal"] == 8

            remote = client.load_remote_index("127.0.0.1", port_a, "shared")
            qvec = system.embedder.encode_text(["a scene"])[0]
            hits = remote.search_vector(qvec, top_k=3)
            assert len(hits) == 3
            assert hits[0]["source"].startswith("remote:")
            assert remote.get_thumbnail(0)[:2] == b"\xff\xd8"
            assert remote.get_metadata(0)["folder"] == "vid0"

            # plug into the facade: fan-in merge must dedup local+remote
            system.remote_indexes.append(remote)
            try:
                from intelligent_video_analysis_retrieval_system_tpu.system import (
                    SearchOptions,
                )

                merged = system.search(
                    "a scene", SearchOptions(limit=5, use_cache=False)
                )
                assert len(merged) == 5
            finally:
                system.remote_indexes.clear()
        finally:
            server_a.stop_server()
        assert not client.health_check("127.0.0.1", port_a)  # clean shutdown

    def test_remote_search_validates_dim(self, served_system):
        from intelligent_video_analysis_retrieval_system_tpu.serve.p2p import (
            NetworkServer,
        )

        root, _, _ = served_system
        port = free_port()
        server = NetworkServer("127.0.0.1", port, enable_discovery=False)
        server.register_index_file("s", str(root / "index" / "index.rvdb"))
        server.start_server()
        try:
            status, body = http_json(
                f"http://127.0.0.1:{port}/api/indexes/s/search",
                {"query_vector": [1.0, 2.0], "top_k": 3},
            )
            assert status == 400
            status, _ = http_json(
                f"http://127.0.0.1:{port}/api/indexes/nope/search",
                {"query_vector": [0.0] * 32},
            )
            assert status == 404
        finally:
            server.stop_server()

    def test_discovery_loopback(self):
        from intelligent_video_analysis_retrieval_system_tpu.serve.p2p import (
            NetworkDiscovery,
        )

        port = free_port()
        disc_port = free_port()
        a = NetworkDiscovery(port, discovery_port=disc_port, interval_s=0.1,
                             node_name="A")
        b = NetworkDiscovery(port + 1, discovery_port=disc_port, interval_s=0.1,
                             node_name="B")
        # node ids must differ on one host WITHOUT manual overrides
        # (identity includes the service port; same-host nodes used to
        # collide and discard each other's announcements)
        assert a.node_id != b.node_id
        found = threading.Event()
        a.on_node_discovered = lambda node: found.set()
        a.start_discovery()
        try:
            time.sleep(0.2)
            b.broadcast_once()
            assert found.wait(timeout=3), "node B not discovered"
            nodes = a.get_nodes()
            assert any(n["node_name"] == "B" for n in nodes)
        finally:
            a.stop_discovery()
            assert not a.is_running


class TestSharedFolders:
    def test_folder_share_list_download(self, served_system, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.serve.p2p import (
            NetworkClient,
            NetworkServer,
        )

        share_root = tmp_path / "share"
        (share_root / "sub").mkdir(parents=True)
        (share_root / "a.txt").write_text("hello")
        (share_root / "sub" / "b.bin").write_bytes(b"\x01\x02")
        port = free_port()
        server = NetworkServer("127.0.0.1", port, enable_discovery=False)
        server.register_folder("stuff", str(share_root))
        server.start_server()
        try:
            client = NetworkClient()
            folders = client.list_remote_folders("127.0.0.1", port)
            assert folders[0]["folder_id"] == "stuff"
            files = client.list_folder_files("127.0.0.1", port, "stuff")
            assert {f["path"] for f in files} == {"a.txt", "sub/b.bin"}
            dest = tmp_path / "dl" / "b.bin"
            client.download_file("127.0.0.1", port, "stuff", "sub/b.bin",
                                 str(dest))
            assert dest.read_bytes() == b"\x01\x02"
        finally:
            server.stop_server()

    def test_path_traversal_blocked(self, served_system, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.serve.p2p import (
            NetworkServer,
        )

        share_root = tmp_path / "share2"
        share_root.mkdir()
        (tmp_path / "secret.txt").write_text("secret")
        port = free_port()
        server = NetworkServer("127.0.0.1", port, enable_discovery=False)
        server.register_folder("s", str(share_root))
        server.start_server()
        try:
            status, body = http_json(
                f"http://127.0.0.1:{port}/api/folders/s/file?path=../secret.txt"
            )
            assert status == 403
            status, _ = http_json(
                f"http://127.0.0.1:{port}/api/folders/s/file?path=nope.txt"
            )
            assert status == 404
        finally:
            server.stop_server()


class TestQueryBatcher:
    def test_batches_concurrent_requests(self, served_system):
        from concurrent.futures import ThreadPoolExecutor

        from intelligent_video_analysis_retrieval_system_tpu.serve.batching import (
            QueryBatcher,
        )

        _, system, _ = served_system
        batcher = QueryBatcher(system, window_ms=50.0, max_batch=16)
        batcher.start()
        try:
            queries = [f"scene number {i}" for i in range(8)]
            with ThreadPoolExecutor(8) as pool:
                futures = [pool.submit(batcher.search, q, 3) for q in queries]
                results = [f.result(timeout=30) for f in futures]
            assert all(len(r) == 3 for r in results)
            assert batcher.stats.requests == 8
            # concurrency + 50ms window must have produced real batches
            assert batcher.stats.max_batch_seen >= 2
            assert batcher.stats.batches < 8
        finally:
            batcher.stop()
        assert not batcher.is_running

    def test_batched_matches_unbatched(self, served_system):
        from intelligent_video_analysis_retrieval_system_tpu.serve.batching import (
            QueryBatcher,
        )
        from intelligent_video_analysis_retrieval_system_tpu.system import (
            SearchOptions,
        )

        _, system, _ = served_system
        batcher = QueryBatcher(system, window_ms=1.0)
        batcher.start()
        try:
            got = batcher.search("a colorful pattern", 4)
        finally:
            batcher.stop()
        want = system.search("a colorful pattern",
                             SearchOptions(limit=4, use_cache=False))
        assert [(r["folder"], r["image"]) for r in got] == [
            (r["folder"], r["image"]) for r in want
        ]

    def test_not_started_raises(self, served_system):
        from intelligent_video_analysis_retrieval_system_tpu.serve.batching import (
            QueryBatcher,
        )

        _, system, _ = served_system
        batcher = QueryBatcher(system)
        with pytest.raises(RuntimeError):
            batcher.search("x")

    def test_no_ann_micro_batch_shrinking(self, served_system):
        """The batcher must NOT shrink micro-batches below max_batch when
        ANN is active. Rounds 3-4 capped micro-batches at ann_max_batch to
        keep IVF engaged under load; the round-5 chip measurement showed
        per-batch routing dominates (dense amortizes one corpus pass over
        the whole batch: served 127 QPS uncapped vs 92 capped at 10M), so
        batches grow to max_batch and UnifiedIndex.search_vectors routes
        each whole batch by the measured crossover."""
        from intelligent_video_analysis_retrieval_system_tpu.serve.batching import (
            QueryBatcher,
            _Pending,
        )

        _, system, _ = served_system

        class _AnnIndex:
            ann_active = True

            class config:
                ann_max_batch = 4

        real = system.index
        system.index = _AnnIndex()
        batcher = QueryBatcher(system, max_batch=64, window_ms=50.0)
        try:
            for i in range(9):  # 9 > the ANN crossover of 4
                batcher._queue.put(_Pending(query=f"q{i}", top_k=5))
            batch = batcher._collect()
            assert len(batch) == 9  # grew past ann_max_batch
        finally:
            system.index = real

    def test_server_batching_path(self, tmp_path):
        """Server with api.batching=true serves correct results."""
        rng = np.random.default_rng(9)
        folder = tmp_path / "keyframes" / "v"
        folder.mkdir(parents=True)
        for n in range(4):
            Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                            ).save(folder / f"{n}.jpg")
        cfg = Config(config_file=None, base_dir=tmp_path, create_dirs=True,
                     overrides={"index": {"dtype": "float32"},
                                "api": {"batching": True}})
        system = EnhancedRetrievalSystem(
            cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                       compute_dtype="float32"))
        system.build_system(tmp_path / "keyframes")
        port = free_port()
        server = system.start_server(host="127.0.0.1", port=port, block=False)
        try:
            assert server.batcher is not None and server.batcher.is_running
            status, body = http_json(
                f"http://127.0.0.1:{port}/api/search",
                {"query": "something", "limit": 2},
            )
            assert status == 200 and body["count"] == 2
            assert server.batcher.stats.requests >= 1
        finally:
            server.stop()
            system.cleanup()


class TestFolderUpload:
    def test_upload_roundtrip(self, served_system, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.serve.p2p import (
            NetworkClient,
            NetworkServer,
        )

        share_root = tmp_path / "up"
        share_root.mkdir()
        src = tmp_path / "local.bin"
        src.write_bytes(b"payload-123")
        port = free_port()
        server = NetworkServer("127.0.0.1", port, enable_discovery=False)
        server.register_folder("inbox", str(share_root))
        server.start_server()
        try:
            client = NetworkClient()
            out = client.upload_file("127.0.0.1", port, "inbox",
                                     "sub/dest.bin", str(src))
            assert out["bytes"] == 11
            assert (share_root / "sub" / "dest.bin").read_bytes() == b"payload-123"
            # traversal blocked on upload too
            import urllib.error

            with pytest.raises(urllib.error.HTTPError):
                client.upload_file("127.0.0.1", port, "inbox",
                                   "../escape.bin", str(src))
        finally:
            server.stop_server()


class TestSimilarAndWSEvents:
    def test_similar_endpoint(self, served_system):
        _, _, port = served_system
        status, body = http_json(
            f"http://127.0.0.1:{port}/api/similar/vid0/1.jpg?limit=3"
        )
        assert status == 200 and body["count"] == 3
        assert all(r["image"] != "1.jpg" for r in body["results"])
        status, _ = http_json(f"http://127.0.0.1:{port}/api/similar/vid0/x.jpg")
        assert status == 404

    def test_ws_image_and_metadata_events(self, served_system):
        import asyncio

        import aiohttp

        root, _, port = served_system
        raw = (root / "keyframes" / "vid0" / "3.jpg").read_bytes()

        async def run():
            async with aiohttp.ClientSession() as session:
                async with session.ws_connect(f"http://127.0.0.1:{port}/ws") as ws:
                    await ws.send_json({"event": "image_search", "data": {
                        "image_base64": base64.b64encode(raw).decode(),
                        "limit": 2}})
                    out = await ws.receive_json()
                    assert out["event"] == "result"
                    assert out["results"][0]["image"] == "3.jpg"
                    await ws.send_json({"event": "metadata_query", "data": {
                        "folder": "vid0", "image": "2.jpg"}})
                    meta = await ws.receive_json()
                    assert meta["event"] == "metadata"
                    assert meta["metadata"]["frame_id"] == 2
                    await ws.send_json({"event": "semantic_search", "data": {
                        "query": "a scene", "limit": 2}})
                    sem = await ws.receive_json()
                    assert sem["event"] == "result" and sem["count"] == 2
            return True

        assert asyncio.run(run())


class TestAdminGate:
    """Optional auth for the mutation surface (round 4, ADVICE r3):
    api.admin_token gates /api/open, /api/maintenance, /api/build;
    api.open_root confines /api/open paths."""

    @pytest.fixture()
    def gated_server(self, tmp_path):
        rng = np.random.default_rng(4)
        folder = tmp_path / "keyframes" / "v"
        folder.mkdir(parents=True)
        for n in range(4):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            ).save(folder / f"{n}.jpg")
        cfg = Config(
            config_file=None, base_dir=tmp_path, create_dirs=True,
            overrides={
                "index": {"dtype": "float32"},
                "api": {"admin_token": "s3cret",
                        "open_root": str(tmp_path)},
                "logging": {"file": False},
            },
        )
        system = EnhancedRetrievalSystem(
            cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                       compute_dtype="float32"))
        system.build_system(tmp_path / "keyframes")
        port = free_port()
        server = system.start_server(host="127.0.0.1", port=port,
                                     block=False)
        yield port, system, tmp_path
        server.stop()
        system.cleanup()

    @staticmethod
    def _post(url, payload, token=None):
        import urllib.error
        import urllib.request

        headers = {"Content-Type": "application/json"}
        if token:
            headers["X-Admin-Token"] = token
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), headers=headers
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                return resp.status, json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read().decode())

    def test_maintenance_requires_token(self, gated_server):
        port, _, _ = gated_server
        url = f"http://127.0.0.1:{port}/api/maintenance"
        status, body = self._post(url, {"action": "clear_cache"})
        assert status == 401 and not body["success"]
        status, body = self._post(url, {"action": "clear_cache"},
                                  token="wrong")
        assert status == 401
        status, body = self._post(url, {"action": "clear_cache"},
                                  token="s3cret")
        assert status == 200 and body["success"]

    def test_bearer_header_accepted(self, gated_server):
        import urllib.request

        port, _, _ = gated_server
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/maintenance",
            data=json.dumps({"action": "clear_cache"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer s3cret"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200

    def test_open_requires_token_and_root(self, gated_server, tmp_path):
        port, system, root = gated_server
        url = f"http://127.0.0.1:{port}/api/open"
        index_path = str(system.index.path)
        status, _ = self._post(url, {"path": index_path})
        assert status == 401
        # inside open_root with the token: allowed
        status, body = self._post(url, {"path": index_path},
                                  token="s3cret")
        assert status == 200 and body["success"]
        # outside open_root: refused even WITH the token
        status, body = self._post(url, {"path": "/etc"}, token="s3cret")
        assert status == 403

    def test_build_requires_token(self, gated_server):
        port, _, root = gated_server
        status, _ = self._post(
            f"http://127.0.0.1:{port}/api/build",
            {"keyframes_dir": str(root / "keyframes")},
        )
        assert status == 401

    def test_search_never_gated(self, gated_server):
        port, _, _ = gated_server
        status, body = self._post(
            f"http://127.0.0.1:{port}/api/search",
            {"query": "anything", "limit": 2},
        )
        assert status == 200 and body["success"]


class TestSocketIOWire:
    """Socket.IO wire compatibility (/socket.io/, Engine.IO v4 +
    Socket.IO v5): the protocol existing reference clients speak
    (python-socketio server at reference api.py:2419-2941). No
    python-socketio in this env, so the tests speak the wire format
    raw — which also pins the exact bytes."""

    RS = "\x1e"

    @staticmethod
    def _get(url):
        with urllib.request.urlopen(url, timeout=15) as resp:
            return resp.read().decode()

    @staticmethod
    def _post(url, body):
        req = urllib.request.Request(
            url, data=body.encode(),
            headers={"Content-Type": "text/plain;charset=UTF-8"},
        )
        with urllib.request.urlopen(req, timeout=15) as resp:
            return resp.read().decode()

    def _handshake(self, port):
        text = self._get(
            f"http://127.0.0.1:{port}/socket.io/?EIO=4&transport=polling"
        )
        assert text.startswith("0"), text
        hello = json.loads(text[1:])
        assert "websocket" in hello["upgrades"]
        return hello["sid"]

    def _drain(self, port, sid):
        text = self._get(
            f"http://127.0.0.1:{port}/socket.io/"
            f"?EIO=4&transport=polling&sid={sid}"
        )
        return text.split(self.RS)

    def test_polling_connect_and_search(self, served_system):
        _, _, port = served_system
        sid = self._handshake(port)
        url = (f"http://127.0.0.1:{port}/socket.io/"
               f"?EIO=4&transport=polling&sid={sid}")
        assert self._post(url, "40") == "ok"
        packets = self._drain(port, sid)
        assert packets[0].startswith("40"), packets  # ns connect ack
        assert json.loads(packets[0][2:])["sid"]
        connected = json.loads(packets[1][2:])       # 42["connected", ...]
        assert connected[0] == "connected"
        assert "search" in connected[1]["capabilities"]

        self._post(url, '42["search", {"query": "a scene", "limit": 2}]')
        packets = self._drain(port, sid)
        name, data = json.loads(packets[0][2:])
        assert name == "result" and data["success"] and data["count"] == 2
        assert data["results"][0]["similarity_score"] > 0

    def test_polling_ack_stats_and_error(self, served_system):
        _, _, port = served_system
        sid = self._handshake(port)
        url = (f"http://127.0.0.1:{port}/socket.io/"
               f"?EIO=4&transport=polling&sid={sid}")
        self._post(url, "40")
        self._drain(port, sid)
        # ack id 7 -> 437[...] ack plus the named reply event
        self._post(url, '427["system_stats", {}]')
        packets = self._drain(port, sid)
        acks = [p for p in packets if p.startswith("437")]
        events = [p for p in packets if p.startswith("42")]
        assert acks and json.loads(acks[0][3:])[0]["success"]
        name, data = json.loads(events[0][2:])
        assert name == "system_stats" and "stats" in data
        # unknown event -> socket.io 'error' event (reference error path)
        self._post(url, '42["no_such_event", {}]')
        packets = self._drain(port, sid)
        name, data = json.loads(packets[0][2:])
        assert name == "error" and not data["success"]

    def test_direct_websocket_transport(self, served_system):
        import asyncio

        import aiohttp

        _, _, port = served_system

        async def run():
            async with aiohttp.ClientSession() as session:
                async with session.ws_connect(
                    f"http://127.0.0.1:{port}/socket.io/"
                    f"?EIO=4&transport=websocket"
                ) as ws:
                    hello = await ws.receive_str()
                    assert hello.startswith("0")
                    await ws.send_str("40")
                    assert (await ws.receive_str()).startswith("40")
                    name, _ = json.loads((await ws.receive_str())[2:])
                    assert name == "connected"
                    await ws.send_str(
                        '42["semantic_search", {"query": "x", "limit": 2}]'
                    )
                    name, data = json.loads((await ws.receive_str())[2:])
                    assert name == "semantic_search_result"
                    assert data["count"] == 2
            return True

        assert asyncio.run(run())

    def test_hostile_wire_input_never_kills_session(self, served_system):
        """Malformed Engine.IO/Socket.IO packets from an untrusted client
        must produce error envelopes or be ignored — never a 5xx or a
        broken session (a valid search must still work afterwards).
        Regression: ``42{"a":1}`` (object instead of array) used to
        raise an uncaught KeyError."""
        import urllib.error

        _, _, port = served_system
        sid = self._handshake(port)
        url = (f"http://127.0.0.1:{port}/socket.io/"
               f"?EIO=4&transport=polling&sid={sid}")
        self._post(url, "40")
        self._drain(port, sid)
        hostile = [
            '42{"a": 1}',            # object, not array
            '42"just a string"',
            "42[123]",               # non-string event name
            "42[]",                  # empty array
            "42[null]",
            '42[["nested"], {}]',
            "42" + "9" * 200,        # huge ack id, no payload
            "4",                     # empty socket.io packet
            "2",                     # eio ping
            "5",                     # upgrade packet over polling
            "9",                     # unknown eio type
            "\x00\x01\x02",          # binary junk
            "4" * 5000,              # long garbage
            "43[]",                  # unsolicited ack
        ]
        for payload in hostile:
            try:
                self._post(url, payload)
            except urllib.error.HTTPError as e:
                assert e.code < 500, (payload, e.code)
        # drain whatever error events queued, then prove the session and
        # the server still work end to end
        self._drain(port, sid)
        self._post(url, '42["search", {"query": "still alive", "top_k": 2}]')
        deadline = time.time() + 20
        got = []
        while time.time() < deadline:
            got += [p for p in self._drain(port, sid) if p.startswith("42")]
            if any('"result"' in p for p in got):
                break
        assert any('"result"' in p for p in got), got
        # a bad sid is a 400, not a crash
        try:
            self._post(
                f"http://127.0.0.1:{port}/socket.io/"
                f"?EIO=4&transport=polling&sid=bogus", "40")
            raise AssertionError("expected 400 for unknown sid")
        except urllib.error.HTTPError as e:
            assert e.code == 400

    def test_polling_to_websocket_upgrade(self, served_system):
        import asyncio

        import aiohttp

        _, _, port = served_system
        sid = self._handshake(port)
        url = (f"http://127.0.0.1:{port}/socket.io/"
               f"?EIO=4&transport=polling&sid={sid}")
        self._post(url, "40")
        self._drain(port, sid)

        async def run():
            async with aiohttp.ClientSession() as session:
                async with session.ws_connect(
                    f"http://127.0.0.1:{port}/socket.io/"
                    f"?EIO=4&transport=websocket&sid={sid}"
                ) as ws:
                    await ws.send_str("2probe")
                    assert await ws.receive_str() == "3probe"
                    await ws.send_str("5")  # upgrade commit
                    await ws.send_str('42["translate", {"text": "xin chào"}]')
                    name, data = json.loads((await ws.receive_str())[2:])
                    assert name == "translation_result", (name, data)
                    assert data["success"]
                    # post-upgrade polling gets a noop so the poller closes
                    loop = asyncio.get_running_loop()
                    polled = await loop.run_in_executor(
                        None, self._drain, port, sid
                    )
                    assert polled == ["6"], polled
            return True

        assert asyncio.run(run())
