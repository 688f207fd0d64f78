"""Headline benchmark: end-to-end text-query latency, with percentiles.

Prints ONE JSON line:
    {"metric": ..., "value": <p50 ms>, "unit": "ms", "vs_baseline": ...,
     "p95": ..., "queries": ..., "extra": {...10M-int8 + embed numbers...}}

Measured paths — the reference's hottest user flow (SURVEY.md §3.2), fully
on-device:

1. headline: CLIP ViT-L/14 text tower (bf16) -> L2 normalize -> exact top-k
   via the fused Pallas chunk-max sweep over an HBM-resident 1M x 768 bf16
   matrix (p50/p95 over >=100 queries).
2. north star (BASELINE.json): the SAME e2e flow over a **10M**-row index in
   int8 capacity mode (7.7 GB — fits the single v5e chip; the bf16 copy
   would need 15.4 GB). Reported in "extra" with p50/p95 and the per-chip
   analysis for the 10M/v5e-8 target.
3. image-tower embedding throughput (ViT-B/32 bf16; IVARS_BENCH_FULL=1 adds
   ViT-L/14).

Baseline: the reference's measured ``clip_text_encoding`` (38-273 ms,
`/root/reference/logs/performance.log:2,4,5,7`) + its claimed
"sub-millisecond" FAISS search (`unified_index.py:491`) — best case ~39 ms
per query. vs_baseline = 39 / p50_ms (>1 beats the reference).

Timing methodology (the TPU here is tunneled; see CLAUDE.md):
``block_until_ready`` does not wait for execution and each value fetch
costs ~24 ms RTT, so per-query wall timing would be RTT-dominated.
Percentile sampling therefore uses ROUNDS: each round enqueues ``m``
independent queries FIFO and fetches only the last result; the per-query
sample is (round_time - measured_dispatch_and_fetch_overhead) / m (see
:func:`round_overhead`). Samples are per-query latencies
averaged over m-query bursts — burst-level p50/p95, the per-query tail
within a burst is not resolvable through the tunnel. The DB is generated
on device (host upload through the tunnel is slow).
"""

from __future__ import annotations

import functools
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def probe_tpu(timeout_s: float = 45.0) -> tuple[bool, str]:
    """Bounded SUBPROCESS probe of the TPU backend.

    During tunnel outages ``jax.devices()`` either hangs indefinitely at
    backend init or raises ``Unable to initialize backend 'axon'``
    (observed 2026-08-17, CLAUDE.md) — an in-process probe would hang the
    whole bench, and BENCH_r03 died exactly this way (rc=1, no JSON).
    Probing in a child keeps the parent's jax uninitialized so it can
    still fall back to CPU via ``jax.config.update``.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "import sys; sys.exit(0 if d else 3)"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        if r.returncode == 0:
            return True, "ok"
        tail = (r.stderr or "").strip().splitlines()
        return False, (tail[-1] if tail else f"rc={r.returncode}")
    except subprocess.TimeoutExpired:
        return False, f"backend init hung > {timeout_s:.0f}s (tunnel down)"
    except Exception as exc:  # pragma: no cover
        return False, f"{type(exc).__name__}: {exc}"


class _BenchAbort(BaseException):
    """Deadline/SIGTERM abort. BaseException so no per-section
    ``except Exception`` can swallow it — only main()'s outer guard
    (which prints the final JSON) catches it."""


def _signal_abort(signum, frame):  # pragma: no cover
    raise _BenchAbort(f"aborted by signal {signum}")


D, K = 768, 10


def round_overhead(per_round: int) -> float:
    """Seconds of non-compute overhead in one m-dispatch round: m Python
    dispatch enqueues of a trivial jitted fn + ONE value fetch (tunnel RTT).

    Must use FRESH results each round — re-fetching an already-fetched
    array returns a host-cached value instantly and underestimates RTT.
    """
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda s: s * 1.0)
    float(tiny(jnp.float32(-1.0)))  # compile
    ts = []
    for r in range(5):
        t0 = time.perf_counter()
        outs = [tiny(jnp.float32(r * per_round + i)) for i in range(per_round)]
        float(outs[-1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def percentile_rounds(fn, rounds: int, per_round: int, overhead: float):
    """fn(salt:int)->device scalar. Returns (p50_ms, p95_ms, n_queries).

    Each sample is (round_time - overhead) / per_round: the per-query device
    time averaged over an m-query FIFO burst, with dispatch + fetch-RTT
    overhead (measured by :func:`round_overhead`) removed.
    """
    samples = []
    salt = 0
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(salt + i) for i in range(per_round)]
        float(outs[-1])
        dt = time.perf_counter() - t0
        salt += per_round
        samples.append(max(dt - overhead, 1e-9) / per_round * 1e3)
    return (
        float(np.percentile(samples, 50)),
        float(np.percentile(samples, 95)),
        rounds * per_round,
    )


def gen_db_bf16_device(n_pad: int, seed: int = 7):
    """Random L2-normalized bf16 rows generated ON DEVICE (host upload of
    a 1.5 GB DB through the tunnel measured ~25 min — never again)."""
    import jax
    import jax.numpy as jnp

    chunk = 262_144

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(buf, key, start):
        c = jax.random.normal(key, (chunk, D), jnp.float32)
        c /= jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-12)
        return jax.lax.dynamic_update_slice(
            buf, c.astype(jnp.bfloat16), (start, 0)
        )

    buf = jnp.zeros((n_pad, D), jnp.bfloat16)
    key = jax.random.PRNGKey(seed)
    n_full = n_pad // chunk
    for i in range(n_full):
        key, sub = jax.random.split(key)
        buf = fill(buf, sub, jnp.int32(i * chunk))
    rem = n_pad - n_full * chunk
    if rem:
        tail = jax.random.normal(key, (rem, D), jnp.float32)
        tail /= jnp.maximum(jnp.linalg.norm(tail, axis=-1, keepdims=True), 1e-12)
        buf = jax.lax.dynamic_update_slice(
            buf, tail.astype(jnp.bfloat16), (n_pad - rem, 0)
        )
    buf.block_until_ready()
    return buf


def gen_db_int8_device(n_pad: int, seed: int = 0):
    """Random int8 rows + f32 scales generated ON DEVICE."""
    import jax
    import jax.numpy as jnp

    chunk = 524_288

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(buf, key, start):
        c = jax.random.randint(key, (chunk, D), -127, 128, dtype=jnp.int8)
        return jax.lax.dynamic_update_slice(buf, c, (start, 0))

    buf = jnp.zeros((n_pad, D), jnp.int8)
    key = jax.random.PRNGKey(seed)
    for i in range(n_pad // chunk):
        key, sub = jax.random.split(key)
        buf = fill(buf, sub, jnp.int32(i * chunk))
    rem = n_pad - (n_pad // chunk) * chunk
    if rem:
        tail = jax.random.randint(key, (rem, D), -127, 128, dtype=jnp.int8)
        buf = jax.lax.dynamic_update_slice(buf, tail, (n_pad - rem, 0))
    scales = (jax.random.uniform(jax.random.PRNGKey(seed + 1), (n_pad, ),
                                 jnp.float32) * 0.2 + 0.9) / 127.0
    buf.block_until_ready()
    return buf, scales


def bench_served_qps(xd, n_valid: int, embedder=None, *, scales=None,
                     ann_state=None, key_suffix: str = "1M") -> dict:
    """REST-level serving throughput over a device-resident index.

    Starts the real aiohttp RetrievalServer (QueryBatcher on) around a
    facade whose index is the device matrix ``xd``; fires concurrent
    distinct queries from an in-process aiohttp client. Quantifies the FULL
    serving overhead — HTTP, JSON, rate limiter, micro-batching, ViT-L text
    encode, fused sweep, result formatting — not just raw device QPS.
    Reference baseline: ~0.14 QPS e2e (performance.log:8).

    ``scales`` switches the index to int8 capacity mode (``xd`` int8 rows
    + per-row scales); ``ann_state`` attaches a built IVF structure;
    batches at/below the measured ``ann_max_batch`` crossover route to
    the batched IVF program, larger ones to the dense sweep (round 5:
    the batcher no longer shrinks micro-batches to force IVF). Key names
    carry ``key_suffix`` (the original 1M run keeps its round-3 names).

    Metadata is synthesized lazily per hit (only top-k rows materialize),
    matching production cost without holding the records in RAM.
    """
    import asyncio
    import socket
    import tempfile

    from intelligent_video_analysis_retrieval_system_tpu.index.unified import (
        UnifiedIndex,
        UnifiedIndexConfig,
    )
    from intelligent_video_analysis_retrieval_system_tpu.retrieval.results import (
        KeyframeMetadata,
    )
    from intelligent_video_analysis_retrieval_system_tpu.serve.rest import (
        RetrievalServer,
    )
    from intelligent_video_analysis_retrieval_system_tpu.system import (
        EnhancedRetrievalSystem,
    )
    from intelligent_video_analysis_retrieval_system_tpu.utils.config import (
        Config,
    )

    class _LazyMetas:
        """len-N sequence synthesizing KeyframeMetadata on access."""

        def __init__(self, n: int) -> None:
            self.n = n

        def __len__(self) -> int:
            return self.n

        def __getitem__(self, i):
            if isinstance(i, slice):
                return [self[j] for j in range(*i.indices(self.n))]
            if not 0 <= i < self.n:
                raise IndexError(i)
            return KeyframeMetadata(
                folder=f"v{i % 97}", image=f"{i}.jpg", frame_id=i
            )

    tmp = tempfile.mkdtemp(prefix="ivars_bench_serve_")
    cfg = Config(
        config_file=None, base_dir=tmp, create_dirs=True,
        overrides={
            "api": {"batching": True, "batching_max_batch": 64,
                    "batching_window_ms": 8.0,
                    "rate_limit_per_minute": 10**9},
            "logging": {"file": False},
        },
    )
    system = EnhancedRetrievalSystem(cfg, embedder=embedder)
    index = UnifiedIndex(UnifiedIndexConfig(
        dtype="int8" if scales is not None else "bfloat16"
    ))
    index._dev_x = xd
    if scales is not None:
        index._dev_scales = scales
    index._n_valid = n_valid
    index._capacity = int(xd.shape[0])
    index._metadata = _LazyMetas(n_valid)
    if ann_state is not None:
        index._ann = ann_state
    system.index = index
    system.is_built = True

    # Pre-warm every text-encode bucket the load pattern can hit BEFORE
    # serving: the first ViT-L text compile takes 30-60 s (worse when the
    # compile service is congested), which would blow the batcher's 30 s
    # per-request timeout and cascade into request failures.
    log("served-QPS: pre-warming encode + search buckets...")
    t0 = time.perf_counter()
    # Warm exactly the buckets the load pattern can hit: client
    # concurrency is 16, so live batches are <= 16 -> encode buckets
    # 8/32, search buckets 8/16. (A fuller sweep incl. 32/64 was tried
    # and measured 531 s of cold compiles for programs the 16-deep
    # pattern never runs, starving later bench sections — and the
    # multi-second p95 outliers recurred ANYWAY on that congested day:
    # they track tunnel/compile-service weather, not cold buckets.)
    for b in (1, 32):
        system.embedder.encode_text([f"warm {i}" for i in range(b)])
    for b in (1, 9):   # search b-buckets 8, 16
        qv = system.embedder.encode_text([f"warm s{i}" for i in range(b)])
        # exact=True warms the DENSE buckets; with an attached ANN state
        # the serving path routes small batches down the batched IVF
        # program instead, so warm THOSE buckets (exact=False)
        index.search_vectors(qv, top_k=10, exact=ann_state is None)
    log(f"served-QPS: buckets warm in {time.perf_counter() - t0:.1f}s")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = RetrievalServer(system, host="127.0.0.1", port=port)
    server.run(block=False)
    url = f"http://127.0.0.1:{port}/api/search"

    import aiohttp

    async def fire(n_req: int, concurrency: int, tag: str):
        lat: list[float] = []
        sem = asyncio.Semaphore(concurrency)

        async with aiohttp.ClientSession() as sess:
            async def one(i: int):
                async with sem:
                    t0 = time.perf_counter()
                    async with sess.post(
                        url,
                        json={"query": f"photo of {tag} scene {i}",
                              "limit": 10},
                        timeout=aiohttp.ClientTimeout(total=120),
                    ) as r:
                        body = await r.json()
                        assert body.get("success"), body
                        assert body["count"] > 0
                    lat.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            await asyncio.gather(*[one(i) for i in range(n_req)])
            return time.perf_counter() - t0, lat

    try:
        log("served-QPS: warmup (tower + bucket compiles)...")
        asyncio.run(fire(40, 16, "warm"))
        asyncio.run(fire(64, 16, "warm2"))  # the timed concurrency pattern
        log("served-QPS: timed run...")
        # concurrency 16 is this host's best operating point: client +
        # server + batcher share ONE core, so ~10 ms of pure-Python work
        # per request caps QPS near 100 regardless of device speed, and
        # deeper concurrency only adds GIL/queue churn (instrumented
        # probe: batch p50 111 ms at conc 8 vs 1.9 s at conc 64 with
        # identical device work)
        elapsed, lat = asyncio.run(fire(256, 16, "timed"))
        qps = 256 / elapsed
        p50 = float(np.percentile(lat, 50)) * 1e3
        p95 = float(np.percentile(lat, 95)) * 1e3
        stats = server.batcher.stats if server.batcher else None
        log(f"served-QPS[{key_suffix}]: {qps:.0f} QPS  p50={p50:.1f} ms "
            f"p95={p95:.1f} ms"
            + (f"  avg_batch={stats.avg_batch:.1f}" if stats else ""))
        if key_suffix == "1M":  # round-3 artifact key names, unchanged
            out = {
                "served_qps_1M": round(qps),
                "served_p50_ms": round(p50, 1),
                "served_p95_ms": round(p95, 1),
            }
            if stats:
                out["served_avg_batch"] = round(stats.avg_batch, 1)
        else:
            out = {
                f"served_qps_{key_suffix}": round(qps),
                f"served_p50_{key_suffix}_ms": round(p50, 1),
                f"served_p95_{key_suffix}_ms": round(p95, 1),
            }
            if stats:
                out[f"served_avg_batch_{key_suffix}"] = round(
                    stats.avg_batch, 1
                )
        return out
    finally:
        try:
            server.stop()
        except Exception:
            pass
        index._dev_x = None
        # release the full CLIP params (~1.7 GB f32) with the section
        system.embedder.params = None
        system.embedder.model = None
        system.embedder._loaded = False


def main() -> None:
    """Outage-proof driver: the final JSON line prints NO MATTER WHAT.

    BENCH_r03 was lost to a tunnel outage that escaped the per-section
    guards (backend init raised before the first section's try). Now:
    a bounded subprocess probe decides TPU vs CPU up front, every section
    records its failure into ``extra.errors`` instead of dying, SIGTERM/
    SIGALRM abort cleanly through the same path, and the print lives in a
    ``finally``.
    """
    result: dict = {
        "metric": "e2e_text_query_latency",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
        "extra": {},
    }
    try:  # pragma: no cover - signal plumbing
        signal.signal(signal.SIGTERM, _signal_abort)
        deadline = float(os.environ.get("IVARS_BENCH_DEADLINE_S", "1380"))
        signal.signal(signal.SIGALRM, _signal_abort)
        signal.alarm(int(deadline))
    except (ValueError, OSError):
        pass  # non-main thread / exotic host: run unguarded
    try:
        _run(result)
    except BaseException as exc:
        result["extra"].setdefault("errors", {})["fatal"] = (
            f"{type(exc).__name__}: {exc}"[:500]
        )
        log(f"bench aborted: {type(exc).__name__}: {exc}")
    finally:
        try:
            signal.alarm(0)
        except (ValueError, OSError):
            pass
        print(json.dumps(result), flush=True)


def _run(result: dict) -> None:
    t_start = time.perf_counter()
    budget_scale = float(os.environ.get("IVARS_BENCH_BUDGET_SCALE", "1"))
    extra: dict = result["extra"]
    errors: dict = {}
    state = {"dead": False}

    def fail(section: str, exc: BaseException) -> None:
        msg = f"{type(exc).__name__}: {exc}"
        log(f"section '{section}' failed: {msg}")
        errors[section] = msg[:500]
        extra["errors"] = errors
        if "UNAVAILABLE" in msg or "Unable to initialize" in msg:
            state["dead"] = True  # backend lost: skip remaining TPU work

    # Bounded backend probe BEFORE any in-process jax device use: during
    # tunnel outages jax.devices() hangs or raises at init (CLAUDE.md).
    if not os.environ.get("IVARS_BENCH_SKIP_PROBE"):
        ok, why = probe_tpu()
        if not ok:
            log(f"TPU probe failed ({why}) -> forcing CPU fallback run")
            extra["tpu_unavailable"] = True
            fail("tpu_probe", RuntimeError(why))
            state["dead"] = False  # CPU path is still alive
            import jax

            jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    def over_budget(limit_s: float, what: str) -> bool:
        """The compile service has 5 s-10 min variance (CLAUDE.md); on a
        congested day optional sections must yield so the final JSON line
        (the driver's artifact) always prints before any outer timeout.
        IVARS_BENCH_BUDGET_SCALE stretches every budget for manual runs on
        congested days."""
        limit_s *= budget_scale
        if time.perf_counter() - t_start > limit_s:
            log(f"skipping {what}: {time.perf_counter() - t_start:.0f}s "
                f"elapsed > {limit_s:.0f}s budget")
            return True
        return False

    from intelligent_video_analysis_retrieval_system_tpu.models import (
        CLIPConfig,
    )
    from intelligent_video_analysis_retrieval_system_tpu.models.clip import (
        CLIPTextTower,
        CLIPVisionTower,
    )
    from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
        pad_database,
        topk_search,
    )

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    N = 1_000_000 if on_tpu else 20_000
    log(f"backend={backend} N={N}")

    rng = np.random.default_rng(0)
    if on_tpu:
        from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
            TILE_N as _TILE,
        )

        log(f"generating {N}x{D} bf16 DB on device...")
        xd = gen_db_bf16_device(-(-N // _TILE) * _TILE)
    else:
        x = rng.standard_normal((N, D)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        xd = pad_database(jnp.asarray(x, jnp.bfloat16))

    cfg = CLIPConfig.vit_l_14()
    tower = CLIPTextTower(cfg.text, dtype=jnp.bfloat16)
    # IVARS_CLIP_VOCAB: optional dir with merges.txt — runs the real CLIP
    # BPE instead of the hash fallback (latency is identical either way;
    # the kind is recorded so the artifact states its text semantics)
    from intelligent_video_analysis_retrieval_system_tpu.models.tokenizer import (
        load_tokenizer,
    )

    tokenizer = load_tokenizer(
        os.environ.get("IVARS_CLIP_VOCAB"), vocab_size=cfg.text.vocab_size
    )
    extra["tokenizer_kind"] = tokenizer.kind
    tokens = jnp.asarray(tokenizer(["a photo of a scene"], cfg.text.max_length))
    tp = jax.jit(tower.init)(jax.random.PRNGKey(0), tokens)["params"]

    def encode(tp, tokens, salt):
        toks = tokens.at[0, 1].set(salt.astype(jnp.int32) % 49000)
        emb = tower.apply({"params": tp}, toks).astype(jnp.float32)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )

    @jax.jit
    def query(tp, xd, tokens, salt):
        emb = encode(tp, tokens, salt)
        res = topk_search(
            xd, emb.astype(jnp.bfloat16), K, n_valid=N, use_pallas=on_tpu
        )
        return res.scores[0, 0]

    try:
        log("compiling 1M bf16 e2e query...")
        t0 = time.perf_counter()
        probe = query(tp, xd, tokens, jnp.float32(0))
        float(probe)
        log(f"compiled+first query in {time.perf_counter() - t0:.1f}s")
        rounds, per_round = (15, 10) if on_tpu else (4, 3)
        ovh = round_overhead(per_round)
        log(f"round overhead ({per_round} dispatches + fetch): "
            f"{ovh*1e3:.1f} ms")

        p50, p95, nq = percentile_rounds(
            lambda i: query(tp, xd, tokens, jnp.float32(i + 1)),
            rounds, per_round, ovh,
        )
        log(f"1M bf16 e2e: p50={p50:.2f} ms p95={p95:.2f} ms "
            f"over {nq} queries")
        # record the headline IMMEDIATELY: a later section dying (or the
        # deadline firing) must not lose the primary metric
        baseline_ms = 39.0
        size = f"{N // 1_000_000}M" if N >= 1_000_000 else f"{N // 1000}k"
        result["metric"] = f"e2e_text_query_latency_{size}_index"
        result["value"] = round(p50, 3)
        result["vs_baseline"] = round(baseline_ms / p50, 2)
        result["p95"] = round(p95, 3)
        result["queries"] = nq
    except Exception as exc:
        fail("headline_1M", exc)
        if state["dead"]:
            return

    # -- sharded-path regression variant: same query over a 1-device mesh ------
    # (shard_map + Pallas composition; catches sharding regressions in
    # BENCH_rNN without multi-chip hardware)
    if on_tpu and not state["dead"] and not over_budget(360, "sharded bench variant"):
        try:
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_search import (
                sharded_topk,
            )

            mesh = Mesh(np.array(jax.devices()[:1]), ("index",))
            xs = jax.device_put(xd, NamedSharding(mesh, P("index", None)))

            # ONE composed program (encode + sharded search), matching the
            # headline's single-dispatch shape — a 2-dispatch version pays
            # the tunnel's per-dispatch floor between stages and read 2-3x
            # noisier across runs
            @jax.jit
            def sharded_fused(tp, xs, tokens, salt):
                emb = encode(tp, tokens, salt)
                res = sharded_topk(mesh, xs, emb.astype(jnp.bfloat16), K, N)
                return res.scores[0, 0]

            def sharded_query(i):
                return sharded_fused(tp, xs, tokens, jnp.float32(i + 1))

            float(sharded_query(-1))  # compile
            s50, s95, _ = percentile_rounds(sharded_query, 8, 8,
                                            round_overhead(8))
            log(f"1M sharded (1-dev mesh): p50={s50:.2f} ms p95={s95:.2f} ms")
            extra["latency_1M_sharded_1dev_p50_ms"] = round(s50, 2)
            del xs
        except Exception as exc:
            fail("sharded_1M", exc)

    # -- v5e-8 north-star anchor: MEASURED per-chip shard -----------------------
    # The 10M/v5e-8 <10 ms target means each chip sweeps a 1.25M-row shard
    # inside the sharded program and merges k results over ICI (~51 KB for 8
    # chips — negligible vs the sweep). One chip can run EXACTLY that shard
    # shape; this replaces the former arithmetic estimate with a measurement.
    if on_tpu and not state["dead"] and not over_budget(420, "1.25M per-chip anchor"):
        try:
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
                TILE_N as _TILE_A,
            )
            from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_search import (
                sharded_topk,
                sharded_topk_int8,
            )

            N_A = 1_250_000
            n_pad_a = -(-N_A // _TILE_A) * _TILE_A
            mesh_a = Mesh(np.array(jax.devices()[:1]), ("index",))

            log(f"anchor: generating {N_A}x{D} bf16 shard on device...")
            xa = jax.device_put(
                gen_db_bf16_device(n_pad_a, seed=21),
                NamedSharding(mesh_a, P("index", None)),
            )

            @jax.jit
            def anchor_bf16(tp, xa, tokens, salt):
                emb = encode(tp, tokens, salt)
                res = sharded_topk(mesh_a, xa, emb.astype(jnp.bfloat16), K, N_A)
                return res.scores[0, 0]

            float(anchor_bf16(tp, xa, tokens, jnp.float32(0)))  # compile
            a50, a95, _ = percentile_rounds(
                lambda i: anchor_bf16(tp, xa, tokens, jnp.float32(i + 1)),
                8, 8, round_overhead(8),
            )
            log(f"anchor bf16 1.25M sharded: p50={a50:.2f} ms p95={a95:.2f} ms")
            extra["latency_10M_8chip_anchor_ms"] = round(a50, 2)
            extra["latency_10M_8chip_anchor_p95_ms"] = round(a95, 2)
            del xa

            # int8 capacity-mode shard at the same shape
            if not over_budget(460, "int8 1.25M anchor"):
                xqa, sqa = gen_db_int8_device(n_pad_a, seed=22)
                sh = NamedSharding(mesh_a, P("index", None))
                xqa = jax.device_put(xqa, sh)
                sqa2 = jax.device_put(sqa.reshape(-1, 1), sh)
                dead_a = jax.device_put(jnp.zeros((n_pad_a, 1), jnp.int8), sh)

                @jax.jit
                def anchor_int8(tp, xqa, sqa2, dead_a, tokens, salt):
                    emb = encode(tp, tokens, salt)
                    res = sharded_topk_int8(
                        mesh_a, xqa, sqa2, emb, K, N_A,
                        deleted_sharded=dead_a,
                    )
                    return res.scores[0, 0]

                float(anchor_int8(tp, xqa, sqa2, dead_a, tokens,
                                  jnp.float32(0)))
                i50, i95, _ = percentile_rounds(
                    lambda i: anchor_int8(tp, xqa, sqa2, dead_a, tokens,
                                          jnp.float32(i + 1)),
                    8, 8, round_overhead(8),
                )
                log(f"anchor int8 1.25M sharded: p50={i50:.2f} ms "
                    f"p95={i95:.2f} ms")
                extra["latency_10M_8chip_anchor_int8_ms"] = round(i50, 2)
                del xqa, sqa2, dead_a
        except Exception as exc:
            fail("anchor_1M25", exc)

    # -- image-tower throughput ------------------------------------------------
    try:
        full = bool(os.environ.get("IVARS_BENCH_FULL"))
        B = (256 if on_tpu else 8) if not full else (128 if on_tpu else 8)
        vcfg = cfg if full else CLIPConfig.vit_b_32()
        vtower = CLIPVisionTower(vcfg.vision, dtype=jnp.bfloat16)
        px0 = jnp.asarray(
            rng.standard_normal((B, 224, 224, 3)).astype(np.float32),
            jnp.bfloat16,
        )
        vp = jax.jit(vtower.init)(jax.random.PRNGKey(0), px0[:1])["params"]

        @jax.jit
        def embed(vp, px, salt):
            out = vtower.apply({"params": vp}, px + salt)
            return out.astype(jnp.float32)[0, 0]

        iters1, iters2 = (3, 13) if on_tpu else (1, 3)

        def run_embed(fn, iters: int) -> float:
            salts = [jnp.bfloat16(i) for i in range(iters)]
            t0 = time.perf_counter()
            results = [fn(vp, px0, s) for s in salts]
            float(results[-1])
            return time.perf_counter() - t0

        def tower_fps(fn) -> float:
            float(fn(vp, px0, jnp.bfloat16(0)))
            t1, t2 = run_embed(fn, iters1), run_embed(fn, iters2)
            per_batch = (t2 - t1) / (iters2 - iters1)
            return B / per_batch if per_batch > 0 else 0.0

        name = "ViT-L/14" if full else "ViT-B/32"
        fps = tower_fps(embed)
        log(f"image embed: {fps:.0f} frames/s/chip ({name} bf16 B={B})")
        extra["image_tower_fps"] = round(fps)
        extra["image_tower"] = name

        # production-fastest mode: W8A8 with static calibrated activation
        # scales (RESULTS.md; cosine vs bf16 ~0.9995). Calibrate on the
        # bench batch via the dynamic twin, then time the static tower.
        if on_tpu and not state["dead"] and not over_budget(420, "static-tower throughput"):
            from intelligent_video_analysis_retrieval_system_tpu.models.calibrate import (
                calibrate_act_scales,
            )

            dyn = CLIPVisionTower(vcfg.vision, dtype=jnp.bfloat16, w8a8=True)
            scales = calibrate_act_scales(dyn, {"params": vp}, [(px0,)])
            stower = CLIPVisionTower(vcfg.vision, dtype=jnp.bfloat16,
                                     w8a8=True, w8a8_static=True)

            @jax.jit
            def embed_static(vp, px, salt):
                out = stower.apply({"params": vp, **scales}, px + salt)
                return out.astype(jnp.float32)[0, 0]

            sfps = tower_fps(embed_static)
            log(f"image embed: {sfps:.0f} frames/s/chip "
                f"({name} W8A8-static B={B})")
            extra["image_tower_fps_int8_static"] = round(sfps)
        del vp, px0
    except Exception as exc:  # pragma: no cover
        fail("image_tower", exc)

    # -- north star: 10M-row index, int8 capacity mode, ONE chip ---------------
    if (
        on_tpu
        and not state["dead"]
        and not os.environ.get("IVARS_BENCH_SKIP_10M")
        and not over_budget(520, "10M int8 north-star section")
    ):
        try:
            from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
                _build_int8_searcher,
            )
            from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
                TILE_N,
            )

            del xd  # free the 1M bf16 copy before allocating 7.7 GB
            import gc

            gc.collect()  # cyclic refs can pin device buffers (one run
            # OOM'd here while a fresh process allocated 10M fine)
            N10 = 10_000_000
            n_pad = -(-N10 // TILE_N) * TILE_N
            log(f"generating 10M x 768 int8 DB on device "
                f"({n_pad * D / 1e9:.2f} GB)...")
            x10, s10 = gen_db_int8_device(n_pad)
            dead = jnp.zeros((n_pad, 1), jnp.int8)
            search10 = _build_int8_searcher(n_pad, D, 8, K, False)

            @jax.jit
            def query10(tp, x10, s10, dead, tokens, salt):
                emb = encode(tp, tokens, salt)
                q = jnp.concatenate([emb, jnp.zeros((7, D), jnp.float32)])
                res = search10(x10, s10, q, jnp.int32(N10), dead)
                return res.scores[0, 0]

            log("compiling 10M int8 e2e query...")
            t0 = time.perf_counter()
            probe10 = query10(tp, x10, s10, dead, tokens, jnp.float32(0))
            float(probe10)
            log(f"compiled+first query in {time.perf_counter() - t0:.1f}s")
            ovh10 = round_overhead(8)
            q50, q95, nq10 = percentile_rounds(
                lambda i: query10(tp, x10, s10, dead, tokens,
                                  jnp.float32(i + 1)),
                12, 8, ovh10,
            )
            log(f"10M int8 e2e ONE chip: p50={q50:.2f} ms p95={q95:.2f} ms "
                f"over {nq10} queries")
            extra["latency_10M_int8_1chip_p50_ms"] = round(q50, 2)
            extra["latency_10M_int8_1chip_p95_ms"] = round(q95, 2)
            extra["queries_10M"] = nq10
            # the per-chip shard of the 10M/v5e-8 target is MEASURED above
            # (latency_10M_8chip_anchor_ms, 1.25M sharded program); no
            # arithmetic estimate is recorded any more.

            # serving throughput at the headline batch: ONE sweep amortized
            # over a 128-query batch (facade.search_batch path; measured
            # best config in benchmarks/exp_qps_10m.py). The (N, 128) i32
            # score matrix adds ~5 GB HBM round-trip against the 7.7 GB row
            # stream — still a throughput win (one stream per 128 queries).
            def qps_at(b_qps: int, rounds: int, per_round: int):
                search_b = _build_int8_searcher(n_pad, D, b_qps, K, False)
                tokens_b = jnp.tile(tokens, (b_qps, 1))

                @jax.jit
                def query_batch(tp, x10, s10, dead, tokens_b, salt):
                    toks = tokens_b.at[:, 1].set(
                        (salt.astype(jnp.int32)
                         + jnp.arange(b_qps, dtype=jnp.int32)) % 49000
                    )
                    emb = tower.apply({"params": tp}, toks).astype(jnp.float32)
                    emb /= jnp.maximum(
                        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
                    )
                    res = search_b(x10, s10, emb, jnp.int32(N10), dead)
                    return res.scores[0, 0]

                log(f"compiling 10M int8 batched (B={b_qps}) search...")
                float(query_batch(tp, x10, s10, dead, tokens_b,
                                  jnp.float32(0)))
                b50, _, _ = percentile_rounds(
                    lambda i: query_batch(tp, x10, s10, dead, tokens_b,
                                          jnp.float32(i + 1)),
                    rounds, per_round, round_overhead(per_round),
                )
                qps = b_qps / (b50 / 1e3)
                log(f"10M int8 batched B={b_qps}: {b50:.2f} ms/batch = "
                    f"{qps:.0f} QPS/chip")
                return qps

            extra["qps_10M_int8_1chip_b128"] = round(qps_at(128, 6, 3))
            if not over_budget(660, "10M B=32 QPS point"):
                extra["qps_10M_int8_1chip_b32"] = round(qps_at(32, 6, 4))

            # scaling curve for smaller meshes: 2.5M (v5e-4 shard) and 5M
            # (v5e-2 shard) prefixes of the SAME 10M buffer, each searched
            # through its own static-shape program
            from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
                TILE_N as _T,
            )

            for n_small, key in (
                (2_500_000, "latency_2M5_int8_1chip_p50_ms"),
                (5_000_000, "latency_5M_int8_1chip_p50_ms"),
            ):
                if over_budget(720, key):
                    break
                n_pad_s = -(-n_small // _T) * _T
                x_s = jax.jit(lambda x: x[:n_pad_s])(x10)
                s_s = s10[:n_pad_s]
                dead_s = jnp.zeros((n_pad_s, 1), jnp.int8)
                search_s = _build_int8_searcher(n_pad_s, D, 8, K, False)

                @jax.jit
                def query_s(tp, x_s, s_s, dead_s, tokens, salt):
                    emb = encode(tp, tokens, salt)
                    q = jnp.concatenate([emb, jnp.zeros((7, D), jnp.float32)])
                    res = search_s(x_s, s_s, q, jnp.int32(n_small), dead_s)
                    return res.scores[0, 0]

                float(query_s(tp, x_s, s_s, dead_s, tokens, jnp.float32(0)))
                s50, _, _ = percentile_rounds(
                    lambda i: query_s(tp, x_s, s_s, dead_s, tokens,
                                      jnp.float32(i + 1)),
                    8, 8, round_overhead(8),
                )
                log(f"{n_small} int8 e2e: p50={s50:.2f} ms")
                extra[key] = round(s50, 2)
                del x_s, s_s, dead_s
            del x10, s10, dead  # free 7.7 GB before the serving section
        except Exception as exc:
            fail("int8_10M", exc)

    # -- IVF ANN latency mode at 10M (ops.ann, round 3) -----------------------
    # Composed e2e (text encode + IVF probe) at B=1 over a regenerated 10M
    # int8 buffer (gen is ~10 s; running last keeps the established
    # artifact keys' sections unstarved — this section has the newest
    # claim and the experiment backup). Latency is data-independent
    # (fixed candidate traffic); recall is corpus-dependent and lives
    # with benchmarks/exp_ivf_10m.py (0.995-1.0 at nprobe 16-64 on a
    # clustered 10M corpus; this uniform buffer is the no-structure
    # adversarial case).
    if (
        on_tpu
        and not state["dead"]
        and not os.environ.get("IVARS_BENCH_SKIP_IVF")
        and not over_budget(780, "IVF ANN section")
    ):
        try:
            import gc

            gc.collect()
            from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
                _build_ivf_searcher,
                build_ivf,
            )
            from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
                TILE_N as _TILE_I,
            )

            N10 = 10_000_000
            n_pad = -(-N10 // _TILE_I) * _TILE_I
            log("IVF section: regenerating 10M int8 DB on device...")
            x10, s10 = gen_db_int8_device(n_pad)
            t0 = time.perf_counter()
            ivf_state, ivf_report = build_ivf(
                x10, n_rows=N10, x_scales=s10, nlist=8192,
                sample_per_list=48, kmeans_iters=6,
            )
            extra["ivf_build_10M_s"] = round(time.perf_counter() - t0, 1)
            log(f"IVF build over 10M: {extra['ivf_build_10M_s']}s "
                f"(nlist={ivf_report.nlist} cap={ivf_report.bucket_cap})")
            ivf_nlist = int(ivf_state.bucket_ids.shape[0])
            ivf_cap = int(ivf_state.bucket_ids.shape[1])
            ivf_tail = int(ivf_state.tail_ids.shape[0])
            for nprobe in (16, 64):
                if over_budget(900, f"IVF nprobe={nprobe} point"):
                    break
                inner = _build_ivf_searcher(
                    ivf_nlist, ivf_cap, D, 1, 16, nprobe, ivf_tail,
                    int8=True,
                )

                @jax.jit
                def query_ivf(tp, x10, s10, cent, bid, tid, tcnt,
                              tokens, salt, _inner=inner):
                    emb = encode(tp, tokens, salt)        # (1, D)
                    res = _inner(x10, s10, cent, bid, tid, tcnt,
                                 emb, jnp.int32(N10), None)
                    return res.scores[0, 0]

                log(f"compiling 10M IVF e2e (nprobe={nprobe})...")
                float(query_ivf(
                    tp, x10, s10, ivf_state.centroids,
                    ivf_state.bucket_ids, ivf_state.tail_ids,
                    ivf_state.tail_count, tokens, jnp.float32(0),
                ))
                i50, i95, _ = percentile_rounds(
                    lambda i: query_ivf(
                        tp, x10, s10, ivf_state.centroids,
                        ivf_state.bucket_ids, ivf_state.tail_ids,
                        ivf_state.tail_count, tokens, jnp.float32(i + 1),
                    ),
                    8, 8, round_overhead(8),
                )
                log(f"10M int8 IVF e2e nprobe={nprobe}: "
                    f"p50={i50:.2f} ms p95={i95:.2f} ms")
                extra[f"latency_10M_int8_ivf_np{nprobe}_p50_ms"] = (
                    round(i50, 2)
                )
            # -- sharded ANN (parallel.sharded_ann): the SAME state through
            # the partitioned-bucket shard_map program on a 1-dev mesh —
            # the per-chip program of the multi-chip latency mode (real
            # meshes divide the candidate traffic by n_dev; the merge is
            # ~KBs). Reuses the built state and buffers.
            if not over_budget(900, "sharded ANN point"):
                from jax.sharding import (
                    Mesh as _Mesh,
                    NamedSharding as _NS,
                    PartitionSpec as _P,
                )

                from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_ann import (
                    _sharded_ivf_searcher_cache,
                    make_sharded_ivf,
                )
                from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_search import (
                    mesh_cache_key,
                )

                smesh = _Mesh(np.array(jax.devices()[:1]), ("index",))
                rowsh = _NS(smesh, _P("index", None))
                x10_sh = jax.device_put(x10, rowsh)
                s10_sh = jax.device_put(s10[:, None], rowsh)
                sivf = make_sharded_ivf(smesh, "index", ivf_state, n_pad)
                dead_sh = jax.device_put(
                    jnp.zeros((n_pad, 1), jnp.int8), rowsh
                )
                mesh_key = mesh_cache_key(smesh)
                s_inner = _sharded_ivf_searcher_cache(
                    mesh_key, "index", ivf_nlist,
                    int(sivf.bucket_ids.shape[1]), 1, 16, 32,
                    int(sivf.tail_ids.shape[1]), n_pad, True,
                )

                @jax.jit
                def query_sivf(tp, x, s, bid, tid, tcnt, cent, tokens,
                               salt):
                    emb = encode(tp, tokens, salt)
                    sc, _ = s_inner(x, s, bid, tid, tcnt, cent, emb,
                                    jnp.int32(N10), dead_sh)
                    return sc[0, 0]

                log("compiling 10M sharded-ANN e2e (nprobe=32)...")
                float(query_sivf(
                    tp, x10_sh, s10_sh, sivf.bucket_ids, sivf.tail_ids,
                    sivf.tail_counts, sivf.centroids, tokens,
                    jnp.float32(0),
                ))
                s50, s95, _ = percentile_rounds(
                    lambda i: query_sivf(
                        tp, x10_sh, s10_sh, sivf.bucket_ids,
                        sivf.tail_ids, sivf.tail_counts, sivf.centroids,
                        tokens, jnp.float32(i + 1),
                    ),
                    8, 8, round_overhead(8),
                )
                log(f"10M int8 sharded-ANN e2e nprobe=32: "
                    f"p50={s50:.2f} ms p95={s95:.2f} ms")
                extra["latency_10M_int8_sharded_ivf_np32_p50_ms"] = (
                    round(s50, 2)
                )
                del x10_sh, s10_sh, sivf, dead_sh

            # -- batched IVF vs dense crossover (round 4, VERDICT r3 #2):
            # the union-dedup program (probed buckets dedup across the
            # batch, one shared gather, one GEMM) must keep ANN under the
            # dense sweep at the serving batcher's REAL batch sizes; the
            # round-3 per-query batching lost above B=4.
            from intelligent_video_analysis_retrieval_system_tpu.ops.ann import (
                _build_ivf_batch_searcher,
            )
            from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
                _build_int8_searcher as _dense_int8,
            )

            dead10 = jnp.zeros((n_pad, 1), jnp.int8)
            for b_x in (8, 16):
                if over_budget(960, f"IVF batched B={b_x} crossover"):
                    break
                tokens_bx = jnp.tile(tokens, (b_x, 1))
                ivf_b = _build_ivf_batch_searcher(
                    ivf_nlist, ivf_cap, D, b_x, 16, 32, ivf_tail,
                    int8=True,
                )
                dense_b = _dense_int8(n_pad, D, b_x, 16, False)

                def _encode_b(tp, tokens_bx, salt, _b=b_x):
                    toks = tokens_bx.at[:, 1].set(
                        (salt.astype(jnp.int32)
                         + jnp.arange(_b, dtype=jnp.int32)) % 49000
                    )
                    emb = tower.apply(
                        {"params": tp}, toks
                    ).astype(jnp.float32)
                    return emb / jnp.maximum(
                        jnp.linalg.norm(emb, axis=-1, keepdims=True),
                        1e-12,
                    )

                # consume ALL rows of the (B, k) result: slicing one
                # element lets XLA narrow the GEMM to query 0's row and
                # the other B-1 queries' work is DCE'd (CLAUDE.md probe
                # discipline — measured on the int8 sweep)
                @jax.jit
                def q_ivf_b(tp, x10, s10, cent, bid, tid, tcnt,
                            tokens_bx, salt, _s=ivf_b):
                    emb = _encode_b(tp, tokens_bx, salt)
                    res = _s(x10, s10, cent, bid, tid, tcnt, emb,
                             jnp.int32(N10), None)
                    return res.scores.sum()

                @jax.jit
                def q_dense_b(tp, x10, s10, dead10, tokens_bx, salt,
                              _s=dense_b):
                    emb = _encode_b(tp, tokens_bx, salt)
                    res = _s(x10, s10, emb, jnp.int32(N10), dead10)
                    return res.scores.sum()

                log(f"compiling batched IVF + dense (B={b_x})...")
                float(q_ivf_b(
                    tp, x10, s10, ivf_state.centroids,
                    ivf_state.bucket_ids, ivf_state.tail_ids,
                    ivf_state.tail_count, tokens_bx, jnp.float32(0),
                ))
                float(q_dense_b(tp, x10, s10, dead10, tokens_bx,
                                jnp.float32(0)))
                i50b, _, _ = percentile_rounds(
                    lambda i: q_ivf_b(
                        tp, x10, s10, ivf_state.centroids,
                        ivf_state.bucket_ids, ivf_state.tail_ids,
                        ivf_state.tail_count, tokens_bx,
                        jnp.float32(i + 1),
                    ),
                    6, 4, round_overhead(4),
                )
                d50b, _, _ = percentile_rounds(
                    lambda i: q_dense_b(
                        tp, x10, s10, dead10, tokens_bx,
                        jnp.float32(i + 100),
                    ),
                    6, 4, round_overhead(4),
                )
                log(f"10M int8 B={b_x}: batched IVF {i50b:.2f} ms/batch "
                    f"vs dense {d50b:.2f} — "
                    f"{'IVF wins' if i50b < d50b else 'dense wins'} "
                    f"({d50b / max(i50b, 1e-9):.2f}x)")
                extra[f"latency_10M_int8_ivf_b{b_x}_np32_batch_ms"] = (
                    round(i50b, 2)
                )
                extra[f"latency_10M_int8_dense_b{b_x}_batch_ms"] = (
                    round(d50b, 2)
                )
            del dead10
            # keep the buffers + IVF state alive for the served-10M
            # section (runs AFTER the established 1M serve key)
            state["ivf_keep"] = (x10, s10, ivf_state)
        except Exception as exc:
            fail("ivf_10M", exc)

    # -- served QPS through the REST stack (batcher on) -------------------------
    # Runs LAST: it is the least artifact-critical section and its facade
    # (full ViT-L params, ~1.7 GB f32) must not crowd the 10M buffer.
    if (
        on_tpu
        and not state["dead"]
        and not os.environ.get("IVARS_BENCH_SKIP_SERVE")
        and not over_budget(1000, "served-QPS section")
    ):
        try:
            import gc

            gc.collect()
            log("served-QPS: generating fresh 1M bf16 DB on device...")
            from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
                TILE_N as _TILE_S,
            )

            xserve = gen_db_bf16_device(-(-N // _TILE_S) * _TILE_S, seed=31)
            extra.update(bench_served_qps(xserve, N))
            del xserve
        except Exception as exc:
            fail("served_qps", exc)

    # -- served QPS at 10M int8: ANN attached vs the dense path (round 4,
    # VERDICT r3 #2 done-criteria). Runs AFTER the 1M serve so the
    # established served_qps_1M key is never starved; reuses the IVF
    # section's 10M buffers + built state. Round 5: the batcher no longer
    # shrinks micro-batches to force IVF (the 2026-08-19 capture measured
    # that policy at 92 QPS vs 127 uncapped); batches route per-batch by
    # the measured ann_max_batch crossover, so at saturation BOTH keys
    # should now read ~equal — this A/B is the regression gate for that.
    keep = state.pop("ivf_keep", None)
    if (
        keep is not None
        and on_tpu
        and not state["dead"]
        and not os.environ.get("IVARS_BENCH_SKIP_SERVE")
        and not over_budget(1050, "served 10M ANN section")
    ):
        try:
            import gc

            gc.collect()
            x10k, s10k, ivf_keep = keep
            log("served-QPS: 10M int8 with ANN active...")
            extra.update(bench_served_qps(
                x10k, 10_000_000, scales=s10k, ann_state=ivf_keep,
                key_suffix="10M_int8_ann",
            ))
            if not over_budget(1180, "served 10M dense comparison"):
                log("served-QPS: 10M int8 dense comparison...")
                extra.update(bench_served_qps(
                    x10k, 10_000_000, scales=s10k,
                    key_suffix="10M_int8_dense",
                ))
        except Exception as exc:
            fail("served_10M", exc)
    del keep


if __name__ == "__main__":
    main()
