"""Cross-process multi-host tests: the DCN-analog path, actually forked.

Spawns TWO separate Python processes that join one JAX distributed runtime
(CPU backend, gloo collectives, 4 virtual devices each -> one 8-device
global mesh), then run the row-sharded search over a corpus where EACH HOST
ONLY EVER HOLDS ITS OWN ROWS (``make_global_sharded_array``), and compare
against an independently computed single-process oracle.

This is the capability that replaces the reference's LAN P2P fan-out
(``/root/reference/api.py:305-603``, ``system.py:1715-1757``) at pod
scale: ICI within a slice, DCN across slices, same program.
"""

from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

import pytest

_CHILD = r'''
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid = int(sys.argv[1]); coord = sys.argv[2]; repo = sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
sys.path.insert(0, repo)

import numpy as np
from jax.sharding import Mesh
from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
    quantize_rows_int8,
)
from intelligent_video_analysis_retrieval_system_tpu.parallel.distributed import (
    host_row_range,
    initialize_distributed,
    is_multi_host,
    make_global_sharded_array,
)
from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_search import (
    sharded_topk,
    sharded_topk_int8,
)

info = initialize_distributed()
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info
assert is_multi_host()

mesh = Mesh(np.array(jax.devices()).reshape(8), ("index",))
n, d = 1024, 32
rng = np.random.default_rng(0)          # same corpus seed on both hosts
x = rng.standard_normal((n, d)).astype(np.float32)
x /= np.linalg.norm(x, axis=-1, keepdims=True)
q = x[:4] + 0.01 * rng.standard_normal((4, d)).astype(np.float32)

start, end = host_row_range(n, mesh)
assert (start, end) == ((0, 512) if pid == 0 else (512, 1024)), (start, end)

# --- f32 path: this host contributes ONLY x[start:end] ---
X = make_global_sharded_array(x[start:end], n, mesh)
res = sharded_topk(mesh, X, jax.numpy.asarray(q), 10, n, use_pallas=False)
got_ids = np.asarray(jax.device_get(res.indices))
got_scores = np.asarray(jax.device_get(res.scores))
full = q @ x.T
want = np.argsort(-full, axis=1)[:, :10]
for b in range(4):
    assert set(got_ids[b].tolist()) == set(want[b].tolist()), b
np.testing.assert_allclose(
    np.sort(got_scores, 1),
    np.sort(np.take_along_axis(full, want, 1), 1), atol=5e-5,
)

# --- int8 capacity path: per-row quantization is host-local ---
lq, ls = quantize_rows_int8(x[start:end])
Xq = make_global_sharded_array(lq, n, mesh)
Xs = make_global_sharded_array(ls.reshape(-1, 1), n, mesh)
res8 = sharded_topk_int8(mesh, Xq, Xs, jax.numpy.asarray(q), 10, n,
                         use_pallas=False)
ids8 = np.asarray(jax.device_get(res8.indices))
assert list(ids8[:, 0]) == [0, 1, 2, 3], ids8[:, 0]

# --- sharded ANN across hosts: every process builds the IDENTICAL IVF
# state from its full local copy (deterministic device math), partitions
# it onto the global mesh, and the shard_map program probes with gloo
# collectives — full probe must return the exact dense candidate set.
from intelligent_video_analysis_retrieval_system_tpu.ops.ann import build_ivf
from intelligent_video_analysis_retrieval_system_tpu.parallel.sharded_ann import (
    make_sharded_ivf,
    sharded_ivf_topk,
)

state, report = build_ivf(
    jax.numpy.asarray(x), n_rows=n, nlist=16, kmeans_iters=4, seed=0
)
shard_rows = int(X.shape[0]) // 8
sivf = make_sharded_ivf(mesh, "index", state, shard_rows)
resa = sharded_ivf_topk(mesh, X, sivf, jax.numpy.asarray(q), 10,
                        nprobe=16, n_valid=n)
ids_a = np.asarray(jax.device_get(resa.indices))
for b in range(4):
    assert set(ids_a[b].tolist()) == set(want[b].tolist()), (b, ids_a[b])

print(f"MULTIHOST OK pid={pid}", flush=True)
'''


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_search(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    repo = str(Path(__file__).resolve().parent.parent)
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i), coord, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST OK pid={i}" in out, out[-3000:]
