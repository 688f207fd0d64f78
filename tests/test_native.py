"""Native C++ layer tests: compiled library vs Python fallbacks."""

import hashlib

import numpy as np
import pytest

from intelligent_video_analysis_retrieval_system_tpu import native


class TestBuild:
    def test_library_compiles(self):
        # the toolchain is present in this environment; the native path
        # must be active (falls back silently elsewhere)
        assert native.is_available()


class TestHashing:
    def test_matches_hashlib(self, tmp_path):
        files = []
        rng = np.random.default_rng(0)
        for i in range(5):
            p = tmp_path / f"f{i}.bin"
            p.write_bytes(rng.bytes(1000 * (i + 1) + i))  # odd sizes
            files.append(p)
        got = native.hash_files(files, threads=4)
        want = [
            hashlib.sha256(p.read_bytes()).hexdigest()[:16] for p in files
        ]
        assert got == want

    def test_empty_file(self, tmp_path):
        p = tmp_path / "empty"
        p.write_bytes(b"")
        assert native.hash_files([p]) == [
            hashlib.sha256(b"").hexdigest()[:16]
        ]

    def test_large_file_block_boundary(self, tmp_path):
        # exactly 1 MiB and 1 MiB +/- 1: exercises buffered block edges
        for size in ((1 << 20) - 1, 1 << 20, (1 << 20) + 1):
            p = tmp_path / f"s{size}"
            data = bytes(range(256)) * (size // 256) + b"x" * (size % 256)
            p.write_bytes(data)
            assert native.hash_files([p])[0] == hashlib.sha256(
                data
            ).hexdigest()[:16]

    def test_missing_file_none(self, tmp_path):
        got = native.hash_files([tmp_path / "nope"])
        assert got == [None]

    def test_empty_list(self):
        assert native.hash_files([]) == []


class TestTopK:
    def test_matches_numpy_oracle(self, rng):
        x = rng.standard_normal((5000, 64)).astype(np.float32)
        q = rng.standard_normal((7, 64)).astype(np.float32)
        scores, ids = native.topk_ip(x, q, 10, threads=4)
        want = q @ x.T
        want_ids = np.argsort(-want, axis=1)[:, :10]
        np.testing.assert_array_equal(ids, want_ids)
        np.testing.assert_allclose(
            scores, np.take_along_axis(want, want_ids, 1), rtol=1e-5
        )

    def test_sorted_descending(self, rng):
        x = rng.standard_normal((1000, 32)).astype(np.float32)
        q = rng.standard_normal((3, 32)).astype(np.float32)
        scores, _ = native.topk_ip(x, q, 50)
        assert (np.diff(scores, axis=1) <= 1e-6).all()

    def test_k_larger_than_n(self, rng):
        x = rng.standard_normal((5, 8)).astype(np.float32)
        q = rng.standard_normal((2, 8)).astype(np.float32)
        scores, ids = native.topk_ip(x, q, 20)
        assert scores.shape == (2, 5)

    def test_single_query_1d(self, rng):
        x = rng.standard_normal((100, 16)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)  # cosine semantics
        scores, ids = native.topk_ip(x, x[42], 1)
        assert ids[0, 0] == 42

    def test_duplicate_scores_complete(self, rng):
        x = np.tile(rng.standard_normal((1, 16)).astype(np.float32), (64, 1))
        scores, ids = native.topk_ip(x, x[:1], 10)
        assert len(set(ids[0].tolist())) == 10


class TestCodecs:
    def test_bf16_roundtrip(self, rng):
        x = rng.standard_normal((100, 8)).astype(np.float32) * 100
        bits = native.f32_to_bf16(x)
        back = native.bf16_to_f32(bits)
        np.testing.assert_allclose(back, x, rtol=8e-3)

    def test_matches_jax_bf16(self, rng):
        import jax.numpy as jnp

        x = rng.standard_normal(1000).astype(np.float32)
        ours = native.f32_to_bf16(x)
        theirs = np.asarray(jnp.asarray(x, jnp.bfloat16)).view(np.uint16)
        np.testing.assert_array_equal(ours, theirs)

    def test_special_values(self):
        x = np.array([0.0, -0.0, np.inf, -np.inf, 1e-40], np.float32)
        back = native.bf16_to_f32(native.f32_to_bf16(x))
        assert back[2] == np.inf and back[3] == -np.inf
        assert back[0] == 0.0


class TestFlatFile:
    def test_roundtrip_bf16(self, tmp_path, rng):
        rows = rng.standard_normal((50, 16)).astype(np.float32)
        path = tmp_path / "emb.flat"
        native.FlatEmbeddingFile.write(path, rows, dtype="bfloat16")
        with native.FlatEmbeddingFile(path) as f:
            assert f.rows.shape == (50, 16)
            assert f.dtype_name == "bfloat16"
            np.testing.assert_allclose(f.as_float32(), rows, rtol=8e-3)

    def test_roundtrip_f32(self, tmp_path, rng):
        rows = rng.standard_normal((20, 8)).astype(np.float32)
        path = tmp_path / "emb.flat"
        native.FlatEmbeddingFile.write(path, rows, dtype="float32")
        with native.FlatEmbeddingFile(path) as f:
            np.testing.assert_array_equal(f.as_float32(), rows)

    def test_bad_file_rejected(self, tmp_path):
        p = tmp_path / "junk.flat"
        p.write_bytes(b"NOTMAGIC" + b"\x00" * 100)
        f = native.FlatEmbeddingFile(p)
        with pytest.raises(IOError):
            f.open()


class TestFlatInt8File:
    """Quantized flat sidecar (round 5): int8 rows + folded scales in one
    mmap'd file — the capacity-mode fast-open path."""

    def test_roundtrip_bit_exact(self, tmp_path, rng):
        rows = rng.integers(-127, 128, (64, 24), dtype=np.int8)
        scales = (rng.uniform(0.9, 1.1, 64) / 127.0).astype(np.float32)
        path = tmp_path / "q.flat8"
        native.FlatInt8File.write(path, rows, scales, normalized=True)
        with native.FlatInt8File(path) as f:
            assert f.normalized is True
            np.testing.assert_array_equal(f.rows, rows)
            np.testing.assert_array_equal(f.scales, scales)

    def test_normalized_flag_persists(self, tmp_path, rng):
        rows = rng.integers(-127, 128, (4, 8), dtype=np.int8)
        scales = np.ones(4, np.float32)
        path = tmp_path / "raw.flat8"
        native.FlatInt8File.write(path, rows, scales, normalized=False)
        with native.FlatInt8File(path) as f:
            assert f.normalized is False

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "junk.flat8"
        p.write_bytes(b"NOTMAGIC" + b"\x00" * 64)
        with pytest.raises(IOError):
            native.FlatInt8File(p).open()

    def test_truncation_rejected(self, tmp_path, rng):
        rows = rng.integers(-127, 128, (32, 8), dtype=np.int8)
        scales = np.ones(32, np.float32)
        p = tmp_path / "t.flat8"
        native.FlatInt8File.write(p, rows, scales, normalized=True)
        p.write_bytes(p.read_bytes()[:-8])  # chop the scale tail
        with pytest.raises(IOError):
            native.FlatInt8File(p).open()

    def test_shape_validation(self, tmp_path, rng):
        rows = rng.integers(-127, 128, (8, 8), dtype=np.int8)
        with pytest.raises(ValueError):
            native.FlatInt8File.write(
                tmp_path / "x.flat8", rows, np.ones(7, np.float32), True
            )


class TestFlatFileRaw:
    """Round-5 additions to FlatEmbeddingFile: raw-payload writes and
    sequential read_into (the lazy-on-load sidecar path)."""

    def test_write_raw_bf16_roundtrip(self, tmp_path, rng):
        bits = rng.integers(0, 2**16, (32, 8)).astype(np.uint16)
        p = tmp_path / "raw.flat"
        native.FlatEmbeddingFile.write_raw(p, bits, "bfloat16")
        f = native.FlatEmbeddingFile(p)
        n, d, name = f.header()
        assert (n, d, name) == (32, 8, "bfloat16")
        out = np.empty((32, 8), np.uint16)
        assert f.read_into(out) == "bfloat16"
        np.testing.assert_array_equal(out, bits)
        # layout-compatible with the classic mmap open
        with native.FlatEmbeddingFile(p) as g:
            np.testing.assert_array_equal(np.asarray(g.rows), bits)

    def test_write_raw_f32_roundtrip(self, tmp_path, rng):
        rows = rng.standard_normal((16, 4)).astype(np.float32)
        p = tmp_path / "raw32.flat"
        native.FlatEmbeddingFile.write_raw(p, rows, "float32")
        out = np.empty((16, 4), np.float32)
        native.FlatEmbeddingFile(p).read_into(out)
        np.testing.assert_array_equal(out, rows)

    def test_write_raw_dtype_mismatch(self, tmp_path, rng):
        with pytest.raises(ValueError):
            native.FlatEmbeddingFile.write_raw(
                tmp_path / "x.flat",
                rng.standard_normal((4, 4)).astype(np.float32), "bfloat16",
            )

    def test_header_truncation_rejected(self, tmp_path, rng):
        bits = rng.integers(0, 2**16, (8, 4)).astype(np.uint16)
        p = tmp_path / "t.flat"
        native.FlatEmbeddingFile.write_raw(p, bits, "bfloat16")
        p.write_bytes(p.read_bytes()[:-4])
        with pytest.raises(IOError):
            native.FlatEmbeddingFile(p).header()
