"""Index layer tests: container, builder (resume), UnifiedIndex, metadata,
portable packages.

The embedder is a deterministic fake (mean-pooled pixel statistics) so
build->search roundtrips are checkable without a real model.
"""

import io

import numpy as np
import pytest
from PIL import Image

from intelligent_video_analysis_retrieval_system_tpu.index import (
    IndexContainer,
    MetadataManager,
    PortableIndex,
    RAGBuilder,
    UnifiedIndex,
    UnifiedIndexConfig,
)
from intelligent_video_analysis_retrieval_system_tpu.retrieval.results import (
    KeyframeMetadata,
)

DIM = 32


def fake_embed(batch: np.ndarray) -> np.ndarray:
    """Deterministic embedding from pixel content: per-channel grid means."""
    b, s, _, _ = batch.shape
    g = batch.reshape(b, 4, s // 4, 4, s // 4, 3).mean(axis=(2, 4))  # (B,4,4,3)
    flat = g.reshape(b, 48)[:, :DIM].astype(np.float32)
    flat = flat + 0.001  # avoid zero rows
    return flat / np.linalg.norm(flat, axis=-1, keepdims=True)


def make_keyframes(root, folders=2, frames=6, size=64, seed=0):
    """Write a keyframes/<video>/<n>.jpg tree of distinct solid-ish images."""
    rng = np.random.default_rng(seed)
    kf = root / "keyframes"
    paths = {}
    for f in range(folders):
        folder = kf / f"video{f}"
        folder.mkdir(parents=True, exist_ok=True)
        for n in range(frames):
            arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
            paths[(f"video{f}", f"{n}.jpg")] = folder / f"{n}.jpg"
    return kf, paths


def make_maps(root, folders=2, frames=6, fps=25.0):
    mp = root / "map"
    mp.mkdir(exist_ok=True)
    for f in range(folders):
        lines = ["n,pts_time,fps,frame_idx"]
        for n in range(frames):
            lines.append(f"{n},{n/fps*10:.3f},{fps},{n*10}")
        (mp / f"video{f}.csv").write_text("\n".join(lines))
    return mp


def build_small(tmp_path, **kwargs):
    kf, _ = make_keyframes(tmp_path)
    mp = make_maps(tmp_path)
    builder = RAGBuilder(
        fake_embed, DIM, input_size=32,
        config=UnifiedIndexConfig(chunk_size=5, dtype="float32",
                                  thumbnail_size=32),
        **kwargs,
    )
    return builder.build_index(kf, tmp_path / "index.rvdb", map_dir=mp)


class TestContainer:
    def test_bulk_metadata_reads_match_individual(self, tmp_path):
        """iter_metadata / read_metadata_range are BULK reads (per-record
        h5py access measured ~1 ms/record — 200k-row loads took minutes);
        they must return exactly what per-record get_metadata returns,
        across slab boundaries and at the edges."""
        with IndexContainer(tmp_path / "m.rvdb", "w", dim=4,
                            dtype="float32") as c:
            n = 257
            c.append_embeddings(np.zeros((n, 4), np.float32))
            c.append_metadata([
                {"folder": f"v{i % 7}", "image": f"{i}.jpg", "frame_id": i,
                 "row_id": i, "tags": ["x" * (i % 13)]}
                for i in range(n)
            ])
            individual = [c.get_metadata(i) for i in range(n)]
            assert list(c.iter_metadata()) == individual
            assert c.read_metadata_range(0, n) == individual
            assert c.read_metadata_range(10, 20) == individual[10:20]
            assert c.read_metadata_range(n - 1, n + 5) == individual[n - 1:]
            assert c.read_metadata_range(5, 5) == []
            # force MANY slabs (tiny slab bound): boundary off-by-ones
            # (dropped/re-yielded records at slab edges, single record
            # bigger than a slab) must not change results
            from intelligent_video_analysis_retrieval_system_tpu.index import (
                container as container_mod,
            )

            old = container_mod._BLOB_SLAB
            container_mod._BLOB_SLAB = 64  # smaller than one record
            try:
                assert list(c.iter_metadata()) == individual
                assert c.read_metadata_range(3, 200) == individual[3:200]
            finally:
                container_mod._BLOB_SLAB = old
            # thumbnails bulk range equals per-record reads too
            c.append_thumbnails([bytes([i % 251]) * (i % 97 + 1)
                                 for i in range(n)])
            per = [c.get_thumbnail(i) for i in range(n)]
            assert c.read_blob_range("thumbnails", 0, n) == per
            assert c.read_blob_range("thumbnails", 40, 60) == per[40:60]

    def test_embeddings_roundtrip_f32(self, tmp_path):
        with IndexContainer(tmp_path / "c.rvdb", "w", dim=8, dtype="float32") as c:
            rows = np.arange(24, dtype=np.float32).reshape(3, 8)
            c.append_embeddings(rows)
            got = c.read_embeddings(as_float32=True)
            np.testing.assert_array_equal(got, rows)

    def test_embeddings_bf16_roundtrip(self, tmp_path):
        with IndexContainer(tmp_path / "c.rvdb", "w", dim=8, dtype="bfloat16") as c:
            rows = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
            c.append_embeddings(rows)
            got = c.read_embeddings(as_float32=True)
            np.testing.assert_allclose(got, rows, rtol=8e-3)  # bf16 mantissa

    def test_embeddings_f16_roundtrip_and_search(self, tmp_path):
        """float16 storage: round-trips within f16 precision and the
        whole index search path works on it (the least-exercised dtype)."""
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            RAGBuilder,
            UnifiedIndexConfig,
        )

        with IndexContainer(tmp_path / "c.rvdb", "w", dim=8,
                            dtype="float16") as c:
            rows = np.random.default_rng(0).standard_normal((4, 8)).astype(
                np.float32
            )
            c.append_embeddings(rows)
            got = c.read_embeddings(as_float32=True)
            np.testing.assert_allclose(got, rows, rtol=1e-3)  # f16 mantissa

        rng = np.random.default_rng(1)
        kf = tmp_path / "keyframes" / "v"
        kf.mkdir(parents=True)
        for n in range(6):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")

        def embed(batch):
            r = np.random.default_rng(abs(hash(batch.tobytes())) % 2**31)
            e = r.standard_normal((len(batch), 16)).astype(np.float32)
            return e / np.linalg.norm(e, axis=-1, keepdims=True)

        builder = RAGBuilder(embed, 16, input_size=32,
                             config=UnifiedIndexConfig(dtype="float16",
                                                       thumbnail_size=32))
        index, _ = builder.build_index(kf.parent, tmp_path / "f16.rvdb")
        hits = index.search(np.ones(16, np.float32) / 4.0, top_k=3)
        assert len(hits) == 3 and np.isfinite(hits[0].similarity_score)
        index.close()

    def test_blobs_and_metadata(self, tmp_path):
        with IndexContainer(tmp_path / "c.rvdb", "w", dim=4) as c:
            c.append_thumbnails([b"jpegA", b"", b"jpegC"])
            assert c.get_thumbnail(0) == b"jpegA"
            assert c.get_thumbnail(1) == b""
            assert c.get_thumbnail(2) == b"jpegC"
            c.append_metadata([{"folder": "v", "image": "1.jpg", "frame_id": 0}])
            assert c.get_metadata(0)["image"] == "1.jpg"
            with pytest.raises(IndexError):
                c.get_thumbnail(3)

    def test_journal_and_maps(self, tmp_path):
        path = tmp_path / "c.rvdb"
        with IndexContainer(path, "w", dim=4) as c:
            c.append_journal(["abc", "def"])
            c.put_map("video1", "n,frame_idx\n0,0\n")
        with IndexContainer(path, "r") as c:
            assert c.journal_hashes() == {"abc", "def"}
            assert "frame_idx" in c.get_map("video1")
            assert c.get_map("nope") is None

    def test_reopen_append(self, tmp_path):
        path = tmp_path / "c.rvdb"
        with IndexContainer(path, "w", dim=4, dtype="float32") as c:
            c.append_embeddings(np.ones((2, 4), np.float32))
        with IndexContainer(path, "a") as c:
            c.append_embeddings(np.zeros((1, 4), np.float32))
            assert c.num_rows == 3

    def test_consistency_repair(self, tmp_path):
        path = tmp_path / "c.rvdb"
        with IndexContainer(path, "w", dim=4, dtype="float32") as c:
            c.append_embeddings(np.ones((3, 4), np.float32))
            c.append_metadata([{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                               for i in range(2)])  # torn tail: 3 vs 2
            report = c.consistency_report()
            assert not report["ok"]
            c.repair_to_consistent()
            assert c.num_rows == 2
            assert c.consistency_report()["ok"]

    def test_random_truncation_fails_clean_or_recovers(self, tmp_path):
        """Crash-robustness fuzz: truncating the FILE at arbitrary byte
        offsets must yield either a clean reopen (possibly after
        repair_to_consistent) or a clean exception — never a hang, crash,
        or silent garbage (rows that do load must be bit-intact)."""
        path = tmp_path / "f.rvdb"
        rng = np.random.default_rng(0)
        rows = rng.standard_normal((64, 8)).astype(np.float32)
        with IndexContainer(path, "w", dim=8, dtype="float32") as c:
            c.append_embeddings(rows)
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                 for i in range(64)]
            )
            c.flush_checkpoint()
        blob = path.read_bytes()
        outcomes = {"recovered": 0, "clean_error": 0}
        for frac in (0.2, 0.5, 0.8, 0.95, 0.999):
            cut = max(1, int(len(blob) * frac))
            path.write_bytes(blob[:cut])
            try:
                with IndexContainer(path, "a", dim=8, dtype="float32") as c:
                    c.repair_to_consistent()
                    n = c.num_rows
                    assert c.consistency_report()["ok"]
                    if n:
                        got = c.read_embeddings(0, n)
                        np.testing.assert_array_equal(got, rows[:n])
                    outcomes["recovered"] += 1
            except Exception:
                outcomes["clean_error"] += 1
        # full file reopens losslessly
        path.write_bytes(blob)
        with IndexContainer(path, "r") as c:
            assert c.num_rows == 64
        assert sum(outcomes.values()) == 5, outcomes

    def test_not_a_container(self, tmp_path):
        bad = tmp_path / "bad.rvdb"
        import h5py

        with h5py.File(bad, "w") as f:
            f.attrs["magic"] = "other"
        with pytest.raises(ValueError):
            IndexContainer(bad, "r")


class TestBuilder:
    def test_build_and_search_roundtrip(self, tmp_path):
        index, report = build_small(tmp_path)
        assert report.processed == 12
        assert report.failed == 0
        assert index.ntotal == 12
        # query with the embedding of a known image -> must rank itself first
        img = np.asarray(
            Image.open(tmp_path / "keyframes" / "video1" / "3.jpg")
            .convert("RGB").resize((32, 32), Image.BICUBIC), np.uint8
        )
        q = fake_embed(img[None])[0]
        hits = index.search(q, top_k=3)
        assert hits[0].metadata.folder == "video1"
        assert hits[0].metadata.image == "3.jpg"
        assert hits[0].similarity_score > 0.98
        index.close()

    def test_frame_ids_from_csv(self, tmp_path):
        index, _ = build_small(tmp_path)
        meta = index.get_metadata(index.row_for("video0", "4.jpg"))
        assert meta.frame_id == 40  # n*10 from the map CSV
        assert meta.fps == 25.0
        index.close()

    def test_thumbnails_stored(self, tmp_path):
        index, _ = build_small(tmp_path)
        thumb = index.get_thumbnail("video0", "0.jpg")
        assert thumb[:2] == b"\xff\xd8"  # JPEG magic
        index.close()

    def test_resume_skips_processed(self, tmp_path):
        index, first = build_small(tmp_path)
        index.close()
        # add two new images then rebuild with resume
        folder = tmp_path / "keyframes" / "video0"
        rng = np.random.default_rng(99)
        for n in (6, 7):
            arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
        builder = RAGBuilder(
            fake_embed, DIM, input_size=32,
            config=UnifiedIndexConfig(chunk_size=5, dtype="float32",
                                      thumbnail_size=32),
        )
        index2, report = builder.build_index(
            tmp_path / "keyframes", tmp_path / "index.rvdb",
            map_dir=tmp_path / "map", resume=True,
        )
        assert report.resumed
        assert report.skipped_resume == 12
        assert report.processed == 2
        assert index2.ntotal == 14
        index2.close()

    def test_fresh_build_overwrites(self, tmp_path):
        index, _ = build_small(tmp_path)
        index.close()
        builder = RAGBuilder(
            fake_embed, DIM, input_size=32,
            config=UnifiedIndexConfig(chunk_size=5, dtype="float32"),
        )
        index2, report = builder.build_index(
            tmp_path / "keyframes", tmp_path / "index.rvdb",
            map_dir=tmp_path / "map", resume=False,
        )
        assert not report.resumed
        assert report.processed == 12
        index2.close()

    def test_corrupt_image_tolerated(self, tmp_path):
        kf, _ = make_keyframes(tmp_path)
        (kf / "video0" / "99.jpg").write_bytes(b"not a jpeg")
        builder = RAGBuilder(
            fake_embed, DIM, input_size=32,
            config=UnifiedIndexConfig(chunk_size=100, dtype="float32"),
        )
        index, report = builder.build_index(kf, tmp_path / "i.rvdb")
        assert report.failed == 1
        assert report.processed == 12
        assert index.ntotal == 12
        index.close()


class TestUnifiedIndex:
    def test_load_from_file(self, tmp_path):
        index, _ = build_small(tmp_path)
        index.close()
        loaded = UnifiedIndex().load_unified_index(tmp_path / "index.rvdb")
        assert loaded.ntotal == 12
        assert loaded.load_time_s is not None
        hits = loaded.search(np.ones(DIM, np.float32), top_k=5)
        assert len(hits) == 5
        assert all(
            hits[i].similarity_score >= hits[i + 1].similarity_score
            for i in range(4)
        )
        loaded.close()

    def test_search_vectors_batch_and_filter(self, tmp_path):
        index, _ = build_small(tmp_path)
        qs = np.stack([np.ones(DIM), -np.ones(DIM)]).astype(np.float32)
        results = index.search_vectors(qs, top_k=4)
        assert len(results) == 2 and len(results[0]) == 4
        only_v1 = index.search(
            np.ones(DIM, np.float32), top_k=4,
            filter_fn=lambda m: m.folder == "video1",
        )
        assert all(h.metadata.folder == "video1" for h in only_v1)
        index.close()

    def test_augmented_search_has_temporal_context(self, tmp_path):
        index, _ = build_small(tmp_path)
        hits = index.augmented_search(np.ones(DIM, np.float32), top_k=2,
                                      temporal_window=2)
        assert hits[0].temporal_context
        ctx = hits[0].temporal_context
        assert all(c["folder"] == hits[0].metadata.folder for c in ctx)
        index.close()

    def test_temporal_context_respects_folder_boundary(self, tmp_path):
        index, _ = build_small(tmp_path)
        # first frame of video1 (row 6): neighbours must not leak video0
        row = index.row_for("video1", "0.jpg")
        ctx = index.get_temporal_context(row, window=3)
        assert all(c["folder"] == "video1" for c in ctx)
        assert all(c["offset"] > 0 for c in ctx)
        index.close()

    def test_incremental_update(self, tmp_path):
        index, _ = build_small(tmp_path)
        index.close()
        index = UnifiedIndex(UnifiedIndexConfig(dtype="float32")).load_unified_index(
            tmp_path / "index.rvdb", mode="a"
        )
        new_vec = np.full((1, DIM), 0.5, np.float32)
        out = index.incremental_update(
            new_vec,
            [KeyframeMetadata(folder="videoX", image="0.jpg", frame_id=0)],
            thumbnails=[b"\xff\xd8fake"],
            file_hashes=["newhash123"],
        )
        assert out["ntotal"] == 13
        hits = index.search(new_vec[0], top_k=1)
        assert hits[0].metadata.folder == "videoX"
        index.close()
        # survives reload
        again = UnifiedIndex().load_unified_index(tmp_path / "index.rvdb")
        assert again.ntotal == 13
        assert again.row_for("videoX", "0.jpg") == 12
        again.close()

    def test_incremental_update_int8_in_place_matches_reload(self, tmp_path):
        """Single-device int8 append is an in-place donated update (no O(N)
        re-upload) and must score bit-identically to a full reload — the
        quantize convention (normalization folded into the scale) matches
        ``_upload_embeddings``."""
        kf, _ = make_keyframes(tmp_path)
        cfg = UnifiedIndexConfig(dtype="int8", thumbnail_size=32)
        builder = RAGBuilder(fake_embed, DIM, input_size=32, config=cfg)
        index, _ = builder.build_index(kf, tmp_path / "q.rvdb")
        index.close()
        index = UnifiedIndex(cfg).load_unified_index(
            tmp_path / "q.rvdb", mode="a"
        )
        cap_before = index._capacity
        rng = np.random.default_rng(3)
        new = rng.standard_normal((2, DIM)).astype(np.float32)
        new /= np.linalg.norm(new, axis=-1, keepdims=True)
        index.incremental_update(
            new,
            [KeyframeMetadata(folder="vx", image=f"{i}.jpg", frame_id=i)
             for i in range(2)],
        )
        assert index._capacity == cap_before  # stayed in place
        q = rng.standard_normal(DIM).astype(np.float32)
        got = [(h.metadata.row_id, h.similarity_score)
               for h in index.search(q, top_k=8)]
        index.close()
        reloaded = UnifiedIndex(cfg).load_unified_index(tmp_path / "q.rvdb")
        want = [(h.metadata.row_id, h.similarity_score)
                for h in reloaded.search(q, top_k=8)]
        reloaded.close()
        assert got == want  # bit-exact (int8 metric is integer math)

    def test_incremental_rejected_readonly(self, tmp_path):
        index, _ = build_small(tmp_path)
        index.close()
        ro = UnifiedIndex().load_unified_index(tmp_path / "index.rvdb", mode="r")
        with pytest.raises(PermissionError):
            ro.incremental_update(
                np.ones((1, DIM), np.float32),
                [KeyframeMetadata(folder="x", image="a.jpg", frame_id=0)],
            )
        ro.close()

    def test_empty_index_search(self, tmp_path):
        with IndexContainer(tmp_path / "e.rvdb", "w", dim=DIM, dtype="float32"):
            pass
        index = UnifiedIndex().load_unified_index(tmp_path / "e.rvdb")
        assert index.search(np.ones(DIM, np.float32), top_k=5) == []
        index.close()


class TestMetadataManager:
    def _metas_feats(self, rng):
        metas, feats = [], []
        row = 0
        for folder in ("a", "b"):
            base = rng.standard_normal(DIM)
            for n in range(5):
                metas.append(
                    KeyframeMetadata(folder=folder, image=f"{n}.jpg",
                                     frame_id=n * (1 if folder == "a" else 10),
                                     row_id=row)
                )
                v = base + 0.05 * rng.standard_normal(DIM)
                feats.append(v / np.linalg.norm(v))
                row += 1
        return metas, np.asarray(feats, np.float32)

    def test_build_and_query(self, rng):
        mm = MetadataManager()
        metas, feats = self._metas_feats(rng)
        mm.build_metadata(metas, feats)
        assert mm.count() == 10
        assert mm.folders() == ["a", "b"]
        assert mm.get("a", "3.jpg").frame_id == 3

    def test_temporal_neighbors(self, rng):
        mm = MetadataManager()
        metas, feats = self._metas_feats(rng)
        mm.build_metadata(metas, feats)
        nbrs = mm.get_temporal_neighbors("a", "2.jpg", window=1)
        assert [m.image for m in nbrs] == ["1.jpg", "3.jpg"]

    def test_similarity_graph(self, rng):
        mm = MetadataManager(similarity_threshold=0.5)
        metas, feats = self._metas_feats(rng)
        mm.build_metadata(metas, feats)
        similar = mm.get_similar_frames("a", "0.jpg")
        assert similar  # same-folder frames are highly similar by design
        assert all(s >= 0.5 for _, s in similar)

    def test_scene_boundaries_gap(self, rng):
        mm = MetadataManager(scene_gap_threshold=5)
        metas, feats = self._metas_feats(rng)
        mm.build_metadata(metas, feats)
        assert mm.get_scene_boundaries("a") == [0]          # gaps of 1
        assert mm.get_scene_boundaries("b") == [0, 1, 2, 3, 4]  # gaps of 10

    def test_save_load_verified(self, rng, tmp_path):
        mm = MetadataManager()
        metas, feats = self._metas_feats(rng)
        mm.build_metadata(metas, feats)
        mm.save(tmp_path / "meta.json")
        mm2 = MetadataManager()
        mm2.load(tmp_path / "meta.json")
        assert mm2.count() == 10
        assert mm2.get_similar_frames("a", "0.jpg")


class TestPortable:
    def test_path_rewriting(self):
        assert (
            PortableIndex.to_portable_path("C:/users/x/keyframes/v/1.jpg")
            == "keyframes/v/1.jpg"
        )
        assert PortableIndex.to_portable_path("/plain/file.jpg") == "file.jpg"

    def test_package_roundtrip(self, tmp_path):
        index, _ = build_small(tmp_path)
        index.close()
        pi = PortableIndex()
        pkg = pi.create_package(tmp_path / "index.rvdb", tmp_path / "pkg")
        report = pi.validate_package(pkg)
        assert report["ok"], report
        loaded = pi.load_package(pkg)
        assert loaded.ntotal == 12
        loaded.close()

    def test_validation_catches_corruption(self, tmp_path):
        index, _ = build_small(tmp_path)
        index.close()
        pi = PortableIndex()
        pkg = pi.create_package(tmp_path / "index.rvdb", tmp_path / "pkg")
        (pkg / "index.rvdb").write_bytes(b"truncated")
        report = pi.validate_package(pkg)
        assert not report["ok"]
        with pytest.raises(ValueError):
            pi.load_package(pkg)

    def test_version_gate(self, tmp_path):
        pi = PortableIndex()
        pkg = tmp_path / "pkg"
        pkg.mkdir()
        (pkg / "manifest.json").write_text('{"format_version": "1.0"}')
        report = pi.validate_package(pkg)
        assert not report["ok"]


class TestDeletion:
    def test_kernel_mask_interpret(self, rng):
        import jax.numpy as jnp

        from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
            topk_exact_reference,
            topk_search,
        )

        n = 3000
        x = rng.standard_normal((n, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = x[:3]
        deleted = np.zeros(n, np.int8)
        deleted[[0, 1, 2, 100]] = 1  # delete the self-matches
        got = topk_search(jnp.asarray(x), jnp.asarray(q), 5,
                          use_pallas=True, interpret=True,
                          deleted=jnp.asarray(deleted))
        ids = np.asarray(got.indices)
        assert not np.isin(ids, [0, 1, 2, 100]).any()
        # equals oracle over the surviving rows
        keep = np.nonzero(deleted == 0)[0]
        want = topk_exact_reference(jnp.asarray(x[keep]), jnp.asarray(q), 5)
        np.testing.assert_array_equal(ids, keep[np.asarray(want.indices)])

    def test_delete_search_excludes(self, tmp_path):
        index, _ = build_small(tmp_path)
        img = np.asarray(
            Image.open(tmp_path / "keyframes" / "video1" / "3.jpg")
            .convert("RGB").resize((32, 32), Image.BICUBIC), np.uint8
        )
        q = fake_embed(img[None])[0]
        assert index.search(q, top_k=1)[0].metadata.image == "3.jpg"
        row = index.row_for("video1", "3.jpg")
        out = index.delete_rows([row])
        assert out["deleted"] == 1
        hits = index.search(q, top_k=3)
        assert all(h.metadata.row_id != row for h in hits)
        assert index.num_live == 11
        index.close()

    def test_delete_survives_reload(self, tmp_path):
        index, _ = build_small(tmp_path)
        row = index.row_for("video0", "0.jpg")
        index.delete_rows([row])
        index.close()
        again = UnifiedIndex(UnifiedIndexConfig(dtype="float32")
                             ).load_unified_index(tmp_path / "index.rvdb")
        assert again.is_deleted(row)
        assert again.num_deleted == 1
        hits = again.search(np.ones(DIM, np.float32), top_k=12)
        assert all(h.metadata.row_id != row for h in hits)
        again.close()

    def test_delete_keys_and_double_delete(self, tmp_path):
        index, _ = build_small(tmp_path)
        out = index.delete_keys([("video0", "1.jpg"), ("video0", "nope.jpg")])
        assert out["deleted"] == 1
        out2 = index.delete_keys([("video0", "1.jpg")])
        assert out2["deleted"] == 0  # idempotent
        index.close()

    def test_readonly_delete_rejected(self, tmp_path):
        index, _ = build_small(tmp_path)
        index.close()
        ro = UnifiedIndex().load_unified_index(tmp_path / "index.rvdb", mode="r")
        with pytest.raises(PermissionError):
            ro.delete_rows([0])
        ro.close()

    def test_temporal_context_skips_deleted(self, tmp_path):
        index, _ = build_small(tmp_path)
        row2 = index.row_for("video0", "2.jpg")
        row3 = index.row_for("video0", "3.jpg")
        index.delete_rows([row2])
        ctx = index.get_temporal_context(row3, window=1)
        assert all(c["row_id"] != row2 for c in ctx)
        index.close()

    def test_compact_in_place(self, tmp_path):
        index, _ = build_small(tmp_path)
        rows = [index.row_for("video0", "0.jpg"),
                index.row_for("video1", "5.jpg")]
        index = UnifiedIndex(UnifiedIndexConfig(dtype="float32",
                                                thumbnail_size=32))
        index.load_unified_index(tmp_path / "index.rvdb", mode="a")
        index.delete_rows(rows)
        out = index.compact()
        assert out["compacted"] == 2
        assert index.ntotal == 10
        assert index.num_deleted == 0
        # keys and assets survive with remapped rows
        assert index.row_for("video0", "0.jpg") is None
        r = index.row_for("video0", "1.jpg")
        assert r is not None
        assert index.get_thumbnail(r)[:2] == b"\xff\xd8"
        assert index.get_metadata(r).row_id == r
        # search still self-retrieves
        img = np.asarray(
            Image.open(tmp_path / "keyframes" / "video1" / "3.jpg")
            .convert("RGB").resize((32, 32), Image.BICUBIC), np.uint8
        )
        hits = index.search(fake_embed(img[None])[0], top_k=1)
        assert hits[0].metadata.image == "3.jpg"
        index.close()

    def test_compact_noop_without_deletes(self, tmp_path):
        index, _ = build_small(tmp_path)
        out = index.compact()
        assert out["compacted"] == 0
        index.close()


class TestInt8Mode:
    def test_append_quantized_verbatim(self, tmp_path, rng):
        """append_quantized stores the caller's exact int8 bytes + scales
        (append_embeddings re-quantizes, which is not idempotent for rows
        from an external quantizer), and the keep_fp copy holds the
        dequantized values."""
        from intelligent_video_analysis_retrieval_system_tpu.index.container import (
            IndexContainer,
        )

        rows = rng.integers(-127, 128, (64, 32)).astype(np.int8)
        scales = (rng.uniform(0.9, 1.1, 64) / 127.0).astype(np.float32)
        path = tmp_path / "q.rvdb"
        with IndexContainer(path, "w", dim=32, dtype="int8",
                            keep_fp=True) as c:
            c.append_quantized(rows[:40], scales[:40])
            c.append_quantized(rows[40:], scales[40:])  # resumable chunks
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                 for i in range(64)]
            )
            c.flush_checkpoint()
            got_rows, got_scales = c.read_quantized()
            np.testing.assert_array_equal(got_rows, rows)
            np.testing.assert_array_equal(got_scales, scales)
            fp = c.read_fp_rows(np.arange(64))
            np.testing.assert_allclose(
                fp, rows.astype(np.float32) * scales[:, None],
                rtol=1e-2, atol=1e-3,  # bf16 storage granularity
            )
        with IndexContainer(path, "r") as c:  # survives reopen
            got_rows, got_scales = c.read_quantized()
            np.testing.assert_array_equal(got_rows, rows)
            np.testing.assert_array_equal(got_scales, scales)

    def test_append_quantized_rejects_bad_input(self, tmp_path, rng):
        from intelligent_video_analysis_retrieval_system_tpu.index.container import (
            IndexContainer,
        )

        with IndexContainer(tmp_path / "f.rvdb", "w", dim=8,
                            dtype="float32") as c:
            with pytest.raises(ValueError, match="int8 container"):
                c.append_quantized(np.zeros((2, 8), np.int8), np.ones(2))
        with IndexContainer(tmp_path / "q.rvdb", "w", dim=8,
                            dtype="int8") as c:
            with pytest.raises(ValueError, match="scales"):
                c.append_quantized(np.zeros((2, 8), np.int8), np.ones(3))
            with pytest.raises(ValueError, match="expected"):
                c.append_quantized(np.zeros((2, 4), np.int8), np.ones(2))

    def test_quantize_roundtrip(self, rng):
        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            dequantize_rows_int8,
            quantize_rows_int8,
        )

        x = rng.standard_normal((50, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q, s = quantize_rows_int8(x)
        back = dequantize_rows_int8(q, s)
        np.testing.assert_allclose(back, x, atol=1.5 / 127)

    def test_int8_search_matches_exact_ranking(self, rng):
        import jax.numpy as jnp

        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            pad_rows_int8,
            quantize_rows_int8,
            topk_search_int8,
        )
        from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
            topk_exact_reference,
        )
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.evaluation import (
            recall_at_k,
        )

        n = 5000
        x = rng.standard_normal((n, 64)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = x[rng.integers(0, n, 4)] + 0.02 * rng.standard_normal((4, 64)).astype(np.float32)
        xi, xs = pad_rows_int8(*quantize_rows_int8(x))
        got = topk_search_int8(jnp.asarray(xi), jnp.asarray(xs),
                               jnp.asarray(q), 10, n_valid=n,
                               use_pallas=True, interpret=True)
        want = topk_exact_reference(jnp.asarray(x), jnp.asarray(q), 10)
        # quantized database: recall@10 must be essentially perfect and the
        # top-1 identical for near-duplicate queries
        assert recall_at_k(np.asarray(got.indices), np.asarray(want.indices)) >= 0.95
        np.testing.assert_array_equal(
            np.asarray(got.indices)[:, 0], np.asarray(want.indices)[:, 0]
        )

    def test_int8_kernel_bitexact_vs_oracle(self, rng):
        """The int8 metric is integer math (< 2^24 exact in f32), so the
        Pallas path and the reference must agree BIT-EXACTLY — scores and
        indices — regardless of reduction order (unlike the bf16 path,
        which is only tie-aware comparable; see ops/quant.py docstring)."""
        import jax.numpy as jnp

        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            _int8_reference,
            pad_rows_int8,
            quantize_rows_int8,
            topk_search_int8,
        )

        n = 4096
        x = rng.standard_normal((n, 64)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = rng.standard_normal((3, 64)).astype(np.float32)
        xi, xs = pad_rows_int8(*quantize_rows_int8(x))
        got = topk_search_int8(jnp.asarray(xi), jnp.asarray(xs),
                               jnp.asarray(q), 7, n_valid=n,
                               use_pallas=True, interpret=True)
        want = _int8_reference(jnp.asarray(xi[:n]), jnp.asarray(xs[:n]),
                               jnp.asarray(q), 7)
        np.testing.assert_array_equal(np.asarray(got.indices),
                                      np.asarray(want.indices))
        np.testing.assert_array_equal(np.asarray(got.scores),
                                      np.asarray(want.scores))

    def test_int8_xla_backend_bitexact(self, rng):
        """The XLA int8 backend (default on TPU — measured 2.06x the Pallas
        kernel, benchmarks/exp_int8_xla_sweep.py) shares phase 2 and does
        op-identical phase-1 math, so scores AND indices must match both
        the Pallas kernel and the full reference bit-exactly, including
        tombstones and a partial n_valid."""
        import jax.numpy as jnp

        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            _int8_reference,
            pad_rows_int8,
            quantize_rows_int8,
            topk_search_int8,
        )

        n = 3000
        x = rng.standard_normal((n + 500, 64)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        q = rng.standard_normal((3, 64)).astype(np.float32)
        xi, xs = pad_rows_int8(*quantize_rows_int8(x))
        deleted = np.zeros(n, np.int8)
        deleted[rng.integers(0, n, 40)] = 1
        kw = dict(k=7, n_valid=n, deleted=jnp.asarray(deleted))
        got_xla = topk_search_int8(jnp.asarray(xi), jnp.asarray(xs),
                                   jnp.asarray(q), use_pallas=True,
                                   backend="xla", **kw)
        got_pl = topk_search_int8(jnp.asarray(xi), jnp.asarray(xs),
                                  jnp.asarray(q), use_pallas=True,
                                  interpret=True, **kw)
        want = _int8_reference(jnp.asarray(xi[:n]), jnp.asarray(xs[:n]),
                               jnp.asarray(q), 7,
                               deleted=jnp.asarray(deleted))
        for other in (got_pl, want):
            np.testing.assert_array_equal(np.asarray(got_xla.indices),
                                          np.asarray(other.indices))
            np.testing.assert_array_equal(np.asarray(got_xla.scores),
                                          np.asarray(other.scores))

    def test_int8_deleted_mask(self, rng):
        import jax.numpy as jnp

        from intelligent_video_analysis_retrieval_system_tpu.ops.quant import (
            pad_rows_int8,
            quantize_rows_int8,
            topk_search_int8,
        )

        n = 1000
        x = rng.standard_normal((n, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        xi, xs = pad_rows_int8(*quantize_rows_int8(x))
        deleted = np.zeros(n, np.int8)
        deleted[0] = 1
        got = topk_search_int8(jnp.asarray(xi), jnp.asarray(xs),
                               jnp.asarray(x[:1]), 3, n_valid=n,
                               deleted=jnp.asarray(deleted),
                               use_pallas=True, interpret=True)
        assert 0 not in np.asarray(got.indices)[0]

    def test_int8_container_end_to_end(self, tmp_path):
        kf, _ = make_keyframes(tmp_path)
        builder = RAGBuilder(
            fake_embed, DIM, input_size=32,
            config=UnifiedIndexConfig(dtype="int8", thumbnail_size=32),
        )
        index, report = builder.build_index(kf, tmp_path / "q.rvdb")
        assert report.processed == 12
        img = np.asarray(
            Image.open(tmp_path / "keyframes" / "video1" / "3.jpg")
            .convert("RGB").resize((32, 32), Image.BICUBIC), np.uint8
        )
        hits = index.search(fake_embed(img[None])[0], top_k=3)
        assert hits[0].metadata.image == "3.jpg"
        assert hits[0].similarity_score > 0.97
        index.close()
        # reload path
        again = UnifiedIndex(UnifiedIndexConfig(dtype="int8")
                             ).load_unified_index(tmp_path / "q.rvdb")
        hits2 = again.search(fake_embed(img[None])[0], top_k=3)
        assert hits2[0].metadata.image == "3.jpg"
        again.close()

    def test_int8_delete_flow(self, tmp_path):
        kf, _ = make_keyframes(tmp_path)
        builder = RAGBuilder(
            fake_embed, DIM, input_size=32,
            config=UnifiedIndexConfig(dtype="int8", thumbnail_size=32),
        )
        index, _ = builder.build_index(kf, tmp_path / "q.rvdb")
        img = np.asarray(
            Image.open(tmp_path / "keyframes" / "video0" / "2.jpg")
            .convert("RGB").resize((32, 32), Image.BICUBIC), np.uint8
        )
        qv = fake_embed(img[None])[0]
        row = index.row_for("video0", "2.jpg")
        index.delete_rows([row])
        hits = index.search(qv, top_k=3)
        assert all(h.metadata.row_id != row for h in hits)
        index.close()


class TestRobustness:
    def test_concurrent_search_during_append(self, tmp_path):
        """Thread safety: searches racing incremental appends stay valid."""
        import threading

        index, _ = build_small(tmp_path)
        errors = []
        stop = threading.Event()

        def searcher():
            q = np.ones(DIM, np.float32)
            while not stop.is_set():
                try:
                    hits = index.search(q, top_k=5)
                    assert 1 <= len(hits) <= 5
                    assert all(
                        0 <= h.metadata.row_id < index.ntotal for h in hits
                    )
                except Exception as exc:  # noqa: BLE001
                    errors.append(exc)
                    return

        threads = [threading.Thread(target=searcher) for _ in range(3)]
        for t in threads:
            t.start()
        rng = np.random.default_rng(0)
        for i in range(5):
            vec = rng.standard_normal((1, DIM)).astype(np.float32)
            vec /= np.linalg.norm(vec)
            index.incremental_update(
                vec,
                [KeyframeMetadata(folder="live", image=f"{i}.jpg", frame_id=i)],
            )
        stop.set()
        for t in threads:
            t.join(timeout=10)
        assert not errors, errors
        assert index.ntotal == 17
        index.close()

    def test_builder_crash_mid_build_resumes(self, tmp_path):
        """Simulated crash: torn container (embeddings ahead of metadata)
        repairs on reopen and the resumed build completes the corpus."""
        kf, _ = make_keyframes(tmp_path, folders=1, frames=8)
        builder = RAGBuilder(
            fake_embed, DIM, input_size=32,
            config=UnifiedIndexConfig(chunk_size=4, dtype="float32"),
        )
        index, _ = builder.build_index(kf, tmp_path / "i.rvdb")
        index.close()
        # tear the file: extra embeddings row without metadata/journal
        with IndexContainer(tmp_path / "i.rvdb", "a") as c:
            c.append_embeddings(np.ones((1, DIM), np.float32))
            assert not c.consistency_report()["ok"]
        index2, report = builder.build_index(
            kf, tmp_path / "i.rvdb", resume=True
        )
        assert index2.ntotal == 8
        assert index2._container.consistency_report()["ok"]
        assert report.skipped_resume == 8  # no re-embedding of intact files
        index2.close()

    def test_unicode_folder_names(self, tmp_path):
        kf = tmp_path / "keyframes" / "phim_việt_🎬"
        kf.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for n in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(kf / f"{n}.jpg")
        builder = RAGBuilder(fake_embed, DIM, input_size=32,
                             config=UnifiedIndexConfig(dtype="float32"))
        index, report = builder.build_index(tmp_path / "keyframes",
                                            tmp_path / "u.rvdb")
        assert report.processed == 3
        hits = index.search(np.ones(DIM, np.float32), top_k=1)
        assert hits[0].metadata.folder == "phim_việt_🎬"
        index.close()
        again = UnifiedIndex().load_unified_index(tmp_path / "u.rvdb")
        assert again.row_for("phim_việt_🎬", "1.jpg") is not None
        again.close()


class TestSearchByRow:
    def test_similar_excludes_self(self, tmp_path):
        index, _ = build_small(tmp_path)
        row = index.row_for("video0", "2.jpg")
        hits = index.search_by_row(row, top_k=3)
        assert len(hits) == 3
        assert all(h.metadata.row_id != row for h in hits)
        assert hits[0].rank == 1
        with pytest.raises(IndexError):
            index.search_by_row(999)
        index.close()


class TestFaultInjection:
    def test_kill_builder_process_and_resume(self, tmp_path):
        """Real crash: a child process building the index is SIGKILLed
        mid-build; the reopened container repairs and the resumed build
        completes the corpus with no duplicates and no lost files."""
        import os
        import signal
        import subprocess
        import sys
        import textwrap
        import time
        from pathlib import Path

        kf, _ = make_keyframes(tmp_path, folders=1, frames=30)
        repo_root = str(Path(__file__).resolve().parent.parent)
        tests_dir = str(Path(__file__).resolve().parent)
        script = textwrap.dedent(f"""
            import sys, time
            sys.path.insert(0, {repo_root!r})
            sys.path.insert(0, {tests_dir!r})
            import jax; jax.config.update("jax_platforms", "cpu")
            import numpy as np
            from test_index import fake_embed, DIM
            from intelligent_video_analysis_retrieval_system_tpu.index import (
                RAGBuilder, UnifiedIndexConfig)

            def slow_embed(batch):
                time.sleep(0.35)  # widen the kill window per chunk
                return fake_embed(batch)

            builder = RAGBuilder(slow_embed, DIM, input_size=32,
                                 config=UnifiedIndexConfig(
                                     chunk_size=3, dtype="float32",
                                     checkpoint_every_chunks=1,
                                     thumbnail_size=32))
            print("BUILD_START", flush=True)
            builder.build_index({str(kf)!r}, {str(tmp_path / 'i.rvdb')!r})
            print("BUILD_DONE", flush=True)
        """)
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=repo_root,
        )
        # wait for the build to start, then let a few chunks land and KILL
        assert proc.stdout.readline().strip() == "BUILD_START"
        deadline = time.time() + 30
        while time.time() < deadline:
            if (tmp_path / "i.rvdb").exists() and (
                tmp_path / "i.rvdb"
            ).stat().st_size > 50_000:
                break
            time.sleep(0.1)
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=10)
        assert proc.returncode != 0  # really died

        # resume in-process: either the torn file repairs and the build
        # completes incrementally, or (hard HDF5 corruption from the kill)
        # the file is quarantined and a fresh build completes — both must
        # end in a correct, complete index
        builder = RAGBuilder(fake_embed, DIM, input_size=32,
                             config=UnifiedIndexConfig(
                                 chunk_size=3, dtype="float32",
                                 thumbnail_size=32))
        index, report = builder.build_index(kf, tmp_path / "i.rvdb",
                                            resume=True)
        assert index.ntotal == 30
        assert index._container.consistency_report()["ok"]
        # every keyframe present exactly once
        keys = {(m.folder, m.image) for m in index._metadata}
        assert len(keys) == 30
        assert report.skipped_resume + report.processed == 30
        index.close()


class TestInt8Rescore:
    """int8 exact-rescore mode (round 4, VERDICT r3 #5): containers built
    with ``int8_rescore`` keep a bf16 copy on disk; searches rescore the
    int8 top-(k*factor) at full precision and recover the exact bf16
    ranking. Corpus engineered so PLAIN int8 gets the ranking wrong
    (score gaps below the ~1/127 int8 resolution)."""

    @staticmethod
    def _near_tie_corpus(rng, n=512, d=32, n_near=16):
        """First ``n_near`` rows crowd one direction with score gaps
        ~1e-3 (below the ~1/127 int8 resolution: plain int8 shuffles
        their order) while the background sits far away (int8's widened
        top-k*factor reliably CONTAINS the near set — the rescore
        contract's precondition)."""
        base = rng.standard_normal(d).astype(np.float32)
        base /= np.linalg.norm(base)
        perturb = rng.standard_normal((n_near, d)).astype(np.float32)
        near = base[None, :] + 0.02 * perturb / np.linalg.norm(
            perturb, axis=1, keepdims=True
        )
        back = rng.standard_normal((n - n_near, d)).astype(np.float32)
        x = np.concatenate([near, back])
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(
            np.float32
        )

    @staticmethod
    def _build(tmp_path, x, name, **cfg_kwargs):
        path = tmp_path / f"{name}.rvdb"
        cfg = UnifiedIndexConfig(dtype="int8", **cfg_kwargs)
        with IndexContainer(
            path, "w", dim=x.shape[1], dtype="int8",
            keep_fp=cfg.int8_rescore,
        ) as c:
            c.append_embeddings(x)
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i,
                  "row_id": i} for i in range(len(x))]
            )
            c.flush_checkpoint()
        return UnifiedIndex(cfg).load_unified_index(path, mode="a")

    def test_read_fp_rows_order_and_dupes(self, tmp_path, rng):
        x = self._near_tie_corpus(rng, n=64)
        idx = self._build(tmp_path, x, "fp", int8_rescore=True)
        ids = np.array([5, 1, 5, 63, 0])
        rows = idx._container.read_fp_rows(ids)
        import jax.numpy as jnp
        want = np.asarray(x[ids].astype(jnp.bfloat16).astype(np.float32))
        np.testing.assert_allclose(rows, want, atol=1e-6)
        idx.close()

    def test_rescore_recovers_exact_ranking(self, tmp_path, rng):
        x = self._near_tie_corpus(rng)
        q = x[:6] + 0.001  # probes inside the near-tie crowd
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        plain = self._build(tmp_path, x, "plain")
        rescored = self._build(tmp_path, x, "rescored", int8_rescore=True)
        # ground truth: f32 ranking over the bf16-stored rows (the exact
        # contract the rescore promises)
        xb = x.astype(np.float32)  # bf16 round-trip
        import jax.numpy as jnp
        xb = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
        truth = np.argsort(-(q @ xb.T), axis=1, kind="stable")[:, :5]

        got_r = rescored.search_vectors(q, top_k=5)
        got_p = plain.search_vectors(q, top_k=5)
        ids_r = [[h.metadata.row_id for h in hits] for hits in got_r]
        ids_p = [[h.metadata.row_id for h in hits] for hits in got_p]
        # the corpus is engineered so plain int8 must NOT already be
        # exact (otherwise this test proves nothing)
        assert ids_p != [list(t) for t in truth]
        assert ids_r == [list(t) for t in truth]
        # scores are true f32 dots against the bf16 rows
        for b, hits in enumerate(got_r):
            for h, t in zip(hits, truth[b]):
                np.testing.assert_allclose(
                    h.similarity_score, float(q[b] @ xb[t]), atol=1e-5
                )
        plain.close()
        rescored.close()

    def test_rescore_cache_equals_disk_path(self, tmp_path, rng):
        """int8_rescore_cache keeps the bf16 rescore rows resident in
        host RAM; results must be IDENTICAL to the disk-gather path
        (same bits, same f32 arithmetic), across appends too."""
        x = self._near_tie_corpus(rng)
        q = x[:4] + 0.001
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        disk = self._build(tmp_path, x, "rc_disk", int8_rescore=True)
        cached = self._build(tmp_path, x, "rc_ram", int8_rescore=True,
                             int8_rescore_cache=True)
        assert disk._fp_cache is None
        assert cached._fp_cache is not None
        assert cached._fp_cache_n == len(x)

        def snap(idx):
            return [
                [(h.metadata.row_id, h.similarity_score) for h in hits]
                for hits in idx.search_vectors(q, top_k=5)
            ]

        assert snap(cached) == snap(disk)
        # appends extend the cache in place and stay consistent
        new = self._near_tie_corpus(rng, n=24)[:8]
        metas = [{"folder": "w", "image": f"n{i}.jpg", "frame_id": i}
                 for i in range(len(new))]
        disk.incremental_update(new, metas)
        cached.incremental_update(new, metas)
        assert cached._fp_cache_n == len(x) + len(new)
        assert snap(cached) == snap(disk)
        qn = new[:2]
        got_c = cached.search_vectors(qn, top_k=1)
        got_d = disk.search_vectors(qn, top_k=1)
        assert [h[0].metadata.row_id for h in got_c] == [
            h[0].metadata.row_id for h in got_d
        ]
        disk.close()
        cached.close()
        # cache survives (rebuilds on) reopen with the same config
        re = UnifiedIndex(
            UnifiedIndexConfig(dtype="int8", int8_rescore=True,
                               int8_rescore_cache=True)
        ).load_unified_index(tmp_path / "rc_ram.rvdb")
        assert re._fp_cache is not None
        assert re._fp_cache_n == len(x) + len(new)
        re.close()

    def test_rescore_respects_deletes(self, tmp_path, rng):
        x = self._near_tie_corpus(rng, n=128)
        idx = self._build(tmp_path, x, "del", int8_rescore=True)
        q = x[:1]
        top = idx.search_vectors(q, top_k=3)[0]
        victim = top[0].metadata.row_id
        idx.delete_rows([victim])
        after = idx.search_vectors(q, top_k=3)[0]
        assert all(h.metadata.row_id != victim for h in after)
        idx.close()

    def test_compact_preserves_fp_copy(self, tmp_path, rng):
        x = self._near_tie_corpus(rng, n=96)
        idx = self._build(tmp_path, x, "cp", int8_rescore=True)
        idx.delete_rows([3, 40])
        report = idx.compact()
        assert report["compacted"] == 2
        assert idx._container.has_fp_rows
        # exactness survives the compact (fp copy came from the fp copy,
        # not an int8 round-trip)
        import jax.numpy as jnp
        xb = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
        keep = [i for i in range(len(x)) if i not in (3, 40)]
        q = x[10:12] / np.linalg.norm(x[10:12], axis=1, keepdims=True)
        # rows 10,11 are inside the near-tie crowd (n_near=16)
        truth_local = np.argsort(-(q @ xb[keep].T), axis=1)[:, :4]
        got = idx.search_vectors(q, top_k=4)
        ids = [[h.metadata.row_id for h in hits] for hits in got]
        assert ids == [[int(t) for t in row] for row in truth_local]
        idx.close()

    def test_plain_int8_container_ignores_flag(self, tmp_path, rng):
        """config.int8_rescore on a container WITHOUT the fp copy must not
        break search (no silent failure; falls back to plain int8)."""
        x = self._near_tie_corpus(rng, n=64)
        idx = self._build(tmp_path, x, "noflag")
        idx.config.int8_rescore = True  # container has no fp copy
        hits = idx.search_vectors(x[:2], top_k=3)
        assert len(hits) == 2 and hits[0]
        idx.close()


class TestMetaSidecar:
    """Columnar metadata sidecar (round 4, index/metacols.py): O(numpy)
    re-opens; the container's blob store stays authoritative. Reference
    load-speed contract: unified_index.py:10,373."""

    @pytest.fixture(autouse=True)
    def _small_threshold(self, monkeypatch):
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            metacols,
            unified,
        )

        monkeypatch.setattr(metacols, "SIDECAR_MIN_ROWS", 8)
        # unified imports the name at call time from metacols — patch the
        # module attribute only
        yield

    def _build(self, tmp_path, n=40, dim=8, with_extras=True):
        rng = np.random.default_rng(3)
        path = tmp_path / "side.rvdb"
        with IndexContainer(path, "w", dim=dim, dtype="float32") as c:
            c.append_embeddings(
                rng.standard_normal((n, dim)).astype(np.float32)
            )
            recs = []
            for i in range(n):
                r = {"folder": f"v{i % 3}", "image": f"{i:04d}.jpg",
                     "frame_id": i, "pts_time": i * 0.2, "row_id": i,
                     "path": f"/kf/v{i % 3}/{i:04d}.jpg"}
                if with_extras and i % 11 == 0:
                    r["tags"] = ["scene"]
                    r["note"] = {"idx": i}
                recs.append(r)
            c.append_metadata(recs)
            c.flush_checkpoint()
        return path

    def _open(self, path, mode="r"):
        idx = UnifiedIndex(UnifiedIndexConfig(dtype="float32"))
        idx.load_unified_index(path, mode=mode)
        return idx

    def test_written_then_loaded_with_exact_equality(self, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.index.metacols import (
            ColumnarMetadata,
            sidecar_path,
        )

        path = self._build(tmp_path)
        idx = self._open(path)
        eager = list(idx._metadata)
        keys = dict(idx._row_by_key)
        idx.close()
        assert sidecar_path(path).is_file()

        idx2 = self._open(path)
        assert isinstance(idx2._metadata, ColumnarMetadata)
        lazy = list(idx2._metadata)
        assert lazy == eager  # every field, incl. tags/extra blob rows
        assert any(m.tags for m in lazy)
        assert any(m.extra.get("note") for m in lazy)
        # NB dict(lazy) copies C-level storage without filling; compare
        # through items() which triggers the lazy fill
        assert dict(idx2._row_by_key.items()) == keys
        assert idx2._row_by_key.get(("v1", "0001.jpg")) == 1
        assert ("v0", "0000.jpg") in idx2._row_by_key
        idx2.close()

    def test_search_hits_identical(self, tmp_path):
        path = self._build(tmp_path)
        rng = np.random.default_rng(5)
        q = rng.standard_normal((2, 8)).astype(np.float32)
        idx = self._open(path)
        a = idx.search_vectors(q, top_k=5)
        idx.close()
        idx2 = self._open(path)
        b = idx2.search_vectors(q, top_k=5)
        idx2.close()
        for ha, hb in zip(a, b):
            assert [(h.metadata.key, h.metadata.frame_id) for h in ha] == \
                   [(h.metadata.key, h.metadata.frame_id) for h in hb]

    def test_mutations_invalidate(self, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.index.metacols import (
            sidecar_path,
        )

        path = self._build(tmp_path)
        self._open(path).close()          # writes sidecar
        idx = self._open(path, mode="a")  # loads columnar
        rng = np.random.default_rng(7)
        idx.incremental_update(
            rng.standard_normal((2, 8)).astype(np.float32),
            [{"folder": "new", "image": f"n{i}.jpg", "frame_id": i}
             for i in range(2)],
        )
        assert not sidecar_path(path).is_file()
        # in-session view stays consistent across the overlay boundary
        assert idx._metadata[41].folder == "new"
        assert idx._row_by_key.get(("new", "n1.jpg")) == 41
        assert idx._row_by_key.get(("v1", "0001.jpg")) == 1
        idx.delete_keys([("v1", "0001.jpg")])
        idx.compact()
        # compact invalidates, then its internal reload rewrites a FRESH
        # sidecar at the compacted count — stale is impossible either way
        side = sidecar_path(path)
        if side.is_file():
            with np.load(side) as z:
                assert int(z["n"]) == 41
        idx.close()
        # reload rebuilds at the compacted count
        idx2 = self._open(path)
        assert len(idx2._metadata) == 41
        assert sidecar_path(path).is_file()
        idx2.close()

    def test_stale_or_corrupt_sidecar_falls_back(self, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.index.metacols import (
            ColumnarMetadata,
            sidecar_path,
        )

        path = self._build(tmp_path)
        self._open(path).close()
        # stale: append via a raw container handle (no invalidation hook)
        with IndexContainer(path, "a", dim=8, dtype="float32") as c:
            c.append_embeddings(np.zeros((1, 8), np.float32))
            c.append_metadata([{"folder": "x", "image": "x.jpg",
                                "frame_id": 0}])
            c.flush_checkpoint()
        idx = self._open(path)
        # count mismatch -> blob path (then rewrites at the new count)
        assert len(idx._metadata) == 41
        assert idx._metadata[40].folder == "x"
        idx.close()
        # corrupt file -> blob path
        sidecar_path(path).write_bytes(b"garbage not npz")
        idx2 = self._open(path)
        assert len(idx2._metadata) == 41
        assert list(idx2._metadata)[0].folder == "v0"
        idx2.close()

    def test_lazy_row_by_key_concurrent_fill(self):
        """_filled must flip only AFTER the map is populated: a reader
        landing mid-fill previously saw a near-empty dict and returned
        false misses for keys that exist (REST threads do key lookups
        with no index lock)."""
        import threading
        import time

        from intelligent_video_analysis_retrieval_system_tpu.index.metacols import (
            LazyRowByKey,
        )

        keys = [("f", f"img_{i:05d}.jpg") for i in range(400)]

        class SlowMetas:
            def iter_keys(self):
                for k in keys:
                    time.sleep(0.0002)  # stretch the fill window
                    yield k

        lazy = LazyRowByKey(SlowMetas())
        got: list = []
        started = threading.Event()

        def filler():
            started.set()
            lazy.get(keys[0])  # triggers the O(n) fill

        t = threading.Thread(target=filler)
        t.start()
        started.wait()
        time.sleep(0.005)  # land mid-fill
        got.append(lazy.get(keys[-1]))  # must block, never false-miss
        t.join()
        assert got == [len(keys) - 1]
        assert len(lazy) == len(keys)

    def test_below_threshold_no_sidecar(self, tmp_path, monkeypatch):
        from intelligent_video_analysis_retrieval_system_tpu.index import (
            metacols,
        )
        from intelligent_video_analysis_retrieval_system_tpu.index.metacols import (
            sidecar_path,
        )

        monkeypatch.setattr(metacols, "SIDECAR_MIN_ROWS", 10_000)
        path = self._build(tmp_path)
        idx = self._open(path)
        assert isinstance(idx._metadata, list)
        idx.close()
        assert not sidecar_path(path).is_file()


class TestFlat8Sidecar:
    """int8 flat embedding sidecar (round 5, native.FlatInt8File): the
    capacity-mode analog of .flat/.meta.npz — blob opens of an int8
    container measured 71 MB/s at 10M rows (chunks interleave with the
    keep_fp blob on disk), so the first open lazily writes a contiguous
    mmap'd rows+folded-scales file and re-opens stream it at disk rate.
    Reference load-speed contract: unified_index.py:10,373."""

    @pytest.fixture(autouse=True)
    def _small_threshold(self, monkeypatch):
        monkeypatch.setattr(UnifiedIndex, "_FLAT_MIN_ROWS", 8)

    def _build(self, tmp_path, n=48, dim=16):
        rng = np.random.default_rng(7)
        path = tmp_path / "cap.rvdb"
        with IndexContainer(path, "w", dim=dim, dtype="int8") as c:
            c.append_embeddings(
                rng.standard_normal((n, dim)).astype(np.float32)
            )
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                 for i in range(n)]
            )
            c.flush_checkpoint()
        return path

    @staticmethod
    def _flat8(path):
        return path.with_name(path.name + ".flat8")

    def _search(self, idx, dim, b=3):
        q = np.random.default_rng(11).standard_normal((b, dim))
        q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
        res = idx.search_vectors(q, top_k=5)
        return [
            [(h.metadata.frame_id, round(float(h.similarity_score), 5))
             for h in per]
            for per in res
        ]

    def test_written_on_first_open_and_used_on_reopen(
        self, tmp_path, monkeypatch
    ):
        path = self._build(tmp_path)
        idx = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        want = self._search(idx, 16)
        idx.close()
        assert self._flat8(path).is_file()

        # reopen MUST come from the sidecar: poison the blob reader
        from intelligent_video_analysis_retrieval_system_tpu.index.container import (
            IndexContainer as IC,
        )

        def _boom(self, *a, **k):  # pragma: no cover - must not run
            raise AssertionError("blob path used despite fresh sidecar")

        monkeypatch.setattr(IC, "read_quantized", _boom)
        idx2 = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        got = self._search(idx2, 16)
        idx2.close()
        assert got == want  # int8 metric is integer math -> bit-exact

    def test_append_invalidates(self, tmp_path):
        path = self._build(tmp_path)
        idx = UnifiedIndex(UnifiedIndexConfig(dtype="int8")).load_unified_index(
            path, mode="a"
        )
        assert self._flat8(path).is_file()
        rng = np.random.default_rng(2)
        idx.incremental_update(
            rng.standard_normal((4, 16)).astype(np.float32),
            [{"folder": "v", "image": f"n{i}.jpg", "frame_id": 100 + i}
             for i in range(4)],
        )
        assert not self._flat8(path).is_file()  # row count changed
        idx.close()
        # next open rebuilds it and serves all rows
        idx2 = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        assert idx2.ntotal == 52
        assert self._flat8(path).is_file()
        idx2.close()

    def test_normalize_mismatch_falls_back(self, tmp_path):
        path = self._build(tmp_path)
        idx = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        idx.close()  # sidecar written with normalized=True
        cfg = UnifiedIndexConfig(normalize=False)
        idx2 = UnifiedIndex(cfg).load_unified_index(path)
        # must have served from the blob (raw scales), not the folded ones
        rows, raw_scales = idx2._container.read_quantized()
        np.testing.assert_array_equal(
            np.asarray(idx2._dev_scales)[: len(raw_scales)], raw_scales
        )
        idx2.close()

    def test_corrupt_sidecar_falls_back(self, tmp_path):
        path = self._build(tmp_path)
        UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path).close()
        p = self._flat8(path)
        p.write_bytes(p.read_bytes()[:40])  # truncate mid-rows
        idx = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        assert idx.ntotal == 48  # blob fallback served
        idx.close()


class TestFlatBf16LazySidecar:
    """Round 5: bf16/f32 containers lazily write the .flat rows sidecar on
    first load (the builder only wrote it at finalize), and loads read it
    back with sequential readinto — thumbnail-bearing containers measured
    87 MB/s on the interleaved blob path."""

    @pytest.fixture(autouse=True)
    def _small_threshold(self, monkeypatch):
        monkeypatch.setattr(UnifiedIndex, "_FLAT_MIN_ROWS", 8)

    def _build(self, tmp_path, n=40, dim=16, dtype="bfloat16"):
        rng = np.random.default_rng(5)
        path = tmp_path / "b.rvdb"
        with IndexContainer(path, "w", dim=dim, dtype=dtype) as c:
            c.append_embeddings(
                rng.standard_normal((n, dim)).astype(np.float32)
            )
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                 for i in range(n)]
            )
            c.flush_checkpoint()
        return path

    def _results(self, idx, dim):
        q = np.random.default_rng(9).standard_normal((2, dim))
        q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
        res = idx.search_vectors(q, top_k=5)
        return [
            [(h.metadata.frame_id, round(float(h.similarity_score), 4))
             for h in per]
            for per in res
        ]

    @pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
    def test_lazy_write_and_reuse(self, tmp_path, monkeypatch, dtype):
        path = self._build(tmp_path, dtype=dtype)
        flat = path.with_name(path.name + ".flat")
        idx = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        want = self._results(idx, 16)
        idx.close()
        assert flat.is_file()

        from intelligent_video_analysis_retrieval_system_tpu.index.container import (
            IndexContainer as IC,
        )

        def _boom(self, *a, **k):  # pragma: no cover - must not run
            raise AssertionError("blob path used despite fresh sidecar")

        monkeypatch.setattr(IC, "read_embeddings", _boom)
        idx2 = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        got = self._results(idx2, 16)
        idx2.close()
        assert got == want  # raw storage bits are identical either path

    def test_append_invalidates_and_rebuilds(self, tmp_path):
        path = self._build(tmp_path)
        flat = path.with_name(path.name + ".flat")
        idx = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(
            path, mode="a"
        )
        assert flat.is_file()
        idx.incremental_update(
            np.random.default_rng(1).standard_normal((3, 16)).astype(
                np.float32
            ),
            [{"folder": "v", "image": f"n{i}.jpg", "frame_id": 90 + i}
             for i in range(3)],
        )
        assert not flat.is_file()
        idx.close()
        idx2 = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        assert idx2.ntotal == 43 and flat.is_file()
        idx2.close()

    def test_corrupt_sidecar_falls_back(self, tmp_path):
        path = self._build(tmp_path)
        UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path).close()
        flat = path.with_name(path.name + ".flat")
        flat.write_bytes(flat.read_bytes()[:30])
        idx = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        assert idx.ntotal == 40
        idx.close()


class TestReviewRegressionsRound5:
    """Regression tests for the round-5 review findings."""

    def test_fp_cache_survives_overflow_append(self, tmp_path):
        """A capacity-overflow append reloads the device state; the
        resident rescore cache must be REBUILT, not silently dropped for
        the rest of the process (it used to stay None — every later query
        paid the disk gather the cache exists to kill)."""
        from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
            TILE_N,
        )

        rng = np.random.default_rng(3)
        n, dim = TILE_N, 16  # fills padded capacity exactly
        x = rng.standard_normal((n, dim)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        path = tmp_path / "cap.rvdb"
        with IndexContainer(path, "w", dim=dim, dtype="int8",
                            keep_fp=True) as c:
            c.append_embeddings(x)
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                 for i in range(n)]
            )
            c.flush_checkpoint()
        cfg = UnifiedIndexConfig(dtype="int8", int8_rescore=True,
                                 int8_rescore_cache=True)
        idx = UnifiedIndex(cfg).load_unified_index(path, mode="a")
        assert idx._fp_cache is not None and idx._fp_cache_n == n
        assert idx._capacity == n  # full to the brim -> next append reloads
        idx.incremental_update(
            np.asarray(x[:3] + 0.01, np.float32),
            [{"folder": "v", "image": f"o{i}.jpg", "frame_id": n + i}
             for i in range(3)],
        )
        assert idx.ntotal == n + 3
        assert idx._fp_cache is not None, "overflow reload dropped the cache"
        assert idx._fp_cache_n == n + 3  # new rows included exactly once
        idx.close()

    def test_explicit_config_beats_persisted_ann_knobs(self, tmp_path):
        """Persisted nprobe/max_batch restore ONLY into default configs: an
        operator who explicitly set the knobs must not have a restart
        silently clobber them with stale build-time values."""
        rng = np.random.default_rng(4)
        x = rng.standard_normal((512, 16)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        path = tmp_path / "k.rvdb"
        with IndexContainer(path, "w", dim=16, dtype="float32") as c:
            c.append_embeddings(x)
            c.append_metadata(
                [{"folder": "v", "image": f"{i}.jpg", "frame_id": i}
                 for i in range(512)]
            )
            c.flush_checkpoint()
        cfg = UnifiedIndexConfig(ann=True, ann_nlist=8, ann_nprobe=2,
                                 ann_max_batch=2)
        idx = UnifiedIndex(cfg).load_unified_index(path, mode="a")
        assert idx.ann_active
        # the build-time recall guard may tune nprobe up its ladder —
        # whatever value it landed on is what got persisted
        tuned = idx.config.ann_nprobe
        idx.close()

        # default config: persisted knobs restore (FAISS-like)
        d = UnifiedIndex(UnifiedIndexConfig()).load_unified_index(path)
        assert d.config.ann_nprobe == tuned and d.config.ann_max_batch == 2
        d.close()

        # explicit non-default config: the operator's values win
        mine = UnifiedIndexConfig(ann_nprobe=7, ann_max_batch=9)
        e = UnifiedIndex(mine).load_unified_index(path)
        assert e.ann_active  # structure still restored
        assert e.config.ann_nprobe == 7 and e.config.ann_max_batch == 9
        e.close()


class TestBuilderSidecarDtypes:
    """The builder's finalize-time sidecar must match what the load path
    reads: .flat8 for int8 containers (the old dequantized-f32 .flat was
    never consulted), raw-bits .flat for bf16/f32."""

    def _build(self, tmp_path, dtype):
        kf, _ = make_keyframes(tmp_path)
        mp = make_maps(tmp_path)
        builder = RAGBuilder(
            fake_embed, DIM, input_size=32,
            config=UnifiedIndexConfig(chunk_size=5, dtype=dtype,
                                      thumbnail_size=32),
        )
        index, _ = builder.build_index(kf, tmp_path / "ix.rvdb", map_dir=mp)
        index.close()
        return tmp_path / "ix.rvdb"

    def test_int8_build_writes_flat8(self, tmp_path):
        path = self._build(tmp_path, "int8")
        assert path.with_name(path.name + ".flat8").is_file()
        assert not path.with_name(path.name + ".flat").is_file()
        # and a reopen actually consumes it (sidecar scales are folded)
        idx = UnifiedIndex(UnifiedIndexConfig(dtype="int8")).load_unified_index(path)
        assert idx.ntotal > 0
        idx.close()

    def test_bf16_build_writes_raw_flat(self, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu import native

        path = self._build(tmp_path, "bfloat16")
        flat = path.with_name(path.name + ".flat")
        assert flat.is_file()
        n, d, name = native.FlatEmbeddingFile(flat).header()
        assert name == "bfloat16" and d == DIM
