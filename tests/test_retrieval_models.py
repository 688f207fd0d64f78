"""Tests for retrieval data models, translator, temporal analyzer, validator."""

import numpy as np
import pytest

from intelligent_video_analysis_retrieval_system_tpu.retrieval.results import (
    KeyframeMetadata,
    SearchResult,
)
from intelligent_video_analysis_retrieval_system_tpu.retrieval.temporal import TemporalAnalyzer
from intelligent_video_analysis_retrieval_system_tpu.retrieval.translator import (
    UniversalQueryTranslator,
)
from intelligent_video_analysis_retrieval_system_tpu.retrieval.validator import (
    DataConsistencyValidator,
)


class TestModels:
    def test_metadata_validation(self):
        with pytest.raises(ValueError):
            KeyframeMetadata(folder="", image="1.jpg", frame_id=0)
        with pytest.raises(ValueError):
            KeyframeMetadata(folder="v", image="1.jpg", frame_id=-1)

    def test_metadata_roundtrip(self):
        m = KeyframeMetadata(folder="v", image="1.jpg", frame_id=5, pts_time=1.5)
        m2 = KeyframeMetadata.from_dict(m.to_dict())
        assert m2 == m

    def test_from_dict_keeps_unknown_fields(self):
        m = KeyframeMetadata.from_dict(
            {"folder": "v", "image": "1.jpg", "frame_id": 0, "custom": 42}
        )
        assert m.extra["custom"] == 42

    def test_result_detail_levels(self):
        m = KeyframeMetadata(folder="v", image="1.jpg", frame_id=5, row_id=3)
        r = SearchResult(metadata=m, similarity_score=0.91234567, rank=1)
        assert set(r.to_dict("minimal")) == {"folder", "image", "similarity_score", "rank"}
        assert "pts_time" in r.to_dict("standard")
        assert "tags" in r.to_dict("rich")
        assert r.to_dict("full")["row_id"] == 3


class TestTranslator:
    def test_english_passthrough(self):
        t = UniversalQueryTranslator()
        res = t.translate_query("a red car on the street")
        assert res.detected_language == "en"
        assert res.confidence >= 0.9
        assert "red car" in res.clip_prompt

    def test_clip_prompt_prefix(self):
        t = UniversalQueryTranslator()
        assert t.translate_query("red car").clip_prompt.startswith("a photo of")
        assert t.translate_query("a photo of a dog").clip_prompt == "a photo of a dog"

    def test_vietnamese_dictionary_fallback(self):
        t = UniversalQueryTranslator()
        res = t.translate_query("người đang chạy trên bãi biển")
        assert res.detected_language == "vi"
        assert res.method == "dictionary"
        assert "person" in res.clip_prompt and "beach" in res.clip_prompt
        assert res.confidence > 0.3

    def test_llm_hook_preferred(self):
        t = UniversalQueryTranslator(llm_translate_fn=lambda q: "a dog swimming")
        res = t.translate_query("con chó đang bơi")
        assert res.method == "llm"
        assert "dog swimming" in res.clip_prompt

    def test_llm_failure_falls_back(self):
        def boom(q):
            raise RuntimeError("no network")

        t = UniversalQueryTranslator(llm_translate_fn=boom)
        res = t.translate_query("con chó")
        assert res.method in ("dictionary", "passthrough")

    def test_cache_hit(self):
        calls = []

        def llm(q):
            calls.append(q)
            return "a cat"

        t = UniversalQueryTranslator(llm_translate_fn=llm)
        t.translate_query("con mèo đen")
        t.translate_query("con mèo đen")
        assert len(calls) == 1

    def test_detect_language_scripts(self):
        detect = UniversalQueryTranslator.detect_language
        assert detect("hello world")[0] == "en"
        assert detect("xin chào các bạn ở đây")[0] == "vi"
        assert detect("你好世界")[0] == "zh"
        assert detect("안녕하세요")[0] == "ko"


class TestTranslatorBreadth:
    """Round-4 offline breadth: ten dictionary languages + Latin-script
    detection (reference TranslationService accepted any language via
    googletrans, api.py:2261-2416; offline rebuild covers the common
    query languages deterministically)."""

    DETECT_CASES = [
        ("a man running on the beach", "en"),
        ("the dog in the park", "en"),
        ("người đang chạy trên bãi biển", "vi"),
        ("一个人在海滩上跑步", "zh"),
        ("夜の街を走っている犬", "ja"),
        ("해변에서 달리는 강아지", "ko"),
        ("человек бежит на пляж ночью", "ru"),
        ("ผู้ชายวิ่งบนชายหาด", "th"),
        ("une femme qui court sur la plage", "fr"),
        ("un perro corriendo en la playa", "es"),
        ("ein mann läuft auf der straße", "de"),
        ("orang berjalan di pantai dengan anjing", "id"),
    ]

    @pytest.mark.parametrize("query,want", DETECT_CASES)
    def test_detection(self, query, want):
        lang, conf = UniversalQueryTranslator.detect_language(query)
        assert lang == want, (query, lang)
        assert conf >= 0.4

    TRANSLATE_CASES = [
        ("해변에서 달리는 강아지", "ko", ["beach", "running", "dog"]),
        ("человек бежит на пляж ночью", "ru",
         ["person", "running", "beach", "at night"]),
        ("ผู้ชายวิ่งบนชายหาด", "th", ["man", "running", "beach"]),
        ("une femme qui court sur la plage", "fr",
         ["woman", "running", "beach"]),
        ("un perro corriendo en la playa", "es",
         ["dog", "running", "beach"]),
        ("ein mann läuft auf der straße", "de",
         ["man", "running", "street"]),
        ("orang berjalan di pantai dengan anjing", "id",
         ["person", "walking", "beach", "dog"]),
    ]

    @pytest.mark.parametrize("query,lang,expect", TRANSLATE_CASES)
    def test_dictionary_translation(self, query, lang, expect):
        res = UniversalQueryTranslator().translate_query(query)
        assert res.detected_language == lang
        assert res.method == "dictionary"
        for word in expect:
            assert word in res.clip_prompt, (res.clip_prompt, word)
        assert res.confidence > 0.3  # usable above the facade threshold

    def test_supported_langs_export(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.translator import (
            SUPPORTED_OFFLINE_LANGS,
        )

        assert set(SUPPORTED_OFFLINE_LANGS) == {
            "vi", "zh", "ja", "ko", "ru", "th", "fr", "es", "de", "id"
        }

    def test_word_boundary_substitution(self):
        """fr 'le' must not fire inside 'fleur' (word-boundary langs);
        zh substitution stays substring (no spaces to bound on)."""
        text, cov = UniversalQueryTranslator._dictionary_translate(
            "une fleur rouge", "fr"
        )
        assert "flower" in text and "red" in text
        assert "f flower" not in text and "fower" not in text
        text, _ = UniversalQueryTranslator._dictionary_translate(
            "红色的花", "zh"
        )
        assert "red" in text and "flower" in text

    def test_shared_diacritics_not_vietnamese(self):
        """Regression: French/Spanish acute-accent words used to detect
        as Vietnamese (shared diacritic set)."""
        assert UniversalQueryTranslator.detect_language("école")[0] == "fr"
        assert UniversalQueryTranslator.detect_language(
            "el médico y la policía en el hospital"
        )[0] == "es"

    def test_vietnamese_unique_chars_still_win(self):
        lang, conf = UniversalQueryTranslator.detect_language(
            "người phụ nữ đẹp"
        )
        assert lang == "vi" and conf > 0.4

    def test_vi_es_con_disambiguation(self):
        """'con' is both a Vietnamese classifier and Spanish 'with':
        vi wins only when a Vietnamese-style diacritic is present."""
        assert UniversalQueryTranslator.detect_language("con mèo")[0] == "vi"
        assert UniversalQueryTranslator.detect_language(
            "mujer con gato"
        )[0] == "es"


class TestTemporal:
    def _features(self, scenes, dim=16, seed=0):
        """Blocks of near-identical vectors per scene."""
        rng = np.random.default_rng(seed)
        rows = []
        for length in scenes:
            base = rng.normal(size=dim)
            base /= np.linalg.norm(base)
            for _ in range(length):
                v = base + rng.normal(scale=0.01, size=dim)
                rows.append(v / np.linalg.norm(v))
        return np.asarray(rows, dtype=np.float32)

    def test_scene_boundaries(self):
        feats = self._features([8, 8, 8])
        ta = TemporalAnalyzer(scene_threshold=0.5, min_scene_length=3)
        scenes = ta.detect_scene_boundaries(feats)
        assert [s.start for s in scenes] == [0, 8, 16]
        assert all(s.length == 8 for s in scenes)

    def test_short_scene_merged(self):
        feats = self._features([8, 2, 8])
        ta = TemporalAnalyzer(scene_threshold=0.5, min_scene_length=4)
        scenes = ta.detect_scene_boundaries(feats)
        # the 2-frame scene merges into its predecessor
        assert scenes[0].length == 10

    def test_shot_ids(self):
        feats = self._features([5, 5])
        ta = TemporalAnalyzer(scene_threshold=0.5, min_scene_length=2)
        shots = ta.assign_shot_ids(feats)
        assert shots[0] == 0 and shots[-1] == 1

    def test_similar_sequences_finds_planted_window(self):
        feats = self._features([10, 10, 10], seed=1)
        query = feats[12:17]  # window inside scene 2
        ta = TemporalAnalyzer()
        hits = ta.find_similar_sequences(feats, query, top_k=1)
        assert hits and 10 <= hits[0]["start"] < 15
        assert hits[0]["score"] > 0.9

    def test_transition_frames(self):
        feats = self._features([6, 6])
        ta = TemporalAnalyzer(scene_threshold=0.5, min_scene_length=2)
        assert ta.extract_transition_frames(feats) == [6]

    def test_interval_stats(self):
        stats = TemporalAnalyzer.frame_interval_stats([0, 10, 20, 30])
        assert stats["mean_gap"] == 10.0
        assert stats["regularity"] == 1.0

    def test_empty_and_single(self):
        ta = TemporalAnalyzer()
        assert ta.detect_scene_boundaries(np.zeros((0, 4), np.float32)) == []
        ones = ta.detect_scene_boundaries(np.ones((1, 4), np.float32))
        assert ones[0].length == 1


class TestValidator:
    def _meta(self, n):
        return [
            KeyframeMetadata(folder="v", image=f"{i}.jpg", frame_id=i, row_id=i)
            for i in range(n)
        ]

    def test_consistent(self):
        v = DataConsistencyValidator()
        report = v.validate_index_metadata_consistency(5, self._meta(5))
        assert report.ok

    def test_count_mismatch(self):
        v = DataConsistencyValidator()
        report = v.validate_index_metadata_consistency(4, self._meta(5))
        assert not report.ok

    def test_duplicate_keys_warn(self):
        v = DataConsistencyValidator()
        meta = self._meta(3)
        meta[2] = KeyframeMetadata(folder="v", image="0.jpg", frame_id=9, row_id=2)
        report = v.validate_index_metadata_consistency(3, meta)
        assert report.ok and report.warnings

    def test_keyframes_folder(self, tmp_workspace):
        v = DataConsistencyValidator()
        bad = v.validate_keyframes_folder(tmp_workspace / "nope")
        assert not bad.ok
        kf = tmp_workspace / "keyframes"
        (kf / "v1").mkdir()
        (kf / "v1" / "1.jpg").write_bytes(b"x")
        good = v.validate_keyframes_folder(kf)
        assert good.ok and good.checked["images"] == 1


class TestEvaluation:
    def test_recall_and_agreement_perfect(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.evaluation import (
            overlap_at_k,
            rank_agreement,
            recall_at_k,
        )

        ids = np.array([[3, 1, 2], [5, 4, 0]])
        assert recall_at_k(ids, ids) == 1.0
        assert rank_agreement(ids, ids) == 1.0
        assert overlap_at_k(ids, ids) == 1.0

    def test_partial_metrics(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.evaluation import (
            overlap_at_k,
            rank_agreement,
            recall_at_k,
        )

        truth = np.array([[1, 2, 3]])
        swapped = np.array([[2, 1, 3]])
        assert recall_at_k(swapped, truth) == 1.0
        assert rank_agreement(swapped, truth) == pytest.approx(1 / 3)
        missing = np.array([[1, 2, 9]])
        assert recall_at_k(missing, truth) == pytest.approx(2 / 3)

    def test_evaluate_backends_pallas_vs_oracle(self, rng):
        import jax.numpy as jnp

        from intelligent_video_analysis_retrieval_system_tpu.ops.topk import (
            topk_exact_reference,
            topk_search,
        )
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.evaluation import (
            evaluate_backends,
        )

        x = rng.standard_normal((3000, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        xd = jnp.asarray(x)
        qs = x[rng.integers(0, 3000, 6)]

        def candidate(q):
            r = topk_search(xd, jnp.asarray(q), 10, use_pallas=True,
                            interpret=True)
            return np.asarray(r.scores), np.asarray(r.indices)

        def oracle(q):
            r = topk_exact_reference(xd, jnp.asarray(q), 10)
            return np.asarray(r.scores), np.asarray(r.indices)

        report = evaluate_backends(candidate, oracle, qs, k=10)
        assert report.passes_parity()
        assert report.score_max_abs_diff < 1e-4


class TestTextProc:
    """retrieval.textproc — the reference's spaCy analog (core.py:1751)."""

    def test_analyze_basic(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            analyze_text,
        )

        a = analyze_text("a red car driving through the busy city at night")
        assert "red" in a.content_words and "car" in a.content_words
        assert "the" not in a.content_words
        assert "red" in a.colors
        assert "driving" in a.actions
        assert any("red car" in p for p in a.noun_phrases)

    def test_entities_capitalized_mid_sentence(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            analyze_text,
        )

        a = analyze_text("people celebrating Tet Festival in Hanoi")
        assert "Tet Festival" in a.entities
        assert "Hanoi" in a.entities

    def test_empty_and_punctuation_only(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            analyze_text,
        )

        assert analyze_text("").content_words == []
        assert analyze_text("?!...").tokens == []

    def test_pos_tagger(self):
        """Round-4 rule-based tagger (the reference read spaCy POS tags,
        core.py:1751-1794)."""
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.textproc import (
            pos_tag,
        )

        tags = dict(pos_tag("a red car driving through the busy city"))
        assert tags["a"] == "DET" and tags["the"] == "DET"
        assert tags["red"] == "ADJ" and tags["busy"] == "ADJ"
        assert tags["car"] == "NOUN" and tags["city"] == "NOUN"
        assert tags["driving"] == "VERB"
        assert tags["through"] == "ADP"

    def test_pos_ing_nouns_not_verbs(self):
        """'building'/'wedding'/'painting' are nouns, not participles."""
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.textproc import (
            pos_tag,
        )

        tags = dict(pos_tag("a wedding in a tall building with a painting"))
        assert tags["wedding"] == "NOUN"
        assert tags["building"] == "NOUN"
        assert tags["painting"] == "NOUN"

    def test_chunks_exclude_verbs(self):
        """'man running fast' must not chunk as one noun phrase (the old
        stopword-run heuristic did)."""
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            analyze_text,
        )

        a = analyze_text("man running fast on the beach")
        assert not any("running" in p for p in a.noun_phrases)
        assert "running" in a.actions

    def test_sentence_start_disambiguation(self):
        """Capitalized sentence-start: suffix evidence beats PROPN
        ('Running dog' is a verb), unknown names still win ('Messi')."""
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.textproc import (
            pos_tag,
        )

        assert dict(pos_tag("Running dog in the park"))["Running"] == "VERB"
        assert dict(pos_tag("Messi scoring a goal"))["Messi"] == "PROPN"

    def test_entity_types(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            analyze_text,
        )

        et = dict(analyze_text(
            "Mr Nguyen speaking at Hanoi University during Tet Festival"
        ).entity_types)
        assert et["Mr Nguyen"] == "PERSON"
        assert et["Hanoi University"] == "ORG"
        assert et["Tet Festival"] == "EVENT"
        et = dict(analyze_text("a trip to Hanoi at night").entity_types)
        assert et["Hanoi"] == "GPE"

    def test_entity_internal_of(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            analyze_text,
        )

        a = analyze_text("Statue of Liberty at sunset")
        assert "Statue of Liberty" in a.entities

    def test_acronym_entity(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            analyze_text,
        )

        et = dict(analyze_text("a news anchor on VTV").entity_types)
        assert et["VTV"] == "ORG"

    def test_expand_variants(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval.textproc import (
            expand_variants,
        )

        v = expand_variants("show me a photo of a red car in the rain")
        assert v[0] == "show me a photo of a red car in the rain"
        assert any("red car" in x for x in v[1:])
        assert len(v) == len(set(v))  # deduplicated

    def test_translator_keywords_use_analyzer(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            UniversalQueryTranslator,
        )

        r = UniversalQueryTranslator().translate_query(
            "a woman wearing a blue dress walking on the beach"
        )
        assert "blue" in r.keywords and "dress" in r.keywords
        assert "the" not in r.keywords

    def test_expand_query_without_provider(self):
        from intelligent_video_analysis_retrieval_system_tpu.agents.llm import (
            LLMProcessor,
        )

        class _Sys:
            class config:
                @staticmethod
                def get(key, default=None):
                    return default

        variants = LLMProcessor(system=_Sys()).expand_query(
            "a red car in the rain"
        )
        assert variants[0] == "a red car in the rain"
        assert len(variants) >= 2  # heuristic variants, not identity


class TestMultilingualDictionaries:
    """zh/ja offline dictionary fallback (vi-only in the reference)."""

    def test_zh_dictionary_translation(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            UniversalQueryTranslator,
        )

        r = UniversalQueryTranslator().translate_query("女人在海滩跳舞")
        assert r.detected_language == "zh"
        assert r.method == "dictionary"
        for w in ("woman", "beach", "dancing"):
            assert w in r.clip_prompt, r.clip_prompt
        assert r.confidence > 0.3

    def test_ja_dictionary_translation(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            UniversalQueryTranslator,
        )

        r = UniversalQueryTranslator().translate_query("ビーチで踊っている女の人")
        assert r.detected_language == "ja"
        assert r.method == "dictionary"
        for w in ("beach", "dancing", "woman"):
            assert w in r.clip_prompt, r.clip_prompt

    def test_unknown_language_still_passthrough(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            UniversalQueryTranslator,
        )

        # Arabic is detected but has no offline dictionary (round 4
        # widened coverage to ten languages; ru/ko/th/fr/es/de/id now
        # translate — see TestTranslatorBreadth)
        r = UniversalQueryTranslator().translate_query("امرأة على الشاطئ")
        assert r.detected_language == "ar"
        assert r.method == "passthrough"
        assert r.confidence <= 0.3

    def test_vi_unchanged(self):
        from intelligent_video_analysis_retrieval_system_tpu.retrieval import (
            UniversalQueryTranslator,
        )

        r = UniversalQueryTranslator().translate_query("con chó trên bãi biển")
        assert r.detected_language == "vi" and r.method == "dictionary"
        assert "dog" in r.clip_prompt and "beach" in r.clip_prompt
