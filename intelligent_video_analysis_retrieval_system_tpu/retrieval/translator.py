"""Multilingual query -> CLIP-optimized English prompt.

Parity with the reference ``UniversalQueryTranslator`` (``core.py:385-684``):
language detection, translation to a CLIP-friendly English prompt, a cache
keyed on the query, and a dictionary fallback for Vietnamese. Differences:

- the LLM call is *pluggable and optional* (``llm_translate_fn``) and never
  sits on the hot search path by default — the reference paid 5-7 s of
  GPT-4o latency per uncached query (``logs/performance.log:8``);
- language detection is a pure Unicode-range heuristic (the reference used
  langdetect with the same heuristic as fallback, ``core.py:485-516``) so it
  is deterministic and dependency-free.
"""

from __future__ import annotations

import re
import threading
from dataclasses import dataclass, field
from typing import Any, Callable

__all__ = ["UniversalQueryTranslator", "TranslationResult"]

# Vietnamese-specific characters (diacritics beyond Latin-1).
_VI_CHARS = set(
    "ăâđêôơưĂÂĐÊÔƠƯ"
    "áàảãạắằẳẵặấầẩẫậéèẻẽẹếềểễệíìỉĩịóòỏõọốồổỗộớờởỡợúùủũụứừửữựýỳỷỹỵ"
    "ÁÀẢÃẠẮẰẲẴẶẤẦẨẪẬÉÈẺẼẸẾỀỂỄỆÍÌỈĨỊÓÒỎÕỌỐỒỔỖỘỚỜỞỠỢÚÙỦŨỤỨỪỬỮỰÝỲỶỸỴ"
)

_CJK = (0x4E00, 0x9FFF)
_HIRAGANA = (0x3040, 0x30FF)
_HANGUL = (0xAC00, 0xD7AF)
_CYRILLIC = (0x0400, 0x04FF)
_THAI = (0x0E00, 0x0E7F)
_ARABIC = (0x0600, 0x06FF)


# Compact Vietnamese->English dictionary for the offline fallback
# (same role as reference core.py:657-684, expanded for video-search terms).
_VI_EN: dict[str, str] = {
    "người": "person", "đàn ông": "man", "phụ nữ": "woman", "trẻ em": "child",
    "con chó": "dog", "con mèo": "cat", "con chim": "bird", "con cá": "fish",
    "xe hơi": "car", "ô tô": "car", "xe máy": "motorbike", "xe đạp": "bicycle",
    "xe buýt": "bus", "xe tải": "truck", "tàu": "ship", "thuyền": "boat",
    "máy bay": "airplane", "đường phố": "street", "tòa nhà": "building",
    "ngôi nhà": "house", "cây": "tree", "hoa": "flower", "núi": "mountain",
    "biển": "sea", "bãi biển": "beach", "sông": "river", "hồ": "lake",
    "bầu trời": "sky", "mây": "cloud", "mưa": "rain", "nắng": "sunny",
    "ban đêm": "at night", "ban ngày": "daytime", "buổi sáng": "morning",
    "buổi tối": "evening", "hoàng hôn": "sunset", "bình minh": "sunrise",
    "màu đỏ": "red", "màu xanh": "blue", "màu xanh lá": "green",
    "màu vàng": "yellow", "màu trắng": "white", "màu đen": "black",
    "đang chạy": "running", "đang đi bộ": "walking", "đang nói": "talking",
    "đang ăn": "eating", "đang uống": "drinking", "đang ngồi": "sitting",
    "đang đứng": "standing", "đang nhảy": "jumping", "đang bơi": "swimming",
    "đang lái xe": "driving", "đang chơi": "playing", "đang hát": "singing",
    "đang khóc": "crying", "đang cười": "laughing", "đám đông": "crowd",
    "sân khấu": "stage", "trận đấu": "match", "bóng đá": "football",
    "tin tức": "news", "phát thanh viên": "news anchor", "phỏng vấn": "interview",
    "cảnh sát": "police", "bác sĩ": "doctor", "học sinh": "student",
    "trường học": "school", "bệnh viện": "hospital", "chợ": "market",
    "nhà hàng": "restaurant", "thành phố": "city", "nông thôn": "countryside",
    "cánh đồng": "field", "áo dài": "ao dai traditional dress",
    "nón lá": "conical hat", "cờ": "flag", "lễ hội": "festival",
    "đêm": "night", "và": "and", "với": "with", "trên": "on", "trong": "in",
    "một": "a", "nhiều": "many", "lớn": "big", "nhỏ": "small",
    "đẹp": "beautiful", "cũ": "old", "mới": "new", "nhanh": "fast",
    "chậm": "slow", "cao": "tall", "thấp": "short",
}

# Compact zh/ja visual-term dictionaries: same offline-fallback role as
# the Vietnamese one (the reference only shipped vi, core.py:657-684;
# detection already distinguishes zh/ja by unicode range, so a small
# dictionary turns those queries from 0.2-confidence passthrough into
# usable CLIP prompts). Entries are common video-search nouns/scenes.
_ZH_EN: dict[str, str] = {
    "人": "person", "男人": "man", "女人": "woman", "孩子": "child",
    "狗": "dog", "猫": "cat", "鸟": "bird", "鱼": "fish", "马": "horse",
    "汽车": "car", "摩托车": "motorbike", "自行车": "bicycle",
    "公共汽车": "bus", "卡车": "truck", "船": "boat", "飞机": "airplane",
    "火车": "train", "街道": "street", "城市": "city", "乡村": "countryside",
    "海滩": "beach", "大海": "sea", "山": "mountain", "河": "river",
    "树": "tree", "花": "flower", "天空": "sky", "云": "cloud",
    "雨": "rain", "雪": "snow", "夜晚": "night", "日落": "sunset",
    "建筑": "building", "桥": "bridge", "市场": "market", "学校": "school",
    "医院": "hospital", "餐厅": "restaurant", "警察": "police",
    "医生": "doctor", "足球": "football", "跑步": "running",
    "游泳": "swimming", "跳舞": "dancing", "唱歌": "singing",
    "吃饭": "eating", "红色": "red", "蓝色": "blue", "绿色": "green",
    "黄色": "yellow", "黑色": "black", "白色": "white", "大": "big",
    "小": "small", "新闻": "news", "采访": "interview", "节日": "festival",
    "国旗": "flag", "和": "and", "在": "in", "的": " ",
}
_JA_EN: dict[str, str] = {
    "人": "person", "男の人": "man", "女の人": "woman", "子供": "child",
    "犬": "dog", "猫": "cat", "鳥": "bird", "魚": "fish", "馬": "horse",
    "車": "car", "バイク": "motorbike", "自転車": "bicycle",
    "バス": "bus", "トラック": "truck", "船": "boat", "飛行機": "airplane",
    "電車": "train", "通り": "street", "都市": "city", "田舎": "countryside",
    "ビーチ": "beach", "海": "sea", "山": "mountain", "川": "river",
    "木": "tree", "花": "flower", "空": "sky", "雲": "cloud",
    "雨": "rain", "雪": "snow", "夜": "night", "夕日": "sunset",
    "建物": "building", "橋": "bridge", "市場": "market", "学校": "school",
    "病院": "hospital", "レストラン": "restaurant", "警察": "police",
    "医者": "doctor", "サッカー": "football", "走っている": "running",
    "泳いでいる": "swimming", "踊っている": "dancing", "歌っている": "singing",
    "食べている": "eating", "赤い": "red", "青い": "blue", "緑の": "green",
    "黄色い": "yellow", "黒い": "black", "白い": "white", "大きい": "big",
    "小さい": "small", "ニュース": "news", "祭り": "festival",
    "旗": "flag", "と": "and", "の": " ", "で": "in",
}

# Longest-phrase-first matching order, per language.
_VI_EN_ORDERED = sorted(_VI_EN.items(), key=lambda kv: -len(kv[0]))
_DICTS_ORDERED: dict[str, list[tuple[str, str]]] = {
    "vi": _VI_EN_ORDERED,
    "zh": sorted(_ZH_EN.items(), key=lambda kv: -len(kv[0])),
    "ja": sorted(_JA_EN.items(), key=lambda kv: -len(kv[0])),
}


@dataclass(slots=True)
class TranslationResult:
    """Outcome of query translation (reference CLIPQueryStructure analog,
    ``core.py:175-199``)."""

    original: str
    clip_prompt: str
    detected_language: str
    confidence: float
    method: str  # passthrough | dictionary | llm
    keywords: list[str] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {
            "original": self.original,
            "clip_prompt": self.clip_prompt,
            "detected_language": self.detected_language,
            "confidence": self.confidence,
            "method": self.method,
            "keywords": self.keywords,
        }


class UniversalQueryTranslator:
    """Language detection + translation with cache and graceful fallback."""

    def __init__(
        self,
        llm_translate_fn: Callable[[str], str | None] | None = None,
        cache: Any | None = None,
        min_confidence: float = 0.3,  # reference threshold (system.py:778)
    ) -> None:
        self.llm_translate_fn = llm_translate_fn
        self.cache = cache
        self.min_confidence = min_confidence
        self._local_cache: dict[str, TranslationResult] = {}
        self._lock = threading.Lock()

    # -- language detection (reference core.py:485-516 heuristics) ----------

    @staticmethod
    def detect_language(text: str) -> tuple[str, float]:
        """Return (language code, confidence in [0,1])."""
        if not text.strip():
            return "en", 0.0
        counts = {"vi": 0, "zh": 0, "ja": 0, "ko": 0, "ru": 0, "th": 0, "ar": 0}
        letters = 0
        for ch in text:
            if ch.isalpha():
                letters += 1
            if ch in _VI_CHARS:
                counts["vi"] += 1
            cp = ord(ch)
            if _CJK[0] <= cp <= _CJK[1]:
                counts["zh"] += 1
            elif _HIRAGANA[0] <= cp <= _HIRAGANA[1]:
                counts["ja"] += 1
            elif _HANGUL[0] <= cp <= _HANGUL[1]:
                counts["ko"] += 1
            elif _CYRILLIC[0] <= cp <= _CYRILLIC[1]:
                counts["ru"] += 1
            elif _THAI[0] <= cp <= _THAI[1]:
                counts["th"] += 1
            elif _ARABIC[0] <= cp <= _ARABIC[1]:
                counts["ar"] += 1
        if letters == 0:
            return "en", 0.1
        lang, hits = max(counts.items(), key=lambda kv: kv[1])
        if hits == 0:
            return "en", 0.9
        return lang, min(1.0, 0.4 + hits / letters)

    # -- translation ---------------------------------------------------------

    def translate_query(self, query: str) -> TranslationResult:
        """Translate ``query`` to a CLIP-friendly English prompt.

        Resolution order: cache -> English passthrough -> optional LLM ->
        dictionary fallback (Vietnamese) -> passthrough with low confidence.
        Never raises (reference guarantee, ``core.py:518-576``).
        """
        query = query.strip()
        with self._lock:
            cached = self._local_cache.get(query)
        if cached is not None:
            return cached
        if self.cache is not None:
            hit = self.cache.get(f"translate::{query}")
            if isinstance(hit, dict) and "clip_prompt" in hit:
                result = TranslationResult(**hit)
                with self._lock:
                    self._local_cache[query] = result
                return result

        lang, lang_conf = self.detect_language(query)
        if lang == "en":
            result = TranslationResult(
                original=query,
                clip_prompt=self._clipify(query),
                detected_language="en",
                confidence=max(lang_conf, 0.9),
                method="passthrough",
                keywords=self._keywords(query),
            )
        else:
            result = self._translate_non_english(query, lang, lang_conf)

        with self._lock:
            self._local_cache[query] = result
        if self.cache is not None:
            try:
                self.cache.set(f"translate::{query}", result.to_dict())
            except Exception:
                pass
        return result

    def _translate_non_english(
        self, query: str, lang: str, lang_conf: float
    ) -> TranslationResult:
        if self.llm_translate_fn is not None:
            try:
                translated = self.llm_translate_fn(query)
            except Exception:
                translated = None
            if translated:
                return TranslationResult(
                    original=query,
                    clip_prompt=self._clipify(translated),
                    detected_language=lang,
                    confidence=0.9,
                    method="llm",
                    keywords=self._keywords(translated),
                )
        if lang in _DICTS_ORDERED:
            translated, coverage = self._dictionary_translate(query, lang)
            if coverage > 0:
                return TranslationResult(
                    original=query,
                    clip_prompt=self._clipify(translated),
                    detected_language=lang,
                    confidence=min(0.85, 0.3 + 0.6 * coverage),
                    method="dictionary",
                    keywords=self._keywords(translated),
                )
        # last resort: raw query, low confidence — caller decides whether
        # to use it (reference uses the prompt only above min_confidence).
        return TranslationResult(
            original=query,
            clip_prompt=query,
            detected_language=lang,
            confidence=0.2,
            method="passthrough",
            keywords=self._keywords(query),
        )

    @staticmethod
    def _dictionary_translate(query: str, lang: str = "vi") -> tuple[str, float]:
        """Longest-phrase-first substitution; returns (text, hit coverage)."""
        text = query.lower()
        matched_chars = 0
        for src, en in _DICTS_ORDERED[lang]:
            if src in text:
                matched_chars += len(src) * text.count(src)
                text = text.replace(src, f" {en} ")
        text = re.sub(r"\s+", " ", text).strip()
        coverage = min(1.0, matched_chars / max(1, len(query)))
        return text, coverage

    @staticmethod
    def _clipify(text: str) -> str:
        """Shape text into a CLIP-style caption: 'a photo of ...' prefix when
        the query is a bare noun phrase (mirrors the prompt template intent
        of reference core.py:582-625 without the LLM)."""
        t = re.sub(r"\s+", " ", text).strip().rstrip(".")
        if not t:
            return t
        lowered = t.lower()
        if lowered.startswith(("a photo", "an image", "a picture", "a video",
                               "a frame", "a screenshot")):
            return t
        return f"a photo of {t}"

    @staticmethod
    def _keywords(text: str) -> list[str]:
        # full analyzer lives in retrieval.textproc (the reference's spaCy
        # feature extraction analog, api.py:2261-2416)
        from .textproc import content_words

        return content_words(text)[:10]
