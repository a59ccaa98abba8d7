"""Heuristic language identification — stopword + character-frequency profile.

No model files (sealed sandbox): a small built-in profile of high-frequency
function words per language, scored as the fraction of a document's tokens
that hit each profile; ties broken deterministically by language name.
"""

from __future__ import annotations

import numpy as np

from dedupe_ray.functions.text import normalize_tokens

__all__ = ["LangIdentifier", "LANG_PROFILES"]

LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset(
        "the of and to in a is that it for on with as was at by this be are from or "
        "an have not but had his they which you were her she will there all we can".split()
    ),
    "de": frozenset(
        "der die das und in den von zu mit sich des auf für ist im dem nicht ein eine "
        "als auch es an werden aus er hat dass sie nach wird bei einer um am sind".split()
    ),
    "fr": frozenset(
        "le de la et les des en un du une que est pour qui dans a par plus pas au sur "
        "ne se ce il sont la mais comme ou si leur y dont elle deux".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al lo como mas "
        "pero sus le ya o este si porque esta entre cuando muy sin sobre tambien".split()
    ),
}


class LangIdentifier:
    """Stateful langid kernel (profiles interned once; hold one per actor)."""

    def __init__(self, profiles: dict[str, frozenset] | None = None, min_tokens: int = 3):
        self.profiles = profiles or LANG_PROFILES
        self.langs = sorted(self.profiles)  # deterministic tie-break order
        self.min_tokens = min_tokens
        # token → packed per-language counter increment (32 bits per language,
        # Python int so overflow is impossible); one C-speed sum(map(get, toks))
        # per doc yields every language's hit count at once
        self._packed: dict[str, int] = {}
        for b, lang in enumerate(self.langs):
            inc = 1 << (32 * b)
            for t in self.profiles[lang]:
                self._packed[t] = self._packed.get(t, 0) + inc

    def predict(self, text: str) -> str:
        toks = normalize_tokens(text)
        if len(toks) < self.min_tokens:
            return "und"
        best_lang, best_score = "und", 0.0
        n = len(toks)
        for lang in self.langs:
            prof = self.profiles[lang]
            score = sum(1 for t in toks if t in prof) / n
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang if best_score >= 0.08 else "und"

    def predict_batch(self, texts) -> np.ndarray:
        """Batch scoring — EXACTLY ``[predict(t) for t in texts]`` (pinned by
        test): the packed-counter dict folds every language's hit count into
        one C-speed ``sum(filter(None, map(dict.get, toks)))`` per doc (one
        membership pass instead of one per language); the strict-> scan in
        alphabetical order and the single float64 division per score match the
        scalar kernel bit-for-bit."""
        out = np.full(len(texts), "und", dtype=object)
        pget = self._packed.get
        langs = self.langs
        shifts = [32 * b for b in range(len(langs))]
        mask = (1 << 32) - 1
        min_tokens = self.min_tokens
        for i, text in enumerate(texts):
            toks = normalize_tokens(text)
            n = len(toks)
            if n < min_tokens:
                continue
            packed = sum(filter(None, map(pget, toks)))
            best_lang, best_score = "und", 0.0
            for lang, sh in zip(langs, shifts):
                score = ((packed >> sh) & mask) / n
                if score > best_score:
                    best_lang, best_score = lang, score
            if best_score >= 0.08:
                out[i] = best_lang
        return out
