"""Text language identification (text/lang_id.py) + the Parakeet
engine's detected-language surface.

The v3 Parakeet model has no language head, so the engine derives
`TranscriptionResult.language` from the decoded text — the result must
carry what the model produced, not echo the request
(`src-tauri/src/managers/transcription.rs:505-513`).
"""

import numpy as np
import pytest

from spittle_tpu.text.lang_id import PARAKEET_V3_LANGUAGES, detect_language

SAMPLES = {
    "en": "the quick brown fox jumped over the lazy dog and it was fine",
    "de": "der Hund ist nicht mit der Katze und ich bin ein Berliner",
    "es": "el perro que corre por la calle es muy rápido y pequeño",
    "pt": "o cachorro não é uma ameaça para o gato que corre",
    "fr": "le chien est une menace pour les chats et je ne sais pas",
    "it": "il cane che corre per la strada è una bestia per gli amici",
    "nl": "de hond is niet een kat en ik weet het niet",
    "sv": "hunden är inte en katt och jag vet inte det",
    "da": "hunden er ikke en kat og jeg ved det ikke af",
    "fi": "koira ei ole kissa ja se on hyvä mutta en tiedä",
    "pl": "pies nie jest kotem i nie wiem że to się dzieje",
    "cs": "pes není kočka a je to na řece že se to děje",
    "hu": "a kutya nem macska és nem tudom hogy ez egy jó nap",
    "ro": "câinele nu este o pisică și nu știu ce se întâmplă pe aici",
    "ru": "собака это не кошка и я не знаю что это было",
    "uk": "собака це не кішка і я не знаю що це було",
    "bg": "кучето не е котка и не знам че това е той",
    "el": "και δεν ξέρω τι είναι αυτό το σκυλί με την γάτα",
}


@pytest.mark.parametrize("lang", sorted(SAMPLES))
def test_detects_language(lang):
    assert detect_language(SAMPLES[lang]) == lang


def test_inconclusive_returns_none():
    assert detect_language("") is None
    assert detect_language("   ") is None
    assert detect_language("12345 67890 !!!") is None
    assert detect_language("tok0 tok3 tok6 zzz qqq") is None  # no evidence


def test_cyrillic_defaults_to_ru_without_cues():
    # Shared-alphabet Cyrillic with no distinctive letters or stopwords.
    assert detect_language("трамвай") == "ru"


def test_language_set_is_the_v3_card():
    assert len(PARAKEET_V3_LANGUAGES) == 25
    assert {"en", "de", "uk", "mt", "el"} <= set(PARAKEET_V3_LANGUAGES)


def test_parakeet_result_carries_detected_language():
    """End-to-end through the engine: the decoded text's language lands
    in the result even when the request said something else; the request
    is the fallback when the text is inconclusive."""
    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.parakeet_engine import ParakeetEngine

    eng = ParakeetEngine()
    eng.load_model("random:parakeet-test")
    audio = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(
        np.float32
    )

    # The random test table decodes to "tokN tokM ..." — no language
    # evidence — so the requested language is the fallback.
    res = eng.transcribe_samples(audio, TranscribeParams(language="en"))
    assert res.language == "en"

    # Force the decode to produce Russian text: the result must say "ru"
    # regardless of the requested "en".
    eng.table.decode = lambda ids: "собака это не кошка и я не знаю"
    res = eng.transcribe_samples(audio, TranscribeParams(language="en"))
    assert res.text
    assert res.language == "ru"
