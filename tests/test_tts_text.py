"""TTS text normalization + VoiceChecker (minicpm/utils.py:44-203 parity)."""

import numpy as np

from x2i_tpu.data.tts_text import (VoiceChecker, detect_language, is_silent,
                                   power_to_db, replace_numbers_with_text,
                                   sentence_end, spell_digits)


def test_number_spelling_matches_reference_semantics():
    # docstring examples from the reference converter
    assert replace_numbers_with_text("我有2个苹果") == "我有二个苹果"
    assert replace_numbers_with_text("I have 23 books") == \
        "I have two three books"
    # digit-by-digit, not place-value
    assert spell_digits("105", "english") == "one zero five"
    assert spell_digits("105", "chinese") == "一零五"
    # explicit language override
    assert replace_numbers_with_text("abc 7", "chinese") == "abc 七"


def test_language_detection():
    assert detect_language("你好 world") == "english"  # 5 latin > 2 CJK
    assert detect_language("hello world") == "english"
    assert detect_language("你好世界") == "chinese"
    assert detect_language("你好 ab") == "chinese"      # tie -> chinese


def test_sentence_end_skips_decimal_points():
    assert sentence_end("price is 3.5 yuan") == ""     # digit before '.'
    assert sentence_end("done. next") == "."
    assert sentence_end("好了。继续") == "。"
    assert sentence_end("no end here") == ""


def test_voice_checker_flags_silence_and_stagnation():
    rng = np.random.default_rng(0)
    chunk, nmel, mel_per = 2560, 100, 10
    n = 12
    silent = np.zeros(chunk * n, np.float32)
    mel = rng.random((nmel, mel_per * n)).astype(np.float32)
    vc = VoiceChecker()
    assert vc.is_bad(silent, mel, chunk_size=chunk)     # 12 silent chunks

    vc.reset()
    # stagnant: near-identical mel chunks -> small nonzero distance
    wav = rng.standard_normal(chunk * 6).astype(np.float32)
    mel1 = rng.random((nmel, mel_per)).astype(np.float32) + 0.5
    mel_rep = np.concatenate(
        [mel1 * (1.0 + 1e-4 * i) for i in range(6)], axis=1)
    assert vc.is_bad(wav, mel_rep, chunk_size=chunk, thresh=100.0)

    vc.reset()
    # varied loud audio passes
    wav = rng.standard_normal(chunk * 6).astype(np.float32)
    mel_var = (rng.random((nmel, mel_per * 6)).astype(np.float32)
               * np.logspace(0, 6, nmel)[:, None])
    assert not vc.is_bad(wav, mel_var, chunk_size=chunk, thresh=1.0)


def test_is_silent_and_power_to_db():
    assert is_silent(np.full(100, 1e-4, np.float32))
    assert not is_silent(np.full(100, 0.1, np.float32))
    db = power_to_db(np.asarray([1.0, 0.1, 1e-20]))
    assert db[0] == 0.0 and abs(db[1] + 10.0) < 1e-6
    assert db[2] == db.max() - 80.0                     # top_db clamp


def test_prompt_bank_structure():
    from x2i_tpu.prompts import (IMAGETEXT2IMAGE_INSTRUCTIONS,
                                 text2image_bank)
    bank = text2image_bank()
    assert [lang for lang, _ in bank] == ["EN", "ZH", "DE", "FR", "JA",
                                          "VI"]
    assert all(len(p) > 50 for _, p in bank)
    assert any("OCR" in p for p in IMAGETEXT2IMAGE_INSTRUCTIONS)
