"""Japanese G2P fallback: kanji readings, youon, prosody format
(reference behavior: src/easevoice/text/japanese.py:109-236; the
pyopenjtalk path needs the OpenJTalk dictionary, absent here — the
fallback keeps the same output format with a default accent contour)."""
import pytest

from easevoice_trainer_tpu.text import japanese
from easevoice_trainer_tpu.text.cleaner import clean_text
from easevoice_trainer_tpu.text.symbols import SYMBOLS


def test_kana_with_prosody_format():
    # same segmentation/anchor-stripping as the reference preprocess_jap:
    # phones start at the first mora, '[' rise after it, marks appended
    assert japanese.g2p("こんにちは！") == [
        "k", "o", "[", "N", "n", "i", "ch", "i", "w", "a", "!"]


def test_kanji_words_and_compounds():
    # jukujikun word, on-compound, kun single, long vowels
    assert japanese.g2p("今日") == ["ky", "o", "[", "o"]
    ph = japanese.g2p("日本語を勉強しています。")
    assert ph[:2] == ["n", "i"] and "N" in ph and ph[-1] == "."
    # single kanji takes the kun reading
    assert japanese.g2p("水")[:2] == ["m", "i"]  # みず


def test_inflected_adjective_resolves_via_stem():
    ph = japanese.g2p("楽しかった")
    # たのしかった -> t a n o sh i k a q t a (plus the rise mark)
    assert "q" in ph and ph[0] == "t" and "sh" in ph


def test_topic_particle_wa():
    assert japanese.g2p("今日はいい天気です。")[:5] == [
        "ky", "o", "[", "o", "w"]
    assert japanese.g2p("お母さんは優しい。")[:1] == ["o"]
    ph = japanese.g2p("お母さんは優しい。")
    assert "w" in ph and "h" not in ph  # んは -> んわ


def test_katakana_and_long_vowel():
    ph = japanese.g2p("東京タワー")
    assert ph == ["t", "o", "[", "o", "ky", "o", "o", "t", "a", "w", "a",
                  "a"]


def test_youon_and_sokuon():
    assert japanese.g2p("きっぷ") == ["k", "i", "[", "q", "p", "u"]
    assert japanese.g2p("しゃしん") == ["sh", "a", "[", "sh", "i", "N"]


def test_clean_text_ja_inventory():
    phones, word2ph, norm = clean_text("私は学校に行きます。", "ja")
    assert word2ph is None
    assert phones and all(p in SYMBOLS for p in phones)
