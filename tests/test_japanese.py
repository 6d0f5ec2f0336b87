"""Japanese G2P fallback: kanji readings, youon, prosody format
(reference behavior: src/easevoice/text/japanese.py:109-236; the
pyopenjtalk path needs the OpenJTalk dictionary, absent here — the
fallback keeps the same output format with accent-phrase segmentation
and a curated Tokyo pitch-accent table, defaulting unknown words to
heiban)."""
import pytest

from easevoice_trainer_tpu.text import japanese
from easevoice_trainer_tpu.text.cleaner import clean_text
from easevoice_trainer_tpu.text.symbols import SYMBOLS


def test_kana_with_prosody_format():
    # same segmentation/anchor-stripping as the reference preprocess_jap:
    # phones start at the first mora, marks appended.  こんにちは is
    # odaka (5): rise after mora 1, no internal fall
    assert japanese.g2p("こんにちは！") == [
        "k", "o", "[", "N", "n", "i", "ch", "i", "w", "a", "!"]


def test_kanji_words_and_compounds():
    # jukujikun word with atamadaka accent: きょ↘う (type 1 -> ']'
    # after the first mora, no rise — espnet rule order)
    assert japanese.g2p("今日") == ["ky", "o", "]", "o"]
    ph = japanese.g2p("日本語を勉強しています。")
    assert ph[:2] == ["n", "i"] and "N" in ph and ph[-1] == "."
    # single kanji takes the kun reading (みず, heiban -> rise)
    assert japanese.g2p("水")[:3] == ["m", "i", "["]


def test_inflected_adjective_resolves_via_stem():
    ph = japanese.g2p("楽しかった")
    # たのしかった -> t a n o sh i k a q t a (plus contour marks)
    assert "q" in ph and ph[0] == "t" and "sh" in ph


def test_topic_particle_wa():
    # 今日(1)+は one accent phrase: ky o ] o w a
    assert japanese.g2p("今日はいい天気です。")[:6] == [
        "ky", "o", "]", "o", "w", "a"]
    ph = japanese.g2p("お母さんは優しい。")
    assert ph[0] == "o"
    assert "w" in ph and "h" not in ph  # んは -> んわ


def test_katakana_and_long_vowel():
    # 東京 (heiban) with the katakana run attached to the same phrase
    ph = japanese.g2p("東京タワー")
    assert ph == ["t", "o", "[", "o", "ky", "o", "o", "t", "a", "w", "a",
                  "a"]


def test_youon_and_sokuon():
    # unknown kana words default to heiban (previous fallback contour)
    assert japanese.g2p("きっぷ") == ["k", "i", "[", "q", "p", "u"]
    assert japanese.g2p("しゃしん") == ["sh", "a", "[", "sh", "i", "N"]


def test_accent_contours():
    # nakadaka noun: おか↘あさん (accent 2) — rise then fall
    ph = japanese.g2p("お母さん")
    assert ph == ["o", "[", "k", "a", "]", "a", "s", "a", "N"]
    # accent phrase border '#' between phrases (same mark the reference
    # emits from full-context labels; cleaner maps it to UNK like the
    # reference clean_text does)
    ph = japanese.g2p("私の名前")
    assert "#" in ph
    # copula attaches and shifts a heiban phrase's nucleus:
    # 学生(0)+です -> がくせいで↘す (fall after で)
    ph = japanese.g2p("学生です")
    assert ph == ["g", "a", "[", "k", "u", "s", "e", "i", "d", "e", "]",
                  "s", "u"]
    # accented word keeps its nucleus through attached aux:
    # 綺麗(1)+です -> き↘れいです
    ph = japanese.g2p("綺麗です")
    assert ph == ["k", "i", "]", "r", "e", "i", "d", "e", "s", "u"]
    # ましょう ending: いきましょ↘う
    ph = japanese.g2p("行きましょう")
    assert ph == ["i", "[", "k", "i", "m", "a", "sh", "o", "]", "o"]


def test_clean_text_ja_inventory():
    phones, word2ph, norm = clean_text("私は学校に行きます。", "ja")
    assert word2ph is None
    assert phones and all(p in SYMBOLS for p in phones)


def test_fallback_fuzz_never_crashes(rng):
    """Random kana/kanji/punct mixtures: g2p must return a list and the
    cleaner must map every phone into the symbol inventory."""
    pools = (
        [chr(c) for c in range(0x3041, 0x3097)],          # hiragana
        [chr(c) for c in range(0x30A1, 0x30F7)],          # katakana
        list("今日天気学校先生行楽海山猫犬雨空電車時間鬱彁"),  # kanji (+rare)
        list("。、！？…ー っゃゅょabcABC123"),
    )
    def pick():
        pool = pools[int(rng.integers(0, len(pools)))]
        return pool[int(rng.integers(0, len(pool)))]

    for _ in range(40):
        n = int(rng.integers(1, 24))
        s = "".join(pick() for _ in range(n))
        ph = japanese.g2p(japanese.text_normalize(s))
        assert isinstance(ph, list)
        cleaned, w2p, _ = clean_text(s, "ja")
        assert all(p in SYMBOLS for p in cleaned)
