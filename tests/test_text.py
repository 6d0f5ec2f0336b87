"""Text frontend tests (modeled on the reference tests/easevoice/text_test.py
golden style — deterministic phones/word2ph/IDs)."""
import numpy as np
import pytest

from easevoice_trainer_tpu.text import SYMBOLS, SYMBOLS_TO_ID, cleaned_text_to_sequence
from easevoice_trainer_tpu.text.cleaner import clean_text


def test_symbol_inventory():
    assert len(SYMBOLS) == 732
    assert SYMBOLS_TO_ID["UNK"] == SYMBOLS.index("UNK")
    # stable ID spot checks against the v2 inventory
    assert SYMBOLS[0] == "!"
    assert "AA1" in SYMBOLS_TO_ID and "zh" in SYMBOLS_TO_ID
    assert "SP2" in SYMBOLS_TO_ID and "SP3" in SYMBOLS_TO_ID
    ids = cleaned_text_to_sequence(["AA1", "nosuchphone", "zh"])
    assert ids[1] == SYMBOLS_TO_ID["UNK"]


def test_english_g2p_basics():
    phones, word2ph, norm = clean_text("hello world", "en")
    assert word2ph is None
    assert all(p in SYMBOLS for p in phones)
    # CMUdict pronunciations
    assert phones[:4] == ["HH", "AH0", "L", "OW1"]
    assert "W" in phones and "ER1" in phones

    # numbers are expanded
    phones2, _, norm2 = clean_text("I have 25 cats.", "en")
    assert "twenty" in norm2 and "five" in norm2

    # short outputs get a leading comma
    phones3, _, _ = clean_text("a", "en")
    assert phones3[0] == ","


def test_english_oov_strategies():
    from easevoice_trainer_tpu.text.english import query_word, g2p
    # possessive voicing
    assert query_word("cat's")[-1] == "S"
    assert query_word("dog's")[-1] == "Z"
    # compound segmentation
    ph = query_word("raincloud")
    assert ph == query_word("rain") + query_word("cloud")
    # letter spelling for short OOV
    assert query_word("xyz")
    # unknown long words still produce phones (LTS fallback)
    assert g2p("floobargle")


def test_english_number_words():
    from easevoice_trainer_tpu.text.english import number_to_words
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234) == "one thousand two hundred thirty four"


def test_chinese_normalizer():
    from easevoice_trainer_tpu.text.chinese_norm import (
        num_to_hanzi, normalize_sentence)
    assert num_to_hanzi(0) == "零"
    assert num_to_hanzi(15) == "十五"
    assert num_to_hanzi(105) == "一百零五"
    assert num_to_hanzi(1234) == "一千二百三十四"
    assert num_to_hanzi(100000001) == "一亿零一"
    assert normalize_sentence("50%") == "百分之五十"
    assert normalize_sentence("3.14") == "三点一四"
    assert normalize_sentence("3月5日") == "三月五日"
    assert "幺" in normalize_sentence("13812345678")


def test_chinese_punct_normalize():
    from easevoice_trainer_tpu.text.chinese import text_normalize
    out = text_normalize("你好，世界！！")
    assert out == "你好,世界!"


def test_tone_sandhi_rules():
    from easevoice_trainer_tpu.text.tone_sandhi import ToneSandhi
    ts = ToneSandhi()
    # 不 + tone4 -> bu2
    finals = ts.modified_tone("不是", "d", ["u4", "i4"])
    assert finals[0] == "u2"
    # 一 + tone4 -> yi2
    finals = ts.modified_tone("一段", "m", ["i1", "uan4"])
    assert finals[0] == "i2"
    # 一 + tone1 -> yi4
    finals = ts.modified_tone("一天", "m", ["i1", "ian1"])
    assert finals[0] == "i4"
    # 3-3 -> 2-3
    finals = ts.modified_tone("你好", "l", ["i3", "ao3"])
    assert finals == ["i2", "ao3"]
    # X不X neutral
    finals = ts.modified_tone("看不看", "v", ["an4", "u4", "an4"])
    assert finals[1] == "u5"


def test_chinese_pinyin_mapping():
    from easevoice_trainer_tpu.text.chinese import (
        _pinyin_pair_to_phones, split_initial_final)
    assert split_initial_final("zhong4") == ("zh", "ong4")
    assert split_initial_final("an1") == ("", "an1")
    assert split_initial_final("yi2") == ("", "yi2")
    phs, n = _pinyin_pair_to_phones("zh", "ong4")
    assert phs == ["zh", "ong4"] and n == 2
    # standalone rewrites: i -> yi
    phs, n = _pinyin_pair_to_phones("", "i2")
    assert phs[0] == "y" and phs[1] == "i2"
    # uei -> ui contraction
    phs, n = _pinyin_pair_to_phones("h", "uei2")
    assert phs == ["h", "ui2"]


def test_chinese_g2p_with_table(tmp_path, monkeypatch):
    """Full zh path via the JSON-table backend (pypinyin absent here)."""
    import json
    table = {
        "你": ["ni3"], "好": ["hao3"], "世": ["shi4"], "界": ["jie4"],
        "你好": ["ni3", "hao3"], "世界": ["shi4", "jie4"],
    }
    p = tmp_path / "pinyin.json"
    p.write_text(json.dumps(table, ensure_ascii=False), encoding="utf8")
    monkeypatch.setenv("EASEVOICE_PINYIN_TABLE", str(p))
    from easevoice_trainer_tpu.text import chinese
    chinese._backend.cache_clear()
    try:
        phones, word2ph, norm = clean_text("你好，世界！", "zh")
    finally:
        chinese._backend.cache_clear()
    assert norm == "你好,世界!"
    assert len(word2ph) == len(norm)
    assert sum(word2ph) == len(phones)
    # 你好 third-tone sandhi: ni2 hao3
    assert phones[0] == "n" and phones[1] == "i2"
    assert phones[2] == "h" and phones[3] == "ao3"
    assert all(p in SYMBOLS for p in phones)


def test_chinese_golden_out_of_box(monkeypatch):
    """The reference's golden zh sentence, exact phones/word2ph/ids, running
    purely on the SHIPPED data files (vendored pinyin_table.json; no
    pypinyin, no EASEVOICE_PINYIN_TABLE override).

    Reference: tests/easevoice/text_test.py:69-104 — expected values are
    byte-identical to the reference's assertions.
    """
    monkeypatch.delenv("EASEVOICE_PINYIN_TABLE", raising=False)
    from easevoice_trainer_tpu.text import chinese
    chinese._backend.cache_clear()
    try:
        text = "成熟是一种明亮而不刺眼的光辉，一种不再需要对别人察言观色的从容。"
        norm = chinese.text_normalize(text)
        assert norm == "成熟是一种明亮而不刺眼的光辉,一种不再需要对别人察言观色的从容."
        phones, word2ph = chinese.g2p(norm)
        assert phones == [
            "ch", "eng2", "sh", "ou2", "sh", "ir4", "y", "i4", "zh", "ong3",
            "m", "ing2", "l", "iang4", "EE", "er2", "b", "u2", "c", "i04",
            "y", "En3", "d", "e5", "g", "uang1", "h", "ui1", ",",
            "y", "i4", "zh", "ong3", "b", "u2", "z", "ai4", "x", "v1",
            "y", "ao4", "d", "ui4", "b", "ie2", "r", "en2", "ch", "a2",
            "y", "En2", "g", "uan1", "s", "e4", "d", "e5", "c", "ong2",
            "r", "ong2", ".",
        ]
        assert word2ph == [2] * 14 + [1] + [2] * 16 + [1]
        assert list(cleaned_text_to_sequence(phones)) == [
            125, 146, 251, 241, 251, 214, 318, 169, 320, 237, 225, 202, 224,
            184, 33, 151, 122, 256, 124, 164, 318, 46, 127, 134, 156, 275,
            158, 280, 1, 318, 169, 320, 237, 122, 256, 319, 105, 317, 296,
            318, 120, 127, 283, 122, 192, 248, 141, 125, 98, 318, 45, 156,
            270, 250, 133, 127, 134, 124, 236, 248, 236, 3,
        ]
        # common particles read correctly straight from the vendored table
        phones2, _, norm2 = clean_text("我们都去了北京。", "zh")
        assert phones2 == ["w", "o3", "m", "en5", "d", "ou1", "q", "v4",
                           "l", "e5", "b", "ei3", "j", "ing1", "."]
    finally:
        chinese._backend.cache_clear()


def test_korean_decompose():
    from easevoice_trainer_tpu.text.korean import decompose, g2p
    assert decompose("한") == ["ㅎ", "ㅏ", "ㄴ"]
    phones = g2p("안녕")
    assert all(p in SYMBOLS for p in phones)


def test_japanese_kana_fallback():
    phones, word2ph, norm = clean_text("こんにちは", "ja")
    assert word2ph is None
    assert phones  # kana romaji path works without pyopenjtalk
    assert all(p in SYMBOLS for p in phones)


def test_polyphonic_corrections(tmp_path, monkeypatch):
    """Vendored g2pw word dict overrides per-char readings (e.g. 音乐 yue4)."""
    import json
    from easevoice_trainer_tpu.text import chinese
    poly = chinese.polyphonic_words()
    if not poly:
        import pytest
        pytest.skip("polyphonic data not present")
    # 快乐: 乐 = le4 ; backend table says yue4 by default -> corrected
    table = {"快": ["kuai4"], "乐": ["yue4"]}
    p = tmp_path / "t.json"
    p.write_text(json.dumps(table, ensure_ascii=False), encoding="utf8")
    monkeypatch.setenv("EASEVOICE_PINYIN_TABLE", str(p))
    chinese._backend.cache_clear()
    try:
        pairs = chinese.correct_pronunciation("快乐", chinese._backend()("快乐"))
        finals = [v for _, v in pairs]
        assert finals[-1].startswith("e4") or finals[-1] == "e4", finals
    finally:
        chinese._backend.cache_clear()
