"""Cantonese G2P: reference golden (tests/easevoice/text_test.py:17-26),
vendored-table backend, and inventory validity."""
import numpy as np
import pytest

from easevoice_trainer_tpu.text import cantonese
from easevoice_trainer_tpu.text.cleaner import clean_text
from easevoice_trainer_tpu.text.symbols import SYMBOLS


def test_reference_cantonese_golden():
    text = "佢個鋤頭太短啦。"
    text_norm = cantonese.text_normalize(text)
    assert text_norm == "佢个锄头太短啦."
    phones, word2ph = cantonese.g2p(text_norm)
    assert phones == ['Yk', 'Yeoi5', 'Yg', 'Yo3', 'Yc', 'Yo4', 'Yt',
                      'Yau4', 'Yt', 'Yaai3', 'Yd', 'Yyun2', 'Yl', 'Yaa1',
                      '.']
    assert word2ph == [2, 2, 2, 2, 2, 2, 2, 1]


def test_vendored_table_inventory_valid():
    chars, words = cantonese._vendored_table()
    assert len(chars) > 1100  # trad+simp expansion of the curated set
    readings = list(chars.values()) + [s for ss in words.values()
                                       for s in ss]
    for jp in readings:
        phones, w2p = cantonese.jyuping_to_initials_finals_tones([jp])
        assert phones and all(p in SYMBOLS for p in phones), jp


def test_word_overrides_beat_char_readings():
    # 行: hang4 alone, hong4 in 銀行 (both scripts)
    ph, _ = cantonese.g2p("银行")
    assert "Yong4" in ph and "Yh" in ph
    ph2, _ = cantonese.g2p("行")
    assert "Yang4" in ph2


def test_clean_text_yue_end_to_end():
    phones, word2ph, norm = clean_text("你今日食咗飯未呀？", "yue")
    assert phones and word2ph
    assert len(phones) == sum(word2ph)
    assert all(p in SYMBOLS for p in phones)
    seq_ids = [SYMBOLS.index(p) for p in phones]
    assert all(isinstance(i, int) for i in seq_ids)


def test_unknown_hanzi_dropped_not_crashing():
    # an obscure char outside the table must not raise
    phones, word2ph = cantonese.g2p("你龘好")
    assert phones
    assert len(phones) == sum(word2ph)
