#!/usr/bin/env python
"""Generate a char/word -> pinyin table for environments without pypinyin.

Run on any machine WITH pypinyin installed:

    python tools/build_pinyin_table.py > easevoice_trainer_tpu/text/data/pinyin_table.json

The table maps single hanzi to their default TONE3 reading and common
multi-char words (from jieba's dictionary) to per-char readings, letting
``easevoice_trainer_tpu.text.chinese`` run without pypinyin at serve time.
"""
import json
import sys


def main():
    from pypinyin import lazy_pinyin, Style
    import jieba

    table = {}
    # single characters over the CJK unified range that pypinyin knows
    for code in range(0x4E00, 0x9FA6):
        ch = chr(code)
        py = lazy_pinyin(ch, style=Style.TONE3, neutral_tone_with_five=True)
        if py and py[0] != ch:
            table[ch] = py

    # common words (polyphone context) from jieba's shipped dictionary
    jieba.initialize()
    freq = jieba.dt.FREQ
    words = [w for w, f in freq.items() if f and len(w) in (2, 3)]
    words.sort(key=lambda w: -freq[w])
    for w in words[:80000]:
        py = lazy_pinyin(w, style=Style.TONE3, neutral_tone_with_five=True)
        if len(py) == len(w):
            table[w] = py

    json.dump(table, sys.stdout, ensure_ascii=False)


if __name__ == "__main__":
    main()
