"""Japanese G2P (pyopenjtalk prosody marks).

The reference uses pyopenjtalk's full-context labels to emit phonemes with
prosody symbols ([ ] # ^ $ ?; reference: src/easevoice/text/japanese.py:142-236).
pyopenjtalk bundles a native OpenJTalk dictionary and is an optional
dependency here; without it this module raises a clear error at use.
A kana-only fallback handles pure-kana input via a romaji table.
"""
from __future__ import annotations

import re
from typing import List

from .symbols import PUNCTUATION

_REP_MAP = {"：": ",", "；": ",", "，": ",", "。": ".", "！": "!", "？": "?",
            "\n": ".", "·": ",", "、": ",", "…": "…"}

_KATA_START = 0x30A1
_HIRA_START = 0x3041

# kana -> romaji (phoneme string) for the no-dependency fallback
_KANA_ROMAJI = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "k a", "き": "k i", "く": "k u", "け": "k e", "こ": "k o",
    "が": "g a", "ぎ": "g i", "ぐ": "g u", "げ": "g e", "ご": "g o",
    "さ": "s a", "し": "sh i", "す": "s u", "せ": "s e", "そ": "s o",
    "ざ": "z a", "じ": "j i", "ず": "z u", "ぜ": "z e", "ぞ": "z o",
    "た": "t a", "ち": "ch i", "つ": "ts u", "て": "t e", "と": "t o",
    "だ": "d a", "ぢ": "j i", "づ": "z u", "で": "d e", "ど": "d o",
    "な": "n a", "に": "n i", "ぬ": "n u", "ね": "n e", "の": "n o",
    "は": "h a", "ひ": "h i", "ふ": "f u", "へ": "h e", "ほ": "h o",
    "ば": "b a", "び": "b i", "ぶ": "b u", "べ": "b e", "ぼ": "b o",
    "ぱ": "p a", "ぴ": "p i", "ぷ": "p u", "ぺ": "p e", "ぽ": "p o",
    "ま": "m a", "み": "m i", "む": "m u", "め": "m e", "も": "m o",
    "や": "y a", "ゆ": "y u", "よ": "y o",
    "ら": "r a", "り": "r i", "る": "r u", "れ": "r e", "ろ": "r o",
    "わ": "w a", "を": "o", "ん": "N", "っ": "q", "ー": ":",
}


def text_normalize(text: str) -> str:
    for p, r in _REP_MAP.items():
        text = text.replace(p, r)
    return text


def _kata_to_hira(text: str) -> str:
    return "".join(
        chr(ord(ch) - _KATA_START + _HIRA_START)
        if _KATA_START <= ord(ch) <= 0x30F6 else ch
        for ch in text)


def g2p(norm_text: str) -> List[str]:
    try:
        import pyopenjtalk  # noqa: F401

        return _g2p_prosody(norm_text)
    except ImportError:
        pass
    # kana fallback
    phones: List[str] = []
    for ch in _kata_to_hira(norm_text):
        if ch in _KANA_ROMAJI:
            phones += _KANA_ROMAJI[ch].split(" ")
        elif ch in PUNCTUATION:
            phones.append(ch)
        elif re.match(r"[ぁ-ゖ]", ch):
            continue
        elif ch.strip():
            raise RuntimeError(
                "Japanese G2P beyond kana requires `pyopenjtalk` "
                "(not installed)")
    return phones


def _g2p_prosody(text: str) -> List[str]:
    """Full-context-label G2P with prosody marks (reference:142-227)."""
    import pyopenjtalk

    labels = pyopenjtalk.make_label(pyopenjtalk.run_frontend(text))
    N = len(labels)
    phones: List[str] = []
    for n in range(N):
        lab = labels[n]
        p3 = re.search(r"\-(.*?)\+", lab).group(1)
        if p3 in ("sil",):
            if n == 0:
                phones.append("^")
            elif n == N - 1:
                e3 = int(re.search(r"!(\d+)_", lab).group(1))
                phones.append("$" if e3 == 0 else "?")
            continue
        if p3 == "pau":
            phones.append("_")
            continue
        phones.append(p3.replace("cl", "q"))
        # accent marks
        a1 = int(re.search(r"/A:([0-9\-]+)\+", lab).group(1))
        a2 = int(re.search(r"\+(\d+)\+", lab).group(1))
        a3 = int(re.search(r"\+(\d+)/", lab).group(1))
        f1 = int(re.search(r"/F:(\d+)_", lab).group(1))
        if n + 1 < N:
            nxt = re.search(r"\-(.*?)\+", labels[n + 1]).group(1)
        else:
            nxt = ""
        a2_next = (int(re.search(r"\+(\d+)\+", labels[n + 1]).group(1))
                   if n + 1 < N and nxt not in ("sil", "pau") else -1)
        if a3 == 1 and a2_next == 1:
            phones.append("#")
        elif a1 == 0 and a2_next == a2 + 1 and a2 != f1:
            phones.append("]")
        elif a2 == 1 and a2_next == 2:
            phones.append("[")
    return phones
