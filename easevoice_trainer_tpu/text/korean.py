"""Korean G2P (jamo decomposition).

The reference decomposes hangul into compatibility jamo after g2pk2
pronunciation rules (reference: src/easevoice/text/korean.py:108-270).
Decomposition itself needs no dependency (pure Unicode arithmetic); the
pronunciation-rule step (g2pk2) is optional — without it the decomposition
of the written form is used directly.
"""
from __future__ import annotations

import re
from typing import List

# symbol inventory uses compatibility jamo: ㄱㄴㄷ... + 空/停
_CHO = "ㄱㄲㄴㄷㄸㄹㅁㅂㅃㅅㅆㅇㅈㅉㅊㅋㅌㅍㅎ"
_JUNG = ["ㅏ", "ㅐ", "ㅑ", "ㅒ", "ㅓ", "ㅔ", "ㅕ", "ㅖ", "ㅗ", "ㅘ", "ㅙ",
         "ㅚ", "ㅛ", "ㅜ", "ㅝ", "ㅞ", "ㅟ", "ㅠ", "ㅡ", "ㅢ", "ㅣ"]
_JONG = ["", "ㄱ", "ㄲ", "ㄳ", "ㄴ", "ㄵ", "ㄶ", "ㄷ", "ㄹ", "ㄺ", "ㄻ",
         "ㄼ", "ㄽ", "ㄾ", "ㄿ", "ㅀ", "ㅁ", "ㅂ", "ㅄ", "ㅅ", "ㅆ", "ㅇ",
         "ㅈ", "ㅊ", "ㅋ", "ㅌ", "ㅍ", "ㅎ"]

# complex medials/finals decomposed to inventory jamo
_SPLIT = {"ㅘ": "ㅗㅏ", "ㅙ": "ㅗㅐ", "ㅚ": "ㅗㅣ", "ㅝ": "ㅜㅓ",
          "ㅞ": "ㅜㅔ", "ㅟ": "ㅜㅣ", "ㅢ": "ㅡㅣ", "ㅒ": "ㅣㅐ",
          "ㅖ": "ㅣㅔ", "ㅑ": "ㅣㅏ", "ㅕ": "ㅣㅓ", "ㅛ": "ㅣㅗ",
          "ㅠ": "ㅣㅜ", "ㄳ": "ㄱㅅ", "ㄵ": "ㄴㅈ", "ㄶ": "ㄴㅎ",
          "ㄺ": "ㄹㄱ", "ㄻ": "ㄹㅁ", "ㄼ": "ㄹㅂ", "ㄽ": "ㄹㅅ",
          "ㄾ": "ㄹㅌ", "ㄿ": "ㄹㅍ", "ㅀ": "ㄹㅎ", "ㅄ": "ㅂㅅ"}

_REP_MAP = {"：": ",", "；": ",", "，": ",", "。": ".", "！": "!",
            "？": "?", "\n": ".", "·": ",", "、": ",", "…": "…"}


def text_normalize(text: str) -> str:
    for p, r in _REP_MAP.items():
        text = text.replace(p, r)
    try:
        from g2pk2 import G2p  # optional pronunciation rules

        text = G2p()(text)
    except Exception:
        pass
    return text


def decompose(ch: str) -> List[str]:
    code = ord(ch) - 0xAC00
    if not (0 <= code < 11172):
        return [ch]
    cho, rest = divmod(code, 588)
    jung, jong = divmod(rest, 28)
    out = [_CHO[cho], _JUNG[jung]]
    if _JONG[jong]:
        out.append(_JONG[jong])
    expanded: List[str] = []
    for j in out:
        expanded += list(_SPLIT.get(j, j))
    return expanded


def g2p(norm_text: str) -> List[str]:
    phones: List[str] = []
    for ch in norm_text:
        if re.match(r"[가-힣]", ch):
            phones += decompose(ch)
        elif ch == " ":
            phones.append("空")
        elif ch.strip():
            phones.append(ch)
    return phones
