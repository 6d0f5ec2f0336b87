"""Cantonese G2P (jyutping -> Y-prefixed symbols).

The reference routes through ToJyutping + cn2an TN
(reference: src/easevoice/text/cantonese.py:11-195).  ToJyutping is an
optional dependency; without it this module raises a clear error at use.
"""
from __future__ import annotations

import re
from typing import List, Tuple

from .symbols import PUNCTUATION
from .chinese_norm import TextNormalizer

_REP_MAP = {"：": ",", "；": ",", "，": ",", "。": ".", "！": "!", "？": "?",
            "\n": ".", "·": ",", "、": ",", "...": "…", "$": ".",
            "—": "-", "~": "…", "～": "…"}
_NORMALIZER = TextNormalizer()

_INITIALS = ["gw", "kw", "ng", "b", "p", "m", "f", "d", "t", "n", "l", "g",
             "k", "h", "z", "c", "s", "j", "w"]


def text_normalize(text: str) -> str:
    out = ""
    for sentence in _NORMALIZER.normalize(text):
        for p, r in _REP_MAP.items():
            sentence = sentence.replace(p, r)
        sentence = re.sub(r"[^一-龥" + "".join(PUNCTUATION) + r"]+", "",
                          sentence)
        out += sentence
    punct = "".join(re.escape(p) for p in PUNCTUATION)
    return re.sub(f"([{punct}])([{punct}])+", r"\1", out)


def jyutping_to_phones(jyutping: str) -> List[str]:
    """'gwong2' -> ['Ygw', 'Yong2'] (Y-prefix inventory)."""
    m = re.match(r"^([a-z]+?)([1-6])$", jyutping)
    if not m:
        return [jyutping]
    syl, tone = m.group(1), m.group(2)
    for ini in _INITIALS:
        if syl.startswith(ini) and len(syl) > len(ini):
            return ["Y" + ini, "Y" + syl[len(ini):] + tone]
    return ["Y" + syl + tone] if syl else [jyutping]


def g2p(norm_text: str) -> Tuple[List[str], List[int]]:
    try:
        import ToJyutping
    except ImportError as e:
        raise RuntimeError(
            "Cantonese G2P requires `ToJyutping` (not installed)") from e
    phones: List[str] = []
    word2ph: List[int] = []
    pairs = ToJyutping.get_jyutping_list(norm_text)
    for ch, jp in pairs:
        if ch in PUNCTUATION:
            phones.append(ch)
            word2ph.append(1)
        elif jp is None:
            continue
        else:
            ph = jyutping_to_phones(jp)
            phones += ph
            word2ph.append(len(ph))
    return phones, word2ph
