"""Chinese text normalization: numerals, dates, percentages -> hanzi.

Stand-in for the reference's rule TN suite
(reference: src/easevoice/text/chinese_norm/*, ~850 LoC of PaddleSpeech-style
rules): covers the high-frequency patterns — integers, decimals, percents,
fractions, ranges, dates, times, phone-ish digit strings — converting them
to spoken-form hanzi so the G2P sees only CJK + punctuation.
"""
from __future__ import annotations

import re
from typing import List

_DIGITS = "零一二三四五六七八九"
_UNITS_SMALL = ["", "十", "百", "千"]
_UNITS_BIG = ["", "万", "亿", "万亿"]


def _four_digits(n: int) -> str:
    """0-9999 -> hanzi (no leading-zero compaction across groups)."""
    if n == 0:
        return ""
    out = []
    digits = [int(d) for d in str(n)]
    L = len(digits)
    for i, d in enumerate(digits):
        unit = _UNITS_SMALL[L - 1 - i]
        if d == 0:
            out.append("零")
        else:
            out.append(_DIGITS[d] + unit)
    s = "".join(out)
    s = re.sub("零+", "零", s).strip("零")
    return s or "零"


def num_to_hanzi(n: int) -> str:
    if n < 0:
        return "负" + num_to_hanzi(-n)
    if n == 0:
        return "零"
    groups = []
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    parts = []
    for i in range(len(groups) - 1, -1, -1):
        g = groups[i]
        if g == 0:
            continue
        word = _four_digits(g)
        # inner-group leading zero when a higher group exists and this group
        # has no thousands digit
        if i < len(groups) - 1 and g < 1000:
            word = "零" + word
        parts.append(word + _UNITS_BIG[i])
    s = "".join(parts)
    s = re.sub("零+", "零", s).strip("零") or "零"
    # idiomatic reading: 一十X -> 十X at the very front
    if s.startswith("一十"):
        s = s[1:]
    return s


def digits_to_hanzi(s: str) -> str:
    """Digit-by-digit reading (phone numbers, IDs); 1 reads 幺."""
    table = {"0": "零", "1": "幺", "2": "二", "3": "三", "4": "四",
             "5": "五", "6": "六", "7": "七", "8": "八", "9": "九"}
    return "".join(table.get(c, c) for c in s)


def decimal_to_hanzi(whole: str, frac: str) -> str:
    out = num_to_hanzi(int(whole)) if whole else "零"
    out += "点" + "".join(_DIGITS[int(d)] for d in frac)
    return out


def _year_digits(s: str) -> str:
    table = dict(zip("0123456789", _DIGITS))
    return "".join(table[c] for c in s)


def normalize_sentence(text: str) -> str:
    # dates: 2024年 / 3月5日
    text = re.sub(r"(\d{2,4})年",
                  lambda m: _year_digits(m.group(1)) + "年", text)
    text = re.sub(r"(\d{1,2})月(\d{1,2})[日号]",
                  lambda m: num_to_hanzi(int(m.group(1))) + "月"
                  + num_to_hanzi(int(m.group(2))) + "日", text)
    # times: 8:30 / 08:30:15
    def _time(m):
        h, mi, s = m.group(1), m.group(2), m.group(3)
        out = num_to_hanzi(int(h)) + "点"
        if int(mi):
            out += num_to_hanzi(int(mi)) + "分"
        if s and int(s):
            out += num_to_hanzi(int(s)) + "秒"
        return out
    text = re.sub(r"(\d{1,2}):(\d{1,2})(?::(\d{1,2}))?", _time, text)
    # percent
    text = re.sub(r"(\d+(?:\.\d+)?)%",
                  lambda m: "百分之" + _number_word(m.group(1)), text)
    # fraction a/b -> b分之a
    text = re.sub(r"(\d+)/(\d+)",
                  lambda m: num_to_hanzi(int(m.group(2))) + "分之"
                  + num_to_hanzi(int(m.group(1))), text)
    # range 3~5 / 3-5
    text = re.sub(r"(\d+(?:\.\d+)?)[~－—](\d+(?:\.\d+)?)",
                  lambda m: _number_word(m.group(1)) + "到"
                  + _number_word(m.group(2)), text)
    # long digit strings (>= 10) read digit-by-digit (phone numbers)
    text = re.sub(r"\d{10,}", lambda m: digits_to_hanzi(m.group(0)), text)
    # decimals, then plain integers
    text = re.sub(r"(\d+)\.(\d+)",
                  lambda m: decimal_to_hanzi(m.group(1), m.group(2)), text)
    text = re.sub(r"\d+", lambda m: num_to_hanzi(int(m.group(0))), text)
    return text


def _number_word(s: str) -> str:
    if "." in s:
        w, f = s.split(".", 1)
        return decimal_to_hanzi(w, f)
    return num_to_hanzi(int(s))


class TextNormalizer:
    """Sentence splitter + per-sentence normalization (reference API)."""

    _SENT_SPLIT = re.compile(r"(?<=[。！？!?；;])")

    def normalize(self, text: str) -> List[str]:
        text = text.replace("　", " ")
        sentences = [s for s in self._SENT_SPLIT.split(text) if s.strip()]
        return [normalize_sentence(s) for s in sentences] or [""]
