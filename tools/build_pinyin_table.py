#!/usr/bin/env python
"""Generate the vendored char -> pinyin table (data/pinyin_table.json).

Runs fully OFFLINE from two public data sources:

1. the g2pw polyphonic word dictionary already vendored at
   ``easevoice_trainer_tpu/text/data/polyphonic.json`` (45k words with
   per-char TONE3 readings) — per-char reading counters give each char's
   most common reading in real words;
2. the CLDR pinyin collation table shipped with perl
   (``Unicode/Collate/CJK/Pinyin.pm``): ~21k hanzi listed in strict
   (syllable, tone) order, one reading-class per line.  Lines are labeled
   by majority vote of the chars whose reading we already know from (1),
   which transfers readings to the ~16k chars the word dictionary never
   exercises.  Unlabeled lines between two same-syllable neighbors with a
   one-tone gap are interpolated; anything else is dropped (UNK at
   runtime is acceptable for chars that rare).

Readings are validated against the opencpop-strict syllable inventory
(after tone strip + the same i/u/v rewrites the runtime applies), so every
emitted reading is guaranteed to map to symbols.

Usage:
    python tools/build_pinyin_table.py \
        > easevoice_trainer_tpu/text/data/pinyin_table.json

If pypinyin happens to be installed it is preferred as the ground-truth
source for single-char defaults (matching the reference's behavior), with
the offline pipeline as fallback.
"""
import collections
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "easevoice_trainer_tpu", "text", "data")
PINYIN_PM = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"

_INITIALS = ["zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l", "g",
             "k", "h", "j", "q", "x", "r", "z", "c", "s", "y", "w"]
_V_REWRITE = {"uei": "ui", "iou": "iu", "uen": "un"}
_STANDALONE_REWRITE = {"ing": "ying", "i": "yi", "in": "yin", "u": "wu"}
_STANDALONE_PREFIX = {"v": "yu", "e": "e", "i": "y", "u": "w"}


def _valid_reading(reading: str, syllables: set) -> bool:
    if not reading or reading[-1] not in "12345":
        return False
    body = reading[:-1]
    ini = ""
    for cand in _INITIALS:
        if body.startswith(cand) and len(body) > len(cand):
            ini = cand
            break
    if ini in ("y", "w"):
        ini = ""
        pinyin = body
    elif ini:
        pinyin = ini + _V_REWRITE.get(body[len(ini):], body[len(ini):])
    else:
        pinyin = _STANDALONE_REWRITE.get(body) or (
            _STANDALONE_PREFIX.get(body[0], "") + body[1:]
            if body and body[0] in _STANDALONE_PREFIX else body)
    return pinyin in syllables


# Isolated-token readings for high-frequency chars whose frequency-weighted
# in-word majority differs from the char's default reading as its own jieba
# token (pypinyin's single-char behavior, which the reference relies on via
# lazy_pinyin — reference: src/easevoice/text/chinese.py:174-176).
_OVERRIDES = {
    "的": "de5", "了": "le5", "着": "zhe5", "得": "de5", "地": "di4",
    "都": "dou1", "不": "bu4", "一": "yi1", "为": "wei4", "和": "he2",
    "个": "ge4", "们": "men5", "还": "hai2", "只": "zhi3", "没": "mei2",
    "过": "guo4", "长": "chang2", "重": "zhong4", "发": "fa1",
    "行": "xing2", "会": "hui4", "吧": "ba5", "吗": "ma5", "呢": "ne5",
    "嘛": "ma5", "啊": "a1", "那": "na4", "哪": "na3", "什": "shen2",
    "觉": "jue2", "处": "chu4", "调": "diao4", "数": "shu4", "乐": "le4",
    "便": "bian4", "应": "ying1", "曾": "ceng2", "传": "chuan2",
}

# Word-level readings matching pypinyin's phrase dictionary where it differs
# from per-char defaults and the vendored polyphonic dict lacks the word.
_PHRASE_OVERRIDES = {
    "成熟": ["cheng2", "shou2"],
}


def _char_counts_from_words(poly: dict) -> dict:
    """Per-char reading counters, weighted by jieba word frequency so that
    each char's top reading reflects running-text usage, not dictionary
    entry counts (raw counts make 了 -> liao3; frequency makes it le5)."""
    try:
        import jieba
        jieba.initialize()
        freq = jieba.dt.FREQ
    except ImportError:  # pragma: no cover
        freq = {}
    counts = collections.defaultdict(collections.Counter)
    for word, readings in poly.items():
        if len(word) != len(readings):
            continue
        weight = (freq.get(word) or 0) + 1
        for ch, r in zip(word, readings):
            if "一" <= ch <= "龥":
                counts[ch][r] += weight
    return counts


def _parse_collation_lines(path: str):
    """Yield lists of chars; each line groups chars with one reading."""
    in_data = False
    for line in open(path, encoding="utf8"):
        line = line.strip()
        if line == "__DATA__":
            in_data = True
            continue
        if line == "__END__":
            break
        if not in_data or not line or line.startswith("FDD0-"):
            continue
        cps = [int(c, 16) for c in line.split() if "-" not in c]
        chars = [chr(c) for c in cps if 0x4E00 <= c <= 0x9FA5]
        if chars:
            yield chars


def build_table() -> dict:
    syllables = set(json.load(open(os.path.join(DATA, "opencpop_strict.json"),
                                   encoding="utf8")))
    poly = json.load(open(os.path.join(DATA, "polyphonic.json"),
                          encoding="utf8"))
    counts = _char_counts_from_words(poly)

    table = {}
    try:
        from pypinyin import lazy_pinyin, Style  # pragma: no cover

        for code in range(0x4E00, 0x9FA6):
            ch = chr(code)
            py = lazy_pinyin(ch, style=Style.TONE3,
                             neutral_tone_with_five=True)
            if py and py[0] != ch and _valid_reading(py[0], syllables):
                table[ch] = [py[0]]
        return table
    except ImportError:
        pass

    # 1. word-majority defaults
    for ch, rc in counts.items():
        for r, _ in rc.most_common():
            if _valid_reading(r, syllables):
                table[ch] = [r]
                break

    # 2. CLDR collation transfer: majority-vote a label per line
    lines = list(_parse_collation_lines(PINYIN_PM))
    labels = []
    for chars in lines:
        votes = collections.Counter()
        for ch in chars:
            if ch in counts:
                for r, n in counts[ch].items():
                    if _valid_reading(r, syllables):
                        votes[r] += n
        labels.append(votes.most_common(1)[0][0] if votes else None)

    # 3. conservative interpolation for unlabeled lines: same syllable,
    #    one-tone gap between neighbors (a2 between a1 and a3)
    for i, lab in enumerate(labels):
        if lab is not None or not (0 < i < len(labels) - 1):
            continue
        prev, nxt = labels[i - 1], labels[i + 1]
        if prev and nxt and prev[:-1] == nxt[:-1]:
            t0, t1 = prev[-1], nxt[-1]
            if t0.isdigit() and t1.isdigit() and int(t1) - int(t0) == 2:
                labels[i] = prev[:-1] + str(int(t0) + 1)

    for chars, lab in zip(lines, labels):
        if lab is None:
            continue
        for ch in chars:
            table.setdefault(ch, [lab])

    for ch, r in _OVERRIDES.items():
        if _valid_reading(r, syllables):
            table[ch] = [r]
    for word, rs in _PHRASE_OVERRIDES.items():
        if all(_valid_reading(r, syllables) for r in rs):
            table[word] = rs
    return table


def main():
    table = build_table()
    json.dump(table, sys.stdout, ensure_ascii=False, separators=(",", ":"),
              sort_keys=True)


if __name__ == "__main__":
    main()
