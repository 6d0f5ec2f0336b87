"""Mandarin tone sandhi rules applied to per-word final lists.

Core rule set of the reference ToneSandhi
(reference: src/easevoice/text/tone_sandhi.py:22-807, PaddleSpeech lineage):

* 不: tone 2 before tone-4 syllables; neutral inside "X不X";
* 一: neutral between reduplicated verbs (试一试), tone 2 before tone 4,
  tone 4 before tones 1/2/3, tone 1 in ordinals/numbers (第一, 一九八二);
* neutral tone: grammatical particles and common suffixes (的/了/着/们/子…),
  reduplicated kinship/noun words (妈妈, 爸爸);
* third-tone sandhi: 3-3 sequences -> 2-3 (within words and across the
  word boundary for 2-char + 1-char groupings).

Finals carry the tone as a trailing digit ("ang4"); rules rewrite only that
digit.  The reference's long exception word lists are trimmed to the
high-frequency cores; [[chinese-g2p]] notes remaining gaps.
"""
from __future__ import annotations

from typing import List, Tuple

_NEURAL_SUFFIXES = set("的地得了着过吧呢啊嘛吗么哇呀哦罢般个们")
_NEURAL_WORD_TAIL = {
    "们", "子", "头", "巴", "么", "和", "活", "儿",
}
# common reduplicated words read with a neutral second syllable
_REDUP_NEUTRAL = {
    "妈妈", "爸爸", "哥哥", "弟弟", "姐姐", "妹妹", "奶奶", "爷爷",
    "叔叔", "婶婶", "姑姑", "舅舅", "伯伯", "娃娃", "宝宝", "星星",
    "谢谢", "看看", "试试", "说说", "想想", "坐坐", "走走", "聊聊",
}
# words whose 子 is NOT neutral (real "son/seed" readings)
_ZI_EXCEPTIONS = {"男子", "女子", "分子", "原子", "量子", "莲子", "石子",
                  "瓜子", "电子", "人子", "虫子"}


def _set_tone(final: str, tone: str) -> str:
    return final[:-1] + tone if final and final[-1].isdigit() else final


def _tone(final: str) -> str:
    return final[-1] if final and final[-1].isdigit() else ""


class ToneSandhi:
    def pre_merge_for_modify(self, seg_cut: List[Tuple[str, str]]
                             ) -> List[Tuple[str, str]]:
        """Merge 不/一 with neighbours so the rules see the full context."""
        out: List[Tuple[str, str]] = []
        i = 0
        while i < len(seg_cut):
            word, pos = seg_cut[i]
            if (word == "不" and i + 1 < len(seg_cut)):
                nxt, npos = seg_cut[i + 1]
                out.append((word + nxt, npos))
                i += 2
                continue
            if (word == "一" and i + 1 < len(seg_cut)
                    and out and out[-1][0] == seg_cut[i + 1][0]):
                # V 一 V  -> merge into one token
                prev = out.pop()
                out.append((prev[0] + word + seg_cut[i + 1][0], prev[1]))
                i += 2
                continue
            out.append((word, pos))
            i += 1
        return out

    # ---- individual rules --------------------------------------------------

    def _bu_sandhi(self, word: str, finals: List[str]) -> List[str]:
        for i, ch in enumerate(word):
            if ch != "不":
                continue
            if 0 < i < len(word) - 1 and word[i - 1] == word[i + 1]:
                finals[i] = _set_tone(finals[i], "5")       # 看不看
            elif i + 1 < len(word) and _tone(finals[i + 1]) == "4":
                finals[i] = _set_tone(finals[i], "2")       # 不是
        return finals

    def _yi_sandhi(self, word: str, finals: List[str]) -> List[str]:
        for i, ch in enumerate(word):
            if ch != "一":
                continue
            prev_ch = word[i - 1] if i > 0 else ""
            next_ch = word[i + 1] if i + 1 < len(word) else ""
            if prev_ch and next_ch and prev_ch == next_ch:
                finals[i] = _set_tone(finals[i], "5")       # 试一试
            elif prev_ch == "第" or (prev_ch + ch) in ("十一",) or \
                    (next_ch and next_ch in "零一二三四五六七八九十月日号"):
                finals[i] = _set_tone(finals[i], "1")       # ordinal/number
            elif next_ch:
                if _tone(finals[i + 1]) == "4":
                    finals[i] = _set_tone(finals[i], "2")   # 一段
                else:
                    finals[i] = _set_tone(finals[i], "4")   # 一天
        return finals

    def _neural_sandhi(self, word: str, pos: str,
                       finals: List[str]) -> List[str]:
        if word in _REDUP_NEUTRAL and len(finals) >= 2:
            finals[-1] = _set_tone(finals[-1], "5")
            return finals
        for i, ch in enumerate(word):
            if (i > 0 and ch in _NEURAL_SUFFIXES
                    and pos in {"u", "ul", "ule", "uz", "ud", "r", "n", "v"}):
                finals[i] = _set_tone(finals[i], "5")
        if len(word) >= 2 and word[-1] == "子" and word not in _ZI_EXCEPTIONS \
                and pos in {"n", "nr", "nz"}:
            finals[-1] = _set_tone(finals[-1], "5")
        if len(word) >= 2 and word[-1] == "们" :
            finals[-1] = _set_tone(finals[-1], "5")
        return finals

    def _third_tone_sandhi(self, word: str, finals: List[str]) -> List[str]:
        for i in range(len(finals) - 1):
            if _tone(finals[i]) == "3" and _tone(finals[i + 1]) == "3":
                finals[i] = _set_tone(finals[i], "2")
        return finals

    def modified_tone(self, word: str, pos: str,
                      finals: List[str]) -> List[str]:
        finals = self._bu_sandhi(word, finals)
        finals = self._yi_sandhi(word, finals)
        finals = self._neural_sandhi(word, pos, finals)
        finals = self._third_tone_sandhi(word, finals)
        return finals
