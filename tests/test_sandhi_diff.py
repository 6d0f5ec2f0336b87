"""Differential test: our ToneSandhi == the reference ToneSandhi.

The reference implementation is imported read-only from /root/reference
with pypinyin stubbed to our vendored-table backend, then both are fed
identical jieba segmentations + finals over a sentence corpus.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference checkout not available")

SENTENCES = [
    "我们都去了北京，天气很好。",
    "你不是不想看一看这把小雨伞吗？",
    "他买了五个苹果和一只老虎。",
    "老老实实的豆腐脑儿很好吃。",
    "我想起来了，门口有一个胡同儿。",
    "第一次去上海，坐了一天一夜的火车。",
    "妈妈在屋子里收拾行李，爸爸躺在椅子上。",
    "这个孩子很聪明，就是有点儿马虎。",
    "朋友们听一听这首曲子吧。",
    "展览馆里所有人都很勇敢。",
    "纸老虎吓不倒好朋友。",
    "他们俩商量着去吃饺子。",
    "水果摊上摆满了葡萄萝卜和蘑菇。",
    "老板娘的女儿考取了理想学府。",
    "我走不动了，咱们坐下来歇一歇。",
    "主席每场演讲都很有讲究。",
    "小狗整天跑来跑去，可爱极了。",
    "雨伞忘在火车上了。",
    "五百个馒头分给一千个人。",
    "他说的倒是轻松。",
]


@pytest.fixture(scope="module")
def ref_sandhi():
    """Reference ToneSandhi with pypinyin stubbed onto our table backend."""
    from conftest import install_pypinyin_stub

    install_pypinyin_stub()
    if "jieba_fast" not in sys.modules:
        import jieba

        sys.modules["jieba_fast"] = jieba
        sys.modules["jieba_fast.posseg"] = jieba.posseg \
            if hasattr(jieba, "posseg") else __import__("jieba.posseg",
                                                        fromlist=["posseg"])
    sys.path.insert(0, REF)
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_tone_sandhi",
            os.path.join(REF, "src/easevoice/text/tone_sandhi.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF)
    return mod.ToneSandhi()


def _finals_for(word):
    from easevoice_trainer_tpu.text.chinese import _backend

    return [v for _, v in _backend()(word)]


def test_pre_merge_parity(ref_sandhi):
    import jieba.posseg as posseg
    from easevoice_trainer_tpu.text.tone_sandhi import ToneSandhi

    ours = ToneSandhi()
    for sent in SENTENCES:
        seg = [(w, p) for w, p in posseg.lcut(sent)]
        ref_out = [tuple(x) for x in ref_sandhi.pre_merge_for_modify(seg)]
        our_out = [tuple(x) for x in ours.pre_merge_for_modify(seg)]
        assert our_out == ref_out, (sent, our_out, ref_out)


def test_modified_tone_parity(ref_sandhi):
    import jieba.posseg as posseg
    from easevoice_trainer_tpu.text.tone_sandhi import ToneSandhi

    ours = ToneSandhi()
    checked = 0
    for sent in SENTENCES:
        seg = ours.pre_merge_for_modify([(w, p) for w, p in
                                         posseg.lcut(sent)])
        for word, pos in seg:
            finals = _finals_for(word)
            if len(finals) != len(word) or not all(
                    f and f[-1].isdigit() for f in finals):
                continue
            ref_out = ref_sandhi.modified_tone(word, pos, list(finals))
            our_out = ours.modified_tone(word, pos, list(finals))
            assert our_out == ref_out, (word, pos, finals, our_out, ref_out)
            checked += 1
    assert checked > 40        # the corpus must actually exercise the rules


def test_golden_sandhi_cases():
    """Table-driven goldens for the canonical rules."""
    from easevoice_trainer_tpu.text.tone_sandhi import ToneSandhi

    ts = ToneSandhi()
    cases = [
        # 不 before tone 4 -> bu2
        ("不怕", "d", ["u4", "a4"], ["u2", "a4"]),
        # X不X -> neutral
        ("看不看", "v", ["an4", "u4", "an4"], ["an4", "u5", "an4"]),
        # 一 before tone 4 -> yi2
        ("一段", "m", ["i1", "uan4"], ["i2", "uan4"]),
        # 一 before non-tone-4 -> yi4
        ("一天", "m", ["i1", "ian1"], ["i4", "ian1"]),
        # V一V -> neutral
        ("看一看", "v", ["an4", "i1", "an4"], ["an4", "i5", "an4"]),
        # ordinal stays yi1
        ("第一", "m", ["i4", "i1"], ["i4", "i1"]),
        # digit string untouched
        ("一零零", "m", ["i1", "ing2", "ing2"], ["i1", "ing2", "ing2"]),
        # 3-3 within word -> 2-3
        ("雨伞", "n", ["v3", "an3"], ["v2", "an3"]),
        # must-neural word
        ("豆腐", "n", ["ou4", "u3"], ["ou4", "u5"]),
        # 子 suffix neutral
        ("桌子", "n", ["uo1", "i3"], ["uo1", "i5"]),
        # locative neutral
        ("家里", "s", ["ia1", "i3"], ["ia1", "i5"]),
        # directional after 上 -> neutral
        ("上来", "v", ["ang4", "ai2"], ["ang4", "ai5"]),
        # quantifier 个
        ("三个", "m", ["an1", "e4"], ["an1", "e5"]),
        # all-three 3-char with 2+1 split (展览馆)
        ("展览馆", "n", ["an3", "an3", "uan3"], ["an2", "an2", "uan3"]),
        # 4-char idiom: 2+2 halves
        ("勇敢领导", "n", ["ong3", "an3", "ing3", "ao3"],
         ["ong2", "an3", "ing2", "ao3"]),
    ]
    for word, pos, finals, expected in cases:
        got = ts.modified_tone(word, pos, list(finals))
        assert got == expected, (word, got, expected)
