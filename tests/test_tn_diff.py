"""Differential + golden tests for Chinese text normalization."""
import importlib.util
import os
import sys

import pytest

from easevoice_trainer_tpu.text.chinese_norm import (
    TextNormalizer, num2str, verbalize_digit)

REF = "/root/reference"

CASES = [
    "今天是2024/03/05。",
    "2019年3月15日他出生了。",
    "会议8:30-12:30举行。",
    "现在是23:59:59。",
    "气温-3°C~5°C,平均气温12.5℃。",
    "占比75.5%,约2/3的人到场。",
    "我的手机号是13812345678。",
    "客服电话400-666-8888。",
    "北京区号010。",
    "他花了39.9元买了3本书和5个苹果。",
    "这块地有520亩,产量0.95吨。",
    "2²=4,3³=27。",
    "1+1=2,10-5=5。",
    "速度从10km~20km不等。",
    "π是圆周率,约等于3.14159。",
    "第1名得了100分,第2名98.5分。",
    "房间面积是120m²,高3m。",
    "他体重65kg,身高175cm。",
    "比赛时间是2021-05-01。",
    "编号00078已经发货。",
    "温度零下-5度到3度。",
    "我要买2个面包和1瓶牛奶。",
    "利率是4.35%,贬值-0.5%。",
    "距离是3~5千米。",
    "α粒子和β射线。",
    "大概100多个人来了。",
    "他住在3楼305室。",
    "今年增长了1.5倍。",
    "考试成绩是90分以上。",
    "火车01:05发车。",
]


@pytest.fixture(scope="module")
def ref_normalizer():
    if not os.path.isdir(os.path.join(REF, "src")):
        pytest.skip("reference checkout not available")
    from conftest import install_pypinyin_stub

    install_pypinyin_stub()                    # constants.py imports compat
    sys.path.insert(0, REF)
    try:
        from src.easevoice.text.chinese_norm.text_normlization import (
            TextNormalizer as RefTN)
    finally:
        sys.path.remove(REF)
    return RefTN()


def test_normalizer_differential(ref_normalizer):
    ours = TextNormalizer()
    for case in CASES:
        assert ours.normalize(case) == ref_normalizer.normalize(case), case


def test_num2str_goldens():
    assert num2str("0") == "零"
    assert num2str("15") == "十五"
    assert num2str("105") == "一百零五"
    assert num2str("1234") == "一千二百三十四"
    assert num2str("100000001") == "一亿零一"
    assert num2str("100001000") == "一亿零一千"
    assert num2str("10005") == "一万零五"
    assert num2str("3.20") == "三点二"
    assert num2str(".22") == "零点二二"
    assert verbalize_digit("13812345678", alt_one=True) == \
        "幺三八幺二三四五六七八"


def test_normalizer_goldens():
    tn = TextNormalizer()
    assert tn.normalize("今天是2024/03/05。") == ["今天是二零二四年三月五日。"]
    assert tn.normalize("会议8:30开始。") == ["会议八点半开始。"]
    assert tn.normalize("占比75.5%。") == ["占比百分之七十五点五。"]
    assert tn.normalize("大约2/3的人。") == ["大约三分之二的人。"]
    assert tn.normalize("气温-3℃。") == ["气温零下三度。"]
    assert tn.normalize("我有3个苹果。") == ["我有三个苹果。"]
    assert tn.normalize("2个人。") == ["两个人。"]
    assert tn.normalize("电话13812345678。") == ["电话幺三八幺二三四五六七八。"]
    # traditional -> simplified
    assert tn.normalize("他說華語。") == ["他说华语。"]
