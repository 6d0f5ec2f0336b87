"""Korean pronunciation rules (g2pk2-equivalent core) and the reference's
Korean G2P golden (reference: tests/easevoice/text_test.py:58-71)."""
import pytest

from easevoice_trainer_tpu.text import korean
from easevoice_trainer_tpu.text.korean_rules import (convert_numbers,
                                                     pronounce, spell_number)


# standard 표준발음법 textbook pairs, one per rule
@pytest.mark.parametrize("written,spoken", [
    ("국밥", "국빱"),       # tensification after obstruent
    ("학교", "학꾜"),
    ("옷감", "옫깜"),       # neutralization + tensification
    ("국물", "궁물"),       # nasalization ㄱ+ㅁ
    ("닫는", "단는"),       # nasalization ㄷ+ㄴ
    ("입니다", "임니다"),   # nasalization ㅂ+ㄴ
    ("독립", "동닙"),       # ㄱ+ㄹ -> ㅇ+ㄴ
    ("심리", "심니"),       # ㅁ+ㄹ -> ㅁ+ㄴ
    ("신라", "실라"),       # lateralization ㄴ+ㄹ
    ("칼날", "칼랄"),       # lateralization ㄹ+ㄴ
    ("좋다", "조타"),       # ㅎ+ㄷ aspiration
    ("좋아", "조아"),       # ㅎ deletion before vowel
    ("않는", "안는"),       # ㄶ before ㄴ
    ("않아", "아나"),       # ㄶ before vowel: ㄴ liaises
    ("앓는", "알른"),       # ㅀ + ㄴ -> ㄹㄹ
    ("입학", "이팍"),       # obstruent + ㅎ aspiration
    ("못하다", "모타다"),   # ㅅ->ㄷ->ㅌ with ㅎ
    ("밝히다", "발키다"),   # cluster + ㅎ
    ("맏이", "마지"),       # palatalization ㄷ+이
    ("같이", "가치"),       # palatalization ㅌ+이
    ("굳이", "구지"),
    ("옷이", "오시"),       # liaison
    ("앉아", "안자"),       # cluster liaison
    ("읽어", "일거"),
    ("값이", "갑씨"),       # ㅄ liaison tensifies ㅅ
    ("맑다", "막따"),       # ㄺ simplification + tensification
    ("맑게", "말께"),       # ㄺ before ㄱ keeps ㄹ
    ("밟다", "밥따"),       # 밟- exception
    ("넓다", "널따"),       # regular ㄼ
    ("무릎", "무릅"),       # final neutralization
    ("부엌", "부억"),
    ("희망", "히망"),       # consonant + ㅢ -> ㅣ
    ("가져", "가저"),       # ㅈ+ㅕ -> ㅓ
])
def test_phonology_pairs(written, spoken):
    assert pronounce(written) == spoken


def test_spell_numbers():
    assert spell_number("0") == "영"
    assert spell_number("13") == "십삼"
    assert spell_number("105000") == "십만오천"
    assert spell_number("20", sino=False) == "스무"
    assert spell_number("3", sino=False) == "세"
    # classifier routing: native for counters, sino otherwise
    assert convert_numbers("3개") == "세개"
    assert convert_numbers("3번") == "세번"
    assert convert_numbers("3월") == "삼월"


def test_reference_korean_golden():
    text = "안녕하세요. 안녕하세요! 역시 좋은 하루야! 서울 강남구로 가자!"
    assert korean.g2p(text) == [
        'ㅇ', 'ㅏ', 'ㄴ', 'ㄴ', 'ㅣ', 'ㅓ', 'ㅇ', 'ㅎ', 'ㅏ', 'ㅅ', 'ㅔ',
        'ㅇ', 'ㅣ', 'ㅗ', '.', '空', 'ㅇ', 'ㅏ', 'ㄴ', 'ㄴ', 'ㅣ', 'ㅓ',
        'ㅇ', 'ㅎ', 'ㅏ', 'ㅅ', 'ㅔ', 'ㅇ', 'ㅣ', 'ㅗ', '!', '空', 'ㅇ',
        'ㅣ', 'ㅓ', 'ㄱ', 'ㅆ', 'ㅣ', '空', 'ㅈ', 'ㅗ', 'ㅇ', 'ㅡ', 'ㄴ',
        '空', 'ㅎ', 'ㅏ', 'ㄹ', 'ㅜ', 'ㅇ', 'ㅣ', 'ㅏ', '!', '空', 'ㅅ',
        'ㅓ', 'ㅇ', 'ㅜ', 'ㄹ', '空', 'ㄱ', 'ㅏ', 'ㅇ', 'ㄴ', 'ㅏ', 'ㅁ',
        'ㄱ', 'ㅜ', 'ㄹ', 'ㅗ', '空', 'ㄱ', 'ㅏ', 'ㅈ', 'ㅏ', '!']


def test_latin_and_numbers_through_g2p():
    from easevoice_trainer_tpu.text.symbols import SYMBOLS

    phones = korean.g2p("abc 3개 주세요")
    assert phones and all(p in SYMBOLS for p in phones)
    # trailing bare jamo gets a sentence-final '.'
    assert korean.g2p("밥")[-1] == "."
