"""Text frontend tests: tokenizer contract, normalization, G2P sanity,
sentence splitting parity with the reference."""

import numpy as np
import pytest

from openvoice_tpu.text import (
    cleaned_text_to_sequence,
    default_symbols,
    intersperse,
    text_to_sequence,
)
from openvoice_tpu.text.english import (
    english_to_ipa2,
    normalize_numbers,
    number_to_words,
    ordinal_to_words,
    word_to_ipa,
)
from openvoice_tpu.text.mandarin import chinese_to_ipa, number_to_chinese, pinyin_to_ipa
from openvoice_tpu.text.split import split_sentence


def test_symbol_inventory_matches_reference():
    # load the reference symbols module directly by path (the package
    # __init__ needs deps not present in this image)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_symbols", "/root/reference/openvoice/text/symbols.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert default_symbols == mod.symbols


def test_tokenizer_drops_unknown_symbols():
    # 'ʌ' is not in the inventory; it must be silently dropped (reference
    # text/__init__.py:25-26 contract)
    ids = cleaned_text_to_sequence("kʌp", default_symbols)
    assert len(ids) == 2


def test_intersperse():
    assert intersperse([5, 9]) == [0, 5, 0, 9, 0]


def test_text_to_sequence_english_roundtrip():
    ids = text_to_sequence("[EN]Hello world.[EN]", default_symbols, ["cjke_cleaners2"])
    assert len(ids) > 5
    assert all(0 <= i < len(default_symbols) for i in ids)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(17) == "seventeen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234567) == "one million two hundred thirty-four thousand five hundred sixty-seven"


def test_ordinals_and_money():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(22) == "twenty-second"
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("the 3rd time") == "the third time"
    assert normalize_numbers("in 1984") == "in nineteen eighty-four"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("1,000,000 stars") == "one million stars"


def test_english_g2p_lexicon_and_rules():
    # lexicon words
    assert word_to_ipa("the") == "ðə"
    assert word_to_ipa("hello") == "həˈloʊ"
    # morphology from lexicon base
    assert word_to_ipa("friends") == "frɛndz"
    # rule-based fallback produces non-empty IPA-ish output
    out = word_to_ipa("blorptastic")
    assert len(out) > 5
    ipa2 = english_to_ipa2("cats and dogs")
    assert "ɹ" not in ipa2 or "r" not in ipa2  # ipa2 conversion applied
    assert " " in ipa2


def test_english_dark_l():
    out = english_to_ipa2("full")
    assert "ɫ" in out


def test_mandarin_numbers():
    assert number_to_chinese("123") == "一百二十三"
    assert number_to_chinese("10") == "十"
    assert number_to_chinese("2005") == "二千零五"
    assert number_to_chinese("3.14") == "三点一四"


def test_pinyin_to_ipa():
    assert pinyin_to_ipa("zhong1") == "ts`⁼ʊŋ→"
    assert pinyin_to_ipa("ni3") == "ni↓↑"
    assert pinyin_to_ipa("hao3") == "xɑʊ↓↑"
    assert pinyin_to_ipa("shi4") == "s`ɹ`↓"
    assert pinyin_to_ipa("lv4") == "lɥ↓"
    assert pinyin_to_ipa("xu3") == "ʃɥ↓↑"
    assert pinyin_to_ipa("men5") == "mən"


def test_chinese_to_ipa_sentence():
    out = chinese_to_ipa("你好")
    assert "ni" in out and "xɑʊ" in out
    ids = text_to_sequence("[ZH]你好。[ZH]", default_symbols, ["cjke_cleaners2"])
    assert len(ids) >= 5


def test_japanese_g2p():
    # the reference's [JA] handler is a latent NameError (text/cleaners.py:9);
    # ours works: kana, katakana, romaji, numbers, and the symbol contract
    from openvoice_tpu.text.japanese import japanese_to_ipa2, number_to_kana

    assert japanese_to_ipa2("こんにちは") == "konnitʃiwa"
    assert japanese_to_ipa2("ありがとう") == "aɾigatoo"  # おう long-vowel merge
    assert japanese_to_ipa2("きって") == "kitte"  # sokuon gemination
    assert japanese_to_ipa2("しんぶん") == "ʃimbɯn"  # ん → m before b
    assert "ŋ" in japanese_to_ipa2("にほんご")  # ん → ŋ before g
    assert japanese_to_ipa2("キャンペーン") == "kjampeen"  # katakana + chouon
    assert japanese_to_ipa2("konnichiwa") == "konnitʃiwa"  # romaji input
    assert number_to_kana("2005") == "にせんご"
    assert number_to_kana("600") == "ろっぴゃく"  # euphonic change
    out = japanese_to_ipa2("365にち")
    assert out.startswith("sambjakɯ")
    # kanji needs a reading dictionary → clear error, not garbage
    with pytest.raises(ValueError):
        japanese_to_ipa2("日本語")


def test_korean_g2p():
    # the reference's [KO] handler is a latent NameError (text/cleaners.py:11)
    from openvoice_tpu.text.korean import korean_to_ipa, number_to_hangul

    assert korean_to_ipa("안녕하세요") == "annjəŋhasejo"
    assert korean_to_ipa("한국어") == "hangugə"  # liaison
    assert korean_to_ipa("감사합니다") == "kamsahamnida"  # nasalization
    assert korean_to_ipa("좋다") == "tʃotʰa"  # ㅎ aspiration fusion
    assert korean_to_ipa("굳이") == "kudʑi"  # palatalization
    assert korean_to_ipa("신라") == "ʃiɫɫa"  # liquidization
    assert korean_to_ipa("학교") == "hakk⁼jo"  # tensification
    assert korean_to_ipa("읽다") == "ikt⁼a"  # cluster reduction ㄺ→ㄱ
    assert korean_to_ipa("바보") == "pabo"  # initial devoicing + voicing
    assert number_to_hangul("2005") == "이천오"
    with pytest.raises(ValueError):
        korean_to_ipa("hello 세계")  # latin inside [KO] is out of scope


def test_ja_ko_tokenize_within_inventory():
    for tagged in ("[JA]こんにちは、げんきですか？[JA]", "[KO]안녕하세요. 감사합니다![KO]"):
        ids = text_to_sequence(tagged, default_symbols, ["cjke_cleaners2"])
        assert len(ids) >= 8
        assert all(0 <= i < len(default_symbols) for i in ids)
    # and the cleaned text itself survives tokenization near-losslessly
    from openvoice_tpu.text import _clean_text

    clean = _clean_text("[KO]안녕하세요[KO]", ["cjke_cleaners2"])
    kept = [c for c in clean if c in default_symbols]
    assert len(kept) >= len(clean) - 1  # at most the trailing period rewrite


def test_split_sentences_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from openvoice.utils import split_sentence as ref_split

    texts = [
        "This is a test. It has multiple sentences! Does it work? Yes, it does.",
        "Short. Very short. OK.",
        "One long sentence that just keeps going and going without any punctuation at all until finally it stops",
    ]
    for t in texts:
        assert split_sentence(t, language_str="EN") == ref_split(t, language_str="EN")
    zh = "今天天气很好。我们去公园散步吧！你觉得怎么样？"
    assert split_sentence(zh, language_str="ZH") == ref_split(zh, language_str="ZH")


def test_cleaned_text_to_sequence_vits2():
    """VITS2 variant (reference text/__init__.py:47-61): tone offsets from
    language_tone_start_map, constant language-ID stream."""
    from openvoice_tpu.text import cleaned_text_to_sequence_vits2
    from openvoice_tpu.text.symbols import language_tone_start_map, symbols

    langs = list(language_tone_start_map)
    lang = "ZH" if "ZH" in language_tone_start_map else langs[1]
    text = symbols[5] + symbols[6] + symbols[7]
    phones, tones, lang_ids = cleaned_text_to_sequence_vits2(
        text, [0, 1, 2], lang, symbols, langs)
    assert phones == [5, 6, 7]
    start = language_tone_start_map[lang]
    assert tones == [start, start + 1, start + 2]
    assert lang_ids == [langs.index(lang)] * 3
