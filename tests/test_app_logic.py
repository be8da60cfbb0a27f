"""App-layer logic parity: smart transcripts, sentence split, number
normalization, edit-span morphing (reference gradio_app.py:200-303)."""

import numpy as np

from voicecraft_tpu.app import (morph_edit_span, normalize_transcript,
                                smart_transcript_edit, smart_transcript_tts,
                                split_sentences, words_info_from_rows)
from voicecraft_tpu.utils.text_norm import (num_to_words,
                                            replace_numbers_with_words)

WORDS = [{"word": "the", "start": 0.10, "end": 0.25},
         {"word": "quick", "start": 0.30, "end": 0.62},
         {"word": "brown", "start": 0.66, "end": 0.95},
         {"word": "fox", "start": 1.00, "end": 1.30}]


def test_num_to_words_matches_num2words_examples():
    # pinned against num2words' default English output
    cases = {
        0: "zero", 7: "seven", 13: "thirteen", 20: "twenty",
        21: "twenty-one", 99: "ninety-nine", 100: "one hundred",
        101: "one hundred and one", 123: "one hundred and twenty-three",
        1000: "one thousand", 1005: "one thousand and five",
        1105: "one thousand, one hundred and five",
        2023: "two thousand and twenty-three",
        1234567: ("one million, two hundred and thirty-four thousand, "
                  "five hundred and sixty-seven"),
        -42: "minus forty-two",
    }
    for n, want in cases.items():
        assert num_to_words(n) == want, (n, num_to_words(n))


def test_replace_numbers_with_words():
    out = replace_numbers_with_words("call me at 42 tomorrow")
    assert "forty-two" in out and "42" not in out
    # digit runs glued to words get space-padded first (reference regex)
    out = replace_numbers_with_words("room101")
    assert "one hundred and one" in out


def test_smart_transcript_tts_word_boundary_cases():
    # cut cleanly after "quick": keep words ending before the cut
    t, pe = smart_transcript_tts(WORDS, 0.64, "jumps high")
    assert t == "the quick  jumps high"
    assert pe == 0.64
    # cut mid-"brown" past its midpoint: keep it, move the cut to its end
    t, pe = smart_transcript_tts(WORDS, 0.85, "jumps high")
    assert t == "the quick brown  jumps high"
    assert pe == 0.95
    # cut mid-"brown" before its midpoint: drop it, cut unchanged
    t, pe = smart_transcript_tts(WORDS, 0.70, "jumps high")
    assert t == "the quick  jumps high"
    assert pe == 0.70


def test_smart_transcript_edit():
    t = smart_transcript_edit(WORDS, 0.30, 0.95, "slow red")
    # words starting before 0.30 + replacement + words ending after 0.95
    assert t == "the  slow redfox "
    # (the reference concatenates without a separator before the tail word —
    # behavioural parity, see gradio_app.py:292-296)


def test_split_sentences():
    txt = "One two. Three four! Five?\nSix seven."
    assert split_sentences(txt) == ["One two.", "Three four!", "Five?",
                                    "Six seven."]
    assert split_sentences("a b\nc d\n\n", "Newline") == ["a b", "c d"]


def test_normalize_transcript():
    out = normalize_transcript("I  have 3 cats\nand 12 dogs")
    assert out == "I have three cats and twelve dogs"


def test_morph_edit_span_floor_and_ceiling():
    # floor at one codec frame
    s, e = morph_edit_span(0.01, 0.5, left_margin=0.08, right_margin=0.08,
                           audio_dur=2.0, codec_sr=50)
    assert s == 1 and e == 29
    # ceiling at audio duration
    s, e = morph_edit_span(1.5, 1.99, left_margin=0.08, right_margin=0.08,
                           audio_dur=2.0, codec_sr=50)
    assert e == 100 and s == 71


def test_words_info_from_rows():
    rows = [{"Label": "hi", "Begin": 0.1, "End": 0.3, "Type": "words"},
            {"Label": "sp", "Begin": 0.3, "End": 0.4, "Type": "phones"},
            {"Label": "there", "Begin": 0.4, "End": 0.8}]
    wi = words_info_from_rows(rows)
    assert wi == [{"word": "hi", "start": 0.1, "end": 0.3},
                  {"word": "there", "start": 0.4, "end": 0.8}]
