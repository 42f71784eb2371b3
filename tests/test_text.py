"""Text frontend tests: ByT5 arithmetic and clean_text behavior."""
import pytest

from llmvox_tpu.text import ByT5Tokenizer, clean_text


def test_byt5_matches_hf_arithmetic():
    tok = ByT5Tokenizer()
    # ByT5: utf-8 byte + 3, trailing </s>=1
    assert tok.encode("Hi") == [ord("H") + 3, ord("i") + 3, 1]
    assert tok.encode("") == [1]
    # multibyte utf-8
    ids = tok.encode("é")
    assert ids == [0xC3 + 3, 0xA9 + 3, 1]


@pytest.mark.skipif(
    pytest.importorskip("transformers", reason="needs transformers") is None,
    reason="transformers unavailable")
def test_byt5_matches_hf_tokenizer():
    from transformers import ByT5Tokenizer as HFByT5
    hf = HFByT5()  # offline default: byte vocab + 125 extra ids
    ours = ByT5Tokenizer()
    for text in ["Hello world.", "a", "123, ok?", "naïve café"]:
        assert ours.encode(text) == hf(text)["input_ids"]


def test_encode_words_flattens_and_appends_385():
    tok = ByT5Tokenizer()
    ids = tok.encode_words("ab cd")
    # per-word ids each with trailing 1, then 385 (src/data.py:139-141)
    assert ids == [ord("a") + 3, ord("b") + 3, 1,
                   ord("c") + 3, ord("d") + 3, 1, 385]


def test_decode_roundtrip():
    tok = ByT5Tokenizer()
    assert tok.decode(tok.encode("round trip!")) == "round trip!"


def test_clean_text_rules():
    # mirrors streaming_server.py:106-149 behavior
    assert clean_text(" **bold** ") == "bold"
    assert clean_text("well-known") == "well known"
    assert clean_text("5. next") == "5 next"
    # strip() runs before symbol spelling, so a leading '#' keeps its space
    # (same behavior as the reference, streaming_server.py:117-130)
    assert clean_text("#1 & #2") == " number 1 and number 2"
    assert clean_text("a@b") == "a at b"
    # whitespace collapse runs before ellipsis -> " pause ", keeping the
    # trailing space, as in the reference (streaming_server.py:133-136)
    assert clean_text("wait....") == "wait pause "
    assert clean_text("1,000") == "1000"
    assert clean_text("a/b") == "a slash b"
    assert clean_text("a\\b") == "a backslash b"
    assert clean_text("  many   spaces  ") == "many spaces"
