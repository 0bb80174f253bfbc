"""Native C++ host library vs the pure-Python fallbacks."""

import numpy as np
import pytest

from hyperdb_tpu.core.chunker import WordTokenizer
from hyperdb_tpu.native import tokenizer as native
from hyperdb_tpu.query.filters import tokenize as py_filter_tokenize


@pytest.fixture(scope="module")
def lib_built():
    if not native.build():
        pytest.skip("no C++ toolchain available")
    return True


def test_native_word_tokenizer_parity(lib_built):
    tok = native.NativeWordTokenizer.maybe_load()
    assert tok is not None
    py = WordTokenizer()
    for text in [
        "hello world",
        "  leading and   multiple   spaces\t tabs\nnewlines ",
        "",
        "single",
        "word " * 700,
        "unicode héllo wörld ünïts",
    ]:
        assert tok.encode(text) == py.encode(text), repr(text)
        assert tok.decode(tok.encode(text)) == py.decode(py.encode(text))


def test_native_filter_tokenizer_parity(lib_built):
    for text in [
        "Sleeps 18 hours a day.",
        "don't STOP, me-now!",
        "punctuation... everywhere?!",
        "",
        "MiXeD CaSe WORDS",
    ]:
        got = native.native_filter_tokenize(text)
        assert got is not None
        assert got == py_filter_tokenize(text), repr(text)


def test_native_filter_tokenizer_non_ascii_falls_back(lib_built):
    """Byte-level C++ cannot lowercase 'É' or classify Unicode word chars;
    non-ASCII input must route to the Unicode-aware Python tokenizer."""
    import re
    import string

    assert native.native_filter_tokenize("CAFÉ is great") is None
    assert native.native_filter_tokenize("ellipsis… here") is None

    punct = str.maketrans("", "", string.punctuation)
    word_re = re.compile(r"\b\w+\b")
    for text in ["CAFÉ is great", "ellipsis… here", "Ünïts of WÖRK"]:
        pure_python = set(word_re.findall(text.translate(punct).lower()))
        assert py_filter_tokenize(text) == pure_python, repr(text)
    assert py_filter_tokenize("CAFÉ is great") == {"café", "is", "great"}


def test_native_merge_topk(lib_built):
    rng = np.random.default_rng(0)
    scores = rng.standard_normal(64).astype(np.float32)
    ids = np.arange(64, dtype=np.int64)
    out = native.native_merge_topk(scores, ids, k=5)
    assert out is not None
    out_scores, out_ids = out
    order = np.argsort(-scores)[:5]
    np.testing.assert_array_equal(out_ids, ids[order])
    np.testing.assert_allclose(out_scores, scores[order])


def test_native_merge_topk_tie_break(lib_built):
    scores = np.array([1.0, 2.0, 2.0, 0.5], dtype=np.float32)
    ids = np.array([7, 9, 3, 1], dtype=np.int64)
    out_scores, out_ids = native.native_merge_topk(scores, ids, k=3)
    # ties broken by lower id: 3 before 9
    np.testing.assert_array_equal(out_ids, [3, 9, 7])


def test_native_word_tokenizer_unicode_whitespace_parity(lib_built):
    """NBSP and other Unicode whitespace must split identically to the
    Python WordTokenizer's \\S+ (the C++ path only sees ASCII bytes, so
    non-ASCII input routes to the Python regex)."""
    from hyperdb_tpu.core.chunker import WordTokenizer
    from hyperdb_tpu.native.tokenizer import NativeWordTokenizer

    nat = NativeWordTokenizer.maybe_load()
    if nat is None:
        pytest.skip("native lib unavailable")
    py = WordTokenizer()
    for text in ["cafe au lait", "plain ascii words",
                 "tabs\tand\nnewlines", "ünïcode wörds"]:
        assert nat.encode(text) == py.encode(text), text


def test_native_merge_accepts_neg_inf_entries(lib_built):
    """Masked rows arrive as (-inf, id); they must fill otherwise-empty
    slots instead of leaving -1 sentinels that callers would index with."""
    from hyperdb_tpu.native.tokenizer import native_merge_topk

    scores = np.array([-np.inf, -np.inf, 1.5], dtype=np.float32)
    ids = np.array([7, 3, 9], dtype=np.int64)
    out = native_merge_topk(scores, ids, k=3)
    if out is None:
        pytest.skip("native lib unavailable")
    out_scores, out_ids = out
    assert out_ids[0] == 9
    # both -inf entries retained, lower id first on the tie
    assert list(out_ids[1:]) == [3, 7]
    assert -1 not in out_ids


def test_wordpiece_control_char_whitespace_parity(lib_built):
    """\\x1c-\\x1f are whitespace to Python's Unicode \\s but not to the C++
    is_space; such text must take the Python path so ids are identical
    whether or not the native lib compiled."""
    from hyperdb_tpu.models.wordpiece import WordPieceTokenizer, train_wordpiece

    tok = WordPieceTokenizer(train_wordpiece(["alpha beta gamma"] * 4, vocab_size=200))
    with_ctrl = tok.text_ids("alpha\x1cbeta")
    plain = tok.text_ids("alpha beta")
    assert with_ctrl == plain  # \x1c splits words exactly like a space
