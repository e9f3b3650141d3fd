"""Tokenizer golden tests vs the reference SimpleTokenizer (run as an oracle).

The reference implementation (training/clip/simple_tokenizer.py) is imported
read-only from /root/reference and used to generate expected token ids; our
from-scratch tokenizer must agree exactly on a corpus covering unicode, emoji,
contractions, digits, HTML entities and whitespace.
"""

import sys

import numpy as np
import pytest

from conftest import install_ftfy_stub

install_ftfy_stub()
sys.path.insert(0, "/root/reference/training/clip")

from clip_mixer_tpu.text import get_tokenizer, tokenize

CORPUS = [
    "a photo of a cat",
    "A Photo   of\ta DOG!!",
    "hello world",
    "it's can't we're I've i'm they'll she'd",
    "12345 67 8",
    "naïve café résumé",
    "日本語のテキスト",
    "emoji 🚀🔥 test",
    "x",
    "",
    "&amp;amp; &lt;tag&gt;",
    "punctuation... --- ???!!",
    "MixedCASE WoRdS",
    "a" * 300,  # long repeated word exercises the merge loop
    "the quick brown fox jumps over the lazy dog",
    "ｆｕｌｌｗｉｄｔｈ",
    "tab\tand\nnewline  collapse",
]


@pytest.fixture(scope="module")
def oracle():
    from simple_tokenizer import SimpleTokenizer  # reference, read-only

    return SimpleTokenizer()


def test_vocab_size():
    assert get_tokenizer().vocab_size == 49408


def test_specials():
    tok = get_tokenizer()
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407


@pytest.mark.parametrize("text", CORPUS, ids=range(len(CORPUS)))
def test_encode_matches_reference(text, oracle):
    assert get_tokenizer().encode(text) == oracle.encode(text)


def test_decode_roundtrip(oracle):
    tok = get_tokenizer()
    for text in CORPUS[:6]:
        ids = tok.encode(text)
        assert tok.decode(ids) == oracle.decode(ids)


def test_tokenize_shape_and_padding():
    arr = tokenize(["a photo of a cat", "dog"])
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == 49406
    # eot present, padding zero after it
    eot_pos = int(np.argmax(arr[1]))
    assert arr[1, eot_pos] == 49407
    assert (arr[1, eot_pos + 1 :] == 0).all()


def test_tokenize_truncate():
    long = "word " * 200
    with pytest.raises(RuntimeError):
        tokenize(long)
    arr = tokenize(long, truncate=True)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == 49407


def test_tokenize_matches_reference_oracle(oracle):
    ours = tokenize(CORPUS, truncate=True)
    sot, eot = 49406, 49407
    for i, text in enumerate(CORPUS):
        ids = [sot] + oracle.encode(text) + [eot]
        if len(ids) > 77:
            ids = ids[:77]
            ids[-1] = eot
        expected = np.zeros(77, dtype=np.int32)
        expected[: len(ids)] = ids
        np.testing.assert_array_equal(ours[i], expected)


def _random_unicode_strings(n, seed):
    """Mixed-script fuzz corpus: ASCII, Latin-1, Greek, Cyrillic, kana, CJK,
    emoji, interleaved whitespace — codepoints the curated CORPUS misses."""
    rng = np.random.default_rng(seed)
    pools = [
        (0x20, 0x7F),       # ASCII incl. punctuation
        (0xA0, 0x100),      # Latin-1 accents
        (0x370, 0x400),     # Greek
        (0x400, 0x500),     # Cyrillic
        (0x3040, 0x3100),   # kana
        (0x4E00, 0x4F00),   # CJK slice
        (0x1F300, 0x1F600), # emoji
    ]
    out = []
    for _ in range(n):
        parts = []
        for _ in range(int(rng.integers(1, 40))):
            lo, hi = pools[int(rng.integers(0, len(pools)))]
            parts.append(chr(int(rng.integers(lo, hi))))
            if rng.random() < 0.3:
                parts.append(" \t\n"[int(rng.integers(0, 3))])
        out.append("".join(parts))
    return out


def test_encode_fuzz_matches_reference(oracle):
    """300 random mixed-script strings must tokenize identically to the
    reference implementation — guards the regex/merge paths the curated
    corpus doesn't reach."""
    tok = get_tokenizer()
    for s in _random_unicode_strings(300, seed=123):
        assert tok.encode(s) == oracle.encode(s), repr(s)


def test_clear_cache_preserves_results():
    """The per-word memo resets (bench cold-start / memory hygiene) must not
    change outputs: python and C++ paths agree before and after clearing."""
    from clip_mixer_tpu.text import fast
    from clip_mixer_tpu.text.tokenize import tokenize

    texts = ["a photo of a cat", "unseenwordzq pairings!", "a photo of a cat"]
    before_py = tokenize(texts, truncate=True)
    get_tokenizer().clear_cache()
    assert (tokenize(texts, truncate=True) == before_py).all()
    if fast.is_available():
        before_cpp = fast.fast_tokenize(texts, truncate=True)
        fast.clear_cache()
        assert (fast.fast_tokenize(texts, truncate=True) == before_cpp).all()
        assert (before_cpp == before_py).all()
