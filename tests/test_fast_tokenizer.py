"""C++ fast tokenizer must match the Python tokenizer token-for-token."""

import numpy as np
import pytest

from clip_mixer_tpu.text import tokenize
from clip_mixer_tpu.text.fast import fast_tokenize, is_available

pytestmark = pytest.mark.skipif(not is_available(), reason="no C++ toolchain")

CORPUS = [
    "a photo of a cat",
    "A Photo   of\ta DOG!!",
    "it's can't we're I've i'm they'll she'd",
    "12345 67 8",
    "naïve café résumé",
    "日本語のテキスト",
    "emoji 🚀🔥 test",
    "x",
    "",
    "&amp;amp; &lt;tag&gt;",
    "punctuation... --- ???!!",
    "don''t '' 'x ''s",
    "!!'s mid-run contraction swallow",
    "<|startoftext|> embedded <|endoftext|>",
    "!!<|endoftext|> swallowed special",
    "a" * 300,
    "the quick brown fox jumps over the lazy dog",
    "ｆｕｌｌｗｉｄｔｈ",
    "tab\tand\nnewline  collapse",
    "mixed 'll'd're endings",
    "прекрасный день сегодня",
    "数字123と文字",
]


def test_matches_python_tokenizer():
    np.testing.assert_array_equal(
        fast_tokenize(CORPUS, truncate=True), tokenize(CORPUS, truncate=True)
    )


def test_single_string_and_shapes():
    out = fast_tokenize("hello world")
    assert out.shape == (1, 77) and out.dtype == np.int32
    np.testing.assert_array_equal(out, tokenize("hello world"))


def test_too_long_raises():
    with pytest.raises(RuntimeError, match="too long"):
        fast_tokenize("word " * 200)
    np.testing.assert_array_equal(
        fast_tokenize("word " * 200, truncate=True), tokenize("word " * 200, truncate=True)
    )


def test_context_length_variants():
    for ctx in (16, 77, 128):
        np.testing.assert_array_equal(
            fast_tokenize(CORPUS[:6], context_length=ctx, truncate=True),
            tokenize(CORPUS[:6], context_length=ctx, truncate=True),
        )


def test_large_random_corpus():
    rng = np.random.default_rng(0)
    words = ["cat", "dog", "résumé", "123", "!!!", "it's", "🚀", "день", "語"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 30)).tolist()) for _ in range(200)
    ]
    np.testing.assert_array_equal(
        fast_tokenize(texts, truncate=True), tokenize(texts, truncate=True)
    )


def test_concurrent_tokenize_thread_safe():
    """ctypes releases the GIL around the C++ batch call and the Bpe handle
    is a singleton — concurrent callers race the memo cache unless it's
    locked. Hammer the same (cache-hitting) and fresh (cache-inserting)
    words from many threads and check token parity with the serial result."""
    from concurrent.futures import ThreadPoolExecutor

    # Fresh words EVERY round (the C++ memo cache is a process singleton —
    # reusing words across rounds would make later rounds pure cache hits
    # and never exercise concurrent INSERTION); the expected tokens come
    # from the Python tokenizer so nothing pre-populates the C++ cache.
    for rep in range(5):  # repeat: races are probabilistic
        texts = [
            f"shared words cat dog plus unique{rep}x{i} token{rep * 100 + i * 7}"
            for i in range(64)
        ]
        expected = [np.asarray(tokenize([t])) for t in texts]

        def run(i, _texts=texts):
            return np.asarray(fast_tokenize([_texts[i]]))

        with ThreadPoolExecutor(8) as ex:
            outs = list(ex.map(run, range(len(texts))))
        for got, want in zip(outs, expected):
            np.testing.assert_array_equal(got, want)


def test_fuzz_matches_python_tokenizer():
    """Random mixed-script strings (same generator as the Python-vs-oracle
    fuzz) must agree between the C++ merge loop and the Python tokenizer —
    guards the UTF-8 pre-tokenizer paths the curated corpus misses."""
    from test_tokenizer import _random_unicode_strings

    batch = _random_unicode_strings(300, seed=321)
    np.testing.assert_array_equal(
        fast_tokenize(batch, truncate=True), tokenize(batch, truncate=True)
    )
