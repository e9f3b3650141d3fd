"""Loader/bindings for the C++ BPE tokenizer (fast_bpe.cpp).

Builds the shared library on first use (g++ -O2 -shared, cached beside the
source), exports the Unicode category bitmasks the C++ scanner needs, and
exposes :func:`fast_tokenize` with the exact contract of
``text.tokenize.tokenize``. Falls back to the Python tokenizer transparently
if no C++ toolchain is available (``is_available()``).

Normalization (ftfy / html-unescape / whitespace / lowercase) stays in
Python — it is cheap and full of library-specific behavior; the C++ side owns
the hot part: pre-tokenization scan + greedy merge loop + cache.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import sys
from typing import Optional, Sequence, Union

import numpy as np

from clip_mixer_tpu.text.bpe import get_tokenizer, normalize_text

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_bpe.cpp")
_MASK_CACHE = os.path.join(_DIR, "vocab", "unicode_masks.npz")
_N_CP = 0x110000


def _build_masks() -> dict:
    """Bitsets over all codepoints for \\p{L}, \\p{N}, \\s as the `regex`
    module defines them (the pre-tokenizer spec, simple_tokenizer.py:78)."""
    if os.path.exists(_MASK_CACHE):
        data = np.load(_MASK_CACHE)
        return {k: data[k] for k in ("letter", "number", "space")}
    import regex

    masks = {}
    for name, pat in (("letter", r"\p{L}"), ("number", r"\p{N}"), ("space", r"\s")):
        rx = regex.compile(pat)
        bits = np.zeros(_N_CP // 8, np.uint8)
        for cp in range(_N_CP):
            if 0xD800 <= cp <= 0xDFFF:
                continue
            if rx.match(chr(cp)):
                bits[cp >> 3] |= 1 << (cp & 7)
        masks[name] = bits
    try:
        np.savez_compressed(_MASK_CACHE, **masks)
    except OSError:
        pass
    return masks


def _so_path() -> str:
    return os.path.join(_DIR, f"_fast_bpe_{sys.platform}.so")


def _compile() -> str:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", so]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


class _FastBPE:
    def __init__(self):
        lib = ctypes.CDLL(_compile())
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_int] + [ctypes.c_void_p] * 6 + [ctypes.c_int32] * 2
        lib.bpe_clear_cache.restype = None
        lib.bpe_clear_cache.argtypes = [ctypes.c_void_p]
        lib.bpe_encode_batch.restype = ctypes.c_int
        lib.bpe_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p,
        ]
        self._lib = lib

        py = get_tokenizer()
        # Initial per-byte symbol ids from the Python tokenizer's tables: the
        # byte's mapped-unicode symbol id, and its </w> variant.
        from clip_mixer_tpu.text.bpe import byte_symbol_table

        sym = byte_symbol_table()
        init_nonfinal = np.asarray([py.token_to_id[sym[b]] for b in range(256)], np.int32)
        init_final = np.asarray([py.token_to_id[sym[b] + "</w>"] for b in range(256)], np.int32)
        # Merge triples: (id(a), id(b), id(a+b)) in rank order.
        n = len(py.rank)
        ma = np.zeros(n, np.int32)
        mb = np.zeros(n, np.int32)
        mo = np.zeros(n, np.int32)
        for (a, b), r in py.rank.items():
            ma[r] = py.token_to_id[a]
            mb[r] = py.token_to_id[b]
            mo[r] = py.token_to_id[a + b]
        masks = _build_masks()

        def ptr(arr):
            return arr.ctypes.data_as(ctypes.c_void_p)

        self._handle = lib.bpe_create(
            ptr(init_nonfinal),
            ptr(init_final),
            n,
            ptr(ma),
            ptr(mb),
            ptr(mo),
            ptr(masks["letter"]),
            ptr(masks["number"]),
            ptr(masks["space"]),
            py.sot_id,
            py.eot_id,
        )

    def encode_batch(self, texts: Sequence[str], context_length: int, truncate: bool) -> np.ndarray:
        normalized = [normalize_text(t).encode("utf-8") for t in texts]
        offsets = np.zeros(len(normalized) + 1, np.int64)
        np.cumsum([len(b) for b in normalized], out=offsets[1:])
        buf = b"".join(normalized)
        out = np.zeros((len(normalized), context_length), np.int32)
        rc = self._lib.bpe_encode_batch(
            self._handle,
            buf,
            offsets.ctypes.data_as(ctypes.c_void_p),
            len(normalized),
            context_length,
            int(truncate),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rc >= 0:
            raise RuntimeError(
                f"Input {texts[rc]} is too long for context length {context_length}"
            )
        return out


@functools.lru_cache()
def _instance() -> Optional[_FastBPE]:
    try:
        return _FastBPE()
    except (OSError, subprocess.CalledProcessError):
        return None


def is_available() -> bool:
    return _instance() is not None


def clear_cache() -> None:
    """Drop the C++ per-word memo (cold-start benchmarking / memory
    hygiene). No-op when the C++ core is unavailable."""
    inst = _instance()
    if inst is not None:
        inst._lib.bpe_clear_cache(inst._handle)


def fast_tokenize(
    texts: Union[str, Sequence[str]], context_length: int = 77, truncate: bool = False
) -> np.ndarray:
    """Drop-in tokenize(): C++ fast path, Python fallback."""
    if isinstance(texts, str):
        texts = [texts]
    inst = _instance()
    if inst is None:
        from clip_mixer_tpu.text.tokenize import tokenize

        return tokenize(texts, context_length, truncate)
    return inst.encode_batch(texts, context_length, truncate)
