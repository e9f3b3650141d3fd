"""CLIP byte-level BPE tokenizer (host-side, pure Python).

Re-implements the semantics of the reference tokenizer
(training/clip/simple_tokenizer.py:10-132) from scratch:

* text cleanup: ftfy mojibake repair (optional here — gated import), double
  HTML-unescape, whitespace collapse, lowercase (reference :50-59,123);
* regex pre-tokenizer with contraction / letter / digit / other classes
  (reference :78 — the pattern string is the spec, kept identical);
* greedy lowest-rank merge loop over byte-level symbols with a ``</w>``
  end-of-word marker and per-token memoisation (reference :80-119);
* vocabulary = 256 byte symbols + 256 ``</w>`` byte symbols + 48,894 merges
  + 2 specials = 49,408 entries (reference :66-74).

The merge table is the reference's gzipped asset, shipped verbatim under
``vocab/`` (pure data). Tokenisation is host CPU work; the accelerated path
consumes the resulting ``int32 [N, 77]`` arrays.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Dict, List, Tuple

import regex

try:  # ftfy is optional in this environment; identity fallback otherwise.
    import ftfy

    _fix_text = ftfy.fix_text
except ImportError:  # pragma: no cover - environment dependent
    def _fix_text(s: str) -> str:
        return s

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"
_END = "</w>"

# Same token classes as the reference pattern (simple_tokenizer.py:78).
_PRETOKENIZE = regex.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
    regex.IGNORECASE,
)


@functools.lru_cache()
def default_vocab_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "vocab", "bpe_simple_vocab_16e6.txt.gz")


@functools.lru_cache()
def byte_symbol_table() -> Dict[int, str]:
    """Invertible byte -> printable-unicode map (GPT-2 scheme).

    Printable latin bytes map to themselves; the rest are displaced to
    256+k so no symbol is whitespace/control (simple_tokenizer.py:16-35).
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table: Dict[int, str] = {b: chr(b) for b in keep}
    offset = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + offset)
            offset += 1
    return table


def normalize_text(text: str) -> str:
    """Cleanup applied before pre-tokenisation (simple_tokenizer.py:50-59,123)."""
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    text = regex.sub(r"\s+", " ", text.strip())
    return text.strip().lower()


class ClipBPE:
    """Greedy byte-level BPE with the CLIP merge table."""

    def __init__(self, vocab_path: str | None = None):
        vocab_path = vocab_path or default_vocab_path()
        with gzip.open(vocab_path) as f:
            lines = f.read().decode("utf-8").split("\n")
        # Line 0 is a version header; the usable merge list is truncated so the
        # final vocab lands exactly at 49,408 (simple_tokenizer.py:66-67).
        n_merges = 49152 - 256 - 2
        merge_pairs: List[Tuple[str, str]] = []
        for line in lines[1 : 1 + n_merges]:
            a, b = line.split()
            merge_pairs.append((a, b))

        base = list(byte_symbol_table().values())
        tokens = base + [s + _END for s in base]
        tokens += ["".join(p) for p in merge_pairs]
        tokens += [SOT, EOT]
        self.token_to_id: Dict[str, int] = {t: i for i, t in enumerate(tokens)}
        self.id_to_token: Dict[int, str] = {i: t for t, i in self.token_to_id.items()}
        self.rank: Dict[Tuple[str, str], int] = {p: i for i, p in enumerate(merge_pairs)}
        self._byte_enc = byte_symbol_table()
        self._byte_dec = {v: k for k, v in self._byte_enc.items()}
        self._cache: Dict[str, List[str]] = {SOT: [SOT], EOT: [EOT]}

    def clear_cache(self) -> None:
        """Reset the per-word memo to its initial state (cold-start
        benchmarking / memory hygiene on unbounded unique text)."""
        self._cache = {SOT: [SOT], EOT: [EOT]}

    @property
    def vocab_size(self) -> int:
        return len(self.token_to_id)

    @property
    def sot_id(self) -> int:
        return self.token_to_id[SOT]

    @property
    def eot_id(self) -> int:
        return self.token_to_id[EOT]

    def _merge_word(self, token: str) -> List[str]:
        """Apply merges greedily by ascending rank (simple_tokenizer.py:80-119)."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        # Seed symbols: each char, last one carrying the end-of-word marker.
        symbols = list(token[:-1]) + [token[-1] + _END]
        if len(symbols) == 1:
            self._cache[token] = symbols
            return symbols

        while len(symbols) > 1:
            # Find the adjacent pair with the lowest merge rank.
            best_rank = None
            best_pos = -1
            for i in range(len(symbols) - 1):
                r = self.rank.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pos = r, i
            if best_rank is None:
                break
            first, second = symbols[best_pos], symbols[best_pos + 1]
            # Merge EVERY adjacent occurrence of this pair in one sweep, as the
            # reference's inner while-loop does (simple_tokenizer.py:94-110).
            out: List[str] = []
            i = 0
            while i < len(symbols):
                if i < len(symbols) - 1 and symbols[i] == first and symbols[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
        self._cache[token] = symbols
        return symbols

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for raw in _PRETOKENIZE.findall(normalize_text(text)):
            mapped = "".join(self._byte_enc[b] for b in raw.encode("utf-8"))
            ids.extend(self.token_to_id[s] for s in self._merge_word(mapped))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.id_to_token[int(i)] for i in ids)
        data = bytearray(self._byte_dec[c] for c in text if c in self._byte_dec)
        return data.decode("utf-8", errors="replace").replace(_END, " ")


@functools.lru_cache()
def get_tokenizer() -> ClipBPE:
    return ClipBPE()
