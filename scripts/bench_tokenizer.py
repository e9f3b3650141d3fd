"""Tokenizer throughput benchmark: C++ core vs Python vs the reference oracle.

Closes the README/PARITY "C++ core 6-10x" claim with a committed measurement
(round-4 verdict item 8). Three legs over the SAME caption batch, all with
the identity-ftfy stub so normalization work is identical:

  oracle  — the reference SimpleTokenizer (/root/reference/training/clip/
            simple_tokenizer.py:10-132), its own encode() loop per caption
            exactly as clip.tokenize (clip.py:198-238) drives it;
  python  — clip_mixer_tpu.text.tokenize (pure-Python ClipBPE);
  cpp     — clip_mixer_tpu.text.fast.fast_tokenize (fast_bpe.cpp via ctypes),
            timed cold (fresh merge cache) and warm (cache populated —
            the steady state of a long training feed).

Captions come from the locally generated natural-ish dress shards when
present (real-ish word/punctuation statistics), else a deterministic
synthetic caption generator. Writes TOKENIZER_BENCH.json and prints one
JSON line.

Usage: python scripts/bench_tokenizer.py [--n 32768]
"""

import argparse
import json
import sys
import tarfile
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REFERENCE_CLIP = "/root/reference/training/clip"


def install_ftfy_stub():
    """Identity ftfy (same as tests/conftest.py) — both sides skip mojibake
    repair, keeping the comparison apples-to-apples."""
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub


def load_captions(n: int, shard_glob: str) -> tuple:
    """n captions: real .txt members from local tar shards if present,
    else deterministic synthetic captions."""
    caps = []
    if Path(shard_glob).is_absolute():
        shards = sorted(Path("/").glob(shard_glob.lstrip("/")))
    else:  # relative globs resolve against the cwd, like every other CLI
        shards = sorted(Path(".").glob(shard_glob))
    for shard in shards:
        try:
            with tarfile.open(shard) as tf:
                for m in tf:
                    if m.name.endswith(".txt"):
                        caps.append(tf.extractfile(m).read().decode("utf-8"))
                        if len(caps) >= n:
                            return caps, f"tar:{shard_glob}"
        except (OSError, tarfile.TarError):
            continue
    if caps:
        # repeat to length (still distinct work per caption for the BPE loop)
        reps = -(-n // len(caps))
        return (caps * reps)[:n], f"tar:{shard_glob} (repeated x{reps})"
    rng = np.random.default_rng(0)
    words = [
        "photo", "of", "a", "the", "small", "large", "red", "blue", "dog",
        "cat", "mountain", "city", "street", "vintage", "close-up", "person",
        "riding", "holding", "wooden", "table", "bright", "sunset", "ocean",
        "painting", "sketch", "illustration", "detailed", "background",
    ]
    caps = [
        " ".join(rng.choice(words, size=rng.integers(4, 16)).tolist()) + "."
        for _ in range(n)
    ]
    return caps, "synthetic"


def diverse_captions(n: int) -> list:
    """Worst-case-for-caching captions: mostly-unique random words (mixed
    case + punctuation), so nearly every word runs the full merge loop —
    the regime where the C++ core's advantage is largest."""
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    caps = []
    for _ in range(n):
        k = int(rng.integers(5, 14))
        words = []
        for _ in range(k):
            w = "".join(rng.choice(letters, size=int(rng.integers(3, 12))))
            if rng.random() < 0.15:
                w = w.capitalize()
            if rng.random() < 0.1:
                w += rng.choice([",", "!", "?", "'s"])
            words.append(w)
        caps.append(" ".join(words) + ".")
    return caps


def bench_one(caps: list, source: str, oracle) -> dict:
    """Time the three legs over one caption set. All three implementations
    memoize per word, so each leg starts from a cleared cache — the honest
    fresh-feed-process number; the C++ leg also reports warm steady state."""
    from clip_mixer_tpu.text import fast
    from clip_mixer_tpu.text.bpe import get_tokenizer
    from clip_mixer_tpu.text.tokenize import tokenize

    n = len(caps)
    # the reference's initial cache state (simple_tokenizer.py:77)
    oracle.cache = {t: t for t in ("<|startoftext|>", "<|endoftext|>")}
    t0 = time.perf_counter()
    oracle_ids = [oracle.encode(c) for c in caps]
    t_oracle = time.perf_counter() - t0

    get_tokenizer().clear_cache()
    t0 = time.perf_counter()
    py_out = tokenize(caps, truncate=True)
    t_python = time.perf_counter() - t0

    # cold = fresh merge cache (a fresh feed process), warm = steady state
    fast.clear_cache()
    t0 = time.perf_counter()
    cpp_out = fast.fast_tokenize(caps, truncate=True)
    t_cpp_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    cpp_out2 = fast.fast_tokenize(caps, truncate=True)
    t_cpp_warm = time.perf_counter() - t0

    # Correctness cross-check on the exact bench batch (golden tests cover
    # the corpus; this pins THIS measurement to matching outputs).
    assert (py_out == cpp_out).all() and (cpp_out == cpp_out2).all()
    sot, eot = 49406, 49407
    for i in range(0, n, max(1, n // 64)):  # spot-check vs the oracle
        ids = [sot] + oracle_ids[i][:75] + [eot]
        ids = ids[:77]
        if len(ids) == 77:
            ids[-1] = eot
        ref = np.zeros(77, np.int32)
        ref[: len(ids)] = ids
        assert (py_out[i] == ref).all(), f"mismatch vs oracle at {i}"

    return {
        "n_captions": n,
        "caption_source": source,
        "oracle_cps": round(n / t_oracle, 1),
        "python_cps": round(n / t_python, 1),
        "cpp_cold_cps": round(n / t_cpp_cold, 1),
        "cpp_warm_cps": round(n / t_cpp_warm, 1),
        "seconds": {
            "oracle": round(t_oracle, 3),
            "python": round(t_python, 3),
            "cpp_cold": round(t_cpp_cold, 3),
            "cpp_warm": round(t_cpp_warm, 3),
        },
        "speedup_cpp_cold_vs_python": round(t_python / t_cpp_cold, 2),
        "speedup_cpp_warm_vs_python": round(t_python / t_cpp_warm, 2),
        "speedup_cpp_cold_vs_oracle": round(t_oracle / t_cpp_cold, 2),
        "speedup_python_vs_oracle": round(t_oracle / t_python, 2),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32768, help="caption batch size")
    p.add_argument("--shards", default="root/data/dress/*.tar")
    p.add_argument("--out", default=str(REPO / "TOKENIZER_BENCH.json"))
    args = p.parse_args()

    install_ftfy_stub()

    from clip_mixer_tpu.text import fast

    assert fast.is_available(), "C++ tokenizer must build for this bench"
    # Load (and if needed compile) the shared library OUTSIDE the timed
    # region; the one throwaway word it caches is cleared per leg.
    fast.fast_tokenize(["warmup"], truncate=True)

    sys.path.insert(0, REFERENCE_CLIP)
    from simple_tokenizer import SimpleTokenizer  # reference, read-only

    oracle = SimpleTokenizer()

    real_caps, real_source = load_captions(args.n, args.shards)
    doc = {
        "legs": {
            # natural-ish templated captions: heavy word repetition, every
            # implementation's cache-friendly case
            "real_captions": bench_one(real_caps, real_source, oracle),
            # mostly-unique words: the merge loop dominates
            "diverse_captions": bench_one(
                diverse_captions(args.n), "synthetic-diverse", oracle
            ),
        }
    }
    Path(args.out).write_text(json.dumps(doc, indent=2))
    summary = {
        leg: {
            "cpp_cold_cps": d["cpp_cold_cps"],
            "x_vs_python": d["speedup_cpp_cold_vs_python"],
            "x_vs_oracle": d["speedup_cpp_cold_vs_oracle"],
        }
        for leg, d in doc["legs"].items()
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
