"""Eval-dataset wrappers over HuggingFace datasets (host-side).

Port of the reference's dataset wrappers (training/clip/dataset.py:34-92):
STS canonicalises sick/mteb column names to (sentence_A, sentence_B,
relatedness_score) and lowercases+strips sentences; SST yields (sentence,
label); MNIST yields (PIL image, label).

All loaders are offline-gated: in a zero-egress environment load_dataset
raises and callers are expected to catch DatasetUnavailable and skip (the
validators do).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

STS_SETS = ["sick", "mteb/sts16-sts", "mteb/sts15-sts", "mteb/sts14-sts", "mteb/sts13-sts", "mteb/sts12-sts"]


class DatasetUnavailable(RuntimeError):
    pass


_REACHABLE: dict = {}  # one probe per (process, host)


def host_reachable(host: str, timeout: float = 5.0) -> bool:
    """One-shot DNS probe of ``host``. A zero-egress host fails resolution
    in milliseconds; without this the hub client retries 5x with backoff
    (~30s) PER DATASET, per validation pass — on a pod with periodic
    validation that compounds. getaddrinfo ignores socket timeouts, so the
    probe runs in a daemon thread with a hard join deadline (an unresolvable
    slow resolver counts as unreachable rather than hanging the trainer)."""
    if host not in _REACHABLE:
        import os
        import socket
        import threading

        if any(
            os.environ.get(k)
            for k in ("HTTPS_PROXY", "https_proxy", "HTTP_PROXY", "http_proxy",
                      "ALL_PROXY", "all_proxy")
        ):
            # Proxied hosts resolve names AT the proxy — a local
            # getaddrinfo failure says nothing. Let the client try.
            _REACHABLE[host] = True
            return True

        result = []

        def probe():
            try:
                socket.getaddrinfo(host, 443)
                result.append(True)
            except OSError:
                result.append(False)

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout)
        _REACHABLE[host] = bool(result and result[0])
    return _REACHABLE[host]


def _hub_reachable(timeout: float = 5.0) -> bool:
    return host_reachable("huggingface.co", timeout)


def _load(name: str, split: str):
    import os

    # Fast-path for offline environments — explicit (env) or auto-detected
    # (DNS probe): without this, the HF hub client retries 5x with backoff
    # (~30s) per dataset before failing. Offline mode still serves the local
    # arrow cache, so a previously-downloaded dataset keeps working.
    explicit = (
        os.environ.get("CLIP_MIXER_OFFLINE") == "1"
        or os.environ.get("HF_HUB_OFFLINE") == "1"
    )
    if explicit or not _hub_reachable():
        if explicit:
            # Only an explicit opt-in propagates to child processes; the
            # auto-detected case stays process-local (a transient resolver
            # failure must not poison every later subprocess via inherited
            # env).
            os.environ["HF_HUB_OFFLINE"] = "1"
            os.environ["HF_DATASETS_OFFLINE"] = "1"
        try:
            # The env vars are read at import time; if `datasets` is already
            # imported elsewhere in the process they are a no-op — flip the
            # live module config too so the retry/backoff path stays off.
            import datasets as _datasets

            _datasets.config.HF_DATASETS_OFFLINE = True
            _datasets.config.HF_HUB_OFFLINE = True
            # default download_mode (REUSE_DATASET_IF_EXISTS) loads the
            # PREPARED arrow cache instantly; reuse_cache_if_exists would
            # re-prepare from raw files on every call.
            return _datasets.load_dataset(name)[split]
        except Exception as e:
            raise DatasetUnavailable(f"offline and {name} not cached: {e}") from e
    try:
        from datasets import load_dataset

        return load_dataset(name)[split]
    except Exception as e:  # offline / missing dataset
        raise DatasetUnavailable(f"could not load {name}:{split}: {e}") from e


def sts_pairs(selected_set: str, split: str = "test") -> List[Tuple[str, str, float]]:
    """(sentence_a, sentence_b, gold_score) triples (dataset.py:34-52)."""
    ds = _load(selected_set, split)
    if selected_set == "sick":
        cols = ("sentence_A", "sentence_B", "relatedness_score")
    else:
        cols = ("sentence1", "sentence2", "score")
    a_col, b_col, s_col = cols
    return [
        (row[a_col].lower().strip(), row[b_col].lower().strip(), float(row[s_col]))
        for row in ds
    ]


def sst2_split(split: str) -> List[Tuple[str, int]]:
    """(sentence, label) pairs (dataset.py:58-70)."""
    ds = _load("sst2", split)
    return [(row["sentence"].lower().strip(), int(row["label"])) for row in ds]


def mnist_batches(split: str, batch_size: int, n_px: int = 224) -> Iterator[Tuple]:
    """Yields (uint8 [B, n_px, n_px, 3], int targets [B]) using the host
    preprocess (dataset.py:76-89 applies the CLIP transform to each digit)."""
    import numpy as np

    from clip_mixer_tpu.ops.preprocess import preprocess_pil

    ds = _load("mnist", split)
    images, targets = [], []
    for row in ds:
        images.append(preprocess_pil(row["image"], n_px))
        targets.append(int(row["label"]))
        if len(images) == batch_size:
            yield np.stack(images), np.asarray(targets)
            images, targets = [], []
    if images:
        yield np.stack(images), np.asarray(targets)
