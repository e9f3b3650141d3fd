"""Training data pipeline: sharded tar reader + synthetic source + prefetch.

Replaces the reference's LaionCoco loader — a map-style dataset doing one
Azure blob GET per sample with 10 retries and 64 workers per rank
(dataset.py:95-150, training.py:60-62) — with the TPU-native shape: the
img2dataset output (generateDataset.sh:18) is ALREADY webdataset tar shards
({key}.jpg + {key}.txt pairs), so we stream those shards sequentially
(sequential reads, no per-sample roundtrips), decode+preprocess in a thread
pool, and prefetch batches ahead of the device.

Determinism/resume contract (the skip_first_batches equivalent,
training.py:131): shard order is a seeded permutation per epoch, sample order
within a shard is the tar's order, and ``start_batch`` fast-forwards by batch
index. Per-host sharding: host h reads shards with index % n_hosts == h.
"""

from __future__ import annotations

import io
import os
import queue
import tarfile
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

# The training pipeline tokenizes full global batches host-side; use the C++
# fast tokenizer when a toolchain is available (6-10x the Python loop at 32k
# captions/step), with transparent fallback.
from clip_mixer_tpu.text.fast import fast_tokenize as tokenize


class Batch(dict):
    """{"images": uint8 [B, H, W, 3], "texts": int32 [B, 77]}."""


class DataSource:
    """Protocol: iter_batches(epoch, start_batch) -> Iterator[Batch]."""

    def iter_batches(self, epoch: int, start_batch: int = 0) -> Iterator[Batch]:
        raise NotImplementedError

    @property
    def batches_per_epoch(self) -> Optional[int]:
        return None


class SyntheticSource(DataSource):
    """Deterministic procedurally-captioned data for smoke tests and
    benchmarking: class-colored noise images with matching captions, so a
    model can actually learn alignment from it."""

    def __init__(
        self,
        batch_size: int,
        image_size: int = 224,
        n_batches: int = 100,
        n_classes: int = 16,
        context_length: int = 77,
        seed: int = 0,
    ):
        self.batch_size = batch_size
        self.image_size = image_size
        self.n_batches = n_batches
        self.n_classes = n_classes
        self.seed = seed
        names = [
            "red square", "green circle", "blue triangle", "yellow star",
            "purple hexagon", "orange diamond", "cyan spiral", "magenta cross",
            "black arrow", "white ring", "brown leaf", "pink heart",
            "gray cloud", "teal wave", "gold crown", "silver moon",
        ]
        if n_classes > len(names):
            raise ValueError(f"n_classes <= {len(names)} (have {len(names)} caption names)")
        self.captions = [f"a photo of a {n}." for n in names[:n_classes]]
        self.tokens = tokenize(self.captions, context_length, truncate=True)
        rng = np.random.default_rng(seed)
        self.colors = rng.integers(30, 226, (n_classes, 3)).astype(np.int16)

    @property
    def batches_per_epoch(self) -> Optional[int]:
        return self.n_batches

    def iter_batches(self, epoch: int, start_batch: int = 0) -> Iterator[Batch]:
        for b in range(start_batch, self.n_batches):
            rng = np.random.default_rng((self.seed, epoch, b))
            classes = rng.integers(0, self.n_classes, self.batch_size)
            noise = rng.integers(-30, 30, (self.batch_size, self.image_size, self.image_size, 3))
            images = np.clip(self.colors[classes][:, None, None] + noise, 0, 255).astype(np.uint8)
            yield Batch(images=images, texts=self.tokens[classes])


def _concat_consuming(chunks: list) -> np.ndarray:
    """np.concatenate(chunks) at ~1x peak memory: preallocate the result,
    copy chunk by chunk, and drop each chunk as it's copied."""
    n = sum(c.shape[0] for c in chunks)
    out = np.empty((n,) + chunks[0].shape[1:], chunks[0].dtype)
    while chunks:
        c = chunks.pop()
        out[n - c.shape[0]:n] = c
        n -= c.shape[0]
    return out


class CacheSource(DataSource):
    """Decode-once, serve-from-host-RAM wrapper — the ``tf.data`` ``.cache()``
    analogue, and the TPU-native answer to a host whose JPEG-decode rate
    can't feed the chip (the reference leans on 64 DataLoader workers per
    rank, training.py:62; a single-core TPU host decodes ~250 imgs/s against
    a ~2000 imgs/s train step). First use materialises everything the inner
    source yields for epoch 0 — preprocessed uint8 images + token rows — into
    two preallocated host arrays; every epoch is then served as a fresh full
    permutation (the reference's DataLoader(shuffle=True) semantics,
    training.py:61 — stronger shuffling than the streaming reservoir the raw
    tar source approximates it with). Resume stays skip-by-count
    deterministic: batch b of epoch e is a pure function of (seed, e, b).

    Memory: N * (res² * 3 + 4 * context) bytes — 100k samples at 224px ≈
    15GB; the fill refuses to grow past ``max_bytes``. Only sensible when the
    dataset fits host RAM and repeats (epochs > 1); for single-pass streaming
    over a large corpus use the tar source directly.

    ``cache_dir`` makes the cache disk-backed (memmapped .npy files keyed by
    a fingerprint of the inner source's shards): later processes — a resumed
    run after a kill, a second experiment on the same data — skip the decode
    pass entirely and serve from the OS page cache. Writes go through a temp
    file + atomic rename, so an interrupted fill can never be mistaken for a
    complete cache.
    """

    def __init__(
        self,
        inner: DataSource,
        seed: int = 0,
        max_bytes: int = 64 << 30,
        cache_dir: Optional[str] = None,
    ):
        self.inner = inner
        self.seed = seed
        self.max_bytes = max_bytes
        if cache_dir is not None and "://" in str(cache_dir):
            # the cache is memmapped (np.load(mmap_mode="r")) — a remote URI
            # can never serve it, and raw os.path would silently create a
            # local "./gs:/..." directory instead (repo-wide gs:// rule)
            raise ValueError(
                f"cache_dir must be a local directory, got {cache_dir!r}; "
                "point --cache-data at local SSD (the cache is memmapped)"
            )
        self.cache_dir = cache_dir
        self.batch_size = inner.batch_size
        self._images: Optional[np.ndarray] = None
        self._texts: Optional[np.ndarray] = None

    def _fingerprint(self) -> str:
        """Identity of the decoded cache: the inner source's shard files
        (path + size) and the decode geometry. Per-host shard splits hash
        differently, so hosts sharing one cache_dir cannot collide."""
        import hashlib

        h = hashlib.sha256()
        for p in getattr(self.inner, "shards", []):
            try:
                st = os.stat(p)
                # mtime_ns too: a same-length caption edit inside a tar (or a
                # sidecar .txt rewrite) can leave the size unchanged
                h.update(f"{p}:{st.st_size}:{st.st_mtime_ns};".encode())
            except OSError:
                h.update(f"{p}:?;".encode())
        # FileListSource captions live OUTSIDE the shard files (manifest /
        # sidecars / dirnames) — hash them directly, they're already in RAM
        for _, caption in getattr(self.inner, "entries", []):
            h.update(caption.encode())
            h.update(b"\x00")
        h.update(f"res={getattr(self.inner, 'image_size', 0)};"
                 f"ctx={getattr(self.inner, 'context_length', 0)}".encode())
        return h.hexdigest()[:16]

    def _fill(self) -> None:
        if self.cache_dir is not None:
            fp = self._fingerprint()
            img_path = os.path.join(self.cache_dir, f"images-{fp}.npy")
            txt_path = os.path.join(self.cache_dir, f"texts-{fp}.npy")
            if os.path.exists(img_path) and os.path.exists(txt_path):
                self._images = np.load(img_path, mmap_mode="r")
                self._texts = np.load(txt_path, mmap_mode="r")
                return
        imgs, txts, total = [], [], 0
        # The fill must see EVERY sample: at large train batch sizes the
        # inner source's drop_last would silently discard up to batch_size-1
        # tail samples from the cache (the cache re-batches anyway).
        inner_drop_last = getattr(self.inner, "drop_last", None)
        if inner_drop_last is not None:
            self.inner.drop_last = False
        try:
            for batch in self.inner.iter_batches(epoch=0):
                imgs.append(batch["images"])
                txts.append(batch["texts"])
                total += batch["images"].nbytes + batch["texts"].nbytes
                if total > self.max_bytes:
                    raise MemoryError(
                        f"CacheSource: cache would exceed max_bytes={self.max_bytes}; "
                        "stream from the inner source instead or raise the budget"
                    )
        finally:
            if inner_drop_last is not None:
                self.inner.drop_last = inner_drop_last
        if not imgs:
            raise ValueError("CacheSource: inner source yielded no batches")
        # consume the batch lists while copying: np.concatenate would hold
        # batches + result alive together (~2x the dataset at peak — the
        # documented 15GB target case would OOM a 24GB host)
        self._images = _concat_consuming(imgs)
        self._texts = _concat_consuming(txts)
        if self.cache_dir is not None:
            os.makedirs(self.cache_dir, exist_ok=True)
            for path, arr in ((img_path, self._images), (txt_path, self._texts)):
                tmp = f"{path}.tmp{os.getpid()}.npy"
                with open(tmp, "wb") as f:
                    np.save(f, arr)
                os.replace(tmp, path)

    @property
    def n_samples(self) -> int:
        if self._images is None:
            self._fill()
        return self._images.shape[0]

    @property
    def batches_per_epoch(self) -> Optional[int]:
        return self.n_samples // self.batch_size

    def iter_batches(self, epoch: int, start_batch: int = 0) -> Iterator[Batch]:
        n = self.n_samples
        order = np.random.default_rng((self.seed, epoch, 3)).permutation(n)
        for b in range(start_batch, n // self.batch_size):
            # Sorted gather: batch COMPOSITION comes from the epoch
            # permutation; within-batch order is ascending. The contrastive
            # objectives are within-batch permutation-equivariant (labels are
            # arange(B) row-matched either way), and an ascending 4.8GB
            # gather is 21x faster than a random one on this host (3.7s vs
            # 78.5s — TLB/page locality), which is the difference between a
            # compute-bound and an input-bound 32k-batch step.
            idx = np.sort(order[b * self.batch_size : (b + 1) * self.batch_size])
            yield Batch(images=self._images[idx], texts=self._texts[idx])


def _decode_one(img_bytes: bytes, image_size: int) -> np.ndarray:
    from PIL import Image

    from clip_mixer_tpu.ops.preprocess import preprocess_pil

    with Image.open(io.BytesIO(img_bytes)) as im:
        return preprocess_pil(im, image_size)


class _DecodeError:
    """Captured per-sample decode failure (picklable across the process
    pool); resolved to raise-or-substitute on the consumer side."""

    def __init__(self, msg: str):
        self.msg = msg


def _decode_checked(img_bytes: bytes, caption: str, image_size: int):
    try:
        return _decode_one(img_bytes, image_size), caption
    except Exception as e:  # corrupt JPEG/PNG, truncated record, ...
        return _DecodeError(repr(e))


def _decode_chunk(args):
    """Decode a chunk of (bytes, caption) samples (one process-pool task —
    chunked so IPC overhead amortises across many images)."""
    samples, image_size = args
    return [_decode_checked(b, c, image_size) for b, c in samples]


class _RetryingStream(io.RawIOBase):
    """Sequential reader over a remote object (any fsspec scheme: gs://,
    s3://, file://, memory://) with bounded reconnect-and-resume retry.

    The reference re-fetches each failed SAMPLE up to 10 times
    (dataset.py:134-142); here the unit of IO is the shard stream, so the
    equivalent robustness is per-read: a dropped connection mid-shard
    reopens the object and seeks back to the exact byte offset already
    consumed — no sample is skipped or duplicated, keeping the
    deterministic skip-by-count resume contract intact.
    """

    def __init__(self, path: str, retries: int = 4, backoff: float = 0.5, open_fn=None):
        if open_fn is None:
            import fsspec

            open_fn = lambda: fsspec.open(path, "rb").open()  # noqa: E731
        self._open_fn = open_fn
        self._path = path
        self._retries = retries
        self._backoff = backoff
        self._pos = 0
        self._f = None
        self._reopen()

    def _reopen(self) -> None:
        if self._f is not None:
            try:
                self._f.close()
            except Exception:
                pass
        self._f = self._open_fn()
        if self._pos:
            self._f.seek(self._pos)

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        delay = self._backoff
        for attempt in range(self._retries + 1):
            try:
                data = self._f.read(len(b))
                n = len(data)
                b[:n] = data
                self._pos += n
                return n
            except Exception:
                if attempt == self._retries:
                    raise
                time.sleep(delay)
                delay *= 2
                try:
                    self._reopen()
                except Exception:
                    pass  # next loop iteration retries the reopen too
        raise AssertionError("unreachable")

    def close(self) -> None:
        if self._f is not None:
            try:
                self._f.close()
            except Exception:
                pass
        super().close()


def open_shard_stream(path: str, readahead_bytes: int = 16 << 20):
    """Readahead-buffered, retrying byte stream for a remote shard."""
    return io.BufferedReader(_RetryingStream(path), buffer_size=readahead_bytes)


def expand_shard_pattern(pattern: str) -> List[str]:
    """Glob a shard pattern, local or remote (any fsspec scheme)."""
    if "://" in pattern:
        import fsspec

        fs, _, paths = fsspec.get_fs_token_paths(pattern)
        return [fs.unstrip_protocol(p) for p in paths]
    import glob as _glob

    return sorted(_glob.glob(pattern))


class TarShardSource(DataSource):
    """Webdataset-style source over tar shards — local/NFS paths or remote
    URIs streamed directly (gs://, s3://, ... via fsspec with readahead and
    bounded mid-stream retry; no FUSE mount needed).

    Each shard holds {key}.jpg + {key}.txt pairs (img2dataset layout). Images
    are decoded with PIL and preprocessed host-side to fixed-size HWC uint8
    (the reference applies clip._transform in the dataloader worker,
    dataset.py:144-146); captions are tokenized host-side with truncation
    (training.py:154).
    """

    def __init__(
        self,
        shard_paths: Sequence[str],
        batch_size: int,
        image_size: int = 224,
        context_length: int = 77,
        seed: int = 0,
        n_hosts: int = 1,
        host_index: int = 0,
        decode_workers: int = 8,
        decode_mode: str = "thread",
        drop_last: bool = True,
        shuffle_buffer: int = 0,
        on_decode_error: str = "raise",
    ):
        """decode_mode: "thread" (PIL releases the GIL during JPEG decode;
        cheapest) or "process" (sidesteps the GIL entirely for the Python
        glue — measured numbers in SCALING.md; prefer it at high worker
        counts if thread scaling plateaus on the target host).

        shuffle_buffer: size of the streaming sample-shuffle buffer (0 = off).
        The reference trains with DataLoader(shuffle=True) over the whole
        dataset (training.py:61) — full random order every epoch. Sequential
        shard streaming cannot do that, so this is the standard webdataset
        answer: a bounded reservoir that yields a uniformly-random resident
        sample as each new one arrives. Seeded by (seed, epoch) only, so the
        stream stays a pure function of the epoch and the resume contract
        (skip-by-count fast-forward) is unchanged. Buffer bytes are raw JPEG
        (~30KB each; 20k buffer ~ 600MB host RAM); size it >= the per-shard
        sample count so consecutive batches mix across shards.

        on_decode_error: "raise" (default) fails the run on the first
        undecodable image; "substitute" replaces a corrupt (image, caption)
        PAIR with the nearest good pair in the same batch and counts it
        (``self.decode_errors``). Substitution — not drop-and-backfill —
        keeps every batch boundary aligned with raw sample counts, so the
        deterministic skip-by-count resume contract is untouched; the cost
        is a duplicated positive pair at the (rare) corrupt-record rate."""
        assert decode_mode in ("thread", "process"), decode_mode
        assert on_decode_error in ("raise", "substitute"), on_decode_error
        all_shards = sorted(shard_paths)
        if n_hosts > 1:
            # EQUAL shard counts per host: an uneven split (host 0 gets one
            # more shard) makes hosts yield different batch counts, and the
            # first host to exhaust its iterator leaves the others blocked
            # in the next step's collective — a silent pod hang. Trailing
            # shards beyond a multiple of n_hosts are dropped (standard
            # webdataset practice; shards are ~uniform by construction).
            per = len(all_shards) // n_hosts
            if per == 0:
                raise ValueError(f"{len(all_shards)} shards cannot feed {n_hosts} hosts")
            self.shards = all_shards[host_index::n_hosts][:per]
        else:
            self.shards = all_shards
        self.batch_size = batch_size
        self.image_size = image_size
        self.context_length = context_length
        self.seed = seed
        self.decode_workers = decode_workers
        self.decode_mode = decode_mode
        self.drop_last = drop_last
        self.shuffle_buffer = shuffle_buffer
        self.on_decode_error = on_decode_error
        self.decode_errors = 0  # substituted samples (on_decode_error="substitute")

    def _iter_samples(self, epoch: int) -> Iterator[Tuple[bytes, str]]:
        it = self._iter_shard_samples(epoch)
        if self.shuffle_buffer <= 1:
            return it
        return self._shuffled(it, epoch)

    def _shuffled(self, it: Iterator[Tuple[bytes, str]], epoch: int) -> Iterator[Tuple[bytes, str]]:
        """Bounded streaming shuffle: once the buffer fills, each incoming
        sample evicts (yields) a uniformly-random resident one; the tail is
        Fisher-Yates-drained. Deterministic per (seed, epoch)."""
        rng = np.random.default_rng((self.seed, epoch, 2))
        buf: List[Tuple[bytes, str]] = []
        for sample in it:
            buf.append(sample)
            if len(buf) >= self.shuffle_buffer:
                i = int(rng.integers(0, len(buf)))
                buf[i], buf[-1] = buf[-1], buf[i]
                yield buf.pop()
        for j in range(len(buf) - 1, 0, -1):  # drain: Fisher-Yates tail
            k = int(rng.integers(0, j + 1))
            buf[j], buf[k] = buf[k], buf[j]
        yield from buf

    def _iter_shard_samples(self, epoch: int) -> Iterator[Tuple[bytes, str]]:
        order = np.random.default_rng((self.seed, epoch)).permutation(len(self.shards))
        for si in order:
            path = self.shards[si]
            if "://" in path:
                # remote: sequential tar stream ("r|*": members read in
                # order, no random access) over the retrying readahead reader
                with open_shard_stream(path) as fobj, tarfile.open(
                    fileobj=fobj, mode="r|*"
                ) as tar:
                    yield from self._iter_tar_members(tar)
            else:
                with tarfile.open(path, "r") as tar:
                    yield from self._iter_tar_members(tar)

    @staticmethod
    def _iter_tar_members(tar) -> Iterator[Tuple[bytes, str]]:
        pending: Dict[str, Dict[str, bytes]] = {}
        for info in tar:
            if not info.isfile():
                continue
            key, ext = os.path.splitext(os.path.basename(info.name))
            if ext not in (".jpg", ".jpeg", ".png", ".txt"):
                continue
            entry = pending.setdefault(key, {})
            entry["img" if ext != ".txt" else "txt"] = tar.extractfile(info).read()
            if "img" in entry and "txt" in entry:
                yield entry["img"], entry["txt"].decode("utf-8", "replace")
                del pending[key]

    def _decode(self, sample: Tuple[bytes, str]):
        img_bytes, caption = sample
        return _decode_checked(img_bytes, caption, self.image_size)

    def _decode_batch(self, pool, raw):
        if self.decode_mode == "process":
            n = max(1, len(raw) // self.decode_workers)
            chunks = [(raw[i : i + n], self.image_size) for i in range(0, len(raw), n)]
            out: List[Tuple[np.ndarray, str]] = []
            for part in pool.map(_decode_chunk, chunks):
                out.extend(part)
        else:
            out = list(pool.map(self._decode, raw))
        bad = [i for i, d in enumerate(out) if isinstance(d, _DecodeError)]
        if not bad:
            return out
        if self.on_decode_error == "raise":
            raise RuntimeError(
                f"{len(bad)}/{len(out)} samples failed to decode "
                f"(first: {out[bad[0]].msg}); pass on_decode_error='substitute' "
                "to train through corrupt records"
            )
        if len(bad) == len(out):
            # nothing in-batch to substitute from: drop the whole batch
            # (raw-sample counts still advanced, so resume alignment holds)
            self.decode_errors += len(bad)
            import sys

            print(
                f"TarShardSource: dropped a batch of {len(out)} samples — "
                f"ALL failed to decode (first: {out[bad[0]].msg})",
                file=sys.stderr,
            )
            return None
        good = [i for i in range(len(out)) if not isinstance(out[i], _DecodeError)]
        for i in bad:
            out[i] = out[min(good, key=lambda g: abs(g - i))]
        first_errors = self.decode_errors == 0
        self.decode_errors += len(bad)
        if first_errors:
            import sys

            print(
                f"TarShardSource: substituted {len(bad)} undecodable sample(s) "
                "with in-batch neighbors (counted in .decode_errors; "
                "further substitutions are silent)",
                file=sys.stderr,
            )
        return out

    def iter_batches(self, epoch: int, start_batch: int = 0) -> Iterator[Batch]:
        if self.decode_mode == "process":
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            # spawn, not fork: this process has an initialized JAX backend
            # (sitecustomize imports jax at startup); forking after backend
            # init copies runtime mutexes mid-flight and can deadlock the
            # child (documented-unsupported by JAX).
            pool = ProcessPoolExecutor(
                self.decode_workers, mp_context=multiprocessing.get_context("spawn")
            )
        else:
            pool = ThreadPoolExecutor(self.decode_workers)
        try:
            it = self._iter_samples(epoch)
            skip = start_batch * self.batch_size
            while True:
                raw = []
                for sample in it:
                    if skip > 0:  # deterministic fast-forward without decoding
                        skip -= 1
                        continue
                    raw.append(sample)
                    if len(raw) == self.batch_size:
                        break
                if len(raw) < self.batch_size and (self.drop_last or not raw):
                    return
                decoded = self._decode_batch(pool, raw)
                if decoded is None:  # substitute mode, every sample corrupt
                    continue
                images = np.stack([d[0] for d in decoded])
                texts = tokenize([d[1] for d in decoded], self.context_length, truncate=True)
                yield Batch(images=images, texts=texts)
        finally:
            pool.shutdown(wait=False)


class FileListSource(TarShardSource):
    """(image file, caption) pairs from an explicit list, a CSV/TSV manifest
    (``from_csv``), or an image directory (``from_folder``) — the fine-tuning
    on-ramp: point ``--data`` at the dataset you already have instead of
    packing tar shards first (``write_tar_shards`` remains the right tool for
    large corpora, where sequential shard reads beat per-file opens).

    Everything TarShardSource documents is inherited — thread/process decode
    pool, deterministic skip-by-count resume, ``on_decode_error`` corrupt-
    record substitution — except sample order: with the whole manifest in
    memory this source draws a FULL per-epoch permutation (seeded by
    ``(seed, epoch)``), i.e. exactly the reference's ``DataLoader
    (shuffle=True)`` semantics (training.py:61) rather than the streaming
    reservoir approximation (``shuffle_buffer`` is accepted but pointless
    here). Per-host sharding splits the entry list round-robin at equal
    per-host counts (same pod-hang rationale as the shard split above).
    """

    def __init__(self, entries: Sequence[Tuple[str, str]], batch_size: int, **kwargs):
        entries = [(str(p), str(c)) for p, c in entries]
        if not entries:
            raise ValueError("FileListSource needs at least one (path, caption) entry")
        n_hosts = int(kwargs.pop("n_hosts", 1))
        host_index = int(kwargs.pop("host_index", 0))
        if n_hosts > 1:
            per = len(entries) // n_hosts
            if per == 0:
                raise ValueError(f"{len(entries)} entries cannot feed {n_hosts} hosts")
            entries = entries[host_index::n_hosts][:per]
        self.entries = entries
        super().__init__([p for p, _ in entries], batch_size, **kwargs)

    @property
    def batches_per_epoch(self) -> Optional[int]:
        full, rem = divmod(len(self.entries), self.batch_size)
        return full + (1 if rem and not self.drop_last else 0)

    def _iter_shard_samples(self, epoch: int) -> Iterator[Tuple[bytes, str]]:
        order = np.random.default_rng((self.seed, epoch)).permutation(len(self.entries))
        for i in order:
            path, caption = self.entries[i]
            try:
                with open(path, "rb") as f:
                    data = f.read()
            except OSError:
                if self.on_decode_error != "substitute":
                    raise
                # unreadable file ≈ undecodable bytes: keep the sample slot so
                # batch boundaries (and therefore resume-by-count) hold, and
                # let _decode_batch substitute an in-batch neighbor for it.
                data = b""
            yield data, caption

    _HEADER_PATH = ("filepath", "file", "image", "image_path", "img_path", "path", "url")
    _HEADER_CAPTION = ("caption", "text", "title", "label")

    @classmethod
    def from_csv(
        cls,
        manifest_path: str,
        batch_size: int,
        image_root: Optional[str] = None,
        delimiter: Optional[str] = None,
        **kwargs,
    ) -> "FileListSource":
        """Manifest file with (image path, caption) columns — the layout
        img2dataset and most caption datasets ship as metadata.

        * delimiter: inferred from the extension (.tsv → tab, else comma)
          unless given.
        * header: the first row is treated as a header iff ANY cell is a
          recognised path column name (filepath/file/image/...) — that cell
          becomes the path column; the caption column is then matched by
          name (caption/text/title/label), falling back to the first other
          column. A first row that resolves to no existing image and carries
          no recognised name is rejected with a clear error instead of being
          silently ingested as data.
        * remote entries (http(s)://) are rejected up front with a pointer
          at img2dataset / scripts/pack_dataset.py — this source only opens
          local paths, and in substitute mode a URL manifest would otherwise
          silently yield zero usable batches.
        * relative image paths resolve against ``image_root`` (default: the
          manifest's own directory).
        """
        import csv as _csv

        if delimiter is None:
            delimiter = "\t" if manifest_path.lower().endswith(".tsv") else ","
        root = (
            image_root
            if image_root is not None
            else os.path.dirname(os.path.abspath(manifest_path))
        )
        entries: List[Tuple[str, str]] = []
        with open(manifest_path, newline="", encoding="utf-8") as f:
            rows = _csv.reader(f, delimiter=delimiter)
            path_col, caption_col = 0, 1
            for lineno, row in enumerate(rows):
                if not row or (len(row) == 1 and not row[0].strip()):
                    continue
                if lineno == 0:
                    names = [c.strip().lower() for c in row]
                    path_hits = [j for j, n in enumerate(names) if n in cls._HEADER_PATH]

                    def _resolve(cell):
                        cell = cell.strip()
                        return cell if os.path.isabs(cell) else os.path.join(root, cell)

                    # A true header's cells are column NAMES — none of them
                    # is an existing file. A data row whose caption happens
                    # to be the literal word "image"/"file"/... must not be
                    # eaten as a header (its path cell resolves).
                    row_has_file = any(os.path.isfile(_resolve(c)) for c in row)
                    if path_hits and not row_has_file:  # header, ANY column order
                        path_col = path_hits[0]
                        caption_col = next(
                            (j for j, n in enumerate(names) if n in cls._HEADER_CAPTION),
                            0 if path_col != 0 else 1,
                        )
                        continue
                    # Header-like but unrecognised (e.g. "image_file,desc"):
                    # ingesting it as data swaps columns or trains on the
                    # header text, surfacing only as confusing decode errors.
                    # Only cells that don't even LOOK like paths qualify — a
                    # path-shaped cell (separator or image extension) whose
                    # file is merely missing stays a data row, which
                    # on_decode_error='substitute' explicitly supports.
                    cell = row[path_col].strip() if len(row) > path_col else ""
                    looks_like_path = ("/" in cell or os.sep in cell or
                                       cell.lower().endswith(
                                           (".jpg", ".jpeg", ".png", ".webp",
                                            ".bmp", ".gif", ".tif", ".tiff")))
                    if (cell and "://" not in cell and not looks_like_path
                            and not os.path.exists(_resolve(cell))):
                        raise ValueError(
                            f"{manifest_path}:1: first row is not a recognised "
                            f"header ({'/'.join(cls._HEADER_PATH)}) and its path "
                            f"cell does not resolve to a file ({_resolve(cell)}); "
                            "rename the header columns or fix image_root"
                        )
                if len(row) <= max(path_col, caption_col):
                    raise ValueError(
                        f"{manifest_path}:{lineno + 1}: need at least "
                        f"{max(path_col, caption_col) + 1} columns, got {len(row)}"
                    )
                p = row[path_col].strip()
                if p.startswith(("http://", "https://")):
                    raise ValueError(
                        f"{manifest_path}:{lineno + 1}: remote URLs are not "
                        "supported by FileListSource (it opens local paths "
                        "only) — download with img2dataset "
                        "(scripts/generate_dataset.py) or pack local files "
                        "with scripts/pack_dataset.py first"
                    )
                if not os.path.isabs(p):
                    p = os.path.join(root, p)
                entries.append((p, row[caption_col]))
        return cls(entries, batch_size, **kwargs)

    @classmethod
    def from_folder(
        cls,
        root: str,
        batch_size: int,
        caption_from: str = "txt",
        **kwargs,
    ) -> "FileListSource":
        """Recursive scan of ``root`` for .jpg/.jpeg/.png images (sorted, so
        the manifest — and with it the resume contract — is deterministic).

        caption_from:
        * "txt"     — sidecar ``<stem>.txt`` next to each image (the
          unpacked-webdataset layout); a missing sidecar is an error.
        * "dirname" — ``"a photo of a <parent dir>."`` (class-folder layout;
          underscores/dashes read as spaces).
        * "stem"    — the filename stem, underscores/dashes as spaces.
        """
        if caption_from not in ("txt", "dirname", "stem"):
            raise ValueError(f"caption_from must be txt|dirname|stem, got {caption_from!r}")
        images: List[str] = []
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for name in sorted(filenames):
                if os.path.splitext(name)[1].lower() in (".jpg", ".jpeg", ".png"):
                    images.append(os.path.join(dirpath, name))
        if not images:
            raise ValueError(f"no .jpg/.jpeg/.png images under {root}")
        entries: List[Tuple[str, str]] = []
        for path in images:
            if caption_from == "txt":
                sidecar = os.path.splitext(path)[0] + ".txt"
                if not os.path.exists(sidecar):
                    raise FileNotFoundError(
                        f"{path}: no sidecar caption {os.path.basename(sidecar)} "
                        "(use caption_from='dirname' or 'stem' for caption-less trees)"
                    )
                with open(sidecar, encoding="utf-8", errors="replace") as f:
                    caption = f.read().strip()
            elif caption_from == "dirname":
                label = os.path.basename(os.path.dirname(path)).replace("_", " ").replace("-", " ")
                caption = f"a photo of a {label}."
            else:
                stem = os.path.splitext(os.path.basename(path))[0]
                caption = stem.replace("_", " ").replace("-", " ")
            entries.append((path, caption))
        return cls(entries, batch_size, **kwargs)


class MixtureSource(TarShardSource):
    """Weighted mixture of tar-shard corpora, blended at the SAMPLE level.

    Production CLIP training blends datasets (e.g. LAION + curated sets);
    the reference trains on a single LAION-COCO subset (dataset.py:95-150)
    with no mixing story. Each batch draws every sample slot from component
    ``i`` with probability ``weights[i]`` via a seeded schedule, so batches
    interleave corpora at the configured ratio in expectation.

    Semantics:
    * Each component is a full TarShardSource stream (own per-epoch shard
      permutation, own shuffle reservoir, own per-host shard selection), so
      everything documented there applies per component.
    * A component that exhausts mid-epoch RESTARTS with a reshuffled shard
      order (sampling with replacement at the corpus level — the standard
      mixture semantic: small corpora repeat, ratios hold). The stream is
      therefore INFINITE: set ``TrainConfig.steps_per_epoch`` (train.py
      --steps-per-epoch) to define the epoch.
    * Determinism/resume contract unchanged: the whole stream is a pure
      function of (seed, epoch), so skip-by-count fast-forward works and
      kill-and-resume stays bitwise deterministic.
    """

    def __init__(
        self,
        components: Sequence[Sequence[str]],
        batch_size: int,
        weights: Optional[Sequence[float]] = None,
        **kwargs,
    ):
        """components: one shard-path list per corpus. weights: relative
        sampling weights (normalized; default uniform). Remaining kwargs are
        TarShardSource's (image_size, seed, n_hosts, shuffle_buffer, ...)."""
        if not components or any(not c for c in components):
            raise ValueError("every mixture component needs at least one shard")
        if weights is None:
            weights = [1.0] * len(components)
        if len(weights) != len(components) or any(w <= 0 for w in weights):
            raise ValueError(f"need {len(components)} positive weights, got {weights}")
        self.weights = np.asarray(weights, np.float64) / np.sum(weights)
        # Children own per-host shard selection + shuffle; the parent's
        # decode/batch/skip machinery runs on the blended sample stream
        # (n_hosts=1 here so the combined list isn't host-split twice).
        # The caller's shuffle_buffer is a HOST-RAM BUDGET: split it across
        # children proportional to sampling weight (it would otherwise
        # multiply by the component count — ~60KB/sample of raw JPEG adds up).
        total_buf = int(kwargs.get("shuffle_buffer", 0) or 0)
        self.children = []
        for paths, w in zip(components, self.weights):
            child_kwargs = dict(kwargs)
            if total_buf > 1:
                # floor 2: a 0/1 buffer silently disables shuffling for a
                # low-weight component the caller asked to shuffle
                child_kwargs["shuffle_buffer"] = max(2, int(round(total_buf * w)))
            self.children.append(TarShardSource(paths, batch_size, **child_kwargs))
        parent_kwargs = dict(kwargs, n_hosts=1, host_index=0)
        super().__init__([p for paths in components for p in paths], batch_size, **parent_kwargs)

    def _iter_samples(self, epoch: int) -> Iterator[Tuple[bytes, str]]:
        rng = np.random.default_rng((self.seed, epoch, 3))
        n = len(self.children)
        repeats = [0] * n
        iters = [c._iter_samples(epoch) for c in self.children]

        def _next(i):
            try:
                return next(iters[i])
            except StopIteration:
                # restart with a reshuffled shard order (distinct epoch key;
                # 1_000_003 just keeps repeat keys clear of real epoch ids)
                repeats[i] += 1
                iters[i] = self.children[i]._iter_samples(epoch + 1_000_003 * repeats[i])
                try:
                    return next(iters[i])
                except StopIteration:
                    raise RuntimeError(
                        f"mixture component {i} yielded no samples "
                        f"({len(self.children[i].shards)} shards)"
                    ) from None

        while True:
            # block draws amortise the rng over the 32k-sample batches
            for i in rng.choice(n, size=4096, p=self.weights):
                yield _next(int(i))


def prefetch(
    iterator: Iterator[Batch], depth: int = 2, stop: "threading.Event | None" = None
) -> Iterator[Batch]:
    """Run the upstream iterator in a background thread with a bounded queue
    so host data work overlaps device steps (the reference leans on
    DataLoader workers for this, training.py:60-62).

    ``stop``: optional externally-owned event; once set, a consumer blocked
    waiting on the queue stops waiting and the generator ends. Batches
    already queued are still yielded first. The Trainer passes its
    preemption flag here so a SIGTERM can interrupt a stalled data wait
    instead of arriving after the grace window has expired."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    worker_stop = threading.Event()

    def _put(item) -> bool:
        # Timed puts so an abandoned consumer (loop break / exception) can't
        # leave the worker blocked forever holding tar handles and decode
        # threads upstream.
        while not worker_stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:  # propagate to the consumer, don't swallow
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            if stop is None:
                item = q.get()
            else:
                try:
                    item = q.get(timeout=0.5)
                except queue.Empty:
                    if stop.is_set():
                        return
                    continue
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        worker_stop.set()


def write_tar_shards_from_files(
    entries: Sequence[Tuple[str, str]],
    out_dir: str,
    samples_per_shard: int = 10000,
) -> List[str]:
    """Pack (image file path, caption) entries into webdataset tar shards by
    RAW byte copy — no decode/re-encode, so pixels are untouched (unlike
    ``write_tar_shards``, which JPEG-re-encodes arrays). The bridge from a
    ``FileListSource``-shaped dataset (CSV manifest / image folder) to the
    sequential-read tar layout that feeds large runs; see
    ``scripts/pack_dataset.py`` for the CLI."""
    os.makedirs(out_dir, exist_ok=True)
    paths: List[str] = []
    tar = None
    try:
        for i, (src_path, caption) in enumerate(entries):
            if i % samples_per_shard == 0:
                if tar is not None:
                    tar.close()
                path = os.path.join(out_dir, f"{len(paths):05d}.tar")
                paths.append(path)
                tar = tarfile.open(path, "w")
            ext = os.path.splitext(src_path)[1].lower()
            if ext not in (".jpg", ".jpeg", ".png"):
                raise ValueError(f"{src_path}: only .jpg/.jpeg/.png can be packed")
            with open(src_path, "rb") as f:
                img = f.read()
            key = f"{i:09d}"
            for name, data in ((f"{key}{ext}", img), (f"{key}.txt", caption.encode())):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
    finally:
        if tar is not None:
            tar.close()
    return paths


def write_tar_shards(
    samples: Iterator[Tuple[np.ndarray, str]],
    out_dir: str,
    samples_per_shard: int = 10000,
    quality: int = 95,
) -> List[str]:
    """Dataset-prep utility: pack (HWC uint8 image, caption) pairs into
    webdataset tar shards (the generateDataset.sh / UnzipDataset role,
    dataset.py:153-189, pointed at local/GCS-fuse storage)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths: List[str] = []
    tar = None
    try:
        for i, (image, caption) in enumerate(samples):
            if i % samples_per_shard == 0:
                if tar is not None:
                    tar.close()
                path = os.path.join(out_dir, f"{len(paths):05d}.tar")
                paths.append(path)
                tar = tarfile.open(path, "w")
            key = f"{i:09d}"
            buf = io.BytesIO()
            Image.fromarray(image).save(buf, "JPEG", quality=quality)
            for name, data in ((f"{key}.jpg", buf.getvalue()), (f"{key}.txt", caption.encode())):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
    finally:
        if tar is not None:
            tar.close()
    return paths
