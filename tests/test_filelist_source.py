"""FileListSource: CSV/TSV manifests and image folders as training data.

The fine-tuning on-ramp — the reference's users point a DataLoader at a
map-style dataset of files (dataset.py:95-150 resolves one blob per sample);
here the same shape of dataset feeds the streaming pipeline without packing
tar shards first. Contract under test: decode/tokenize parity with
TarShardSource, full per-epoch permutation (the reference's
DataLoader(shuffle=True), training.py:61), deterministic skip-by-count
resume, equal disjoint per-host splits, and corrupt-record substitution.
"""

import csv
import os

import numpy as np
import pytest

from clip_mixer_tpu.data.pipeline import FileListSource
from clip_mixer_tpu.text.fast import fast_tokenize


def _write_images(root, n, size=24, captions=None, subdir=""):
    from PIL import Image

    rng = np.random.default_rng(42)
    d = os.path.join(str(root), subdir) if subdir else str(root)
    os.makedirs(d, exist_ok=True)
    entries = []
    for i in range(n):
        path = os.path.join(d, f"img_{i:03d}.jpg")
        Image.fromarray(
            rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        ).save(path, "JPEG", quality=95)
        cap = captions[i] if captions else f"caption number {i}"
        entries.append((path, cap))
    return entries


def test_entries_batches_and_determinism(tmp_path):
    entries = _write_images(tmp_path, 13)
    src = FileListSource(entries, batch_size=4, image_size=16, context_length=16)
    assert src.batches_per_epoch == 3  # drop_last
    a = list(src.iter_batches(epoch=0))
    assert len(a) == 3
    assert a[0]["images"].shape == (4, 16, 16, 3)
    assert a[0]["images"].dtype == np.uint8
    assert a[0]["texts"].shape == (4, 16)
    # same epoch twice: identical stream
    b = list(src.iter_batches(epoch=0))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_array_equal(x["texts"], y["texts"])
    # skip-by-count resume yields the identical tail
    c = list(src.iter_batches(epoch=0, start_batch=2))
    np.testing.assert_array_equal(a[2]["images"], c[0]["images"])
    np.testing.assert_array_equal(a[2]["texts"], c[0]["texts"])
    # different epochs permute differently (13! orders; collision ~0)
    d = next(iter(src.iter_batches(epoch=1)))
    assert not np.array_equal(a[0]["texts"], d["texts"])
    # ...but cover the same multiset of captions across the epoch
    drop = 13 % 4

    def seen(batches):
        return sorted(t.tobytes() for bt in batches for t in bt["texts"])

    full = list(src.iter_batches(epoch=1))
    assert len(seen(full)) == 13 - drop


def test_tokenization_matches_manifest_captions(tmp_path):
    caps = [f"a photo of thing {i}" for i in range(8)]
    entries = _write_images(tmp_path, 8, captions=caps)
    src = FileListSource(entries, batch_size=8, image_size=16, context_length=16)
    (batch,) = list(src.iter_batches(epoch=3))
    want = fast_tokenize(caps, 16, truncate=True)
    # epoch permutation reorders rows; compare as multisets of token rows
    assert sorted(r.tobytes() for r in batch["texts"]) == sorted(
        r.tobytes() for r in want
    )


def test_host_split_equal_and_disjoint(tmp_path):
    entries = _write_images(tmp_path, 11)
    srcs = [
        FileListSource(entries, batch_size=2, image_size=16, context_length=16,
                       n_hosts=2, host_index=h)
        for h in range(2)
    ]
    # 11 entries over 2 hosts: 5 each, one dropped — equal counts (pod-hang rule)
    assert len(srcs[0].entries) == len(srcs[1].entries) == 5
    assert not set(p for p, _ in srcs[0].entries) & set(p for p, _ in srcs[1].entries)
    with pytest.raises(ValueError):
        FileListSource(entries[:1], batch_size=1, n_hosts=2, host_index=0)


def test_from_csv_header_and_relative_paths(tmp_path):
    entries = _write_images(tmp_path, 6)
    manifest = tmp_path / "data.csv"
    with open(manifest, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filepath", "caption"])  # header detected by column name
        for p, c in entries:
            w.writerow([os.path.basename(p), c])  # relative to the manifest dir
    src = FileListSource.from_csv(str(manifest), batch_size=3, image_size=16,
                                  context_length=16)
    assert sorted(p for p, _ in src.entries) == sorted(p for p, _ in entries)
    assert len(list(src.iter_batches(epoch=0))) == 2

    # TSV + no header + extra columns: positional (0, 1)
    tsv = tmp_path / "data.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        for p, c in entries:
            w.writerow([p, c, "ignored-extra-column"])
    src2 = FileListSource.from_csv(str(tsv), batch_size=3, image_size=16,
                                   context_length=16)
    assert src2.entries[0][1] == entries[0][1]

    # short row: clear error with the line number
    bad = tmp_path / "bad.csv"
    bad.write_text("only_one_column\n")
    with pytest.raises(ValueError, match="bad.csv:1"):
        FileListSource.from_csv(str(bad), batch_size=1)


def test_from_folder_sidecar_and_dirname(tmp_path):
    entries = _write_images(tmp_path, 4, subdir="golden_retriever")
    for p, c in entries:
        with open(os.path.splitext(p)[0] + ".txt", "w") as f:
            f.write(c + "\n")
    src = FileListSource.from_folder(str(tmp_path), batch_size=2, image_size=16,
                                     context_length=16)
    assert sorted(c for _, c in src.entries) == sorted(c for _, c in entries)

    dn = FileListSource.from_folder(str(tmp_path), batch_size=2, image_size=16,
                                    context_length=16, caption_from="dirname")
    assert dn.entries[0][1] == "a photo of a golden retriever."

    st = FileListSource.from_folder(str(tmp_path), batch_size=2,
                                    caption_from="stem")
    assert st.entries[0][1] == "img 000"

    # missing sidecar is an explicit error in txt mode
    os.remove(os.path.splitext(entries[0][0])[0] + ".txt")
    with pytest.raises(FileNotFoundError):
        FileListSource.from_folder(str(tmp_path), batch_size=2)
    with pytest.raises(ValueError):
        FileListSource.from_folder(str(tmp_path / "empty"), batch_size=2)


def test_corrupt_and_missing_files_substitute(tmp_path):
    entries = _write_images(tmp_path, 8)
    # one corrupt image, one vanished file
    with open(entries[2][0], "wb") as f:
        f.write(b"not a jpeg at all")
    os.remove(entries[5][0])

    strict = FileListSource(entries, batch_size=8, image_size=16, context_length=16)
    with pytest.raises((RuntimeError, OSError)):
        list(strict.iter_batches(epoch=0))

    lenient = FileListSource(entries, batch_size=8, image_size=16, context_length=16,
                             on_decode_error="substitute")
    (batch,) = list(lenient.iter_batches(epoch=0))
    assert batch["images"].shape == (8, 16, 16, 3)
    assert lenient.decode_errors == 2


def test_pack_dataset_roundtrip(tmp_path):
    """scripts/pack_dataset.py bridge: manifest -> raw-byte tar shards ->
    TarShardSource yields the same decoded samples FileListSource does
    (raw copy, so pixels are bit-identical)."""
    import subprocess
    import sys as _sys

    from clip_mixer_tpu.data.pipeline import TarShardSource

    caps = [f"pack caption {i}" for i in range(9)]
    entries = _write_images(tmp_path / "src", 9, captions=caps)
    manifest = tmp_path / "m.csv"
    with open(manifest, "w", newline="") as f:
        w = csv.writer(f)
        for p, c in entries:
            w.writerow([p, c])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "pack_dataset.py"),
         "--data", str(manifest), "--out", str(tmp_path / "shards"),
         "--samples-per-shard", "4"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "9 samples into 3 shard(s)" in out.stdout

    shards = sorted(str(p) for p in (tmp_path / "shards").glob("*.tar"))
    tar_src = TarShardSource(shards, batch_size=9, image_size=16, context_length=16,
                             seed=123)
    fl_src = FileListSource(entries, batch_size=9, image_size=16, context_length=16,
                            seed=123)
    (a,) = list(tar_src.iter_batches(epoch=0))
    (b,) = list(fl_src.iter_batches(epoch=0))
    # orders differ (shard permutation vs entry permutation): compare multisets
    key = lambda img, txt: (img.tobytes(), txt.tobytes())
    assert sorted(key(i, t) for i, t in zip(a["images"], a["texts"])) == sorted(
        key(i, t) for i, t in zip(b["images"], b["texts"])
    )

    # gs:// --out is rejected, not silently written to ./gs:/
    bad = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "pack_dataset.py"),
         "--data", str(manifest), "--out", "gs://bucket/shards"],
        capture_output=True, text=True, timeout=60,
    )
    assert bad.returncode != 0 and "GCS-fuse" in bad.stderr


def test_from_csv_reordered_and_unrecognised_headers(tmp_path):
    """Header detection must not depend on column order, and a header-like
    first row with unrecognised names must fail loudly instead of being
    ingested as a (column-swapped) data row."""
    entries = _write_images(tmp_path, 4)

    # reordered header: caption first, path second
    manifest = tmp_path / "reordered.csv"
    with open(manifest, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["caption", "filepath"])
        for p, c in entries:
            w.writerow([c, os.path.basename(p)])
    src = FileListSource.from_csv(str(manifest), batch_size=2, image_size=16,
                                  context_length=16)
    assert sorted(p for p, _ in src.entries) == sorted(p for p, _ in entries)
    assert src.entries[0][1] == entries[0][1]
    assert len(list(src.iter_batches(epoch=0))) == 2

    # unrecognised header names: clear error, not silent column swap
    bad = tmp_path / "unrecognised.csv"
    with open(bad, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_file", "desc"])
        for p, c in entries:
            w.writerow([p, c])
    with pytest.raises(ValueError, match="not a recognised header"):
        FileListSource.from_csv(str(bad), batch_size=2)


def test_from_csv_rejects_remote_urls(tmp_path):
    """A URL manifest (img2dataset metadata) must fail at construction with
    an actionable message — FileListSource only opens local paths, and in
    substitute mode every URL row would otherwise decay to b'' and the epoch
    would silently yield zero batches."""
    manifest = tmp_path / "urls.csv"
    with open(manifest, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "caption"])
        w.writerow(["https://example.com/cat.jpg", "a cat"])
    with pytest.raises(ValueError, match="img2dataset|pack_dataset"):
        FileListSource.from_csv(str(manifest), batch_size=1)


def test_from_csv_caption_named_like_header_is_data(tmp_path):
    """A headerless manifest whose first CAPTION is literally 'image' (or
    any recognised column name) must stay a data row: the path cell resolves
    to a real file, so the row cannot be a header. Regression: header
    detection once matched ANY cell, dropping the first sample and swapping
    the columns for the whole manifest."""
    entries = _write_images(tmp_path, 3)
    manifest = tmp_path / "tricky.csv"
    with open(manifest, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([os.path.basename(entries[0][0]), "image"])  # caption = 'image'
        for p, c in entries[1:]:
            w.writerow([os.path.basename(p), c])
    src = FileListSource.from_csv(str(manifest), batch_size=3, image_size=16,
                                  context_length=16)
    assert len(src.entries) == 3  # first row kept as data
    assert src.entries[0] == (entries[0][0], "image")
    assert src.entries[1][1] == entries[1][1]  # columns NOT swapped


def test_from_csv_missing_first_file_stays_data_row(tmp_path):
    """Headerless manifest whose FIRST image was deleted: the cell is
    path-shaped, so it must be ingested as a data row (substitute mode
    explicitly supports unreadable files) — not rejected as an unrecognised
    header at construction time."""
    entries = _write_images(tmp_path, 3)
    manifest = tmp_path / "gone.csv"
    with open(manifest, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["deleted/gone_0001.jpg", "a vanished photo"])
        for p, c in entries:
            w.writerow([os.path.basename(p), c])
    src = FileListSource.from_csv(str(manifest), batch_size=4, image_size=16,
                                  context_length=16, on_decode_error="substitute")
    assert len(src.entries) == 4
    [batch] = list(src.iter_batches(epoch=0))
    assert batch["images"].shape[0] == 4  # substituted, not aborted
