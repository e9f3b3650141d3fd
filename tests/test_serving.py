"""Serving gates: HTTP endpoints over a real socket + micro-batcher."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.serving import InferenceEngine, MicroBatcher, serve

CFG = CLIPConfig(
    embed_dim=16,
    image_resolution=32,
    vision_layers=1,
    vision_width=32,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    text_width=32,
    text_heads=1,
    text_layers=1,
    tower="mixer",
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def server_port():
    params = clip_model.init(jax.random.key(0), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4, 8))
    engine.load_classifier(["cat", "dog", "bird"], ["a photo of a {}."])
    srv = serve(engine, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield port
    srv.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _png_b64(seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_healthz(server_port):
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/healthz") as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    # observability fields: numeric path per tower + program provenance
    assert h["paths"] == {"image": "float", "text": "float"}
    assert h["frozen"] is False
    assert h["buckets"] == [4, 8] and h["embed_dim"] == 16


def test_encode_text_endpoint(server_port):
    code, out = _post(server_port, "/encode_text", {"texts": ["a cat", "a dog"]})
    assert code == 200
    feats = np.asarray(out["features"])
    assert feats.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-4)


def test_encode_image_and_classify(server_port):
    imgs = [_png_b64(0), _png_b64(1)]
    code, out = _post(server_port, "/encode_image", {"images_b64": imgs})
    assert code == 200
    assert np.asarray(out["features"]).shape == (2, 16)

    code, out = _post(server_port, "/classify", {"images_b64": imgs, "top_k": 2})
    assert code == 200
    assert len(out["results"]) == 2
    top = out["results"][0]
    assert len(top) == 2 and {"label", "prob"} <= set(top[0])
    assert top[0]["label"] in ("cat", "dog", "bird")


def test_bad_request(server_port):
    code, out = _post(server_port, "/encode_text", {"wrong_key": []})
    assert code == 400 and "bad request" in out["error"]
    code, out = _post(server_port, "/nope", {})
    assert code == 404


def test_batching_pads_to_buckets(server_port):
    # 5 texts with buckets (4, 8): one bucket-8 run; results must match
    # a 2-text call exactly (padding must not leak into outputs).
    code5, out5 = _post(server_port, "/encode_text", {"texts": ["a", "b", "c", "d", "e"]})
    assert code5 == 200, out5
    code2, out2 = _post(server_port, "/encode_text", {"texts": ["a", "b"]})
    assert code2 == 200, out2
    np.testing.assert_allclose(
        np.asarray(out5["features"])[:2], np.asarray(out2["features"]), atol=1e-5
    )


def test_micro_batcher_merges_and_returns_per_item():
    calls = []

    def fn(batch):
        calls.append(batch.shape[0])
        return batch * 2.0

    mb = MicroBatcher(fn, max_batch=8, max_wait_ms=50.0)
    items = [np.full((3,), float(i)) for i in range(6)]
    results = [None] * 6

    def worker(i):
        results[i] = mb.submit(items[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):
        np.testing.assert_array_equal(results[i], items[i] * 2.0)
    assert sum(calls) == 6
    assert max(calls) > 1  # at least one merged batch


def test_enable_int8_serving_path():
    params = clip_model.init(jax.random.key(1), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4,))
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    f_bf = engine.encode_image_arrays(imgs)
    engine.enable_int8(imgs)
    f_q = engine.encode_image_arrays(imgs)
    cos = (f_bf * f_q).sum(-1)
    assert cos.min() > 0.995  # both unit-norm
    # text path still works on the quantized param tree
    t = engine.encode_text(["a cat"])
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, rtol=1e-4)


def test_empty_inputs(server_port):
    code, out = _post(server_port, "/encode_text", {"texts": []})
    assert code == 200 and out["features"] == []


def test_non_image_bytes_is_bad_request(server_port):
    blob = base64.b64encode(b"hello, not an image").decode()
    code, out = _post(server_port, "/encode_image", {"images_b64": [blob]})
    assert code == 400 and "bad request" in out["error"]


def test_concurrent_single_image_posts_coalesce(server_port):
    results = [None] * 4

    def worker(i):
        results[i] = _post(server_port, "/encode_image", {"images_b64": [_png_b64(i)]})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for code, out in results:
        assert code == 200
        assert np.asarray(out["features"]).shape == (1, 16)
    # same image via the batch path gives the same features
    code, direct = _post(server_port, "/encode_image", {"images_b64": [_png_b64(0)]})
    np.testing.assert_allclose(
        np.asarray(results[0][1]["features"]), np.asarray(direct["features"]), atol=1e-5
    )


def test_enable_int8_with_text():
    params = clip_model.init(jax.random.key(3), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4,))
    t_bf = engine.encode_text(["a photo of a cat"])
    rng = np.random.default_rng(0)
    engine.enable_int8(
        rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8),
        sample_texts=["a photo of a cat", "a dog running"],
    )
    t_q = engine.encode_text(["a photo of a cat"])
    assert float((t_bf * t_q).sum(-1)[0]) > 0.995


def test_enable_int8_transformer_preset_full():
    """int8 serving now covers ALL non-ResNet presets: transformer vision AND
    text towers are quantized when sample_texts is given."""
    cfg = CFG.replace(tower="transformer", vision_width=64, text_width=64)
    params = clip_model.init(jax.random.key(4), cfg)
    engine = InferenceEngine(params, cfg, batch_buckets=(4,))
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    f_bf = engine.encode_image_arrays(imgs)
    t_bf = engine.encode_text(["a photo of a cat"])
    engine.enable_int8(imgs, sample_texts=["a photo of a cat", "a dog running"])
    f_q = engine.encode_image_arrays(imgs)
    t_q = engine.encode_text(["a photo of a cat"])
    assert (f_bf * f_q).sum(-1).min() > 0.99
    assert float((t_bf * t_q).sum(-1)[0]) > 0.99


def test_mesh_engine_matches_single_device():
    """A mesh-backed engine (batch sharded over all local devices, params
    replicated) must produce the same features as the single-device engine —
    bf16/int8 paths included — and round its buckets up to shard evenly."""
    from jax.sharding import Mesh

    params = clip_model.init(jax.random.key(1), CFG)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (10, 32, 32, 3), dtype=np.uint8)
    texts = ["a cat", "a dog on a mat", "hello world"]

    single = InferenceEngine(params, CFG, batch_buckets=(4, 8))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    meshed = InferenceEngine(params, CFG, batch_buckets=(2, 4, 6, 8), mesh=mesh)
    assert meshed.buckets == [4, 8]  # 2->4, 6->8: multiples of 4 devices

    np.testing.assert_allclose(
        single.encode_image_arrays(imgs), meshed.encode_image_arrays(imgs),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_allclose(
        single.encode_text(texts), meshed.encode_text(texts), rtol=0, atol=1e-6
    )

    # int8 path under the mesh: qparams placed replicated, batch sharded
    single.enable_int8(imgs[:4], sample_texts=texts)
    meshed.enable_int8(imgs[:4], sample_texts=texts)
    np.testing.assert_allclose(
        single.encode_image_arrays(imgs), meshed.encode_image_arrays(imgs),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_allclose(
        single.encode_text(texts), meshed.encode_text(texts), rtol=0, atol=1e-6
    )


def test_warmup_compiles_all_buckets():
    """warmup() runs every bucket on both towers without error, including
    on the int8 path, and requests after it return the same features."""
    params = clip_model.init(jax.random.key(3), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4, 8))
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    engine.enable_int8(imgs)
    engine.warmup()
    feats = engine.encode_image_arrays(imgs)
    assert feats.shape == (4, CFG.embed_dim) and np.all(np.isfinite(feats))


def test_metrics_endpoint(server_port):
    """GET /metrics: per-endpoint counters + latency quantiles, errors
    counted separately."""
    _post(server_port, "/encode_text", {"texts": ["warm"]})
    _post(server_port, "/encode_text", {"wrong_key": []})  # a 400
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/metrics") as r:
        m = json.loads(r.read())["endpoints"]
    et = m["/encode_text"]
    assert et["count"] >= 2 and et["errors"] >= 1
    assert et["p50_ms"] is not None and et["p99_ms"] >= et["p50_ms"] >= 0


def test_oversized_body_rejected(server_port):
    """A hostile/runaway Content-Length is refused up front (413), not read
    into memory."""
    import clip_mixer_tpu.serving as serving_mod

    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/encode_text",
        data=b'{"texts": []}',
        headers={"Content-Type": "application/json"},
    )
    # lie about the length: the server must refuse before reading
    req.add_unredirected_header("Content-Length", str(serving_mod.MAX_BODY_BYTES + 1))
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 413
        assert "exceeds" in json.loads(e.read())["error"]
    except TimeoutError:
        assert False, "server tried to read the claimed body instead of refusing"


def test_retrieval_index_and_endpoint(server_port):
    """POST /index builds a feature bank; POST /retrieve returns top-k ids
    by cosine; querying before indexing is a 409."""
    code, out = _post(server_port, "/retrieve", {"texts": ["anything"]})
    assert code == 409 and "no index" in out["error"]

    ids = ["img-a", "img-b", "img-c"]
    code, out = _post(
        server_port, "/index",
        {"images_b64": [_png_b64(10), _png_b64(11), _png_b64(12)], "ids": ids},
    )
    assert code == 200 and out["indexed"] == 3

    code, out = _post(server_port, "/retrieve", {"texts": ["a photo", "noise"], "top_k": 2})
    assert code == 200 and len(out["results"]) == 2
    top = out["results"][0]
    assert len(top) == 2 and top[0]["id"] in ids
    assert top[0]["score"] >= top[1]["score"]

    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/healthz") as r:
        assert json.loads(r.read())["index_size"] == 3

    # re-indexing replaces the bank atomically
    code, out = _post(server_port, "/index",
                      {"images_b64": [_png_b64(10)], "ids": ["only"]})
    code, out = _post(server_port, "/retrieve", {"texts": ["x"], "top_k": 1})
    assert out["results"][0][0]["id"] == "only"


def test_retrieval_library_api():
    params = clip_model.init(jax.random.key(9), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4,))
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    engine.index_images(imgs, ids=["a", "b", "c", "d"])
    res = engine.retrieve(["a photo of something"], top_k=4)
    assert [r["id"] for r in res[0]] and len(res[0]) == 4
    scores = [r["score"] for r in res[0]]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="does not match"):
        engine.load_index(np.zeros((3, CFG.embed_dim), np.float32), ["x"])


def test_negative_content_length_refused(server_port):
    """Content-Length: -1 must not trigger a read-to-EOF (the OOM the 413
    cap exists to stop)."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server_port, timeout=10)
    conn.putrequest("POST", "/encode_text")
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length", "-1")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_retrieve_bad_top_k_and_dim_mismatch():
    params = clip_model.init(jax.random.key(11), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4,))
    with pytest.raises(ValueError, match="embed_dim"):
        engine.load_index(np.zeros((2, CFG.embed_dim + 1), np.float32), ["a", "b"])
    engine.load_index(np.eye(CFG.embed_dim, dtype=np.float32)[:3], ["a", "b", "c"])
    with pytest.raises(ValueError, match="top_k"):
        engine.retrieve(["x"], top_k=0)
    res = engine.retrieve(["x"], top_k=99)  # clamped to bank size
    assert len(res[0]) == 3


def test_index_endpoint_in_metrics(server_port):
    _post(server_port, "/index", {"images_b64": [_png_b64(20)], "ids": ["m"]})
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/metrics") as r:
        m = json.loads(r.read())["endpoints"]
    assert "/index" in m and m["/index"]["count"] >= 1


def test_embed_dataset_bank_roundtrip(tmp_path):
    """scripts/embed_dataset.py -> .npz bank -> load_index_file -> retrieve,
    ids mapping back to the source tar records."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import embed_dataset

    import clip_mixer_tpu as clip
    from clip_mixer_tpu.data.pipeline import write_tar_shards

    rng = np.random.default_rng(0)
    samples = [(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), f"caption {i}") for i in range(6)]
    shard_dir = tmp_path / "shards"
    write_tar_shards(iter(samples), str(shard_dir), samples_per_shard=4)

    ckpt = str(tmp_path / "ckpt")
    params = clip_model.init(jax.random.key(0), CFG)
    clip.save_pretrained(params, CFG, ckpt)

    bank = str(tmp_path / "bank.npz")
    embed_dataset.main([
        "--model", ckpt, "--data", str(shard_dir / "*.tar"),
        "--out", bank, "--batch", "4",
    ])

    engine = InferenceEngine(params, CFG, batch_buckets=(4,))
    engine.load_index_file(bank)
    assert len(engine._index[1]) == 6
    assert engine._index[1][0] == "00000/000000000"  # shard-stem/member-key
    res = engine.retrieve(["a caption"], top_k=3)
    assert len(res[0]) == 3 and all("/" in r["id"] for r in res[0])

    # bank features equal direct engine features for the same records (the
    # decode path and encoder are shared)
    import tarfile, io as _io
    from clip_mixer_tpu.data.pipeline import _decode_one
    with tarfile.open(shard_dir / "00000.tar") as tar:
        first = _decode_one(tar.extractfile("000000000.jpg").read(), 32)
    direct = engine.encode_image_arrays(first[None])[0]
    with np.load(bank) as z:
        np.testing.assert_array_equal(z["features"][0], direct)


def test_serving_client_end_to_end(server_port, tmp_path):
    """clip_mixer_tpu.client.ServingClient against the live server: every
    endpoint, file + bytes image inputs, 4xx raising, and 5xx/connection
    retry semantics."""
    import base64 as _b64mod

    from clip_mixer_tpu.client import ServingClient, ServingError

    c = ServingClient(f"http://127.0.0.1:{server_port}", retries=1, backoff_s=0.01)
    assert c.healthz()["status"] == "ok"

    feats = c.encode_text(["a cat", "a dog"])
    assert feats.shape == (2, CFG.embed_dim) and feats.dtype == np.float32

    img_path = tmp_path / "img.png"
    img_path.write_bytes(_b64mod.b64decode(_png_b64(31)))
    by_path = c.encode_image_files([str(img_path)])
    by_bytes = c.encode_image_files([img_path.read_bytes()])
    np.testing.assert_array_equal(by_path, by_bytes)

    assert c.classify([str(img_path)], top_k=2)[0][0]["label"] in ("cat", "dog", "bird")
    assert c.index([str(img_path)], ids=["client-img"]) == 1
    assert c.retrieve(["anything"], top_k=1)[0][0]["id"] == "client-img"
    assert "/encode_text" in c.metrics()

    # 4xx raises immediately (no retry burn)
    with pytest.raises(ServingError) as ei:
        c._request("/encode_text", {"wrong_key": []})
    assert ei.value.status == 400

    # unreachable host: retries then a clear error
    dead = ServingClient("http://127.0.0.1:1", retries=1, backoff_s=0.01, timeout=2)
    with pytest.raises(ServingError, match="unreachable"):
        dead.healthz()


def test_device_bank_retrieval_matches_host():
    """Device-resident (and mesh-sharded, padded) banks return identical
    retrieval results to the host-numpy path."""
    from jax.sharding import Mesh

    params = clip_model.init(jax.random.key(13), CFG)
    rng = np.random.default_rng(13)
    bank = rng.standard_normal((6, CFG.embed_dim)).astype(np.float32)
    ids = [f"s{i}" for i in range(6)]
    texts = ["a query", "another"]

    host = InferenceEngine(params, CFG, batch_buckets=(4,))
    host.load_index(bank, ids, device=False)
    want = host.retrieve(texts, top_k=4)

    def assert_same(got):
        # XLA vs numpy matmul differ by ULPs; ids and near-equal scores
        for g, w in zip(got, want):
            assert [r["id"] for r in g] == [r["id"] for r in w]
            np.testing.assert_allclose(
                [r["score"] for r in g], [r["score"] for r in w], atol=1e-5
            )

    dev = InferenceEngine(params, CFG, batch_buckets=(4,))
    dev.load_index(bank, ids, device=True)  # single-device HBM
    assert isinstance(dev._index[0], jax.Array)
    assert_same(dev.retrieve(texts, top_k=4))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    meshed = InferenceEngine(params, CFG, batch_buckets=(4,), mesh=mesh)
    meshed.load_index(bank, ids, device=True)  # 6 rows pad to 8 over 4 chips
    assert meshed._index[0].shape[0] == 8  # padded
    assert_same(meshed.retrieve(texts, top_k=4))

    # auto policy: tiny bank stays host-side
    auto = InferenceEngine(params, CFG, batch_buckets=(4,))
    auto.load_index(bank, ids)
    assert isinstance(auto._index[0], np.ndarray)


def test_embed_dataset_provenance_and_corrupt_members(tmp_path):
    """Corrupt tar members are skipped (not fatal); banks refuse a
    wrong-architecture engine and warn on a numeric-path mismatch."""
    import io as _io
    import sys
    import tarfile
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import embed_dataset

    import clip_mixer_tpu as clip
    from clip_mixer_tpu.data.pipeline import write_tar_shards

    rng = np.random.default_rng(1)
    samples = [(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), f"c {i}") for i in range(3)]
    shard_dir = tmp_path / "shards"
    write_tar_shards(iter(samples), str(shard_dir), samples_per_shard=10)
    # append a corrupt member to the shard
    with tarfile.open(shard_dir / "00000.tar", "a") as tar:
        info = tarfile.TarInfo("zzz_corrupt.jpg")
        info.size = 9
        tar.addfile(info, _io.BytesIO(b"not a jpg"))

    ckpt = str(tmp_path / "ckpt")
    params = clip_model.init(jax.random.key(0), CFG)
    clip.save_pretrained(params, CFG, ckpt)
    bank = str(tmp_path / "bank.npz")
    embed_dataset.main(["--model", ckpt, "--data", str(shard_dir / "*.tar"), "--out", bank, "--batch", "4"])

    with np.load(bank) as z:
        assert len(z["ids"]) == 3  # corrupt member skipped, run survived

    engine = InferenceEngine(params, CFG, batch_buckets=(4,))
    engine.load_index_file(bank)  # float bank on float engine: silent

    # wrong architecture refused
    other_cfg = CFG.replace(vision_width=64)
    other = InferenceEngine(clip_model.init(jax.random.key(1), other_cfg), other_cfg)
    with pytest.raises(ValueError, match="different architecture"):
        other.load_index_file(bank)

    # numeric-path mismatch warns (float bank, int8 engine)
    q8 = InferenceEngine(params, CFG, batch_buckets=(4,))
    q8.enable_int8(np.zeros((4, 32, 32, 3), np.uint8))
    with pytest.warns(UserWarning, match="image path"):
        q8.load_index_file(bank)


def test_classifier_built_through_engine_path(tmp_path):
    """load_classifier must encode prompts through the engine's own text
    path: same math as evals.zeroshot on a float engine, and no live model
    re-trace on a frozen one."""
    from clip_mixer_tpu import aot
    from clip_mixer_tpu.evals.zeroshot import build_zeroshot_classifier

    params = clip_model.init(jax.random.key(17), CFG)
    names, templates = ["cat", "dog"], ["a photo of a {}.", "art of a {}."]

    engine = InferenceEngine(params, CFG, batch_buckets=(4,))
    engine.load_classifier(names, templates)
    w_ref = build_zeroshot_classifier(params, CFG, names, templates)
    np.testing.assert_allclose(np.asarray(engine._classifier), w_ref, atol=1e-5)

    out = str(tmp_path / "srv")
    aot.export_servable(params, CFG, out, batch_buckets=(4,))
    frozen = aot.load_servable(out)
    frozen.load_classifier(names, templates)  # runs on recorded programs
    np.testing.assert_allclose(np.asarray(frozen._classifier), w_ref, atol=1e-5)
    res = frozen.classify(np.zeros((2, 32, 32, 3), np.uint8), top_k=1)
    assert res[0][0]["label"] in names


def test_similarity_endpoint(server_port):
    """POST /similarity: the reference README demo semantics over HTTP —
    logits_per_image = 100 * cosine, probs = softmax over texts."""
    code, out = _post(
        server_port, "/similarity",
        {"images_b64": [_png_b64(0)], "texts": ["a cat", "a dog", "a car"]},
    )
    assert code == 200
    logits = np.asarray(out["logits_per_image"])
    probs = np.asarray(out["probs"])
    assert logits.shape == probs.shape == (1, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    np.testing.assert_allclose(probs, e / e.sum(-1, keepdims=True), rtol=1e-5)


# --------------------------------------------------------------------------
# Device-side resize serving (InferenceEngine(input_hw=...))
# --------------------------------------------------------------------------


def test_input_hw_engine_matches_host_preprocess():
    """Float path: the engine's in-graph resize must equal composing the
    batch preprocess by hand (same graph, so exact)."""
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess

    params = clip_model.init(jax.random.key(1), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4,), input_hw=(64, 64))
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    got = engine.encode_image_arrays(u8)

    pre = make_batch_preprocess((64, 64), CFG.image_resolution, normalize=True, dtype="float32")
    want = np.asarray(
        jax.jit(lambda p, x: clip_model.l2_normalize(
            clip_model.encode_image(p, CFG, pre(x))))(params, u8),
        np.float32,
    )  # jitted like the engine path: same composition -> same XLA program
    np.testing.assert_array_equal(got, want)
    assert engine.input_hw == (64, 64)


def test_input_hw_int8_planar_path():
    """int8 mixer + input_hw routes through the planar fused front-end;
    features must stay close to the engine's own float path."""
    params = clip_model.init(jax.random.key(1), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4,), input_hw=(64, 64))
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    before = engine.encode_image_arrays(u8)
    engine.enable_int8(u8)  # calibration samples at SOURCE resolution
    after = engine.encode_image_arrays(u8)
    assert engine.path_kinds["image"] == "int8"
    cos = (before * after).sum(-1)  # both l2-normalized
    assert cos.min() > 0.99, cos


def test_input_hw_decode_rejects_wrong_size():
    params = clip_model.init(jax.random.key(1), CFG)
    engine = InferenceEngine(params, CFG, batch_buckets=(4,), input_hw=(64, 64))
    buf = io.BytesIO()
    Image.new("RGB", (48, 48)).save(buf, "PNG")
    with pytest.raises(ValueError, match="64x64 source images"):
        engine.decode_and_preprocess([buf.getvalue()])
    # exact-size blobs pass through raw (no host resample)
    buf2 = io.BytesIO()
    Image.new("RGB", (64, 64), (10, 20, 30)).save(buf2, "PNG")
    arr = engine.decode_and_preprocess([buf2.getvalue()])
    assert arr.shape == (1, 64, 64, 3) and arr.dtype == np.uint8
    np.testing.assert_array_equal(arr[0, 0, 0], [10, 20, 30])


def test_input_hw_frozen_roundtrip(tmp_path):
    """export_servable(input_hw=) records resize-inclusive programs;
    load_servable rebuilds an engine bit-equal to the live one."""
    from clip_mixer_tpu.aot import export_servable, load_servable

    params = clip_model.init(jax.random.key(2), CFG)
    out = str(tmp_path / "frozen_ihw")
    export_servable(params, CFG, out, batch_buckets=(4,), input_hw=(64, 64))
    frozen = load_servable(out, check_platform=False)
    assert frozen.frozen and frozen.input_hw == (64, 64)

    live = InferenceEngine(params, CFG, batch_buckets=(4,), input_hw=(64, 64))
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        frozen.encode_image_arrays(u8), live.encode_image_arrays(u8)
    )


def test_embed_dataset_input_size_bank(tmp_path):
    """--input-size banks: decode-only host path, device resize, features
    bit-equal to a same-input_hw engine; provenance mismatch warns."""
    import sys
    import warnings as _warnings
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import embed_dataset

    import clip_mixer_tpu as clip
    from clip_mixer_tpu.data.pipeline import write_tar_shards

    rng = np.random.default_rng(3)
    samples = [(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8), f"caption {i}") for i in range(4)]
    shard_dir = tmp_path / "shards64"
    write_tar_shards(iter(samples), str(shard_dir), samples_per_shard=4)

    ckpt = str(tmp_path / "ckpt")
    params = clip_model.init(jax.random.key(0), CFG)
    clip.save_pretrained(params, CFG, ckpt)

    bank = str(tmp_path / "bank64.npz")
    embed_dataset.main([
        "--model", ckpt, "--data", str(shard_dir / "*.tar"),
        "--out", bank, "--batch", "4", "--input-size", "64",
    ])

    engine = InferenceEngine(params, CFG, batch_buckets=(4,), input_hw=(64, 64))
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # matching input_hw must NOT warn
        engine.load_index_file(bank)
    assert len(engine._index[1]) == 4

    # bit-equality: bank row == the engine encoding the JPEG-decoded source
    import tarfile, io as _io
    from PIL import Image
    with tarfile.open(shard_dir / "00000.tar") as tar:
        raw = np.asarray(
            Image.open(_io.BytesIO(tar.extractfile("000000000.jpg").read())).convert("RGB"),
            np.uint8,
        )
    direct = engine.encode_image_arrays(raw[None])[0]
    with np.load(bank) as z:
        np.testing.assert_array_equal(z["features"][0], direct)

    # a default (host-resize) engine loading this bank must warn on the
    # input_hw provenance mismatch
    plain = InferenceEngine(params, CFG, batch_buckets=(4,))
    with pytest.warns(UserWarning, match="input_hw"):
        plain.load_index_file(bank)


def test_cli_frozen_dir_refuses_retrace_flags(tmp_path, monkeypatch):
    """A --model dir carrying recorded programs serves them by default, so
    flags that would silently re-trace the encoders (--int8/--all-devices/
    --input-size) must be refused up front unless --no-frozen opts out
    (serving.main frozen auto-detect, round 5)."""
    import sys

    import pytest

    from clip_mixer_tpu import serving

    d = tmp_path / "rel"
    (d / "servable").mkdir(parents=True)
    (d / "servable" / "manifest.json").write_text("{}")
    monkeypatch.setattr(
        sys, "argv",
        ["serving", "--model", str(d), "--int8", "scales.npz"])
    with pytest.raises(SystemExit, match="--int8"):
        serving.main()
