"""Serving stack tests — torchserve-counterpart semantics: archive -> server ->
/predictions/<name> responses must match direct inference exactly
(reference workflow: segmentation/tools/torchserve/test_torchserve.py:36-56)."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from recnext_tpu.export import publish_fused
from recnext_tpu.models.registry import create_model
from recnext_tpu.serve import ServingModel, check_server, make_server, topk_json

OVR = dict(embed_dim=(16, 32, 64, 128), depth=(1, 1, 2, 1),
           mlp_ratio=(2.0, 2.0, 2.0, 2.0), num_classes=11)
SIZE = 32


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    model = create_model("recnext_m0", **OVR)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats so fusion actually does something
    variables = jax.tree.map(
        lambda v: v + 0.05 * np.random.default_rng(3).normal(size=v.shape)
        .astype(v.dtype), variables)
    out = tmp_path_factory.mktemp("archive")
    publish_fused("recnext_m0", variables, str(out))
    return str(out)


@pytest.fixture(scope="module")
def serving(archive):
    m = ServingModel(archive, "recnext_m0", max_batch=4, input_size=SIZE,
                     dtype=jnp.float32, cfg_overrides=OVR)
    m.warmup()
    return m


def _jpeg_bytes(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (48, 40, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95)
    return buf.getvalue()


def test_predict_pads_and_matches_direct(serving, archive, rng):
    fused = create_model("recnext_m0", fused=True, **OVR)
    x = rng.normal(size=(3, SIZE, SIZE, 3)).astype(np.float32)
    want = jax.nn.softmax(
        fused.apply(serving.variables, jnp.asarray(x), training=False), axis=-1)
    got = serving.predict(x)  # 3 rows into a compiled max_batch=4 program
    assert got.shape == (3, 11)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.fixture(scope="module")
def server(serving):
    srv = make_server(serving, port=0, window_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.batcher.close()


def test_ping_and_info(server):
    with urllib.request.urlopen(f"{server}/ping", timeout=30) as r:
        assert json.loads(r.read())["status"] == "Healthy"
    with urllib.request.urlopen(f"{server}/models/recnext_m0", timeout=30) as r:
        info = json.loads(r.read())
    assert info["input_size"] == SIZE and info["max_batch"] == 4
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(f"{server}/models/nope", timeout=30)


def test_prediction_parity_with_direct(server, serving, tmp_path):
    img = tmp_path / "img.jpg"
    img.write_bytes(_jpeg_bytes(0))
    assert check_server(server, serving, str(img))


def test_concurrent_requests_microbatch(server, serving):
    results = {}

    def post(i):
        req = urllib.request.Request(
            f"{server}/predictions/recnext_m0", data=_jpeg_bytes(i),
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            results[i] = json.loads(r.read())

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    before = serving.requests_served
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    for i, res in results.items():
        top = res["topk"]
        assert len(top) == 5 and abs(sum(e["score"] for e in top)) <= 1.0 + 1e-5
        # response must match direct inference on the same bytes
        direct = topk_json(serving.predict(
            serving.preprocess(_jpeg_bytes(i))[None])[0])
        assert top[0]["class_id"] == direct["topk"][0]["class_id"]
    assert serving.requests_served >= before + 4


def test_bad_image_is_400(server):
    req = urllib.request.Request(
        f"{server}/predictions/recnext_m0", data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_serving_model_loads_sha_stamped_archive(archive, tmp_path):
    """A --sha-stamp published archive (recnext_m0_fused-<sha8>.msgpack, no
    unstamped file) must load through the same resolve_published_path fallback
    export.load_published uses."""
    import shutil
    from pathlib import Path

    from recnext_tpu.export import sha_stamp

    stamped_dir = tmp_path / "stamped"
    stamped_dir.mkdir()
    src = Path(archive) / "recnext_m0_fused.msgpack"
    dst = stamped_dir / src.name
    shutil.copy(src, dst)
    shutil.copy(Path(archive) / "recnext_m0_meta.json",
                stamped_dir / "recnext_m0_meta.json")
    sha_stamp(dst)  # renames to recnext_m0_fused-<sha8>.msgpack
    assert not dst.exists()

    m = ServingModel(str(stamped_dir), "recnext_m0", max_batch=2,
                     input_size=SIZE, dtype=jnp.float32, cfg_overrides=OVR)
    x = np.zeros((1, SIZE, SIZE, 3), np.float32)
    probs = m.predict(x)
    assert probs.shape == (1, 11)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
