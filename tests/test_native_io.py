"""Native C++ image-decoding core: correctness vs PIL, batch path, loader wiring."""

import io

import numpy as np
import pytest
from PIL import Image

from recnext_tpu.data import native
from recnext_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain/libjpeg unavailable")


def _jpeg(arr):
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=95)
    return b.getvalue()


def test_decode_matches_pil():
    rng = np.random.default_rng(0)
    img = (rng.random((97, 130, 3)) * 255).astype(np.uint8)
    blob = _jpeg(img)
    dec = native.decode_jpeg(blob)
    ref = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    assert dec.shape == ref.shape
    np.testing.assert_array_equal(dec, ref)  # same libjpeg underneath


def test_batch_decode_crop_normalizes():
    img = np.full((64, 64, 3), 128, np.uint8)
    blob = _jpeg(img)
    crops = np.array([[0, 0, -1, -1, 0]], np.int32)
    out = native.batch_decode_crop([blob], crops, 32)
    assert out.shape == (1, 32, 32, 3)
    want = (128 / 255 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[0, 16, 16], want, atol=0.05)


def test_flip_and_crop():
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :32] = 255  # left half white
    blob = _jpeg(img)
    out = native.batch_decode_crop(
        [blob, blob], np.array([[0, 0, -1, -1, 0], [0, 0, -1, -1, 1]], np.int32), 16)
    # unflipped: left bright; flipped: right bright
    assert out[0, 8, 2, 0] > out[0, 8, 13, 0]
    assert out[1, 8, 2, 0] < out[1, 8, 13, 0]


def test_native_eval_loader(tmp_path):
    from recnext_tpu.data.datasets import ImageFolder
    from recnext_tpu.data.loader import eval_loader
    from recnext_tpu.data.transforms import EvalTransform

    yy, xx = np.mgrid[0:80, 0:100]
    for ci, cls in enumerate(("a", "b")):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(3):
            # smooth gradients: bilinear and bicubic resampling agree closely
            arr = np.stack([(xx * 2 + i * 20) % 256, (yy * 3 + ci * 40) % 256,
                            (xx + yy) % 256], axis=-1).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg", "JPEG", quality=95)
    ds = ImageFolder(str(tmp_path / "val"))
    loader = eval_loader(ds, EvalTransform(32), batch_size=4, native=True)
    batches = list(iter(loader))
    assert sum(b["image"].shape[0] for b in batches) == 6
    assert batches[0]["image"].dtype == np.float32
    # compare against PIL path: same images, close values (bilinear vs bicubic)
    pil_loader = eval_loader(ds, EvalTransform(32), batch_size=4, native=False)
    pil_batches = list(iter(pil_loader))
    a = np.concatenate([b["image"] for b in batches])
    b = np.concatenate([b["image"] for b in pil_batches])
    assert np.mean(np.abs(a - b)) < 0.25
