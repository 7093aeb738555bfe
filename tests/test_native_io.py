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
    # the native path is PIL-parity: exact resize-then-crop geometry + the same
    # antialiased bicubic kernel; only PIL's uint8 intermediate quantization
    # remains (~1 LSB)
    pil_loader = eval_loader(ds, EvalTransform(32), batch_size=4, native=False)
    pil_batches = list(iter(pil_loader))
    a = np.concatenate([b["image"] for b in batches])
    b = np.concatenate([b["image"] for b in pil_batches])
    from recnext_tpu.data.transforms import IMAGENET_STD
    d = np.abs(a - b) * IMAGENET_STD[None, None, None]  # back to [0,1] scale
    assert d.max() < 0.02 and d.mean() < 0.005


def test_native_bicubic_matches_pil_eval_transform():
    """Direct parity check on arbitrary sizes: native fused crop-resample ==
    EvalTransform (PIL resize-bicubic + center crop) within PIL's uint8
    intermediate quantization."""
    import io

    from recnext_tpu.data import native as native_io
    from recnext_tpu.data.transforms import EvalTransform, IMAGENET_STD

    if not native_io.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    for (w, h) in [(100, 80), (321, 480), (96, 96)]:
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack([(xx * 7) % 256, (yy * 5) % 256,
                        rng.integers(0, 256, (h, w))], -1).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=95)
        blob = buf.getvalue()
        size = 64
        t = EvalTransform(size)
        want = t(None, Image.open(io.BytesIO(blob)))
        from recnext_tpu.data.transforms import center_crop_rect

        cx, cy, cw, ch, _ = center_crop_rect(w, h, size, t.crop_pct)
        crops = np.asarray([[cx, cy, cw, ch, 0]], np.float32)
        got = native_io.batch_decode_crop([blob], crops, size)[0]
        d = np.abs(got - want) * IMAGENET_STD[None, None]
        assert d.max() < 0.02, (w, h, d.max())
        assert d.mean() < 0.004, (w, h, d.mean())
