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


def test_batch_decode_crop_u8_matches_pil_box_resize():
    """The training-path uint8 stage: fused decode+crop+resample with PIL
    rounding == PIL's resize(box=...) within 1 LSB (PIL quantizes between the
    two separable passes; we quantize once at the end)."""
    rng = np.random.default_rng(3)
    arr = (rng.random((120, 150, 3)) * 255).astype(np.uint8)
    blob = _jpeg(arr)
    src = Image.open(io.BytesIO(blob)).convert("RGB")
    x, y, cw, ch = 10, 20, 100, 80
    want = np.asarray(src.resize((64, 64), Image.BICUBIC, box=(x, y, x + cw, y + ch)))
    got = native.batch_decode_crop_u8(
        [blob], np.asarray([[x, y, cw, ch, 0]], np.float32), 64)[0]
    assert got.dtype == np.uint8
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1 and d.mean() < 0.2


def _train_folder(tmp_path, n_per_class=4):
    from recnext_tpu.data.datasets import ImageFolder

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(n_per_class):
            yy, xx = np.mgrid[0:90, 0:110]
            arr = np.stack([(xx * 3 + i * 31) % 256, (yy * 2) % 256,
                            rng.integers(0, 256, (90, 110))], -1).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg", "JPEG", quality=95)
    return ImageFolder(str(tmp_path / "train"))


def test_native_train_loader_simple_matches_pil(tmp_path):
    """SimpleTrainTransform through the fully-fused native path must reproduce
    the PIL path: same per-sample rng stream -> same RRC rect + flip, and the
    fused resample+normalize is PIL-parity (uint8 intermediate quantization
    only)."""
    from recnext_tpu.data.loader import train_loader
    from recnext_tpu.data.transforms import IMAGENET_STD, SimpleTrainTransform

    ds = _train_folder(tmp_path)
    kw = dict(batch_size=4, epoch=1, seed=5, repeated_aug=True)
    t = SimpleTrainTransform(48)
    nat = list(iter(train_loader(ds, t, native=True, **kw)))
    pil = list(iter(train_loader(ds, t, native=False, **kw)))
    assert len(nat) == len(pil) and len(nat) > 0
    for bn, bp in zip(nat, pil):
        np.testing.assert_array_equal(bn["label"], bp["label"])
        d = np.abs(bn["image"] - bp["image"]) * IMAGENET_STD[None, None, None]
        assert d.max() < 0.02 and d.mean() < 0.005


def test_native_train_loader_full_aug_matches_pil(tmp_path):
    """Full TrainTransform: native uint8 crop + post_crop(RandAugment/jitter/
    erasing) vs the all-PIL path. The rng streams coincide, so geometry, op
    choices and erasing noise are identical; remaining diffs come from RA
    thresholding ops (posterize/solarize) crossing a bucket on the <=1-LSB
    resample difference — rare, so bound the big-diff fraction, not the max."""
    from recnext_tpu.data.loader import train_loader
    from recnext_tpu.data.transforms import IMAGENET_STD, TrainTransform

    ds = _train_folder(tmp_path)
    kw = dict(batch_size=4, epoch=0, seed=9, repeated_aug=True)
    t = TrainTransform(48)
    nat = list(iter(train_loader(ds, t, native=True, **kw)))
    pil = list(iter(train_loader(ds, t, native=False, **kw)))
    assert len(nat) == len(pil) and len(nat) > 0
    for bn, bp in zip(nat, pil):
        np.testing.assert_array_equal(bn["label"], bp["label"])
        d = np.abs(bn["image"] - bp["image"]) * IMAGENET_STD[None, None, None]
        assert d.mean() < 0.01
        assert (d > 0.1).mean() < 0.02


def test_native_train_loader_falls_back_for_non_jpeg(tmp_path):
    """A PNG in the folder fails native decode; the batch falls back to the PIL
    path transparently (fresh rng streams -> identical to the pure-PIL batch)."""
    from recnext_tpu.data.loader import train_loader
    from recnext_tpu.data.transforms import SimpleTrainTransform

    ds = _train_folder(tmp_path, n_per_class=2)
    png = tmp_path / "train" / "a" / "z.png"
    Image.fromarray(np.zeros((60, 70, 3), np.uint8)).save(png, "PNG")
    ds2 = type(ds)(str(tmp_path / "train"))
    kw = dict(batch_size=5, epoch=0, seed=1, repeated_aug=False)
    t = SimpleTrainTransform(32)
    nat = list(iter(train_loader(ds2, t, native=True, **kw)))
    pil = list(iter(train_loader(ds2, t, native=False, **kw)))
    assert len(nat) == len(pil) and len(nat) > 0
    for bn, bp in zip(nat, pil):
        np.testing.assert_array_equal(bn["label"], bp["label"])
        np.testing.assert_allclose(bn["image"], bp["image"], atol=0.12)


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


def test_native_loader_falls_back_for_tar_dataset(tmp_path):
    """TarImageFolder.samples holds tar MEMBER names, not filesystem paths — the
    native gate must detect that and use the PIL path instead of crashing the
    prefetch worker (loader._samples_on_disk)."""
    import tarfile

    from recnext_tpu.data.datasets import TarImageFolder
    from recnext_tpu.data.loader import eval_loader, train_loader
    from recnext_tpu.data.transforms import EvalTransform, SimpleTrainTransform

    _train_folder(tmp_path, n_per_class=2)
    tar_path = tmp_path / "train.tar"
    with tarfile.open(tar_path, "w") as tf:
        tf.add(tmp_path / "train", arcname=".")
    ds = TarImageFolder(str(tar_path))
    assert len(ds) == 4

    ev_nat = list(iter(eval_loader(ds, EvalTransform(32), batch_size=2,
                                   native=True)))
    ev_pil = list(iter(eval_loader(ds, EvalTransform(32), batch_size=2,
                                   native=False)))
    assert len(ev_nat) == len(ev_pil) > 0
    for bn, bp in zip(ev_nat, ev_pil):
        np.testing.assert_array_equal(bn["label"], bp["label"])
        np.testing.assert_allclose(bn["image"], bp["image"], atol=1e-5)

    tr = list(iter(train_loader(ds, SimpleTrainTransform(32), batch_size=2,
                                epoch=0, seed=1, repeated_aug=False,
                                native=True)))
    assert len(tr) > 0 and tr[0]["image"].shape == (2, 32, 32, 3)
