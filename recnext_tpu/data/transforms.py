"""Host-side image transforms (PIL + numpy) — no torchvision/timm dependency.

Implements the reference training recipe (/root/reference/data/datasets.py:102-140):
train = RandomResizedCrop(bicubic, scale .08-1) + flip + RandAugment(rand-m9-mstd0.5-inc1)
+ normalize + RandomErasing(p=.25, pixel) — per timm create_transform, auto-augment
REPLACES color jitter ("elif color_jitter is not None", transforms_factory.py); eval =
resize(256/224*s, bicubic) + center crop + normalize. Plus ThreeAugment (DeiT-III,
/root/reference/data/threeaugment.py:88-121): RRC + flip + choice(grayscale, solarize,
blur) + jitter 0.4 (3A is the one branch that does jitter).

Outputs are HWC float32 normalized arrays (NHWC batches feed the TPU directly).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

BICUBIC = Image.BICUBIC


def normalize(img: Image.Image | np.ndarray) -> np.ndarray:
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return (arr[..., :3] - IMAGENET_MEAN) / IMAGENET_STD


def rrc_rect(
    rng: np.random.Generator,
    w: int,
    h: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Tuple[int, int, int, int]:
    """RandomResizedCrop rectangle (x, y, cw, ch) — the torchvision/timm sampling
    loop. Single source of truth for the PIL path (random_resized_crop) and the
    native fused decode+crop path (loader._native_train_batches): same rng, same
    draw order, same rect."""
    area = w * h
    for _ in range(10):
        target = rng.uniform(*scale) * area
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x = int(rng.integers(0, w - cw + 1))
            y = int(rng.integers(0, h - ch + 1))
            return x, y, cw, ch
    # fallback: center crop
    s = min(w, h)
    return (w - s) // 2, (h - s) // 2, s, s


def random_resized_crop(
    rng: np.random.Generator,
    img: Image.Image,
    size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Image.Image:
    w, h = img.size
    x, y, cw, ch = rrc_rect(rng, w, h, scale, ratio)
    return img.resize((size, size), BICUBIC, box=(x, y, x + cw, y + ch))


def center_crop_rect(w: int, h: int, size: int, crop_pct: float = 224 / 256):
    """The source-image float rect that resize_center_crop maps onto the final
    (size x size) crop: (cx, cy, cw, ch). Single source of truth for the
    short-side-resize rounding, shared with the native loader's fused
    crop-resample path (data/loader.py) so its geometry is EXACTLY the PIL
    path's.

    Rounding is timm/torchvision-exact (the reference's eval pipeline,
    /root/reference/data/datasets.py:130-136 -> torchvision Resize):
    scale_size = floor(size / crop_pct) (timm transforms_imagenet_eval) and the
    long side of the aspect-preserving resize truncates, int(scale*long/short)
    (torchvision F.resize), and the crop offset is int(round(diff/2.0)) —
    Python banker's rounding, torchvision F.center_crop — not diff//2. The
    earlier round()/floor choices diverged from the reference by 1px at
    crop_pct != 0.875, non-square aspect ratios, or (resized - size) ≡ 3
    (mod 4) — caught by the cross-harness eval loop
    (tests/test_cross_harness.py)."""
    scale_size = int(size / crop_pct)  # floor; exact at 224/0.875 -> 256
    if w <= h:
        nw, nh = scale_size, max(1, int(scale_size * h / w))
    else:
        nh, nw = scale_size, max(1, int(scale_size * w / h))
    sx, sy = w / nw, h / nh
    x, y = _crop_offset(nw, size), _crop_offset(nh, size)
    return x * sx, y * sy, size * sx, size * sy, (nw, nh)


def _crop_offset(full: int, crop: int) -> int:
    """torchvision F.center_crop offset: int(round((full - crop) / 2.0))."""
    return int(round((full - crop) / 2.0))


def resize_center_crop(img: Image.Image, size: int, crop_pct: float = 224 / 256) -> Image.Image:
    w, h = img.size
    _, _, _, _, (nw, nh) = center_crop_rect(w, h, size, crop_pct)
    img = img.resize((nw, nh), BICUBIC)
    x, y = _crop_offset(nw, size), _crop_offset(nh, size)
    return img.crop((x, y, x + size, y + size))


# ---------------------------------------------------------------------------
# RandAugment (timm 'rand-m9-mstd0.5-inc1' policy)
#
# Semantics hand-derived from timm auto_augment.py as of timm 0.9-1.0 (the
# reference's requirement range; these code paths are identical across it):
# _RAND_INCREASING_TRANSFORMS op set, uniform choice with replacement,
# per-op apply prob 0.5, magnitude gauss(m, mstd) clamped to [0, 10], inc1
# level->arg maps, PIL AFFINE with fill (124,116,104). Value-level oracle:
# tests/test_randaugment_oracle.py.
# ---------------------------------------------------------------------------

_MAX_LEVEL = 10.0
_FILL = (124, 116, 104)


def _affine(img, matrix):
    return img.transform(img.size, Image.AFFINE, matrix, resample=BICUBIC, fillcolor=_FILL)


def _shear_x(img, v):
    return _affine(img, (1, v, 0, 0, 1, 0))


def _shear_y(img, v):
    return _affine(img, (1, 0, 0, v, 1, 0))


def _translate_x(img, v):
    return _affine(img, (1, 0, v * img.size[0], 0, 1, 0))


def _translate_y(img, v):
    return _affine(img, (1, 0, 0, 0, 1, v * img.size[1]))


def _enhance(cls):
    return lambda img, v: cls(img).enhance(v)


def _posterize(img, bits):
    # timm posterize: bits_to_keep >= 8 is the identity; bits CAN reach 0 at
    # level 10 under inc1 (4 - int(10/10*4)), which blacks the image — PIL's
    # lut math handles 0 but some versions range-check, so do the 0-bit mask
    # explicitly instead of clamping to 1 (which diverged from timm)
    bits = int(bits)
    if bits >= 8:
        return img
    if bits <= 0:
        return Image.fromarray(np.zeros_like(np.asarray(img)))
    return ImageOps.posterize(img, bits)


def _solarize(img, thresh):
    return ImageOps.solarize(img, int(thresh))


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img, np.int32)
    arr = np.where(arr < thresh, np.clip(arr + int(add), 0, 255), arr).astype(np.uint8)
    return Image.fromarray(arr)


def _rotate(img, v):
    return img.rotate(v, resample=BICUBIC, fillcolor=_FILL)


# (name, fn, level->arg mapping). 'inc1' = increasing-severity variants.
def _lvl_signed(scale):
    def f(rng, level):
        v = level / _MAX_LEVEL * scale
        return -v if rng.random() < 0.5 else v

    return f


def _lvl_enhance(rng, level):  # inc1: 1.0 +/- 0.9*level/10
    v = level / _MAX_LEVEL * 0.9
    return max(0.1, 1.0 + (-v if rng.random() < 0.5 else v))


_RA_OPS = [
    ("AutoContrast", lambda img, v: ImageOps.autocontrast(img), lambda rng, l: None),
    ("Equalize", lambda img, v: ImageOps.equalize(img), lambda rng, l: None),
    ("Invert", lambda img, v: ImageOps.invert(img), lambda rng, l: None),
    ("Rotate", _rotate, _lvl_signed(30.0)),
    ("Posterize", _posterize, lambda rng, l: 4 - int(l / _MAX_LEVEL * 4)),  # inc
    ("Solarize", _solarize, lambda rng, l: 256 - int(l / _MAX_LEVEL * 256)),  # inc
    ("SolarizeAdd", _solarize_add, lambda rng, l: int(l / _MAX_LEVEL * 110)),
    ("Color", _enhance(ImageEnhance.Color), lambda rng, l: _lvl_enhance(rng, l)),
    ("Contrast", _enhance(ImageEnhance.Contrast), lambda rng, l: _lvl_enhance(rng, l)),
    ("Brightness", _enhance(ImageEnhance.Brightness), lambda rng, l: _lvl_enhance(rng, l)),
    ("Sharpness", _enhance(ImageEnhance.Sharpness), lambda rng, l: _lvl_enhance(rng, l)),
    ("ShearX", _shear_x, _lvl_signed(0.3)),
    ("ShearY", _shear_y, _lvl_signed(0.3)),
    ("TranslateX", _translate_x, _lvl_signed(0.45)),
    ("TranslateY", _translate_y, _lvl_signed(0.45)),
]


def rand_augment(
    rng: np.random.Generator,
    img: Image.Image,
    num_ops: int = 2,
    magnitude: float = 9.0,
    mstd: float = 0.5,
    prob: float = 0.5,
) -> Image.Image:
    """timm RandAugment: num_ops draws, each APPLIED with prob 0.5 (the default the
    'rand-m9-mstd0.5-inc1' recipe uses) at magnitude ~ N(m, mstd) clipped."""
    for _ in range(num_ops):
        if rng.random() > prob:
            continue
        name, fn, lvl = _RA_OPS[int(rng.integers(len(_RA_OPS)))]
        # timm AugmentOp.__call__: gaussian jitter when mstd > 0, then clamp to
        # [0, _LEVEL_DENOM] UNCONDITIONALLY (the clamp applies to a static
        # magnitude too)
        m = float(rng.normal(magnitude, mstd)) if mstd else float(magnitude)
        m = float(np.clip(m, 0.0, _MAX_LEVEL))
        img = fn(img, lvl(rng, m))
    return img


def color_jitter(rng: np.random.Generator, img: Image.Image, strength: float = 0.4) -> Image.Image:
    for cls in (ImageEnhance.Brightness, ImageEnhance.Contrast, ImageEnhance.Color):
        f = float(rng.uniform(max(0.0, 1 - strength), 1 + strength))
        img = cls(img).enhance(f)
    return img


def random_erasing(
    rng: np.random.Generator,
    arr: np.ndarray,
    p: float = 0.25,
    area: Tuple[float, float] = (0.02, 1 / 3),
    ratio: Tuple[float, float] = (0.3, 3.33),
) -> np.ndarray:
    """timm RandomErasing mode='pixel': fill a random box with N(0,1) noise
    (applies on the normalized array)."""
    if rng.random() > p:
        return arr
    h, w = arr.shape[:2]
    for _ in range(10):
        target = rng.uniform(*area) * h * w
        ar = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        eh, ew = int(round(np.sqrt(target * ar))), int(round(np.sqrt(target / ar)))
        if eh < h and ew < w and eh > 0 and ew > 0:
            y = int(rng.integers(0, h - eh + 1))
            x = int(rng.integers(0, w - ew + 1))
            arr = arr.copy()
            arr[y : y + eh, x : x + ew] = rng.normal(size=(eh, ew, arr.shape[2])).astype(arr.dtype)
            return arr
    return arr


def three_augment_choice(rng: np.random.Generator, img: Image.Image) -> Image.Image:
    """DeiT-III: RandomChoice(grayscale, solarize, gaussian blur) at p=1."""
    c = int(rng.integers(3))
    if c == 0:
        return ImageOps.grayscale(img).convert("RGB")
    if c == 1:
        return ImageOps.solarize(img)
    return img.filter(ImageFilter.GaussianBlur(radius=float(rng.uniform(0.1, 2.0))))


@dataclasses.dataclass
class TrainTransform:
    """One sample: PIL -> augmented normalized HWC float32.

    Split as (RRC + flip) -> post_crop(aug chain) so the native loader can fuse
    the decode + crop + flip in C++ (rrc_scale draws feed rrc_rect with the same
    rng stream) and hand the small uint8 crop to post_crop."""

    size: int = 224
    three_augment: bool = False
    auto_augment: bool = True  # False = the reference's `--aa ''` (jitter-only)
    ra_magnitude: float = 9.0
    jitter: float = 0.4
    reprob: float = 0.25
    rrc_scale: Tuple[float, float] = (0.08, 1.0)

    def post_crop(self, rng: np.random.Generator, img) -> np.ndarray:
        """Augment an already-cropped (size x size) image: RandAugment/3A ->
        jitter -> normalize -> erasing. `img` is a PIL Image or uint8 HWC array."""
        if not isinstance(img, Image.Image):
            img = Image.fromarray(img, "RGB")
        if self.three_augment:
            # DeiT-III: one of {grayscale, solarize, blur} THEN ColorJitter
            # (reference data/threeaugment.py + --ThreeAugment path)
            img = three_augment_choice(rng, img)
            if self.jitter:
                img = color_jitter(rng, img, self.jitter)
        elif self.auto_augment:
            # timm create_transform: auto_augment REPLACES color jitter
            # ("elif color_jitter is not None" — transforms_factory.py); the
            # reference's default recipe (aa=rand-m9-mstd0.5-inc1) runs RA only
            img = rand_augment(rng, img, magnitude=self.ra_magnitude)
        elif self.jitter:
            # the reference's `--aa ''` path: no AA, ColorJitter applies
            img = color_jitter(rng, img, self.jitter)
        arr = normalize(img)
        if self.reprob:
            arr = random_erasing(rng, arr, p=self.reprob)
        return arr.astype(np.float32)

    def __call__(self, rng: np.random.Generator, img: Image.Image) -> np.ndarray:
        img = img.convert("RGB")
        img = random_resized_crop(rng, img, self.size, scale=self.rrc_scale)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return self.post_crop(rng, img)


@dataclasses.dataclass
class SimpleTrainTransform:
    """RRC + flip + normalize only — smoke/memorization runs and ablations.
    post_crop=None signals the native loader that normalization can fuse in C++."""

    size: int = 224
    rrc_scale: Tuple[float, float] = (0.6, 1.0)
    post_crop = None

    def __call__(self, rng: np.random.Generator, img: Image.Image) -> np.ndarray:
        img = img.convert("RGB")
        img = random_resized_crop(rng, img, self.size, scale=self.rrc_scale)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return normalize(img).astype(np.float32)


@dataclasses.dataclass
class EvalTransform:
    size: int = 224
    crop_pct: float = 224 / 256

    def __call__(self, rng, img: Image.Image) -> np.ndarray:
        img = img.convert("RGB")
        return normalize(resize_center_crop(img, self.size, self.crop_pct)).astype(np.float32)
