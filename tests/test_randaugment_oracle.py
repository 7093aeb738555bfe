"""RandAugment / RandomErasing ORACLE tests: value-level fixtures for the
rand-m9-mstd0.5-inc1 recipe (the reference's train augmentation,
/root/reference/data/datasets.py:107-124), not just "runs, shapes ok".

timm isn't installed here (zero egress), so the semantics are hand-derived
from timm's auto_augment.py as of timm 0.9-1.0 (the versions the reference's
requirements pin range over; the inc1/mstd/prob code paths are identical
across them):

* op set    = _RAND_INCREASING_TRANSFORMS (15 ops, no Cutout)
* selection = uniform with replacement, num_layers=2
* apply     = each chosen op applied with prob 0.5
* magnitude = gauss(m, mstd) when mstd>0, then clamped to [0, 10] (the clamp
              applies to static magnitudes too)
* inc1 maps = enhance 1.0±0.9·l/10 (floor 0.1), posterize 4-int(l/10·4) bits
              (0 bits at l=10 → black), solarize 256-int(l/10·256),
              solarize_add int(l/10·110), rotate ±30·l/10, shear ±0.3·l/10,
              translate ±0.45·l/10 (relative), signs negated with prob 0.5
* pixel math delegates to PIL exactly as timm does (Image.AFFINE with
  fillcolor (124,116,104) = round(255·IMAGENET_MEAN), bicubic per the
  reference's interpolation hparam)

RandomErasing: timm mode='pixel' — p=0.25, one box, area U(0.02, 1/3)·HW,
log-uniform aspect in (0.3, 1/0.3), 10 attempts, N(0,1) fill on the
normalized tensor.
"""

import numpy as np
import pytest
from PIL import Image

from recnext_tpu.data import transforms as T


def _gradient_img():
    row = np.arange(256, dtype=np.uint8)
    return Image.fromarray(row[None, :, None] * np.ones((4, 1, 3), np.uint8))


def _square_img():
    arr = np.zeros((32, 32, 3), np.uint8)
    arr[8:16, 16:24] = 255
    return Image.fromarray(arr), arr


# ---------------------------------------------------------------- op set ----

def test_op_set_matches_timm_rand_increasing():
    names = [name for name, _, _ in T._RA_OPS]
    assert names == [
        "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize",
        "Solarize", "SolarizeAdd", "Color", "Contrast", "Brightness",
        "Sharpness", "ShearX", "ShearY", "TranslateX", "TranslateY",
    ]  # _RAND_INCREASING_TRANSFORMS order/content (Posterize/Solarize/
    #    enhance entries are the Increasing variants, asserted below)


# ----------------------------------------------------- level->arg fixtures --

def _lvl(name):
    return {n: l for n, _, l in T._RA_OPS}[name]


@pytest.mark.parametrize("name,scale", [("Rotate", 30.0), ("ShearX", 0.3),
                                        ("ShearY", 0.3), ("TranslateX", 0.45),
                                        ("TranslateY", 0.45)])
def test_signed_level_maps(name, scale):
    lvl = _lvl(name)
    rng = np.random.default_rng(0)
    vals = [lvl(rng, 9.0) for _ in range(64)]
    # |v| = scale * 9/10 exactly; sign negated with prob 0.5 (timm
    # _randomly_negate), both signs must occur
    assert all(abs(abs(v) - scale * 0.9) < 1e-12 for v in vals)
    assert any(v < 0 for v in vals) and any(v > 0 for v in vals)
    assert lvl(rng, 0.0) == 0.0


def test_enhance_level_map_inc1():
    lvl = _lvl("Color")
    rng = np.random.default_rng(1)
    vals = {round(lvl(rng, 10.0), 6) for _ in range(64)}
    assert vals == {0.1, 1.9}  # 1.0 ± 0.9, floored at 0.1
    vals9 = {round(lvl(rng, 9.0), 6) for _ in range(64)}
    assert vals9 == {round(1 - 0.81, 6), 1.81}
    assert lvl(rng, 0.0) == 1.0  # identity at level 0


def test_bit_level_maps_inc1():
    rng = np.random.default_rng(2)
    post, sol, sadd = _lvl("Posterize"), _lvl("Solarize"), _lvl("SolarizeAdd")
    # posterize: 4 - int(l/10*4) KEPT bits (0 at level 10)
    assert [post(rng, l) for l in (0, 4, 9, 10)] == [4, 3, 1, 0]
    # solarize: 256 - int(l/10*256)
    assert [sol(rng, l) for l in (0, 9, 10)] == [256, 26, 0]
    # solarize_add: int(l/10*110)
    assert [sadd(rng, l) for l in (0, 9, 10)] == [0, 99, 110]


# ------------------------------------------------------ pixel-math fixtures -

def test_translate_x_pixel_exact():
    """Positive relative translate: output(x,y) samples input(x + v·W, y), so
    content moves LEFT by v·W pixels (timm translate_x_rel AFFINE matrix
    (1, 0, pct·W, 0, 1, 0))."""
    img, _ = _square_img()
    out = np.asarray(T._translate_x(img, 0.25))  # 0.25 * 32 = 8 px
    white = np.where(out[12, :, 0] > 200)[0]
    assert white.min() == 8 and white.max() == 15  # was cols 16..23
    # vacated area takes the fill color (124, 116, 104)
    assert tuple(out[12, 28]) == T._FILL


def test_shear_x_pixel_exact():
    """AFFINE (1, v, 0, 0, 1, 0): row y content shifts left by v·y."""
    img, _ = _square_img()
    out = np.asarray(T._shear_x(img, 0.5))
    r8 = np.where(out[8, :, 0] > 200)[0]   # shift 4: interior 13..18
    r15 = np.where(out[15, :, 0] > 200)[0]  # shift 7.5
    assert r8.min() in (12, 13) and r8.max() in (18, 19)
    assert r15.min() in (8, 9) and r15.max() in (15, 16)


def test_rotate_90_matches_rot90():
    img, arr = _square_img()
    out = np.asarray(T._rotate(img, 90))
    np.testing.assert_array_equal(out, np.rot90(arr, 1))  # PIL rotate is CCW


def test_posterize_bit_math():
    g = _gradient_img()
    out = np.asarray(T._posterize(g, 2))[0, :, 0]
    np.testing.assert_array_equal(out, (np.arange(256) & 0b11000000).astype(np.uint8))
    # level-10 inc1 case: 0 kept bits -> black (timm posterize allows it)
    assert not np.asarray(T._posterize(g, 0)).any()
    # >= 8 bits is the identity (timm short-circuit)
    assert T._posterize(g, 8) is g


def test_solarize_bit_math():
    g = _gradient_img()
    out = np.asarray(T._solarize(g, 128))[0, :, 0]
    exp = np.arange(256)
    exp = np.where(exp >= 128, 255 - exp, exp).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)


def test_solarize_add_bit_math():
    g = _gradient_img()
    out = np.asarray(T._solarize_add(g, 110))[0, :, 0]
    exp = np.arange(256)
    exp = np.where(exp < 128, np.minimum(exp + 110, 255), exp).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)


# ------------------------------------------- sampling semantics (recorded) --

def _probe_ops(record):
    """Replace the op table with one recording probe whose level map is the
    identity, so rand_augment's sampling internals become observable."""
    return [("Probe", lambda img, v: (record.append(v), img)[1],
             lambda rng, l: l)]


def test_magnitude_gaussian_and_clamp(monkeypatch):
    record = []
    monkeypatch.setattr(T, "_RA_OPS", _probe_ops(record))
    rng = np.random.default_rng(3)
    img = _gradient_img()
    for _ in range(4000):
        T.rand_augment(rng, img, num_ops=1, magnitude=9.0, mstd=0.5, prob=1.0)
    m = np.asarray(record)
    assert m.max() <= 10.0 and m.min() >= 0.0
    assert abs(m.mean() - 9.0) < 0.05  # gauss(9, .5), clip negligible
    assert 0.40 < m.std() < 0.60
    # static magnitude is clamped too (timm clamps outside the mstd branch)
    record.clear()
    T.rand_augment(rng, img, num_ops=1, magnitude=50.0, mstd=0.0, prob=1.0)
    assert record == [10.0]


def test_apply_probability(monkeypatch):
    record = []
    monkeypatch.setattr(T, "_RA_OPS", _probe_ops(record))
    rng = np.random.default_rng(4)
    img = _gradient_img()
    n = 3000
    for _ in range(n):
        T.rand_augment(rng, img, num_ops=2, magnitude=9.0, mstd=0.5, prob=0.5)
    rate = len(record) / (2 * n)  # each of the 2 draws applies with prob 0.5
    assert 0.46 < rate < 0.54


def test_rand_augment_runs_all_real_ops():
    """With the real table, a long run must exercise every op without error
    and produce valid uint8 RGB output."""
    rng = np.random.default_rng(5)
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (48, 48, 3), np.uint8))
    for _ in range(300):
        out = T.rand_augment(rng, img, magnitude=9.0)
        assert out.size == img.size and out.mode == "RGB"


# -------------------------------------------------------- RandomErasing -----

def test_random_erasing_distribution():
    rng = np.random.default_rng(6)
    h = w = 64
    base = np.zeros((h, w, 3), np.float32)
    applied = 0
    fracs, aspects, noise = [], [], []
    n = 1500
    for _ in range(n):
        out = T.random_erasing(rng, base, p=0.25)
        ys, xs = np.where(out[..., 0] != 0)
        if len(ys) == 0:
            continue
        applied += 1
        eh = ys.max() - ys.min() + 1
        ew = xs.max() - xs.min() + 1
        fracs.append(eh * ew / (h * w))
        aspects.append(eh / ew)
        noise.append(out[ys.min():ys.max() + 1, xs.min():xs.max() + 1, :].ravel())
    # p = 0.25 (binomial std ~ 0.011 at n=1500)
    assert 0.21 < applied / n < 0.29
    fracs, aspects = np.asarray(fracs), np.asarray(aspects)
    # area fraction ~ U(0.02, 1/3) up to integer rounding of the box dims
    assert fracs.min() > 0.015 and fracs.max() < 0.35
    assert abs(np.median(fracs) - (0.02 + 1 / 3) / 2) < 0.05
    # aspect = exp(U(log .3, log 10/3)); rounding widens the tails slightly
    assert aspects.min() > 0.25 and aspects.max() < 4.0
    # 'pixel' mode fill is per-pixel N(0, 1)
    allnoise = np.concatenate(noise)
    assert abs(allnoise.mean()) < 0.02 and abs(allnoise.std() - 1.0) < 0.02


def test_random_erasing_p1_always_applies():
    rng = np.random.default_rng(7)
    base = np.zeros((32, 32, 3), np.float32)
    for _ in range(50):
        out = T.random_erasing(rng, base, p=1.0)
        assert (out != 0).any()
