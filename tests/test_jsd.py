"""JSD consistency loss (moganet --jsd-loss / --aug-splits): golden vs an
independent torch implementation of timm's JsdCrossEntropy, plus the split-aug
loader layout and a CLI smoke run."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from recnext_tpu.train.losses import jsd_cross_entropy


def torch_jsd(output, target, num_splits=3, alpha=12.0, smoothing=0.1):
    """Reimplementation of timm JsdCrossEntropy semantics as the oracle."""
    split_size = output.shape[0] // num_splits
    logits_split = torch.split(output, split_size)
    # smoothed CE on the clean split
    logp = F.log_softmax(logits_split[0], dim=-1)
    nll = -logp.gather(1, target[:split_size][:, None])[:, 0]
    smooth = -logp.mean(dim=-1)
    loss = ((1 - smoothing) * nll + smoothing * smooth).mean()
    probs = [F.softmax(l, dim=1) for l in logits_split]
    mean_p = torch.clamp(torch.stack(probs).mean(0), 1e-7, 1)
    logm = mean_p.log()
    loss += alpha * sum(F.kl_div(logm, p, reduction="batchmean")
                        for p in probs) / len(probs)
    return loss


@pytest.mark.parametrize("splits", [2, 3])
def test_jsd_matches_torch_oracle(rng, splits):
    n, c = 6, 11
    logits = rng.normal(size=(n * splits, c)).astype(np.float32)
    labels = rng.integers(0, c, n * splits).astype(np.int32)
    want = float(torch_jsd(torch.from_numpy(logits),
                           torch.from_numpy(labels).long(),
                           num_splits=splits))
    got = float(jsd_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                  num_splits=splits))
    assert got == pytest.approx(want, rel=1e-5)


def test_identical_splits_have_zero_consistency(rng):
    n, c = 4, 7
    block = rng.normal(size=(n, c)).astype(np.float32)
    logits = np.concatenate([block, block, block])
    labels = rng.integers(0, c, 3 * n).astype(np.int32)
    with_alpha = float(jsd_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                         num_splits=3, alpha=12.0))
    no_alpha = float(jsd_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                       num_splits=3, alpha=0.0))
    assert with_alpha == pytest.approx(no_alpha, abs=1e-5)


def test_split_aug_loader_layout():
    from recnext_tpu.data.datasets import FakeData
    from recnext_tpu.data.loader import train_loader

    ds = FakeData(n=8, size=16, nb_classes=4)
    clean = lambda rng, img: np.zeros((16, 16, 3), np.float32)
    aug = lambda rng, img: np.ones((16, 16, 3), np.float32) * rng.random()
    loader = train_loader(ds, aug, batch_size=4, epoch=0, repeated_aug=False,
                          aug_splits=3, clean_transform=clean)
    batch = next(iter(loader))
    assert batch["image"].shape == (12, 16, 16, 3)
    assert batch["label"].shape == (12,)
    # block 0 is the clean view; labels repeat per block
    np.testing.assert_array_equal(batch["image"][:4], 0.0)
    assert (batch["image"][4:] > 0).all()
    np.testing.assert_array_equal(batch["label"][:4], batch["label"][4:8])
    np.testing.assert_array_equal(batch["label"][:4], batch["label"][8:])
    # augmented views of the same sample differ (independent rng streams)
    assert not np.allclose(batch["image"][4], batch["image"][8])


def test_jsd_cli_smoke(tmp_path):
    from recnext_tpu.train.main import main

    res = main(["--model", "recnext_m0", "--data-set", "FAKE", "--fake-classes", "8",
                "--epochs", "1", "--batch-size", "24", "--input-size", "32",
                "--steps-per-epoch", "2", "--no-model-ema",
                "--jsd-loss", "--aug-splits", "3", "--no-repeated-aug",
                "--output-dir", str(tmp_path)])
    assert "max_acc" in res
