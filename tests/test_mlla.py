"""MLLA ablation variants: golden parity vs the reference torch models."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recnext_tpu.convert import mlla_torch_to_flax
from recnext_tpu.models.mlla import MLLA, MLLAConfig
from tests.torch_ref import load_ref_module, to_nhwc


def _small_cfg(variant):
    return MLLAConfig(name=f"small_{variant}", variant=variant, embed_dim=16,
                      depths=(1, 1, 1, 1), num_heads=(2, 4, 8, 16),
                      expansion_ratio=2.5 if variant == "recconv" else 2.0,
                      num_classes=10, img_size=64)


REF_FILES = {
    "recconv": "mlla/models/mlla_recconv.py",
    "recattn": "mlla/models/mlla_recattn.py",
    "recattn_simple": "mlla/models/mlla_recattn_simple.py",
}


@pytest.mark.parametrize("variant", ["recconv", "recattn", "recattn_simple"])
def test_mlla_parity_eval(variant):
    cfg = _small_cfg(variant)
    mod = load_ref_module(REF_FILES[variant], f"ref_mlla_{variant}")
    torch.manual_seed(0)
    kwargs = dict(img_size=cfg.img_size, num_classes=cfg.num_classes,
                  embed_dim=cfg.embed_dim, depths=list(cfg.depths),
                  drop_path_rate=0.0)
    if variant == "recconv":
        tm = mod.MLLA(expansion_ratio=cfg.expansion_ratio, **kwargs)
    else:
        tm = mod.MLLA(num_heads=list(cfg.num_heads), **kwargs)
    tm.eval()
    # randomize stem BN stats so fusion-free BN paths are nontrivial
    g = torch.Generator().manual_seed(0)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)

    variables = mlla_torch_to_flax(tm.state_dict())
    fm = MLLA(cfg=cfg)
    x_t = torch.randn(2, 3, cfg.img_size, cfg.img_size)
    with torch.no_grad():
        y_t = tm(x_t).numpy()
    y_j = np.asarray(fm.apply(variables, jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_j, y_t, atol=3e-4, rtol=1e-4)


@pytest.mark.parametrize("variant", ["recattn", "recattn_simple"])
def test_mlla_blockdiag_matches_headbatch(variant):
    """attn_impl='blockdiag' (channel-layout masked-dense LA, the round-5
    formulation) must reproduce the shipping head-batched MLLA forward with
    the SAME parameters — reassociation-bounded, no param change."""
    import dataclasses

    import jax

    cfg = _small_cfg(variant)
    m_head = MLLA(cfg=dataclasses.replace(cfg, attn_impl="headbatch"))
    m_blk = MLLA(cfg=dataclasses.replace(cfg, attn_impl="blockdiag"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, cfg.img_size, cfg.img_size, 3)),
                    jnp.float32)
    variables = m_head.init(jax.random.PRNGKey(0), x)
    y_h = np.asarray(m_head.apply(variables, x))
    y_b = np.asarray(m_blk.apply(variables, x))
    np.testing.assert_allclose(y_b, y_h, rtol=2e-4, atol=2e-5)
