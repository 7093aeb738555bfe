"""Training-stack tests: losses (golden vs torch reference), optimizer/schedule math,
mixup semantics, and the full sharded train step on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recnext_tpu.data.mixup import mixup_cutmix, one_hot_smooth
from recnext_tpu.models.recnext import RecNext, RecNextConfig
from recnext_tpu.parallel import batch_sharding, make_mesh, replicated, state_sharding
from recnext_tpu.train import losses as L
from recnext_tpu.train.optim import cosine_schedule, make_optimizer, scaled_lr
from recnext_tpu.train.state import TrainState
from recnext_tpu.train.step import make_eval_step, make_train_step

TINY = RecNextConfig(name="tiny", family="m", embed_dim=(8, 16, 32, 64),
                     depth=(1, 0, 1, 0), mlp_ratio=(2, 2, 2, 2), num_classes=8,
                     distillation=True)


def test_distillation_loss_golden_vs_torch():
    """Exact parity with /root/reference/losses.py for both hard and soft modes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_losses", "/root/reference/losses.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(0)
    b, n = 4, 10
    out = rng.normal(size=(b, n)).astype(np.float32)
    out_kd = rng.normal(size=(b, n)).astype(np.float32)
    teacher = rng.normal(size=(b, n)).astype(np.float32)
    labels = rng.integers(0, n, size=(b,))

    class T(torch.nn.Module):
        def forward(self, x):
            return torch.from_numpy(teacher)

    for kind, tau in [("hard", 1.0), ("soft", 2.0), ("none", 1.0)]:
        tl = ref.DistillationLoss(torch.nn.CrossEntropyLoss(), T(), kind, 0.5, tau)
        want = tl(
            torch.zeros(b, 3), (torch.from_numpy(out), torch.from_numpy(out_kd)),
            torch.from_numpy(labels),
        ).item()
        got = L.distillation_loss(
            (jnp.asarray(out), jnp.asarray(out_kd)), jnp.asarray(labels),
            jnp.asarray(teacher), base_criterion=L.cross_entropy,
            kind=kind, alpha=0.5, tau=tau,
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_soft_target_ce_matches_smoothing_ce():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(6, 12)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 12, size=(6,)))
    t = one_hot_smooth(labels, 12, 0.1)
    a = L.soft_target_cross_entropy(logits, t)
    b = L.label_smoothing_cross_entropy(logits, labels, 0.1)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_cosine_schedule_matches_reference_log():
    """Value-exact against the committed reference log (base lr 2e-3,
    logs/normal/recnext_m1_without_distill_300e.txt): cosine spans the full 300
    epochs and the lr used during epoch e is the schedule at t=max(e-1,0) — the
    reference's lr_scheduler.step(epoch) lag (main.py:413)."""
    sched = cosine_schedule(2e-3, steps_per_epoch=10, epochs=300, warmup_epochs=5,
                            cooldown_epochs=0, warmup_lr=1e-6, min_lr=1e-5)
    log = {0: 1e-6, 1: 1e-6,  # epochs 0 AND 1 run at warmup_lr_init (the lag)
           4: 1.2004e-3, 5: 1.6002e-3,
           150: 1.0154194251956726e-3,
           290: 1.659409822760516e-5,
           299: 1.0218219942528799e-5}
    for epoch, want in log.items():
        assert float(sched(epoch * 10)) == pytest.approx(want, rel=1e-3), epoch
    # cooldown epochs are EXTRA epochs, flat at min_lr, after the cycle
    sched2 = cosine_schedule(2e-3, 10, epochs=300, warmup_epochs=5,
                             cooldown_epochs=10)
    assert float(sched2(305 * 10)) == pytest.approx(1e-5)
    assert scaled_lr(1e-3, 2048) == pytest.approx(4e-3)


def test_mixup_targets_sum_to_one():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 16, 16, 3)).astype(np.float32))
    y = jnp.arange(8) % 4
    for seed in range(4):
        xm, t = mixup_cutmix(jax.random.PRNGKey(seed), x, y, num_classes=4)
        assert xm.shape == x.shape and t.shape == (8, 4)
        np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, rtol=1e-5)


def _make_state_and_step(mesh, mixup=True, distillation="hard"):
    model = RecNext(cfg=TINY)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    # constant lr: the cosine schedule's first epoch is warmup_lr=1e-6, far too
    # small for the 5-step learning assertions below to mean anything
    tx = make_optimizer(5e-3)
    state = TrainState.create(variables, tx)

    tvars = model.init(jax.random.PRNGKey(1), x0)
    teacher = lambda xb: model.apply(tvars, xb, training=False)
    step = make_train_step(model, tx, num_classes=8, teacher_apply=teacher,
                           distillation=distillation, mixup=mixup)
    return model, state, step


def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh(8, fsdp=2)
    # mixup off: random per-step target mixing adds loss noise that can mask
    # (or fake) the 5-step improvement this test asserts
    model, state, step = _make_state_and_step(mesh, mixup=False)
    st_sh = state_sharding(state, mesh)
    b_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)
    state = jax.device_put(state, st_sh)

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(rng.normal(size=(16, 32, 32, 3)).astype(np.float32), b_sh),
        "label": jax.device_put((np.arange(16) % 8).astype(np.int32), b_sh),
    }
    key = jax.device_put(jax.random.PRNGKey(0), r_sh)

    jitted = jax.jit(step, in_shardings=(st_sh, {"image": b_sh, "label": b_sh}, r_sh),
                     out_shardings=(st_sh, r_sh))
    with mesh:
        losses = []
        for _ in range(5):
            state, metrics = jitted(state, batch, key)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 5
    # it must actually LEARN on the repeated batch, not just run — a step that
    # applied zero/garbage gradients would keep the loss flat
    assert losses[-1] < losses[0]
    # EMA must track params but not equal them
    lp = jax.tree_util.tree_leaves(state.params)[0]
    le = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(lp), np.asarray(le))


def test_data_parallel_matches_single_device():
    """The same batch must produce the same loss whether sharded over 8 devices or 1 —
    global-batch BN + psum'd grads make DP exact, not approximate."""
    mesh8 = make_mesh(8, fsdp=1)
    mesh1 = make_mesh(1, fsdp=1)
    rng = np.random.default_rng(2)
    image = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)
    label = (np.arange(16) % 8).astype(np.int32)
    key = jax.random.PRNGKey(3)

    results = []
    for mesh in (mesh8, mesh1):
        model, state, step = _make_state_and_step(mesh, mixup=False)
        st_sh = state_sharding(state, mesh)
        b_sh = batch_sharding(mesh)
        r_sh = replicated(mesh)
        state = jax.device_put(state, st_sh)
        batch = {"image": jax.device_put(image, b_sh), "label": jax.device_put(label, b_sh)}
        jitted = jax.jit(step, in_shardings=(st_sh, {"image": b_sh, "label": b_sh}, r_sh),
                         out_shardings=(st_sh, r_sh))
        with mesh:
            state, metrics = jitted(state, batch, jax.device_put(key, r_sh))
            state, metrics2 = jitted(state, batch, jax.device_put(key, r_sh))
        results.append((float(metrics["loss"]), float(metrics2["loss"])))
    np.testing.assert_allclose(results[0], results[1], rtol=2e-4)


def test_grad_accum_and_remat():
    """MultiSteps: params AND the EMA only move every k micro-steps (the EMA
    horizon must not shrink k-fold); remat step stays correct."""
    model = RecNext(cfg=TINY)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    tx = make_optimizer(1e-2, grad_accum=2)
    state = TrainState.create(variables, tx, ema=True)
    teacher = lambda xb: model.apply(variables, xb, training=False)
    step = jax.jit(make_train_step(model, tx, num_classes=8, teacher_apply=teacher,
                                   distillation="hard", mixup=False, remat=True,
                                   ema_decay=0.5, grad_accum=2))
    batch = {"image": jnp.ones((4, 32, 32, 3)), "label": jnp.zeros((4,), jnp.int32)}
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
    state, m1 = step(state, batch, jax.random.PRNGKey(0))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    e1 = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))  # accumulating
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))  # EMA gated too
    state, m2 = step(state, batch, jax.random.PRNGKey(0))
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    e2 = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))  # applied at k=2
    assert not np.allclose(np.asarray(e1), np.asarray(e2))  # EMA follows the update
    assert np.isfinite(float(m2["loss"]))


def test_sharded_inference_matches_single_device():
    from recnext_tpu.parallel.serving import make_sharded_inference

    model = RecNext(cfg=TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    want = np.asarray(model.apply(variables, x, training=False))

    for fsdp, fsdp_params in [(1, False), (2, True)]:
        mesh = make_mesh(8, fsdp=fsdp)
        infer = make_sharded_inference(model, variables, mesh, fsdp_params=fsdp_params)
        with mesh:
            got = np.asarray(infer(x))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_eval_step_counts():
    model = RecNext(cfg=TINY)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    tx = make_optimizer(1e-3)
    state = TrainState.create(variables, tx)
    ev = make_eval_step(model)
    batch = {"image": jnp.zeros((4, 32, 32, 3)), "label": jnp.zeros((4,), jnp.int32)}
    m = ev(state, batch)
    assert int(m["count"]) == 4
    assert 0 <= int(m["correct1"]) <= int(m["correct5"]) <= 4
    assert np.isfinite(float(m["loss_sum"])) and float(m["loss_sum"]) > 0
    # padded tail rows (label -1) contribute to nothing
    padded = {"image": jnp.zeros((6, 32, 32, 3)),
              "label": jnp.asarray([0, 0, 0, 0, -1, -1], jnp.int32)}
    mp = ev(state, padded)
    assert int(mp["count"]) == 4
    assert float(mp["loss_sum"]) == pytest.approx(float(m["loss_sum"]), rel=1e-5)
    assert int(mp["correct1"]) == int(m["correct1"])


def test_sharded_inference_with_packed_executor():
    """The lane-packed executor serves through the sharded-inference wrapper:
    batch sharded over the mesh, packed forward, logits == fused apply."""
    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.packed_infer import packed_apply
    from recnext_tpu.parallel.serving import make_sharded_inference

    cfg = TINY
    model = RecNext(cfg=cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(16, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=cfg, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))

    mesh = make_mesh(8)
    infer = make_sharded_inference(
        fused, fused_vars, mesh,
        apply_fn=lambda v, xx: packed_apply(v, cfg, xx, group=2))
    with mesh:
        got = np.asarray(infer(x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)


def test_fuse_params_traceable_matches_numpy():
    """fuse_params(xp=jnp) under jit produces the same fused tree as the host
    numpy transform — the in-training fused eval relies on this (no host
    round-trip; train/step.py:make_fused_eval_step). Covers the dual-head
    classifier (TINY is distillation=True) and the L family's RepVGGDW
    (.at-based center add)."""
    from recnext_tpu.fusion import fuse_params

    l_cfg = RecNextConfig(name="small_l", family="l", embed_dim=(16, 32, 64, 128),
                          depth=(1, 1, 2, 2), mlp_ratio=(2, 2, 2, 1.5),
                          num_heads=(1, 1, 1, 2), split_rates=(4, 4, 4, 4),
                          num_classes=10)
    for cfg in (TINY, l_cfg):
        model = RecNext(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
        want = fuse_params(variables)  # numpy path
        got = jax.jit(lambda v: fuse_params(v, xp=jnp))(variables)
        assert jax.tree.structure(want) == jax.tree.structure(got)
        for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-6, rtol=1e-6)


def test_fused_eval_step_matches_unfused():
    """make_fused_eval_step (BN-fused + lane-packed deployment graph) counts the
    same correct/valid totals as the reference-style unfused eval, for the
    packed m family, the fused-model L family, and the EMA weight set."""
    from recnext_tpu.train.step import make_fused_eval_step

    rng = np.random.default_rng(3)
    batch = {"image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
             "label": jnp.asarray([0, 1, 2, 3, 4, 5, -1, -1], jnp.int32)}

    l_cfg = RecNextConfig(name="small_l", family="l", embed_dim=(16, 32, 64, 128),
                          depth=(1, 1, 2, 2), mlp_ratio=(2, 2, 2, 1.5),
                          num_heads=(1, 1, 1, 2), split_rates=(4, 4, 4, 4),
                          num_classes=10)
    for cfg in (TINY, l_cfg):
        model = RecNext(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(1), batch["image"][:1])
        # perturb BN stats so fusion is non-trivial
        variables["batch_stats"] = jax.tree.map(
            lambda s: s + 0.1 * jnp.abs(jnp.asarray(
                rng.normal(size=s.shape), s.dtype)) + 0.05,
            variables["batch_stats"])
        state = TrainState.create(variables, make_optimizer(1e-3))
        fused_model = (RecNext(cfg=cfg, fused=True)
                       if cfg.family not in ("m", "a") else None)
        for ema in (False, True):
            want = jax.jit(make_eval_step(model, ema=ema))(state, batch)
            got = jax.jit(make_fused_eval_step(
                cfg, ema=ema, fused_model=fused_model,
                dtype=jnp.float32))(state, batch)
            assert int(got["count"]) == int(want["count"]) == 6
            assert int(got["correct1"]) == int(want["correct1"])
            assert int(got["correct5"]) == int(want["correct5"])
            np.testing.assert_allclose(float(got["loss_sum"]),
                                       float(want["loss_sum"]), rtol=1e-4)
