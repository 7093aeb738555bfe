#!/bin/sh
# Round-4 MLLA-trainer evidence run: the graft family through the main CLI on
# the real TPU with the MLLA recipe's ingredients active — global-norm clip 5.0
# (TRAIN.CLIP_GRAD), wd 0.05, and MESA EMA-self-distillation kicking in at 1/3
# of training (--mesa-start-ratio 0.33) so the log shows both phases.
# FAKE-100 at 64^2 keeps epochs short (same artifact scale as the m0 runs);
# EMA decay 0.99 and lr 4e-3 are the step-count recalibration for the ~16-step
# FAKE epoch (see fake100_m0_distill110e_tpu.sh — the recipe's 1e-3 base lr
# scaled to 2.5e-4 at batch 128 barely moves in 18 toy epochs; 4e-3 matches
# the m0 artifact runs). Log: fake100_mlla_mesa_tpu.log — top-1 1% -> 18.4%,
# with the MESA loss term visibly switching on at epoch 6 (ratio 0.33).
cd /root/repo
exec python -m recnext_tpu.train.main \
  --model mlla_nano_recattn_simple --data-set FAKE --fake-classes 100 \
  --batch-size 128 --epochs 18 --warmup-epochs 2 \
  --lr 0.004 --weight-decay 0.05 --clip-mode norm --clip-grad 5.0 \
  --mesa 1.0 --mesa-start-ratio 0.33 \
  --model-ema-decay 0.99 \
  --input-size 64 \
  --mixup 0.8 --cutmix 1.0 \
  --compile-cache /tmp/xla_cache \
  --output-dir /tmp/mlla_mesa_run \
  --log-every 8
