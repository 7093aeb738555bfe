#!/bin/sh
# Round-4 MLLA-trainer evidence run: the graft family through the main CLI on
# the real TPU with the MLLA recipe's ingredients active — global-norm clip 5.0
# (TRAIN.CLIP_GRAD), wd 0.05, and MESA EMA-self-distillation kicking in at 1/3
# of training (--mesa-start-ratio 0.33) so the log shows both phases.
# FAKE-100 at 64^2 keeps epochs short (same artifact scale as the m0 runs);
# EMA decay 0.99 is the step-count recalibration for the ~16-step FAKE epoch
# (see fake100_m0_distill110e_tpu.sh). Log: fake100_mlla_mesa_tpu.log
cd /root/repo
exec python -m recnext_tpu.train.main \
  --model mlla_nano_recattn_simple --data-set FAKE --fake-classes 100 \
  --batch-size 128 --epochs 9 --warmup-epochs 2 \
  --weight-decay 0.05 --clip-mode norm --clip-grad 5.0 \
  --mesa 1.0 --mesa-start-ratio 0.33 \
  --model-ema-decay 0.99 \
  --input-size 64 \
  --mixup 0.8 --cutmix 1.0 \
  --compile-cache /tmp/xla_cache \
  --output-dir /tmp/mlla_mesa_run \
  --log-every 8
