# Round-3 long-horizon composed-recipe run (VERDICT item 5). Three legs:
# leg 1 (epochs 0-35, --eval-ema, ema decay 0.999) then SIGKILL; resume legs
# below. Log: examples/logs/fake100_m0_distill110e_tpu.log
#
# NOTE (schedule semantics changed after this run): these legs ran under the
# older cosine_schedule where --cooldown-epochs was carved OUT of --epochs
# (110 total = cosine over 100 + 10 flat). The current timm-exact schedule
# appends cooldown INSTEAD; the equivalent invocation today is
# --epochs 100 --cooldown-epochs 10 (same 110-epoch trajectory, plus the
# reference's one-epoch step() lag — see train/optim.py:cosine_schedule).
#!/bin/sh
# Round-3 VERDICT item 5: long-horizon composed recipe (110 epochs, FAKE-100,
# hard distillation from the trained RegNetY-160 teacher, EMA + per-epoch EMA
# eval, cosine + 10-epoch cooldown). A mid-run kill + auto-resume is driven
# from outside this script.
cd /root/repo
exec python -m recnext_tpu.train.main \
  --model recnext_m0 --data-set FAKE --fake-classes 100 \
  --batch-size 128 --epochs 110 --warmup-epochs 5 --cooldown-epochs 10 \
  --lr 0.004 --min-lr 1e-5 \
  --distillation-type hard --distillation-alpha 0.5 \
  --teacher-model regnety_160 --teacher-ckpt /tmp/longrun/teacher160/teacher \
  --eval-ema --model-ema-decay 0.999 \
  --mixup 0.8 --cutmix 1.0 \
  --compile-cache /tmp/xla_cache \
  --output-dir /tmp/longrun/student_m0 \
  --log-every 32

#!/bin/sh
# Resume leg of the round-3 long-horizon run after the mid-run SIGKILL at
# epoch 35 (in-flight). Identical recipe, MINUS --eval-ema so the remaining
# epochs log BOTH raw (test_acc*) and EMA (ema_test_acc*) accuracy per epoch
# (the EMA-vs-raw crossover evidence); auto-resume picks up from the orbax
# latest ckpt in --output-dir.
cd /root/repo
exec python -m recnext_tpu.train.main \
  --model recnext_m0 --data-set FAKE --fake-classes 100 \
  --batch-size 128 --epochs 110 --warmup-epochs 5 --cooldown-epochs 10 \
  --lr 0.004 --min-lr 1e-5 \
  --distillation-type hard --distillation-alpha 0.5 \
  --teacher-model regnety_160 --teacher-ckpt /tmp/longrun/teacher160/teacher \
  --model-ema-decay 0.999 \
  --mixup 0.8 --cutmix 1.0 \
  --compile-cache /tmp/xla_cache \
  --output-dir /tmp/longrun/student_m0 \
  --log-every 32

#!/bin/sh
# Second resume leg of the round-3 long-horizon run after the mid-run SIGKILL at
# epoch 35 (in-flight). Identical recipe, MINUS --eval-ema so the remaining
# epochs log BOTH raw (test_acc*) and EMA (ema_test_acc*) accuracy per epoch
# (the EMA-vs-raw crossover evidence); auto-resume picks up from the orbax
# latest ckpt in --output-dir.
cd /root/repo
exec python -m recnext_tpu.train.main \
  --model recnext_m0 --data-set FAKE --fake-classes 100 \
  --batch-size 128 --epochs 110 --warmup-epochs 5 --cooldown-epochs 10 \
  --lr 0.004 --min-lr 1e-5 \
  --distillation-type hard --distillation-alpha 0.5 \
  --teacher-model regnety_160 --teacher-ckpt /tmp/longrun/teacher160/teacher \
  --model-ema-decay 0.99 \
  --mixup 0.8 --cutmix 1.0 \
  --compile-cache /tmp/xla_cache \
  --output-dir /tmp/longrun/student_m0 \
  --log-every 32
# (decay 0.999 was miscalibrated for the tiny FAKE epoch: ~16 steps/epoch means
# 0.999^~600 = 0.55 of the INIT weights were still in the EMA at epoch 37 —
# ema_test_acc1 7.8 vs raw 54.9. 0.99 is the step-count-equivalent of the
# reference's 0.99996 at ImageNet scale: half-life ~70 steps ~ 5 epochs.)
