#!/bin/bash
# Round-5 campaign 5: MLLA blockdiag A/B + a5 blockdiag-train workaround probe.
# Run on the single v5e chip with the host otherwise quiet (CLAUDE.md:
# TPU-measurement phase discipline). One TPU process at a time.
set -x
cd /root/repo
# 1) MLLA attention formulation A/B, inference (native 256, batch 256)
python -m recnext_tpu.benchmark.bench_mlla \
  --models mlla_nano_recattn mlla_mini_recattn mlla_nano_recattn_simple mlla_mini_recattn_simple \
  --attn-impl headbatch
python -m recnext_tpu.benchmark.bench_mlla \
  --models mlla_nano_recattn mlla_mini_recattn mlla_nano_recattn_simple mlla_mini_recattn_simple \
  --attn-impl blockdiag
# 2) MLLA train-step A/B (batch 128 as in the round-4 train rows)
python -m recnext_tpu.benchmark.bench_mlla --train --batch 128 \
  --models mlla_nano_recattn mlla_mini_recattn --attn-impl headbatch
python -m recnext_tpu.benchmark.bench_mlla --train --batch 128 \
  --models mlla_nano_recattn mlla_mini_recattn --attn-impl blockdiag
