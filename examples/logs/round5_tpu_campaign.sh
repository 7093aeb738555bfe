#!/bin/bash
# Round-5 TPU measurement campaign (v5e, single chip via axon tunnel).
# Sequential — the chip is single-client. Exact commands of record for the
# round-5 PERF.md sections; each step flushes its own JSON artifact.
set -x
cd "$(dirname "$0")/../.."
export RECNEXT_COMPILE_CACHE="$PWD/.xla_cache"

# 1. A-family e2e attention-formulation levers (VERDICT r4 item 1)
for m in recnext_a0 recnext_a1 recnext_a2; do
  for impl in headbatch blockdiag blockdiag_fused; do
    timeout 900 python bench.py --model $m --batch 256 --timed 6 --warmup 3 \
      --attn-impl $impl 2>&1 | tail -1
  done
done

# 2. Op-level breakdown inside the packed A block, a0 + a2, all stages
timeout 3600 python -m recnext_tpu.benchmark.attn_breakdown --model recnext_a0 \
  --stages 0 1 2 3 --batch 256 --out attn_breakdown_a0_r5.json
timeout 3600 python -m recnext_tpu.benchmark.attn_breakdown --model recnext_a2 \
  --stages 0 1 2 3 --batch 256 --out attn_breakdown_a2_r5.json

# 3. Batch-occupancy scan (VERDICT r4 item 2): priority variants first,
#    then the rest of the zoo (adaptive climb; resume-safe)
timeout 5400 python -m recnext_tpu.benchmark.occupancy_scan --resume \
  --models recnext_t recnext_s recnext_b recnext_a0 recnext_a1 recnext_a2 \
  --out occupancy_r5.json
timeout 7200 python -m recnext_tpu.benchmark.occupancy_scan --resume \
  --out occupancy_r5.json

# 4. Variance-honest train bench (VERDICT r4 item 7): median-of-3 + spread
timeout 10000 python -m recnext_tpu.benchmark.bench_all --train --batch 256 \
  --repeats 3 --stamp round5 --resume --out bench_train_r5.json \
  --models recnext_m0 recnext_m1 recnext_m2 recnext_m3 recnext_m4 recnext_m5 \
           recnext_a0 recnext_a1 recnext_a2 recnext_a3 recnext_a4 recnext_a5 \
           recnext_t recnext_s recnext_b recnext_t_share_channel \
           recnext_s_share_channel recnext_b_share_channel

# 6. On-TPU finetune evidence (VERDICT r4 item 3): FAKE pretrain @96² ->
#    --finetune warm start @128² with a different class count
timeout 3000 python -m recnext_tpu.train.main --model recnext_m0 \
  --data-set FAKE --fake-classes 8 --epochs 3 --batch-size 128 \
  --input-size 96 --steps-per-epoch 16 --simple-aug --no-model-ema \
  --lr 0.02 --warmup-epochs 0 --output-dir /tmp/ft_pre \
  --export-teacher /tmp/ft_weights 2>&1 | tail -6
timeout 3000 python -m recnext_tpu.train.main --model recnext_m0 \
  --data-set FAKE --fake-classes 4 --epochs 2 --batch-size 128 \
  --input-size 128 --steps-per-epoch 16 --simple-aug --no-model-ema \
  --lr 0.02 --warmup-epochs 0 --finetune /tmp/ft_weights \
  --output-dir /tmp/ft_warm 2>&1 | tail -6

# 5. A-backbone detection row (VERDICT r4 item 8): RetinaNet-a3 @512²
timeout 3600 python -m recnext_tpu.tasks.train_det \
  --preset det_recnext_a3_fpn_1x_coco --detector retinanet --img-size 512 \
  --batch-size 8 --benchmark 20 --eval-every 0 --steps-per-epoch 1 \
  --fake-size 8 --output-dir /tmp/det_a3_bench 2>&1 | tail -3
