#!/bin/bash
# Round-5 TPU measurement campaign, part 2 (v5e, single chip via axon tunnel).
# Part 1 (examples/logs/round5_tpu_campaign.sh) measured the attention
# formulation levers + op breakdowns + occupancy scan; the VM restarted before
# the train bench / finetune / detection steps, and the blockdiag default then
# landed in the model + packed executor — so the throughput table of record is
# re-measured here from scratch under the shipping configuration.
# Sequential — the chip is single-client; each step flushes its own JSON.
set -x
cd "$(dirname "$0")/../.."
export RECNEXT_COMPILE_CACHE="$PWD/.xla_cache"

# 1. Throughput table of record @256 (all 18, blockdiag default, batch-1 latency)
timeout 7200 python -m recnext_tpu.benchmark.bench_all --batch 256 --timed 6 \
  --latency --stamp round5 --resume --out bench_b256_r5.json \
  --models recnext_m0 recnext_m1 recnext_m2 recnext_m3 recnext_m4 recnext_m5 \
           recnext_a0 recnext_a1 recnext_a2 recnext_a3 recnext_a4 recnext_a5 \
           recnext_t recnext_s recnext_b recnext_t_share_channel \
           recnext_s_share_channel recnext_b_share_channel

# 2. @512 for the models whose shipping batch was 512 (m0, t_share) + the
#    blockdiag a0-a2 occupancy sanity (the round-5 occupancy scan predates the
#    blockdiag default)
timeout 3600 python -m recnext_tpu.benchmark.bench_all --batch 512 --timed 6 \
  --stamp round5 --resume --out bench_b512_r5.json \
  --models recnext_m0 recnext_t_share_channel recnext_a0 recnext_a1 recnext_a2

# 3. Best-of-batch merge -> the table of record
timeout 600 python -m recnext_tpu.benchmark.merge_results \
  bench_b256_r5.json bench_b512_r5.json --out bench_results.json --markdown

# 4. Variance-honest train bench (VERDICT r4 item 7): median-of-3 + spread
timeout 14000 python -m recnext_tpu.benchmark.bench_all --train --batch 256 \
  --repeats 3 --stamp round5 --resume --out bench_train_r5.json \
  --models recnext_m0 recnext_m1 recnext_m2 recnext_m3 recnext_m4 recnext_m5 \
           recnext_a0 recnext_a1 recnext_a2 recnext_a3 recnext_a4 recnext_a5 \
           recnext_t recnext_s recnext_b recnext_t_share_channel \
           recnext_s_share_channel recnext_b_share_channel

# 5. On-TPU finetune evidence (VERDICT r4 item 3): FAKE pretrain @96² ->
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

# 6. A-backbone detection row (VERDICT r4 item 8): RetinaNet-a3 @512²
timeout 3600 python -m recnext_tpu.tasks.train_det \
  --preset det_recnext_a3_fpn_1x_coco --detector retinanet --img-size 512 \
  --batch-size 8 --benchmark 20 --eval-every 0 --steps-per-epoch 1 \
  --fake-size 8 --output-dir /tmp/det_a3_bench 2>&1 | tail -3

# 7. Driver-headline sanity: default bench (m1 fused bf16 @224, blockdiag era)
timeout 900 python bench.py 2>&1 | tail -1
