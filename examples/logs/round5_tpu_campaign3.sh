#!/bin/bash
# Round-5 TPU campaign, part 3: re-sweep the A-family lane-packing policy
# under the blockdiag attention default. The shipping MEASURED_GROUPS entries
# for a0-a2 were measured in rounds 2-3 under the head-batched attention,
# whose per-head 6-D transposes multiplied with g>1 — blockdiag packs g>1
# with NO head transposes, and the narrow early stages (a0 stage 0: c=40,
# 31% of the 128 VPU/MXU lanes) are exactly where packing should pay.
# Sequential — single-client chip.
set -x
cd "$(dirname "$0")/../.."
export RECNEXT_COMPILE_CACHE="$PWD/.xla_cache"

# retry the one part-2 train row that hit a transient remote-compile HTTP 500
timeout 3000 python -m recnext_tpu.benchmark.bench_all --train --batch 256 \
  --repeats 3 --stamp round5 --resume --out bench_train_r5.json \
  --models recnext_a5

# a0: dims (40,80,160,320), shipping (1,1,1,2)
timeout 3600 python -m recnext_tpu.benchmark.sweep_packing --model recnext_a0 \
  --batch 256 --timed 6 --groups 1,1,1,1 1,1,1,2 2,1,1,2 2,2,1,2 4,2,1,2 \
  2,2,2,2 1,2,1,2 2,1,1,1 \
  2>&1 | grep -v WARNING | tee sweep_a0_blockdiag_r5.log

# a1: dims (48,96,192,384), shipping (1,1,2,1)
timeout 3600 python -m recnext_tpu.benchmark.sweep_packing --model recnext_a1 \
  --batch 256 --timed 6 --groups 1,1,1,1 1,1,2,1 2,1,2,1 2,2,2,1 4,2,2,1 \
  2,2,1,1 2,1,1,1 \
  2>&1 | grep -v WARNING | tee sweep_a1_blockdiag_r5.log

# a2: dims (56,112,224,448), shipping (1,1,1,2)
timeout 3600 python -m recnext_tpu.benchmark.sweep_packing --model recnext_a2 \
  --batch 256 --timed 6 --groups 1,1,1,1 1,1,1,2 2,1,1,2 2,2,1,2 4,2,1,2 \
  2,1,1,1 2,2,2,2 \
  2>&1 | grep -v WARNING | tee sweep_a2_blockdiag_r5.log

# a3-a5 spot-check: does blockdiag move the round-3 winners?
timeout 2400 python -m recnext_tpu.benchmark.sweep_packing --model recnext_a3 \
  --batch 256 --timed 6 --groups 1,1,1,1 1,1,2,1 2,1,2,1 2,2,2,1 \
  2>&1 | grep -v WARNING | tee sweep_a3_blockdiag_r5.log
timeout 2400 python -m recnext_tpu.benchmark.sweep_packing --model recnext_a4 \
  --batch 256 --timed 6 --groups 1,1,1,1 1,1,2,1 2,1,2,1 2,2,2,1 \
  2>&1 | grep -v WARNING | tee sweep_a4_blockdiag_r5.log
timeout 2400 python -m recnext_tpu.benchmark.sweep_packing --model recnext_a5 \
  --batch 256 --timed 6 --groups 1,1,1,1 1,4,2,1 2,4,2,1 2,2,2,1 \
  2>&1 | grep -v WARNING | tee sweep_a5_blockdiag_r5.log

# recnext_t re-measure: the part-2 @256 row read 27.4k img/s vs 43.7k in
# round 4, but recnext_t contains NO variant-1 attention (stage 0 is empty,
# stages 1-2 are qk-first, stage 3 is LA3) — the code change cannot reach it,
# and recnext_s/b/t_share measured flat. Interleave with recnext_s as a
# control to decide anomaly vs real drift before the table of record ships.
for rep in 1 2; do
  for m in recnext_t recnext_s; do
    timeout 900 python bench.py --model $m --batch 256 --timed 6 --warmup 3 \
      2>&1 | tail -1
  done
done

# Batch-1 latency A/B: the round-5 table showed a1's device latency moving
# 0.53 -> 0.615 ms under the blockdiag default while a0's improved — at batch 1
# the removed transposes are cheap and the nh-times-denser contraction isn't
# free, so the formulation choice may be batch-dependent. Measure it.
for m in recnext_a0 recnext_a1 recnext_a2; do
  for impl in blockdiag headbatch; do
    timeout 900 python bench.py --model $m --latency --attn-impl $impl \
      2>&1 | tail -1
  done
done
