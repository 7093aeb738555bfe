#!/bin/bash
# Round-5 TPU campaign, part 4: follow-ups from part 3.
# - stage-1-only packing tuples the part-3 grids missed (a0's only win was
#   stage-1 g=2; test the same move on a1/a2 before updating any policy)
# - a5 train-step measurement: the blockdiag train graph reproducibly crashes
#   the remote TPU compiler (HTTP 500, tpu_compile_helper exit 1, 2/2 runs) —
#   measure the headbatch A/B form and the batch-128 blockdiag fallback to
#   decide what ships for a5 training.
set -x
cd "$(dirname "$0")/../.."
export RECNEXT_COMPILE_CACHE="$PWD/.xla_cache"

timeout 1800 python -m recnext_tpu.benchmark.sweep_packing --model recnext_a1 \
  --batch 256 --timed 6 --groups 1,2,2,1 \
  2>&1 | grep -v WARNING | tee -a sweep_a1_blockdiag_r5.log
timeout 1800 python -m recnext_tpu.benchmark.sweep_packing --model recnext_a2 \
  --batch 256 --timed 6 --groups 1,2,1,2 \
  2>&1 | grep -v WARNING | tee -a sweep_a2_blockdiag_r5.log

# a5 train: headbatch at the standard batch
timeout 3000 python bench.py --model recnext_a5 --train --batch 256 \
  --repeats 3 --timed 6 --attn-impl headbatch 2>&1 | tail -1
# a5 train: blockdiag at half batch (does the compiler crash track graph size?)
timeout 3000 python bench.py --model recnext_a5 --train --batch 128 \
  --repeats 3 --timed 6 2>&1 | tail -1

# Table-of-record refresh for the rows part 3 invalidated: a0/a3 under the
# updated MEASURED_GROUPS policy, and recnext_t whose part-2 row (27.4k) was
# an anomaly (re-measured 43.7k/43.6k interleaved with a flat control).
python - <<'EOF'
import json
rows = [r for r in json.load(open('bench_b256_r5.json'))
        if r['model'] not in ('recnext_a0', 'recnext_a3', 'recnext_t')]
open('bench_b256_r5.json', 'w').write(json.dumps(rows, indent=2))
EOF
timeout 3600 python -m recnext_tpu.benchmark.bench_all --batch 256 --timed 6 \
  --latency --stamp round5 --resume --out bench_b256_r5.json \
  --models recnext_a0 recnext_a3 recnext_t
timeout 600 python -m recnext_tpu.benchmark.merge_results \
  bench_b256_r5.json bench_b512_r5.json --out bench_results.json --markdown
