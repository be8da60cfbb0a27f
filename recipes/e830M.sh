#!/bin/bash
# 830M pretraining recipe — the reference z_scripts/e830M.sh mapped onto
# train_cli.py.  Reference: 4 GPUs, ScaledAdam lr 0.05, 50k steps, dynamic
# batching 100k tokens/device, grad-accum 26, codebook weights [5,1,0.5,0.1].
# On TPU the per-device token budget and accumulation stay the same; the
# mesh does the data parallelism (use --n-model 2 on pods for 2-way TP).
set -e
DATA=${1:?usage: e830M.sh <dataset_dir> [exp_dir]}
EXP=${2:-exp/e830M}
python train_cli.py \
  --preset giga830M \
  --exp-dir "$EXP" \
  --dataset-dir "$DATA" \
  --optimizer ScaledAdam \
  --lr 0.05 \
  --num-steps 50000 \
  --max-num-tokens 100000 \
  --num-buckets 6 \
  --drop-long 1 \
  --codebook-weight 5 1 0.5 0.1 \
  --val-every-n-steps 800 \
  --train-attn chunked \
  --train-remat attn \
  --seed 1 --tb
# --train-attn chunked: +16% tokens/s and a higher batch ceiling on v5e
# (PERF.md training sweep); drop it for bit-exact dense reference numerics
# --train-remat attn: save the pre-out-proj attention result per layer so
# the backward skips the second attention forward — +9% tokens/s on v5e
# (38.2k at B=11; PERF.md remat-policy sweep).  Bit-identical grads vs
# the default full remat (tests/test_remat_policy.py)
