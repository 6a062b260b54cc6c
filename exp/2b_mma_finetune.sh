#!/usr/bin/env bash
# Whole-model latency finetune from a converged lat0 MMA checkpoint
# (parity with /root/reference/exp/2b-mma_finetune.sh: --finetune-from-model
# loads all weights but resets the optimizer/LR schedule; our --load-params
# has the same semantics).  LATVAR sweeps the latency-loss weight.
set -euo pipefail
DATA=${DATA:-DATA/en-de}
BASE=${BASE:-checkpoints/mma_lat0_0/checkpoint_avg}
LATVAR=${LATVAR:-0.1}
SAVE=${SAVE:-checkpoints/mma_lat${LATVAR//./_}}

python -m simulst_tpu.cli.train --cmvn global \
    --data "$DATA" --task st --model mma --loss mma \
    --override simul_attn_type=hard_aligned_fixed_pre_decision \
    --loss-override latency_factor="$LATVAR" \
    --load-params "$BASE" \
    --lr 2e-4 --warmup-updates 1000 --clip-norm 10 \
    --eval-metric bleu --max-tokens 40000 --update-freq 4 \
    --max-updates 30000 --patience 10 \
    --save-dir "$SAVE" "$@"
