#!/usr/bin/env bash
# MMA simultaneous translation training (parity with /root/reference/exp/2-mma.sh):
# infinite-lookback monotonic attention + fixed pre-decision, latency loss.
set -euo pipefail
DATA=${DATA:-DATA/en-de}
ASR=${ASR:-checkpoints/asr_pretrain/checkpoint_last}
SAVE=${SAVE:-checkpoints/mma}
LAT=${LAT:-0.1}   # latency_avg_weight sweep knob

python -m simulst_tpu.cli.train --cmvn global \
    --data "$DATA" --task st --model mma --loss mma \
    --override simul_attn_type=infinite_lookback_fixed_pre_decision \
    --override fixed_pre_decision_ratio=8 --override mass_preservation=true \
    --loss-override latency_avg_weight="$LAT" \
    --loss-override latency_avg_type=differentiable_average_lagging \
    --load-pretrained-encoder-from "$ASR" \
    --lr 5e-4 --warmup-updates 4000 --clip-norm 10 \
    --eval-metric bleu --max-tokens 40000 --update-freq 4 --max-updates 100000 --patience 25 \
    --save-dir "$SAVE" "$@"
