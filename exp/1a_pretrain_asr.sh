#!/usr/bin/env bash
# ASR pretraining recipe (parity with /root/reference/exp/1a-pretrain_asr.sh):
# Emformer encoder + Transformer decoder, joint CTC+CE on MuST-C transcripts.
set -euo pipefail
DATA=${DATA:-DATA/en-de}
SAVE=${SAVE:-checkpoints/asr_pretrain}

python -m simulst_tpu.cli.train --cmvn global \
    --data "$DATA" --task asr --model s2t_emformer --loss joint_ctc \
    --override ctc_layer=true \
    --loss-override ctc_factor=1.0 --loss-override label_smoothing=0.1 \
    --lr 1e-3 --warmup-updates 10000 --clip-norm 10 \
    --eval-metric wer --max-tokens 40000 --update-freq 8 --max-updates 300000 --patience 25 \
    --save-dir "$SAVE" "$@"
