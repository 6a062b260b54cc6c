#!/usr/bin/env bash
# CIF adaptive simultaneous translation (parity with /root/reference/exp/3-cif.sh).
set -euo pipefail
DATA=${DATA:-DATA/en-de}
ASR=${ASR:-checkpoints/asr_pretrain/checkpoint_last}
SAVE=${SAVE:-checkpoints/cif}

python -m simulst_tpu.cli.train --cmvn global \
    --data "$DATA" --task st --model cif --loss cif \
    --override cif_beta=1.0 --override ctc_layer=true \
    --loss-override ctc_factor=0.3 --loss-override quant_factor=1.0 \
    --loss-override quant_type=align \
    --load-pretrained-encoder-from "$ASR" \
    --lr 5e-4 --warmup-updates 4000 --clip-norm 10 \
    --eval-metric bleu --max-tokens 40000 --update-freq 4 --max-updates 100000 --patience 25 \
    --save-dir "$SAVE" "$@"
