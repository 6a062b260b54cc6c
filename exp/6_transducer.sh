#!/usr/bin/env bash
# Transformer-Transducer ST training + offline eval
# (parity with /root/reference/eval/eval_transducer.sh and the rnnt_criterion
# training path, codebase/criterion/rnnt_criterion.py:44-147).
set -euo pipefail
DATA=${DATA:-DATA/en-de}
ASR=${ASR:-checkpoints/asr_pretrain/checkpoint_last}
SAVE=${SAVE:-checkpoints/transducer}

python -m simulst_tpu.cli.train --cmvn global \
    --data "$DATA" --task st --model transducer --loss rnnt \
    --loss-override fastemit_lambda=0.01 --loss-override offline_factor=1.0 \
    --load-pretrained-encoder-from "$ASR" \
    --lr 5e-4 --warmup-updates 4000 --clip-norm 10 \
    --max-tokens 20000 --update-freq 8 --max-updates 100000 --patience 25 \
    --save-dir "$SAVE" "$@"

# offline greedy eval (the transducer has no beam path)
python -m simulst_tpu.cli.generate \
    --data "$DATA" --gen-subset dev --task st \
    --checkpoint "$SAVE/checkpoint_last" --model transducer --beam 1 \
    --output "$SAVE/gen_dev.txt"

# streaming eval with the transducer agent
python -m simulst_tpu.cli.stream_eval \
    --source "$DATA/dev.wav_list" --target "$DATA/dev.de" \
    --vocab "$DATA/spm_unigram4096_st.txt" \
    --checkpoint "$SAVE/checkpoint_last" --agent transducer \
    --output "$SAVE/simul_dev"
