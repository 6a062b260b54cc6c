#!/usr/bin/env bash
# MT teacher + sequence-level KD (parity with /root/reference/exp/0-mt.sh +
# DATA/create_distillation_tsv.py): train transformer_small, generate
# train-set translations, write the distilled manifest.
set -euo pipefail
DATA=${DATA:-DATA/en-de}
SAVE=${SAVE:-checkpoints/mt_teacher}

python -m simulst_tpu.cli.train \
    --data "$DATA" --task mt --model mt_transformer --loss ce \
    --lr 5e-4 --warmup-updates 4000 --clip-norm 10 \
    --eval-metric bleu --max-tokens 16000 --max-updates 100000 --patience 20 \
    --save-dir "$SAVE" "$@"

python -m simulst_tpu.cli.generate \
    --data "$DATA" --gen-subset train --task mt \
    --checkpoint "$SAVE/checkpoint_last" --beam 5 \
    --output "$SAVE/train_gen.txt"

python - <<PY
from simulst_tpu.data.kd import create_distillation_tsv
missing = create_distillation_tsv("$DATA/train_st.tsv",
                                  "$SAVE/train_gen.txt",
                                  "$DATA/train_distilled_st.tsv")
print("distilled manifest written; missing:", missing)
PY
