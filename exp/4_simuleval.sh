#!/usr/bin/env bash
# Streaming evaluation sweep (parity with /root/reference/eval/run_all_simuleval.sh).
set -euo pipefail
DATA=${DATA:-DATA/en-de}
CKPT=${CKPT:-checkpoints/mma/checkpoint_avg}
VOCAB=${VOCAB:-$DATA/spm_unigram4096_st.txt}
AGENT=${AGENT:-mma}
OUT=${OUT:-simul_results}

for SPLIT in dev tst-COMMON; do
  python -m simulst_tpu.cli.stream_eval \
      --source "$DATA/$SPLIT.wav_list" --target "$DATA/$SPLIT.de" \
      --checkpoint "$CKPT" --vocab "$VOCAB" --agent "$AGENT" \
      --output "$OUT/$SPLIT" "$@"
done
