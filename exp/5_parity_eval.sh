#!/usr/bin/env bash
# Checkpoint-parity evaluation harness (round-2): convert a reference fairseq
# checkpoint and reproduce its offline + streaming numbers
# (BASELINE.md targets: ASR WER 9.65/12.85; MMA BLEU 22.88 @ AL 1583ms;
#  CIF BLEU 20.59 @ AL 1389ms).
set -euo pipefail
DATA=${DATA:?path to prepared MuST-C en-de dir}
FAIRSEQ_CKPT=${FAIRSEQ_CKPT:?path to reference .pt checkpoint}
MODEL=${MODEL:-mma}            # s2t_emformer | mma | cif
VOCAB=${VOCAB:-$DATA/spm_unigram4096_st.txt}
OUT=${OUT:-parity/$MODEL}

python - <<PY
import jax
from simulst_tpu.compat.fairseq_converter import convert
from simulst_tpu.data.vocab import Vocabulary
from simulst_tpu.models import get_model
from simulst_tpu.train.checkpoint import save_checkpoint
from simulst_tpu import config as cfglib

vocab = Vocabulary.from_txt("$VOCAB")
cls = get_model("$MODEL")
cfg = cls.Config(vocab_size=len(vocab), ctc_layer="$MODEL" != "mma")
model = cls(cfg)
params = model.init(jax.random.PRNGKey(0))
params = convert("$MODEL", params, "$FAIRSEQ_CKPT")
save_checkpoint("$OUT/converted", params,
                metadata={"model": "$MODEL", "config": cfglib.to_dict(cfg)})
print("converted ->", "$OUT/converted")
PY

# offline parity (WER for ASR checkpoints, BLEU for ST)
python -m simulst_tpu.cli.generate --data "$DATA" --gen-subset tst-COMMON \
    --checkpoint "$OUT/converted" --beam 5 \
    --task "$([ "$MODEL" = s2t_emformer ] && echo asr || echo st)" \
    --scoring "$([ "$MODEL" = s2t_emformer ] && echo wer || echo bleu)" \
    --output "$OUT/generate.txt"

# streaming parity (ST models)
if [ "$MODEL" != "s2t_emformer" ]; then
  python -m simulst_tpu.cli.stream_eval \
      --source "$DATA/tst-COMMON.wav_list" --target "$DATA/tst-COMMON.de" \
      --checkpoint "$OUT/converted" --vocab "$VOCAB" \
      --agent "$MODEL" --fused --global-cmvn "$DATA/gcmvn.npz" \
      --output "$OUT/simul"
  python -m simulst_tpu.cli.latency_bleu "$OUT/simul"
fi
