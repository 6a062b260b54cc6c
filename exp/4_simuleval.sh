#!/usr/bin/env bash
# Full streaming evaluation sweep (parity with
# /root/reference/eval/run_all_simuleval.sh:10-79): checkpoint averaging per
# model, then {CIF checkpoints x per-checkpoint test-time beta} and
# {MMA checkpoints} x {dev, tst-COMMON, 20/40/60s long-utterance splits}.
# Every cell writes `scores` + `instances.log`; cli/latency_bleu.py turns the
# tree into the BLEU-vs-AL table.
#
# Configure via env:
#   DATA       manifest dir (wav_list + refs + vocab)
#   TGT        target language (default de)
#   CKPT_ROOT  checkpoints root (default checkpoints)
#   CIFS       space-separated CIF run names under $CKPT_ROOT
#   BETAS      space-separated per-checkpoint test-time betas (aligned, cif
#              beta re-calibration, run_all_simuleval.sh:20-33)
#   MMAS       space-separated MMA run names
#   KSWEEP     optional wait-k test-time lagging sweep for MMA checkpoints
#   SPLITS     default "dev tst-COMMON tst-COMMON_20s tst-COMMON_40s tst-COMMON_60s"
#   EXTRA      extra stream_eval args (e.g. "--fused --batch-size 8")
set -euo pipefail
DATA=${DATA:-DATA/en-de}
TGT=${TGT:-de}
CKPT_ROOT=${CKPT_ROOT:-checkpoints}
VOCAB=${VOCAB:-$DATA/spm_unigram4096_st.txt}
OUT=${OUT:-simul_results}
SPLITS=${SPLITS:-"dev tst-COMMON tst-COMMON_20s tst-COMMON_40s tst-COMMON_60s"}
CIFS=${CIFS:-"cif_${TGT}_align"}
BETAS=${BETAS:-"1.0"}
MMAS=${MMAS:-"mma_${TGT}"}
KSWEEP=${KSWEEP:-""}
EXTRA=${EXTRA:-""}

avgcheck() {  # best-5 averaging, skipped if already done
    local dir="$CKPT_ROOT/$1"
    if [ ! -d "$dir/checkpoint_avg" ]; then
        python -m simulst_tpu.cli.average_checkpoints \
            --dir "$dir" --n 5 --output "$dir/checkpoint_avg"
    fi
}

run_cell() {  # agent ckpt split outdir extra...
    local agent=$1 ckpt=$2 split=$3 outdir=$4; shift 4
    if [ ! -f "$DATA/$split.wav_list" ]; then
        echo "skip $split (no $DATA/$split.wav_list)"; return
    fi
    mkdir -p "$outdir"
    local gc=()
    [ -f "$DATA/gcmvn.npz" ] && gc=(--global-cmvn "$DATA/gcmvn.npz")
    python -m simulst_tpu.cli.stream_eval \
        --source "$DATA/$split.wav_list" --target "$DATA/$split.$TGT" \
        --checkpoint "$ckpt" --vocab "$VOCAB" --agent "$agent" \
        "${gc[@]}" --output "$outdir" $EXTRA "$@"
}

read -ra CIF_ARR <<< "$CIFS"
read -ra BETA_ARR <<< "$BETAS"
read -ra MMA_ARR <<< "$MMAS"

for m in "${CIF_ARR[@]}"; do avgcheck "$m"; done
for m in "${MMA_ARR[@]}"; do avgcheck "$m"; done

for split in $SPLITS; do
    for i in "${!CIF_ARR[@]}"; do
        m=${CIF_ARR[i]}; beta=${BETA_ARR[i]:-1.0}
        run_cell cif "$CKPT_ROOT/$m/checkpoint_avg" "$split" \
            "$OUT/$m/$split" --cif-beta "$beta"
    done
    for m in "${MMA_ARR[@]}"; do
        if [ -n "$KSWEEP" ]; then
            for k in $KSWEEP; do
                run_cell mma "$CKPT_ROOT/$m/checkpoint_avg" "$split" \
                    "$OUT/$m-k$k/$split" --waitk "$k"
            done
        else
            run_cell mma "$CKPT_ROOT/$m/checkpoint_avg" "$split" \
                "$OUT/$m/$split"
        fi
    done
done

# one command -> the BLEU-vs-AL table (latency-bleu.ipynb equivalent)
python -m simulst_tpu.cli.latency_bleu "$OUT"/*/* --tsv "$OUT/latency_bleu.tsv"
