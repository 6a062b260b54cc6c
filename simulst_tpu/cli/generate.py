"""Offline generation CLI — the eval/generate.py replacement.

Batch beam/greedy decoding with S-/T-/H-/D- line output (fairseq-generate
format, parsed downstream by the KD builder) and corpus BLEU/WER scoring
(reference /root/reference/eval/generate.py:255-396).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu import config as cfglib
from simulst_tpu.data.dataset import BatcherConfig, SpeechDataset, make_batches
from simulst_tpu.data.manifest import load_tsv
from simulst_tpu.data.vocab import EOS, Vocabulary
from simulst_tpu.decode.beam import BeamConfig, beam_search, greedy_decode
from simulst_tpu.decode.scoring import corpus_bleu, wer
from simulst_tpu.models import get_model
from simulst_tpu.models import s2t_emformer as s2t
from simulst_tpu.nn import attention as attn_mod
from simulst_tpu.nn import transformer as tfm
from simulst_tpu.train.checkpoint import load_checkpoint


def _run_search(step_fn, dstate, reorder_fn, b, beam_cfg: BeamConfig,
                prefix_tokens=None, bos=None):
    if beam_cfg.beam_size == 1:
        return greedy_decode(step_fn, dstate, b, beam_cfg, bos=bos,
                             prefix_tokens=prefix_tokens)
    res = beam_search(step_fn, dstate, b, beam_cfg, reorder_fn,
                      prefix_tokens=prefix_tokens, bos=bos)
    return res.tokens[:, 0], res.lengths[:, 0]


def _build_cif(model, params, batch, beam_cfg: BeamConfig,
               overshoot_weight: float = 1.0):
    """Offline CIF decoding: fire from alpha (no teacher forcing), then
    greedy/beam over the position-aligned CIF features (the reference's
    fairseq-generate path for cif_transformer, eval/eval_cif.sh)."""
    from simulst_tpu.models import cif as cif_mod
    cfg = model.cfg
    enc = s2t.encoder_forward(params["encoder"], cfg,
                              jnp.asarray(batch["feats"]),
                              jnp.asarray(batch["feat_lengths"]))
    valid = (jnp.arange(enc.encoder_out.shape[1])[None, :]
             < enc.lengths[:, None])
    max_out = min(int(enc.encoder_out.shape[1] / cfg.cif_beta) + 2,
                  beam_cfg.max_len + 2)
    cif_out, _ = cif_mod.cif_layer_forward(params["cif"], cfg,
                                           enc.encoder_out, valid,
                                           max_out_len=max_out)
    b = batch["feats"].shape[0]
    beam = beam_cfg.beam_size
    cif_buf = jnp.repeat(cif_out.cif_out, beam, axis=0)
    cif_len = jnp.repeat(cif_out.cif_lengths, beam, axis=0)
    dstate = cif_mod.cif_decoder_init_state(cfg, b * beam, beam_cfg.max_len + 1)

    def step_fn(state, tokens):
        return cif_mod.cif_decoder_step(params["decoder"], cfg, state, tokens,
                                        cif_buf, cif_len,
                                        overshoot_weight=overshoot_weight)

    def reorder_fn(state, idx):
        def re(c):
            return attn_mod.KVCache(k=c.k[idx], v=c.v[idx], length=c.length[idx])
        return cif_mod.CIFDecoderState(
            caches=tuple(re(c) for c in state.caches),
            cross_caches=tuple(re(c) for c in state.cross_caches),
            step=state.step[idx])

    return step_fn, dstate, reorder_fn


def decode_batch_cif(model, params, batch, beam_cfg: BeamConfig,
                     overshoot_weight: float = 1.0, prefix_tokens=None):
    return _run_search(*_build_cif(model, params, batch, beam_cfg,
                                   overshoot_weight),
                       batch["feats"].shape[0], beam_cfg, prefix_tokens)


def _build_mma(model, params, batch, beam_cfg: BeamConfig):
    """Offline MMA decoding (online=False: wait-k clipped to source end, no
    early READ returns — fairseq SequenceGenerator semantics)."""
    from simulst_tpu.models import mma as mma_mod
    cfg = model.cfg
    enc = s2t.encoder_forward(params["encoder"], cfg,
                              jnp.asarray(batch["feats"]),
                              jnp.asarray(batch["feat_lengths"]))
    b = batch["feats"].shape[0]
    beam = beam_cfg.beam_size
    enc_buf = jnp.repeat(enc.encoder_out, beam, axis=0)
    src_len = jnp.repeat(enc.lengths, beam, axis=0)
    dstate = mma_mod.mma_decoder_init_state(cfg, b * beam, beam_cfg.max_len + 1)
    offline = jnp.asarray(False)

    def step_fn(state, tokens):
        logits, action, state = mma_mod.mma_decoder_step(
            params["decoder"], cfg, state, tokens, enc_buf, src_len, offline)
        return logits, state

    def reorder_fn(state, idx):
        def re(c):
            return attn_mod.KVCache(k=c.k[idx], v=c.v[idx], length=c.length[idx])
        def rm(m):
            return mma_mod.MonotonicState(head_step=m.head_step[idx],
                                          head_read=m.head_read[idx])
        return mma_mod.MMADecoderState(
            caches=tuple(re(c) for c in state.caches),
            monotonic=tuple(rm(m) for m in state.monotonic),
            step=state.step[idx])

    return step_fn, dstate, reorder_fn


def decode_batch_mma(model, params, batch, beam_cfg: BeamConfig,
                     prefix_tokens=None):
    return _run_search(*_build_mma(model, params, batch, beam_cfg),
                       batch["feats"].shape[0], beam_cfg, prefix_tokens)


def decode_batch_transducer(model, params, batch, beam_cfg: BeamConfig,
                            prefix_tokens=None):
    """Offline transducer decode over the emit-scan lattice path: greedy or
    beam over the per-step emit distribution.  The reference runs fairseq's
    SequenceGenerator over TransducerDecoder's incremental forward (the
    forced-emit-at-source-EOS scan, transducer_model.py:165-209, via
    eval/eval_transducer.sh + generate.py:201-207), so its beam hypotheses
    each carry their own emit cursor; here that cursor (prev_emit) lives in
    TransducerState and is gathered on beam reorder like the KV caches."""
    from simulst_tpu.models.transducer import TransducerState
    cfg = model.cfg
    enc = s2t.encoder_forward(params["encoder"], cfg,
                              jnp.asarray(batch["feats"]),
                              jnp.asarray(batch["feat_lengths"]))
    # decode_step pools the visible source itself (downsample > 1), exactly
    # like the reference's incremental path — pass RAW encoder frames
    src, src_lens = enc.encoder_out, enc.lengths
    b = batch["feats"].shape[0]
    beam = beam_cfg.beam_size
    if beam > 1:
        src = jnp.repeat(src, beam, axis=0)
        src_lens = jnp.repeat(src_lens, beam, axis=0)
    state = model.init_decode_state(src.shape[0], beam_cfg.max_len + 1)

    step = jax.jit(lambda st, tok: model.decode_step(params, st, tok, src,
                                                     src_lens, online=False))

    def step_fn(st, tokens):
        logits, _, st = step(st, tokens)
        return logits, st

    def reorder_fn(st, idx):
        return TransducerState(
            caches=tuple(attn_mod.KVCache(k=c.k[idx], v=c.v[idx],
                                          length=c.length[idx])
                         for c in st.caches),
            prev_emit=st.prev_emit[idx], step=st.step[idx])

    # first decode input = bos(=blank), reference replaces the front EOS
    return _run_search(step_fn, state, reorder_fn, b, beam_cfg,
                       prefix_tokens=prefix_tokens, bos=cfg.blank_idx)


def decode_batch(model, params, batch, beam_cfg: BeamConfig,
                 prefix_tokens=None):
    """Returns (tokens (B, L), lengths (B,)) best hypotheses."""
    from simulst_tpu.models.cif import CIFModel
    from simulst_tpu.models.mma import MMAModel
    from simulst_tpu.models.transducer import TransducerModel
    if isinstance(model, CIFModel):
        return decode_batch_cif(model, params, batch, beam_cfg,
                                prefix_tokens=prefix_tokens)
    if isinstance(model, MMAModel):
        return decode_batch_mma(model, params, batch, beam_cfg,
                                prefix_tokens=prefix_tokens)
    if isinstance(model, TransducerModel):
        return decode_batch_transducer(model, params, batch, beam_cfg,
                                       prefix_tokens=prefix_tokens)
    return _run_search(*_build_std(model, params, batch, beam_cfg),
                       batch["feats"].shape[0], beam_cfg, prefix_tokens)


def _build_std(model, params, batch, beam_cfg: BeamConfig):
    cfg = model.cfg
    enc = s2t.encoder_forward(params["encoder"], cfg,
                              jnp.asarray(batch["feats"]),
                              jnp.asarray(batch["feat_lengths"]))
    b = batch["feats"].shape[0]
    beam = beam_cfg.beam_size
    enc_out = jnp.repeat(enc.encoder_out, beam, axis=0)
    enc_valid = (jnp.arange(enc_out.shape[1])[None, :]
                 < jnp.repeat(enc.lengths, beam)[:, None])
    dstate = tfm.decoder_init_state(cfg.decoder, b * beam, beam_cfg.max_len + 1)

    def step_fn(state, tokens):
        return tfm.decoder_step(params["decoder"], cfg.decoder, state, tokens,
                                enc_out, enc_valid)

    def reorder_fn(state, idx):
        def re(c):
            return attn_mod.KVCache(k=c.k[idx], v=c.v[idx], length=c.length[idx])
        return tfm.DecoderState(caches=tuple(re(c) for c in state.caches),
                                step=state.step[idx])

    return step_fn, dstate, reorder_fn


def _build_mt(model, params, batch, beam_cfg: BeamConfig):
    """Text-to-text decoding for the MT teacher (seq-KD generation)."""
    from simulst_tpu.models.mt_transformer import text_encoder_forward
    cfg = model.cfg
    enc, enc_valid = text_encoder_forward(params["encoder"], cfg,
                                          jnp.asarray(batch["src_tokens"]))
    b = batch["src_tokens"].shape[0]
    beam = beam_cfg.beam_size
    enc_out = jnp.repeat(enc, beam, axis=0)
    valid = jnp.repeat(enc_valid, beam, axis=0)
    dstate = tfm.decoder_init_state(cfg.decoder, b * beam, beam_cfg.max_len + 1)

    def step_fn(state, tokens):
        return tfm.decoder_step(params["decoder"], cfg.decoder, state, tokens,
                                enc_out, valid)

    def reorder_fn(state, idx):
        def re(c):
            return attn_mod.KVCache(k=c.k[idx], v=c.v[idx], length=c.length[idx])
        return tfm.DecoderState(caches=tuple(re(c) for c in state.caches),
                                step=state.step[idx])

    return step_fn, dstate, reorder_fn


def decode_batch_mt(model, params, batch, beam_cfg: BeamConfig,
                    prefix_tokens=None):
    return _run_search(*_build_mt(model, params, batch, beam_cfg),
                       batch["src_tokens"].shape[0], beam_cfg, prefix_tokens)


def build_ensemble(builders):
    """Combine per-model (step_fn, state, reorder_fn) triples into one:
    per-step log-probs are probability-averaged across models
    (logsumexp - log N), fairseq EnsembleModel semantics
    (/root/reference/eval/generate.py:96-103 loads colon-separated
    ensembles; fairseq's SequenceGenerator averages per-step probs).
    log_softmax is idempotent, so downstream greedy/beam normalization
    of the returned averaged log-probs is a no-op."""
    step_fns, states, reorder_fns = zip(*builders)

    def step_fn(states, tokens):
        outs = [f(s, tokens) for f, s in zip(step_fns, states)]
        lps = jnp.stack([jax.nn.log_softmax(o[0].astype(jnp.float32), -1)
                         for o in outs])
        avg = jax.nn.logsumexp(lps, axis=0) - jnp.log(lps.shape[0])
        return avg, tuple(o[1] for o in outs)

    def reorder_fn(states, idx):
        return tuple(r(s, idx) for r, s in zip(reorder_fns, states))

    return step_fn, tuple(states), reorder_fn


def decode_batch_ensemble(models, params_list, batch, beam_cfg: BeamConfig,
                          task: str = "st"):
    """Ensemble decoding over N same-vocab checkpoints (model families may
    mix, except the transducer's greedy lattice path)."""
    from simulst_tpu.models.cif import CIFModel
    from simulst_tpu.models.mma import MMAModel
    from simulst_tpu.models.transducer import TransducerModel
    builders = []
    for model, params in zip(models, params_list):
        if isinstance(model, TransducerModel):
            raise ValueError("ensemble decoding is not defined for the "
                             "transducer's greedy emit-scan path")
        if task == "mt":
            builders.append(_build_mt(model, params, batch, beam_cfg))
        elif isinstance(model, CIFModel):
            builders.append(_build_cif(model, params, batch, beam_cfg))
        elif isinstance(model, MMAModel):
            builders.append(_build_mma(model, params, batch, beam_cfg))
        else:
            builders.append(_build_std(model, params, batch, beam_cfg))
    step_fn, state, reorder_fn = build_ensemble(builders)
    b = (batch["src_tokens"] if task == "mt" else batch["feats"]).shape[0]
    return _run_search(step_fn, state, reorder_fn, b, beam_cfg)


def main(argv=None):
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--gen-subset", default="tst-COMMON")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default=None, help="override model name")
    p.add_argument("--vocab", default=None)
    p.add_argument("--task", default="st", choices=["asr", "st", "mt"])
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-len", type=int, default=200)
    p.add_argument("--len-penalty", type=float, default=1.0)
    p.add_argument("--min-len", type=int, default=1,
                   help="EOS blocked until this many tokens are generated")
    p.add_argument("--unk-penalty", type=float, default=0.0)
    p.add_argument("--prefix-size", type=int, default=0,
                   help="force hypotheses to start with the first N target "
                        "tokens (fairseq --prefix-size)")
    p.add_argument("--max-tokens", type=int, default=40000)
    p.add_argument("--scoring", default="bleu", choices=["bleu", "wer"])
    p.add_argument("--output", default=None)
    p.add_argument("--override", action="append", default=[])
    args = p.parse_args(argv)

    vocab_path = args.vocab
    if vocab_path is None:
        for cand in sorted(os.listdir(args.data)):
            if cand.startswith("spm_") and cand.endswith(".txt"):
                vocab_path = os.path.join(args.data, cand)
    vocab = (Vocabulary.from_spm(vocab_path) if vocab_path.endswith(".model")
             else Vocabulary.from_txt(vocab_path))

    # colon-separated checkpoint list = ensemble decoding (per-step
    # probability averaging), reference eval/generate.py:96-103
    overrides = dict(cfglib.parse_override(s) for s in args.override)
    models, params_list = [], []
    for ckpt in args.checkpoint.split(":"):
        restored, meta = load_checkpoint(ckpt)
        model_name = args.model or (meta or {}).get("model", "s2t_emformer")
        model_cls = get_model(model_name)
        base = ((meta or {}).get("config") or {})
        mcfg = cfglib.from_dict(model_cls.Config, {**base, **overrides,
                                                   "vocab_size": len(vocab)})
        models.append(model_cls(mcfg))
        params_list.append(restored)
    model, params = models[0], params_list[0]

    target_field = "src_text" if args.task == "asr" else "tgt_text"
    rows = load_tsv(os.path.join(args.data, f"{args.gen_subset}_st.tsv"))
    # coarse ladders: offline decoding compiles one beam-search executable
    # per realized (frame, token) bucket, so compile time — not padding
    # fill — dominates a single eval pass (the fine training default would
    # realize ~5x the shapes for no wall-clock win here)
    bcfg = BatcherConfig(max_tokens=args.max_tokens, shuffle=False,
                         batch_multiple=1,
                         frame_buckets=(256, 512, 768, 1024, 1536, 2048,
                                        3072),
                         token_buckets=(16, 32, 48, 64, 96, 128))
    beam_cfg = BeamConfig(beam_size=args.beam, max_len=args.max_len,
                          len_penalty=args.len_penalty,
                          min_len=args.min_len, unk_penalty=args.unk_penalty)

    if args.task == "mt":
        from simulst_tpu.data.text_dataset import TextDataset, make_text_batches
        for i, r in enumerate(rows):
            r.setdefault("id", str(i))
        ds = TextDataset(rows, vocab)
        batches = []
        for b in make_text_batches(ds, bcfg):
            b["ids"] = [rows[i]["id"] for i in b["indices"]]
            batches.append(b)
    else:
        ds = SpeechDataset(rows, vocab, bcfg, target_field)
        batches = make_batches(ds)

    refs, hyps, lines = [], [], []
    id2row = {r["id"]: i for i, r in enumerate(rows)}
    for batch in batches:
        n_real = batch["n_real"]
        prefix = None
        if args.prefix_size > 0 and "target" in batch:
            prefix = jnp.asarray(batch["target"][:, :args.prefix_size])
        if len(models) > 1:
            tokens, lengths = decode_batch_ensemble(models, params_list,
                                                    batch, beam_cfg,
                                                    task=args.task)
        elif args.task == "mt":
            tokens, lengths = decode_batch_mt(model, params, batch, beam_cfg,
                                              prefix_tokens=prefix)
        else:
            tokens, lengths = decode_batch(model, params, batch, beam_cfg,
                                           prefix_tokens=prefix)
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        for j in range(n_real):
            uid = batch["ids"][j]
            i = id2row[uid]
            hyp_ids = [int(t) for t in tokens[j][: int(lengths[j])]
                       if t != EOS]
            hyp = vocab.decode_ids(hyp_ids)
            ref = rows[i][target_field]
            refs.append(ref)
            hyps.append(hyp)
            lines.append(f"S-{i}\t{rows[i].get('src_text', '')}")
            lines.append(f"T-{i}\t{ref}")
            lines.append(f"D-{i}\t0.0\t{hyp}")

    score = (corpus_bleu(refs, hyps) if args.scoring == "bleu"
             else wer(refs, hyps))
    lines.append(f"SCORE\t{args.scoring}\t{score:.2f}")
    text = "\n".join(lines)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")
    else:
        print(text)
    print(f"{args.scoring}: {score:.2f}")
    return score


if __name__ == "__main__":
    main()
