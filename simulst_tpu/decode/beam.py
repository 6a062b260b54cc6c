"""Beam search over the incremental decoder API.

Native replacement for fairseq's SequenceGenerator (used via
/root/reference/eval/generate.py:201-207 and the in-training eval of
tasks/speech_to_text_infer.py:126-144).  One jittable `lax.scan` over decode
steps: beams live in the batch axis of the static-capacity KV caches, and
beam reordering is a gather along that axis — no re-allocation.

Scoring follows fairseq: accumulated log-prob, length-normalized by
len ** lenpen at finalization; EOS hypotheses are frozen by forcing PAD
continuation with -inf scores for non-PAD.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

NEG = -1e9


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    beam_size: int = 5
    max_len: int = 200
    len_penalty: float = 1.0
    pad_idx: int = 1
    eos_idx: int = 2
    bos_idx: int = 0
    # fairseq generation_args parity (tasks/inference_config.py:8-77):
    min_len: int = 1           # EOS blocked while fewer tokens than this
    unk_penalty: float = 0.0   # subtracted from the unk log-prob
    unk_idx: int = 3


class BeamResult(NamedTuple):
    tokens: jnp.ndarray   # (B, beam, max_len) best-first, PAD-padded
    scores: jnp.ndarray   # (B, beam) length-normalized
    lengths: jnp.ndarray  # (B, beam) lengths incl. EOS


def beam_search(step_fn: Callable, init_state, batch_size: int,
                cfg: BeamConfig, reorder_fn: Callable, prefix_tokens=None,
                bos: int = None):
    """step_fn(state, tokens (N,)) -> (logits (N, V), new_state) where
    N = batch*beam (states must be built with that batch dim).
    reorder_fn(state, idx (N,)) -> state gathered along the batch axis.

    fairseq-style search: 2*beam candidates per step; EOS candidates are
    BANKED (finalized with length-normalized scores) and leave the beam, so
    live slots keep exploring; at the end banked hypotheses compete with the
    length-normalized unfinished beams.

    prefix_tokens: optional (B, P) int32, PAD-padded — each hypothesis is
    constrained to start with its row's non-PAD prefix (fairseq
    --prefix-size semantics: the prefix token keeps its model score, all
    other continuations are masked).

    bos overrides the seed input token (default eos, the fairseq
    convention; the transducer starts from blank).
    """
    bsz, beam = batch_size, cfg.beam_size
    n = bsz * beam
    L = cfg.max_len

    def gather_beams(x, idx):
        # x: (B, K, ...), idx: (B, beam) into the K axis
        return jnp.take_along_axis(
            x, idx.reshape(bsz, -1, *([1] * (x.ndim - 2))), axis=1)

    tokens0 = jnp.full((bsz, beam, L + 1), cfg.pad_idx, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(
        cfg.eos_idx if bos is None else bos)    # fairseq seeds with EOS
    scores0 = jnp.where(jnp.arange(beam)[None, :] == 0, 0.0, NEG)
    scores0 = jnp.broadcast_to(scores0, (bsz, beam))
    bank_tokens0 = jnp.full((bsz, beam, L), cfg.pad_idx, jnp.int32)
    bank_scores0 = jnp.full((bsz, beam), NEG)
    bank_lengths0 = jnp.ones((bsz, beam), jnp.int32)

    def body(carry, t):
        state, tokens, scores, bank_tokens, bank_scores, bank_lengths = carry
        prev = tokens[:, :, t].reshape(n)
        logits, state = step_fn(state, prev)
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        v = lprobs.shape[-1]
        lprobs = lprobs.reshape(bsz, beam, v)
        lprobs = lprobs.at[:, :, cfg.pad_idx].set(NEG)  # never produce PAD
        if cfg.unk_penalty:
            lprobs = lprobs.at[:, :, cfg.unk_idx].add(-cfg.unk_penalty)
        if cfg.min_len > 0:   # block EOS until min_len tokens are generated
            eos_col = jnp.where(t < cfg.min_len, NEG,
                                lprobs[:, :, cfg.eos_idx])
            lprobs = lprobs.at[:, :, cfg.eos_idx].set(eos_col)
        if prefix_tokens is not None:
            P = prefix_tokens.shape[1]
            forced = jnp.where(t < P, prefix_tokens[:, jnp.minimum(t, P - 1)],
                               cfg.pad_idx)                      # (B,)
            has_pref = (t < P) & (forced != cfg.pad_idx)
            keep = jax.nn.one_hot(forced, v, dtype=bool)[:, None, :]
            lprobs = jnp.where(has_pref[:, None, None],
                               jnp.where(keep, lprobs, NEG), lprobs)

        cand = scores[:, :, None] + lprobs                  # (B, beam, V)
        flat = cand.reshape(bsz, beam * v)
        k2 = min(2 * beam, beam * v)
        top_scores, top_idx = jax.lax.top_k(flat, k2)       # (B, 2*beam)
        src_beam = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)
        is_eos = tok == cfg.eos_idx

        # candidate hypotheses (token prefixes incl. the new token)
        cand_tokens = gather_beams(tokens, src_beam)        # (B, 2b, L+1)
        cand_tokens = cand_tokens.at[:, :, t + 1].set(tok)

        # --- bank finished candidates (normalized score competition)
        fin_len = (t + 1).astype(jnp.float32)
        fin_norm = jnp.maximum(fin_len ** cfg.len_penalty, 1.0)
        fin_scores = jnp.where(is_eos, top_scores / fin_norm, NEG)
        all_scores = jnp.concatenate([bank_scores, fin_scores], axis=1)
        all_tokens = jnp.concatenate(
            [bank_tokens, cand_tokens[:, :, 1:]], axis=1)
        all_lengths = jnp.concatenate(
            [bank_lengths, jnp.full((bsz, k2), t + 1, jnp.int32)], axis=1)
        bank_scores, bank_idx = jax.lax.top_k(all_scores, beam)
        bank_tokens = gather_beams(all_tokens, bank_idx)
        bank_lengths = jnp.take_along_axis(all_lengths, bank_idx, axis=1)

        # --- live beams: best `beam` non-EOS candidates
        live_scores = jnp.where(is_eos, NEG, top_scores)
        new_scores, live_idx = jax.lax.top_k(live_scores, beam)
        tokens = gather_beams(cand_tokens, live_idx)
        live_src = jnp.take_along_axis(src_beam, live_idx, axis=1)

        flat_idx = (jnp.arange(bsz)[:, None] * beam + live_src).reshape(n)
        state = reorder_fn(state, flat_idx)
        return (state, tokens, new_scores, bank_tokens, bank_scores,
                bank_lengths), None

    carry = (init_state, tokens0, scores0, bank_tokens0, bank_scores0,
             bank_lengths0)
    (state, tokens, scores, bank_tokens, bank_scores, bank_lengths), _ = \
        jax.lax.scan(body, carry, jnp.arange(L))

    # unfinished beams compete at max_len with length normalization
    live_norm = jnp.maximum(float(L) ** cfg.len_penalty, 1.0)
    all_scores = jnp.concatenate([bank_scores, scores / live_norm], axis=1)
    all_tokens = jnp.concatenate([bank_tokens, tokens[:, :, 1:]], axis=1)
    all_lengths = jnp.concatenate(
        [bank_lengths, jnp.full((bsz, beam), L, jnp.int32)], axis=1)
    final_scores, idx = jax.lax.top_k(all_scores, beam)
    out_tokens = jnp.take_along_axis(all_tokens, idx[:, :, None], axis=1)
    lengths = jnp.take_along_axis(all_lengths, idx, axis=1)
    # PAD beyond each hypothesis' length
    pos = jnp.arange(L)[None, None, :]
    out_tokens = jnp.where(pos < lengths[:, :, None], out_tokens, cfg.pad_idx)
    return BeamResult(tokens=out_tokens, scores=final_scores, lengths=lengths)


def greedy_decode(step_fn: Callable, init_state, batch_size: int,
                  cfg: BeamConfig, bos: int = None, prefix_tokens=None):
    """Greedy (beam=1) decode via lax.scan. Returns (tokens (B, max_len),
    lengths (B,)).  bos overrides the first input token (default eos, the
    fairseq convention; the transducer starts from blank)."""
    def body(carry, t):
        state, prev, done, tokens = carry
        logits, state = step_fn(state, prev)
        lg = logits.astype(jnp.float32)
        if cfg.unk_penalty:
            lg = lg.at[:, cfg.unk_idx].add(-cfg.unk_penalty)
        if cfg.min_len > 0:
            eos_col = jnp.where(t < cfg.min_len, NEG, lg[:, cfg.eos_idx])
            lg = lg.at[:, cfg.eos_idx].set(eos_col)
        nxt = lg.argmax(-1).astype(jnp.int32)
        if prefix_tokens is not None:
            P = prefix_tokens.shape[1]
            forced = jnp.where(t < P, prefix_tokens[:, jnp.minimum(t, P - 1)],
                               cfg.pad_idx)
            nxt = jnp.where((t < P) & (forced != cfg.pad_idx), forced, nxt)
        nxt = jnp.where(done, cfg.pad_idx, nxt)
        tokens = tokens.at[:, t].set(nxt)
        done = done | (nxt == cfg.eos_idx)
        return (state, nxt, done, tokens), None

    tokens0 = jnp.full((batch_size, cfg.max_len), cfg.pad_idx, jnp.int32)
    prev0 = jnp.full((batch_size,), cfg.eos_idx if bos is None else bos,
                     jnp.int32)
    done0 = jnp.zeros((batch_size,), bool)
    (state, _, _, tokens), _ = jax.lax.scan(
        body, (init_state, prev0, done0, tokens0), jnp.arange(cfg.max_len))
    is_eos = tokens == cfg.eos_idx
    lengths = jnp.where(is_eos.any(-1), jnp.argmax(is_eos, -1) + 1, cfg.max_len)
    return tokens, lengths
