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


class BeamResult(NamedTuple):
    tokens: jnp.ndarray   # (B, beam, max_len) best-first, PAD-padded
    scores: jnp.ndarray   # (B, beam) length-normalized
    lengths: jnp.ndarray  # (B, beam) lengths incl. EOS


def beam_search(step_fn: Callable, init_state, batch_size: int,
                cfg: BeamConfig, reorder_fn: Callable):
    """step_fn(state, tokens (N,)) -> (logits (N, V), new_state) where
    N = batch*beam (states must be built with that batch dim).
    reorder_fn(state, idx (N,)) -> state gathered along the batch axis.
    """
    bsz, beam = batch_size, cfg.beam_size
    n = bsz * beam

    def gather_beams(x, idx):
        # x: (B, beam, ...), idx: (B, beam) into beam axis
        return jnp.take_along_axis(
            x, idx.reshape(bsz, beam, *([1] * (x.ndim - 2))), axis=1)

    tokens0 = jnp.full((bsz, beam, cfg.max_len + 1), cfg.pad_idx, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(cfg.eos_idx)  # fairseq seeds with EOS
    scores0 = jnp.where(jnp.arange(beam)[None, :] == 0, 0.0, NEG)
    scores0 = jnp.broadcast_to(scores0, (bsz, beam))
    finished0 = jnp.zeros((bsz, beam), bool)

    def body(carry, t):
        state, tokens, scores, finished = carry
        prev = tokens[:, :, t].reshape(n)
        logits, state = step_fn(state, prev)
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        v = lprobs.shape[-1]
        lprobs = lprobs.reshape(bsz, beam, v)
        # frozen (finished) beams may only continue with PAD at no cost
        pad_only = jnp.full((v,), NEG).at[cfg.pad_idx].set(0.0)
        lprobs = jnp.where(finished[:, :, None], pad_only[None, None, :], lprobs)
        # never produce PAD on live beams
        live_mask = jnp.zeros((v,)).at[cfg.pad_idx].set(NEG)
        lprobs = lprobs + jnp.where(finished[:, :, None], 0.0,
                                    live_mask[None, None, :])

        cand = scores[:, :, None] + lprobs                    # (B, beam, V)
        flat = cand.reshape(bsz, beam * v)
        top_scores, top_idx = jax.lax.top_k(flat, beam)       # (B, beam)
        src_beam = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)

        tokens = gather_beams(tokens, src_beam)
        tokens = tokens.at[:, :, t + 1].set(tok)
        finished = gather_beams(finished[:, :, None], src_beam)[:, :, 0]
        newly = (tok == cfg.eos_idx) & ~finished
        finished = finished | newly

        flat_idx = (jnp.arange(bsz)[:, None] * beam + src_beam).reshape(n)
        state = reorder_fn(state, flat_idx)
        return (state, tokens, top_scores, finished), None

    carry = (init_state, tokens0, scores0, finished0)
    (state, tokens, scores, finished), _ = jax.lax.scan(
        body, carry, jnp.arange(cfg.max_len))

    # lengths: position of EOS (excluding the seed) else max_len
    body_tokens = tokens[:, :, 1:]
    is_eos = body_tokens == cfg.eos_idx
    has_eos = is_eos.any(axis=-1)
    eos_pos = jnp.argmax(is_eos, axis=-1)
    lengths = jnp.where(has_eos, eos_pos + 1, cfg.max_len)
    norm = lengths.astype(jnp.float32) ** cfg.len_penalty
    final_scores = scores / jnp.maximum(norm, 1.0)

    order = jnp.argsort(-final_scores, axis=1)
    tokens = jnp.take_along_axis(body_tokens, order[:, :, None], axis=1)
    final_scores = jnp.take_along_axis(final_scores, order, axis=1)
    lengths = jnp.take_along_axis(lengths, order, axis=1)
    return BeamResult(tokens=tokens, scores=final_scores, lengths=lengths)


def greedy_decode(step_fn: Callable, init_state, batch_size: int,
                  cfg: BeamConfig):
    """Greedy (beam=1) decode via lax.scan. Returns (tokens (B, max_len),
    lengths (B,))."""
    def body(carry, t):
        state, prev, done, tokens = carry
        logits, state = step_fn(state, prev)
        nxt = logits.argmax(-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_idx, nxt)
        tokens = tokens.at[:, t].set(nxt)
        done = done | (nxt == cfg.eos_idx)
        return (state, nxt, done, tokens), None

    tokens0 = jnp.full((batch_size, cfg.max_len), cfg.pad_idx, jnp.int32)
    prev0 = jnp.full((batch_size,), cfg.eos_idx, jnp.int32)
    done0 = jnp.zeros((batch_size,), bool)
    (state, _, _, tokens), _ = jax.lax.scan(
        body, (init_state, prev0, done0, tokens0), jnp.arange(cfg.max_len))
    is_eos = tokens == cfg.eos_idx
    lengths = jnp.where(is_eos.any(-1), jnp.argmax(is_eos, -1) + 1, cfg.max_len)
    return tokens, lengths
