"""Fused per-chunk streaming steps: READ + all WRITEs in ONE XLA call.

The reference's agent protocol round-trips host<->device for every policy
decision and every token (decoder forward per WRITE, default_agent.py:382-413).
TPU-native, the policy loop is a `lax.while_loop` ON DEVICE: one call per
audio chunk runs the incremental encoder, then keeps decoding until the
policy demands more source (CIF: decoded length catches up with the fired
length, cif_agent.py:385-412; MMA: any monotonic head demands source), with
the force-finish EOS rollback expressed as not adopting the attempted state.

Per-chunk host work drops to one dispatch + one small readback.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from simulst_tpu.models import cif as cif_mod
from simulst_tpu.models import mma as mma_mod
from simulst_tpu.models import s2t_emformer as s2t


class CIFFusedState(NamedTuple):
    enc: s2t.EncoderStreamState          # carry_len handled statically
    cif: cif_mod.CIFStreamState
    dec: cif_mod.CIFDecoderState
    cif_buf: jnp.ndarray                 # (B, Tmax, D)
    cif_len: jnp.ndarray                 # (B,) int32
    tokens: jnp.ndarray                  # (B, Tmax) int32 emitted so far
    n_tokens: jnp.ndarray                # (B,) int32
    finished: jnp.ndarray                # (B,) bool (EOS emitted)


def cif_fused_init(params, cfg: cif_mod.CIFConfig, max_tokens: int,
                   batch: int = 1, dtype=jnp.float32) -> CIFFusedState:
    return CIFFusedState(
        enc=s2t.encoder_init_state(params["encoder"], cfg, batch, dtype),
        cif=cif_mod.cif_layer_init_state(params["cif"], cfg, batch, dtype),
        dec=cif_mod.cif_decoder_init_state(cfg, batch, max_tokens, dtype),
        cif_buf=jnp.zeros((batch, max_tokens, cfg.embed_dim), dtype),
        cif_len=jnp.zeros((batch,), jnp.int32),
        tokens=jnp.full((batch, max_tokens), cfg.padding_idx, jnp.int32),
        n_tokens=jnp.zeros((batch,), jnp.int32),
        finished=jnp.zeros((batch,), bool))


def make_cif_fused_step(params, cfg: cif_mod.CIFConfig,
                        overshoot_weight: float = 1.0,
                        max_writes_per_chunk: int = 64):
    """Returns step(state, feats, finish) -> (state, n_new_tokens)."""

    @functools.partial(jax.jit, static_argnames=("carry_len", "finish",
                                                 "has_feats"))
    def _step(state: CIFFusedState, feats, carry_len: int, finish: bool,
              has_feats: bool):
        enc_in = state.enc._replace(carry_len=carry_len)
        enc_out, enc_state = s2t.encoder_step(
            params["encoder"], cfg, enc_in, feats if has_feats else None,
            finish)
        fired, n_emit, cif_state = cif_mod.cif_layer_step(
            params["cif"], cfg, state.cif, enc_out.encoder_out, finish)
        b = state.cif_buf.shape[0]
        tmax = state.cif_buf.shape[1]
        # append fired features (masked scatter at cif_len..cif_len+n)
        pos = jnp.arange(tmax)[None, :]
        new_idx = pos - state.cif_len[:, None]           # slot within `fired`
        take = (new_idx >= 0) & (new_idx < n_emit[:, None])
        gathered = jnp.take_along_axis(
            fired, jnp.clip(new_idx, 0, fired.shape[1] - 1)[:, :, None], axis=1)
        cif_buf = jnp.where(take[:, :, None], gathered, state.cif_buf)
        cif_len = state.cif_len + n_emit.astype(jnp.int32)

        def cond(c):
            dec, tokens, n_tok, finished, writes = c
            more = (cif_len > n_tok) | jnp.asarray(finish)
            can = (~finished) & (n_tok < tmax - 1) & more
            return can.any() & (writes < max_writes_per_chunk)

        def body(c):
            dec, tokens, n_tok, finished, writes = c
            prev = jnp.where(n_tok > 0,
                             jnp.take_along_axis(
                                 tokens, jnp.maximum(n_tok - 1, 0)[:, None],
                                 axis=1)[:, 0],
                             jnp.full((b,), cfg.eos_idx, jnp.int32))
            logits, new_dec = cif_mod.cif_decoder_step(
                params["decoder"], cfg, dec, prev, cif_buf, cif_len,
                overshoot_weight=overshoot_weight)
            tok = logits.argmax(-1).astype(jnp.int32)
            is_eos = tok == cfg.eos_idx
            # force-finish: EOS before finish => discard the attempt
            reject = is_eos & (not finish)
            active = (~finished) & ((cif_len > n_tok) | jnp.asarray(finish)) \
                & (n_tok < tmax - 1)
            accept = active & ~reject
            dec = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(accept.any(), (1,) * new.ndim), new, old)
                if new.ndim else jnp.where(accept.any(), new, old),
                new_dec, dec)
            tokens = jnp.where(
                (pos == n_tok[:, None]) & accept[:, None], tok[:, None], tokens)
            n_tok = n_tok + accept.astype(jnp.int32)
            finished = finished | (accept & is_eos) | (active & reject)
            return dec, tokens, n_tok, finished, writes + 1

        init = (state.dec, state.tokens, state.n_tokens, state.finished,
                jnp.zeros((), jnp.int32))
        dec, tokens, n_tok, finished, _ = jax.lax.while_loop(cond, body, init)
        # mid-stream, "finished" from rejection just pauses this chunk
        if not finish:
            finished = state.finished
        new_state = CIFFusedState(enc=enc_state, cif=cif_state, dec=dec,
                                  cif_buf=cif_buf, cif_len=cif_len,
                                  tokens=tokens, n_tokens=n_tok,
                                  finished=finished)
        return new_state, n_tok - state.n_tokens

    def step(state: CIFFusedState, feats, finish: bool = False
             ) -> Tuple[CIFFusedState, jnp.ndarray]:
        carry_len = state.enc.carry_len
        has_feats = feats is not None and feats.shape[1] > 0
        new_state, n_new = _step(state, feats if has_feats else None,
                                 carry_len, finish, has_feats)
        n_feats = feats.shape[1] if has_feats else 0
        new_carry = s2t._carry_plan(cfg, carry_len, n_feats, finish)
        new_state = new_state._replace(
            enc=new_state.enc._replace(carry_len=new_carry))
        return new_state, n_new

    return step


# ---------------------------------------------------------------------------
# MMA / wait-k
# ---------------------------------------------------------------------------

class MMAFusedState(NamedTuple):
    enc: s2t.EncoderStreamState
    dec: mma_mod.MMADecoderState
    enc_buf: jnp.ndarray                 # (B, Smax, D)
    src_len: jnp.ndarray                 # () int32
    tokens: jnp.ndarray                  # (B, Tmax)
    n_tokens: jnp.ndarray                # (B,)
    finished: jnp.ndarray                # (B,) bool


def mma_fused_init(params, cfg: mma_mod.MMAConfig, max_src: int,
                   max_tokens: int, batch: int = 1, dtype=jnp.float32
                   ) -> MMAFusedState:
    return MMAFusedState(
        enc=s2t.encoder_init_state(params["encoder"], cfg, batch, dtype),
        dec=mma_mod.mma_decoder_init_state(cfg, batch, max_tokens, dtype),
        enc_buf=jnp.zeros((batch, max_src, cfg.embed_dim), dtype),
        src_len=jnp.zeros((), jnp.int32),
        tokens=jnp.full((batch, max_tokens), cfg.padding_idx, jnp.int32),
        n_tokens=jnp.zeros((batch,), jnp.int32),
        finished=jnp.zeros((batch,), bool))


def make_mma_fused_step(params, cfg: mma_mod.MMAConfig,
                        max_writes_per_chunk: int = 64):
    """Returns step(state, feats, finish) -> (state, n_new_tokens). B=1.

    WRITE loop runs on device until the model demands a READ (any monotonic
    head, mma_model.py:191-210) or emits EOS; both the READ and the
    force-finish EOS rejection adopt only the advanced monotonic positions
    (the reference's clear_cache keeps the monotonic buffer)."""

    @functools.partial(jax.jit, static_argnames=("carry_len", "finish",
                                                 "has_feats"))
    def _step(state: MMAFusedState, feats, carry_len: int, finish: bool,
              has_feats: bool):
        enc_in = state.enc._replace(carry_len=carry_len)
        enc_out, enc_state = s2t.encoder_step(
            params["encoder"], cfg, enc_in, feats if has_feats else None,
            finish)
        enc_buf = jax.lax.dynamic_update_slice(
            state.enc_buf, enc_out.encoder_out.astype(state.enc_buf.dtype),
            (0, state.src_len, 0))
        src_len = state.src_len + enc_out.encoder_out.shape[1]
        b, tmax = state.tokens.shape
        online = jnp.asarray(not finish)
        pos = jnp.arange(tmax)[None, :]

        def cond(c):
            dec, tokens, n_tok, finished, stop, writes = c
            return (~stop) & (~finished.all()) & \
                (writes < max_writes_per_chunk) & (n_tok < tmax - 1).all()

        def body(c):
            dec, tokens, n_tok, finished, stop, writes = c
            prev = jnp.where(n_tok > 0,
                             jnp.take_along_axis(
                                 tokens, jnp.maximum(n_tok - 1, 0)[:, None],
                                 axis=1)[:, 0],
                             jnp.full((b,), cfg.eos_idx, jnp.int32))
            logits, action, new_dec = mma_mod.mma_decoder_step(
                params["decoder"], cfg, dec, prev, enc_buf,
                jnp.full((b,), src_len, jnp.int32), online)
            tok = logits.argmax(-1).astype(jnp.int32)
            is_eos = tok == cfg.eos_idx
            reject = is_eos & (not finish)
            write = (action == 1) & (~reject.any()) & (~finished.any())
            # rollback (READ or rejected EOS): keep old KV, adopt monotonic
            rolled = mma_mod.adopt_on_read(dec, new_dec)
            dec = jax.tree.map(
                lambda nw, rb: jnp.where(write, nw, rb), new_dec, rolled)
            tokens = jnp.where((pos == n_tok[:, None]) & write,
                               tok[:, None], tokens)
            n_tok = n_tok + jnp.where(write, 1, 0)
            finished = finished | (write & is_eos)
            stop = (action == 0) | reject.any() | (write & is_eos).any()
            return dec, tokens, n_tok, finished, stop, writes + 1

        init = (state.dec, state.tokens, state.n_tokens, state.finished,
                jnp.asarray(False), jnp.zeros((), jnp.int32))
        dec, tokens, n_tok, finished, _, _ = jax.lax.while_loop(
            cond, body, init)
        new_state = MMAFusedState(enc=enc_state, dec=dec, enc_buf=enc_buf,
                                  src_len=src_len, tokens=tokens,
                                  n_tokens=n_tok, finished=finished)
        return new_state, n_tok - state.n_tokens

    def step(state: MMAFusedState, feats, finish: bool = False
             ) -> Tuple[MMAFusedState, jnp.ndarray]:
        carry_len = state.enc.carry_len
        has_feats = feats is not None and feats.shape[1] > 0
        new_state, n_new = _step(state, feats if has_feats else None,
                                 carry_len, finish, has_feats)
        n_feats = feats.shape[1] if has_feats else 0
        new_carry = s2t._carry_plan(cfg, carry_len, n_feats, finish)
        new_state = new_state._replace(
            enc=new_state.enc._replace(carry_len=new_carry))
        return new_state, n_new

    return step
