"""Benchmark: per-chunk streaming encoder+decoder step latency on one chip.

The reference publishes no throughput numbers (BASELINE.md); the north star
adds per-chunk streaming step latency / RTF as the perf axis.  This measures
the full production-geometry model (s2t_emformer_s: 12-layer / 256-dim
Emformer encoder + 6-layer decoder) doing one SimulEval READ step (640ms of
audio -> incremental encode -> one decoder WRITE step), jitted to a single
XLA call each.

Output: one JSON line; vs_baseline = real-time factor (latency / 640ms
chunk duration; < 1.0 means faster than real time, lower is better).
"""
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from simulst_tpu.models import s2t_emformer as s2t
    from simulst_tpu.nn import transformer as tfm

    cfg = s2t.S2TEmformerConfig(vocab_size=4100, ctc_layer=False)
    model = s2t.S2TEmformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # Streaming at batch=1 is weight-bandwidth-bound (~100MB of fp32 params
    # re-read from HBM per chunk); serve in bf16 (softmax/LN still fp32
    # internally). Override with SIMULST_BENCH_DTYPE=float32.
    dtype = jnp.dtype(os.environ.get("SIMULST_BENCH_DTYPE", "bfloat16"))
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    # streaming geometry (reference agents/default_agent.py:364-376):
    # steady chunk = segment_length(64 pre-stride frames) * 10ms = 640ms
    chunk_frames = cfg.segment_length
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, chunk_frames, 80)).astype(dtype)

    enc_step = s2t.make_encoder_stepper(params["encoder"], cfg)
    state = s2t.encoder_init_state(params["encoder"], cfg, 1, dtype)
    # warm the carry with a first (seg+rc)-sized chunk
    first = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, cfg.segment_length + cfg.right_context, 80)).astype(dtype)
    out, state = enc_step(state, first)

    # fixed-capacity encoder buffer + decoder state for the WRITE step
    S_MAX = 1024
    enc_buf = jnp.zeros((1, S_MAX, cfg.embed_dim), dtype)
    enc_buf = jax.lax.dynamic_update_slice(enc_buf, out.encoder_out, (0, 0, 0))
    src_len = jnp.asarray(out.encoder_out.shape[1])
    dstate = tfm.decoder_init_state(cfg.decoder, 1, 256, dtype)
    tok = jnp.array([cfg.eos_idx], jnp.int32)

    # The whole READ (incremental encode + buffer append) + WRITE (one
    # decoder step) is ONE compiled XLA call — per-step host dispatch through
    # the runtime is ~1ms here, so fusion matters as much as FLOPs.
    import functools

    @functools.partial(jax.jit, static_argnames=("carry_len",))
    def fused_read_write(sub, pos, emf_state, carry, dstate, enc_buf,
                         src_len, tok, feats, carry_len):
        st = s2t.EncoderStreamState(sub=sub, pos=pos, emf=emf_state,
                                    carry=carry, carry_len=carry_len)
        out, ns = s2t.encoder_step(params["encoder"], cfg, st, feats)
        enc_buf = jax.lax.dynamic_update_slice(
            enc_buf, out.encoder_out, (0, src_len, 0))
        src_len = src_len + out.encoder_out.shape[1]
        valid = (jnp.arange(S_MAX)[None, :] < src_len)
        logits, dstate = tfm.decoder_step(params["decoder"], cfg.decoder,
                                          dstate, tok, enc_buf, valid)
        return (ns.sub, ns.pos, ns.emf, ns.carry, dstate, enc_buf, src_len,
                logits)

    def one_read_write(state, dstate, enc_buf, src_len):
        sub, pos, emf_state, carry, dstate, enc_buf, src_len, logits = \
            fused_read_write(state.sub, state.pos, state.emf, state.carry,
                             dstate, enc_buf, src_len, tok, feats,
                             state.carry_len)
        new_len = s2t._carry_plan(cfg, state.carry_len, feats.shape[1], False)
        state = s2t.EncoderStreamState(sub=sub, pos=pos, emf=emf_state,
                                       carry=carry, carry_len=new_len)
        return state, dstate, enc_buf, src_len, logits

    # warmup / compile
    for _ in range(3):
        state_w, dstate_w, enc_w, sl_w, lg = one_read_write(
            state, dstate, enc_buf, src_len)
        jax.block_until_ready(lg)

    n_iter = 30
    t0 = time.perf_counter()
    st, ds, eb, sl = state, dstate, enc_buf, src_len
    for _ in range(n_iter):
        st, ds, eb, sl, lg = one_read_write(st, ds, eb, sl)
    jax.block_until_ready(lg)
    dt = (time.perf_counter() - t0) / n_iter * 1000.0

    chunk_ms = cfg.segment_length * 10.0  # 10ms frame shift
    print(json.dumps({
        "metric": "streaming_read_write_step_latency",
        "value": round(dt, 3),
        "unit": "ms",
        "vs_baseline": round(dt / chunk_ms, 4),
    }))


if __name__ == "__main__":
    main()
