"""Benchmarks: streaming + training performance on one chip.

The reference publishes no throughput numbers (BASELINE.md); the north-star
perf axes are per-chunk streaming step latency / RTF and training throughput.
Metrics (one JSON line each; the headline streaming READ+WRITE line prints
LAST and also carries every other metric in its "extra" field):

  * streaming_read_write_step_latency — full production-geometry
    s2t_emformer_s (12x256 Emformer + 6-layer decoder) doing one SimulEval
    READ (640ms of audio, incremental encode) + one decoder WRITE step as a
    single XLA call.  vs_baseline = RTF (latency / 640ms chunk; lower is
    better, < 1.0 = faster than real time).
  * cif_fused_chunk_latency / mma_fused_chunk_latency — one FULL fused chunk
    step (READ + all WRITEs in a device-side while_loop, stream/fused.py),
    B=1, production geometry.
  * batched_stream_throughput — B=8 fused CIF chunk steps; value = times
    faster than real time aggregated over the batch
    (B * 640ms / step_latency); the reference caps at B==1
    (cif_agent.py:341-343).
  * train_step_latency — jitted fwd+bwd (label-smoothed CE) on a 32x1024
    bf16 batch; extra carries frames/sec.
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp


def _cast(params, dtype):
    if dtype == jnp.float32:
        return params
    return jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)


def _time(fn, n_iter=30, warmup=3):
    """fn: (f32 scalar carry) -> f32 scalar carry.

    The axon runtime executes LAZILY: a dispatched computation whose result
    nothing ever depends on may never run on the device, and
    block_until_ready does not force it.  Honest timing therefore requires
    a REAL data dependency chained through every iteration (the carry must
    feed the computation's inputs and be derived from its outputs) plus a
    final host fetch.  Each bench below ties the carry into its input
    tensor with `+ carry * 1e-30` and folds a mean/sum of its output back
    into the carry.
    """
    c = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        c = fn(c)
    float(c)
    c = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        c = fn(c)
    float(c)
    return (time.perf_counter() - t0) / n_iter * 1000.0


# Per-dispatch overhead through the axon tunnel is ~1-3 ms and varies with
# tunnel load — larger than the streaming kernels themselves (device time
# ~1 ms/step, measured via the jax profiler).  Latency metrics therefore
# chain CHAIN dependent steps inside ONE jitted call and divide: the
# result is device latency + 1/CHAIN of the dispatch cost, which matches
# what a production host (no tunnel, ~0.1 ms dispatch) would see.
CHAIN = 8


def bench_read_write(dtype):
    """Headline: fused READ + one WRITE, s2t geometry (no policy loop)."""
    from simulst_tpu.models import s2t_emformer as s2t
    from simulst_tpu.nn import transformer as tfm

    cfg = s2t.S2TEmformerConfig(vocab_size=4100, ctc_layer=False)
    model = s2t.S2TEmformerModel(cfg)
    params = _cast(model.init(jax.random.PRNGKey(0)), dtype)

    chunk_frames = cfg.segment_length
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, chunk_frames, 80)).astype(dtype)

    enc_step = s2t.make_encoder_stepper(params["encoder"], cfg)
    state = s2t.encoder_init_state(params["encoder"], cfg, 1, dtype)
    first = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, cfg.segment_length + cfg.right_context, 80)).astype(dtype)
    out, state = enc_step(state, first)

    S_MAX = 1024
    enc_buf = jnp.zeros((1, S_MAX, cfg.embed_dim), dtype)
    enc_buf = jax.lax.dynamic_update_slice(enc_buf, out.encoder_out, (0, 0, 0))
    src_len = jnp.asarray(out.encoder_out.shape[1])
    dstate = tfm.decoder_init_state(cfg.decoder, 1, 256, dtype)
    tok = jnp.array([cfg.eos_idx], jnp.int32)

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

    carry_len = state.carry_len  # steady-state: constant across steps

    @functools.partial(jax.jit, static_argnames=("carry_len",))
    def chain(tc, sub, pos, emf, carry, dstate, enc_buf, src_len, tok, feats,
              carry_len):
        feats = feats + (tc * 1e-30).astype(feats.dtype)
        def body(c, _):
            sub, pos, emf, carry, dstate, enc_buf, src_len = c
            sub, pos, emf, carry, dstate, enc_buf, src_len, logits = \
                fused_read_write(sub, pos, emf, carry, dstate, enc_buf,
                                 src_len, tok, feats, carry_len)
            return (sub, pos, emf, carry, dstate, enc_buf, src_len), logits
        _, ys = jax.lax.scan(
            body, (sub, pos, emf, carry, dstate, enc_buf, src_len), None,
            length=CHAIN)
        return tc + ys.astype(jnp.float32).mean()

    def step(tc):
        return chain(tc, state.sub, state.pos, state.emf, state.carry, dstate,
                     enc_buf, src_len, tok, feats, carry_len)

    return _time(step) / CHAIN


def bench_fused_chunk(kind, dtype, batch=1):
    """Full fused chunk step (READ + all WRITEs while_loop), CIF or MMA."""
    from simulst_tpu.models.cif import CIFConfig, CIFModel
    from simulst_tpu.models.mma import MMAConfig, MMAModel
    from simulst_tpu.stream import fused

    if kind == "cif":
        cfg = CIFConfig(vocab_size=4100)
        params = _cast(CIFModel(cfg).init(jax.random.PRNGKey(0)), dtype)
        step_fn = fused.make_cif_fused_step(params, cfg)
        state = fused.cif_fused_init(params, cfg, max_tokens=256, batch=batch,
                                     dtype=dtype)
    else:
        cfg = MMAConfig(vocab_size=4100, ctc_layer=False)
        params = _cast(MMAModel(cfg).init(jax.random.PRNGKey(0)), dtype)
        step_fn = fused.make_mma_fused_step(params, cfg)
        state = fused.mma_fused_init(params, cfg, max_src=1024,
                                     max_tokens=256, batch=batch, dtype=dtype)

    first = jax.random.normal(
        jax.random.PRNGKey(2),
        (batch, cfg.segment_length + cfg.right_context, 80)).astype(dtype)
    state, _ = step_fn(state, first)
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (batch, cfg.segment_length, 80)).astype(dtype)

    # the session state carries static python-int leaves (e.g. the encoder
    # carry_len, constant in steady state); only array leaves go through the
    # scan carry
    leaves, treedef = jax.tree_util.tree_flatten(state)
    is_dyn = [isinstance(l, jnp.ndarray) for l in leaves]

    def _split(st):
        ls = jax.tree_util.tree_leaves(st)
        return [l for l, d in zip(ls, is_dyn) if d]

    def _rebuild(dyn):
        it = iter(dyn)
        return jax.tree_util.tree_unflatten(
            treedef, [next(it) if d else l for l, d in zip(leaves, is_dyn)])

    @jax.jit
    def chain(tc, dyn, feats):
        feats = feats + (tc * 1e-30).astype(feats.dtype)
        def body(dyn, _):
            st, n_new = step_fn(_rebuild(dyn), feats)
            return _split(st), n_new
        _, ns = jax.lax.scan(body, dyn, None, length=CHAIN)
        return tc + ns.sum().astype(jnp.float32)

    dyn0 = _split(state)

    def step(tc):
        return chain(tc, dyn0, feats)

    return _time(step, n_iter=20) / CHAIN


def bench_eval_throughput(dtype, sizes=((8, 10), (64, 4)), n_chunks=16):
    """Scanned-session evaluation throughput: for each (B, n_batches) in
    `sizes`, n_batches DISTINCT batches of B utterances x (n_chunks chunks
    = ~10.6s audio each) through CIFAgent.process_session_wavs.

    The measured pipeline is the production evaluator's (stream/evaluator
    evaluate_batched(scan=True)): int16 PCM wavs (the on-disk format; 1/4
    the f32 upload bytes) are STAGED for EVERY size's batches up front —
    uploads ride the fast pre-degradation transfer path and pipeline ahead
    of compute — then each batch runs featurize + first chunk + lax.scan +
    finish + drain as ONE dispatch (fused.make_session_executor).  Reported
    wall time INCLUDES each size's staging share; compile warms on a
    separate extra batch.  Returns {B: (utt/sec, x_realtime)}.  The
    reference caps at B==1 with a host round trip per READ/WRITE
    (cif_agent.py:341-343, default_agent.py:364-413)."""
    import numpy as np
    from simulst_tpu.data.vocab import SPECIALS, Vocabulary
    from simulst_tpu.models.cif import CIFConfig, CIFModel
    from simulst_tpu.stream.agents import (AgentConfig, CIFAgent,
                                           chunk_geometry_ms,
                                           stage_session_wavs)

    syms = list(SPECIALS) + [f"w{i}" for i in range(4100 - len(SPECIALS))]
    vocab = Vocabulary(syms)
    cfg = CIFConfig(vocab_size=4100)
    model = CIFModel(cfg)
    params = _cast(model.init(jax.random.PRNGKey(0)), dtype)
    acfg = AgentConfig(max_tgt_len=256, max_src_frames=1024)
    agent = CIFAgent(model, params, vocab, acfg, fused=True)

    first_ms, steady_ms = chunk_geometry_ms(cfg)
    n_first = int(first_ms / 1000.0 * 16000)
    n_steady = int(steady_ms / 1000.0 * 16000)
    audio_s = (first_ms + (n_chunks - 1) * steady_ms) / 1000.0
    n_samp = n_first + (n_chunks - 1) * n_steady

    def make_batch(batch, seed):
        r = np.random.RandomState(seed)
        return [(r.randn(n_samp) * (1500 + 300 * i)).astype(np.int16)
                for i in range(batch)]

    batches, warms, stages, t_stage = {}, {}, {}, {}
    for B, nb in sizes:
        batches[B] = [make_batch(B, s) for s in range(1, nb + 1)]
        warms[B] = make_batch(B, 0)
    for B, nb in sizes:                   # stage EVERYTHING before compile
        t0 = time.perf_counter()
        stages[B] = [stage_session_wavs(agent, w) for w in batches[B]]
        jax.block_until_ready(stages[B][-1].wav_mat)
        t_stage[B] = time.perf_counter() - t0

    out = {}
    for B, nb in sizes:
        agent.new_batched_session(B).process_session_wavs(warms[B])  # compile
        t1 = time.perf_counter()
        for wavs, st in zip(batches[B], stages[B]):
            agent.new_batched_session(B).process_session_wavs(wavs, staged=st)
        dt = t_stage[B] + (time.perf_counter() - t1)
        ups = nb * B / dt
        out[B] = (ups, ups * audio_s)
    return out


def _peak_flops(dtype) -> float:
    """Peak dense-matmul FLOP/s of one chip for the given compute dtype
    (published spec sheets; unknown kinds fall back to v5e)."""
    kind = jax.devices()[0].device_kind.lower()
    bf16 = {
        "v4": 275e12, "v5e": 197e12, "v5 lite": 197e12, "v5litepod": 197e12,
        "v5p": 459e12, "v6e": 918e12, "v6 lite": 918e12,
    }
    peak = next((v for k, v in bf16.items() if k in kind), 197e12)
    if jnp.dtype(dtype) == jnp.float32:
        peak /= 8  # fp32 runs as multi-pass bf16 on the MXU
    return peak


def bench_train_step(dtype_name="bfloat16", B=32, padded=False,
                     packed=False, bucket_step=None):
    """Jitted fwd+bwd at the Bx1024 geometry (rbg dropout keys, the train
    CLI default).  B=32 is the headline (comparable across rounds); the
    B=64 extra shows throughput with fixed costs amortized.

    padded=True benches one BUCKETED batch with realistic length variance
    (frame lengths spread 0.7T..T, target lengths 0.6U..U, zero-padded like
    the batcher) and additionally returns the EFFECTIVE non-pad frames/s —
    the honest throughput number for real data, vs the full-length batch
    that flatters MFU (VERDICT r3 weak #4).

    bucket_step (implies padded) narrows the frame spread to what a
    BatcherConfig.frame_buckets ladder with that step yields — lengths in
    (T - step, T] — measuring the finer-bucketing lever from docs/perf.md
    (target spread stays 0.6U..U: bucketing is on frames only).

    packed=True (implies padded) additionally routes the Emformer stack
    through SEQUENCE-PACKED rows (train/packing.py): the same bucketed
    batch runs over ceil(total_segments / row_segments) rows instead of B,
    recovering most of the padding gap."""
    jax.config.update("jax_default_prng_impl", "rbg")
    import numpy as np
    from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
    from simulst_tpu.models import s2t_emformer as s2t

    padded = padded or packed or bucket_step is not None
    T, U = 1024, 64
    cfg = s2t.S2TEmformerConfig(vocab_size=4100, ctc_layer=True,
                                compute_dtype=dtype_name)
    model = s2t.S2TEmformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, T, 80))
    feats = jnp.broadcast_to(feats, (B, T, 80))
    lengths = jnp.full((B,), T, jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 4100)
    if padded:
        lo = T - bucket_step + 1 if bucket_step is not None else 0.7 * T
        lens_np = np.linspace(lo, T, B).astype(np.int32)
        lengths = jnp.asarray(lens_np)
        feats = jnp.where(jnp.arange(T)[None, :, None] < lengths[:, None, None],
                          feats, 0.0)
        tlen = np.linspace(0.6 * U, U, B).astype(np.int32)
        tokens = jnp.where(jnp.arange(U)[None, :] < jnp.asarray(tlen)[:, None],
                           tokens, 1)  # padding_idx
    plan = None
    if packed:
        from simulst_tpu.nn import conv as cnv
        from simulst_tpu.train import packing
        l4 = np.asarray(cnv.subsampler_apply(
            params["encoder"]["subsample"], feats, lengths)[1])
        ecfg = cfg.emformer
        n0 = (T // cfg.stride) // ecfg.segment
        # rows sized for 2-3 examples: same-length rows can't pair anything
        # under length-sorted bucketing (see packing.choose_row_segments)
        n_p = packing.choose_row_segments(
            l4, ecfg.segment, packing.usable_row_segments(ecfg, n0, 4 * n0))
        plan = packing.pack_plan(l4, T // cfg.stride, ecfg.segment,
                                 ecfg.right_context, row_segs=n_p)
        plan = packing.PackPlan(*[jnp.asarray(a) for a in plan])
    lcfg = JointCTCConfig()

    @jax.jit
    def train_step(tc, p):
        f = feats + tc * 1e-30
        def loss_fn(p):
            logits, extra = model.forward(p, f, lengths, tokens,
                                          rng=jax.random.PRNGKey(3),
                                          deterministic=False,
                                          pack_plan=plan)
            loss, _ = joint_ctc_loss(logits, extra, tokens, lcfg)
            return loss / (B * U)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        from simulst_tpu.train.optim import global_sumsq
        gn = global_sumsq(grads)
        return tc + loss.astype(jnp.float32) + gn * 1e-12

    # chain steps inside one dispatch like the streaming metrics: the real
    # train loop (donated buffers, host running ahead) pipelines dispatch
    # behind device work, while a per-step dispatch through the tunnel costs
    # ~1-3 ms that a production host never sees
    @jax.jit
    def chain(tc, p):
        cc, _ = jax.lax.scan(lambda a, _: (train_step(a, p), None), tc,
                             None, length=CHAIN)
        return cc

    dt = _time(lambda tc: chain(tc, params), n_iter=10, warmup=2) / CHAIN

    # MFU from an ANALYTIC matmul-FLOP model (XLA's cost_analysis counts the
    # Pallas custom calls as zero flops, so it cannot be used here).  Counts
    # the algorithmic multiply-adds of the model's matmuls/convs at fwd x1,
    # bwd x2 — the standard model-FLOP convention; elementwise work excluded.
    flops = _train_matmul_flops(cfg, B, T, U) * 3
    mfu = flops / (dt / 1000.0) / _peak_flops(dtype_name)
    if padded:
        # device MFU is unchanged (static shapes: the chip computes full-T
        # matmuls either way); the EFFECTIVE numbers scale each FLOP term by
        # its non-pad fraction — source-side terms by eff_t, target-side
        # linear terms by eff_u, the decoder self-attn core by eff_u^2 and
        # the cross-attn core by eff_t*eff_u
        eff_t = float(jnp.sum(lengths)) / (B * T)
        eff_u = float(np.sum(tlen)) / (B * U)
        f_src, f_tgt, f_tgt_sq, f_cross = _train_matmul_flops(
            cfg, B, T, U, split=True)
        eff = (f_src * eff_t + f_tgt * eff_u + f_tgt_sq * eff_u ** 2
               + f_cross * eff_t * eff_u) / (f_src + f_tgt + f_tgt_sq
                                             + f_cross)
        return dt, B * T / (dt / 1000.0) * eff, mfu * eff
    return dt, B * T / (dt / 1000.0), mfu


def bench_variant_train_step(kind, dtype_name="bfloat16", B=32):
    """Jitted fwd+bwd for the MMA or CIF model at the headline 32x1024
    geometry with their FULL losses (latency/quantity terms included) —
    the perf claims of record that BENCH_r* previously never captured
    (VERDICT r4 weak #3).  Returns (ms, frames/sec)."""
    jax.config.update("jax_default_prng_impl", "rbg")
    T, U = 1024, 64

    if kind == "mma":
        from simulst_tpu.losses.mma_loss import MMALossConfig, mma_loss
        from simulst_tpu.models.mma import MMAConfig, MMAModel
        cfg = MMAConfig(vocab_size=4100, ctc_layer=False,
                        compute_dtype=dtype_name,
                        simul_attn_type="hard_aligned_fixed_pre_decision",
                        fixed_pre_decision_ratio=8)
        model = MMAModel(cfg)
        lcfg = MMALossConfig(latency_avg_weight=0.1, latency_var_weight=0.1)

        def loss_fn(p, feats, lengths, tokens):
            logits, extra = model.forward(p, feats, lengths, tokens,
                                          rng=jax.random.PRNGKey(3),
                                          deterministic=False)
            loss, _ = mma_loss(logits, extra, tokens, lengths, lcfg)
            return loss / (B * U)
    else:
        from simulst_tpu.losses.cif_loss import CIFLossConfig, cif_loss
        from simulst_tpu.models.cif import CIFConfig, CIFModel
        cfg = CIFConfig(vocab_size=4100, compute_dtype=dtype_name)
        model = CIFModel(cfg)
        lcfg = CIFLossConfig()

        def loss_fn(p, feats, lengths, tokens):
            logits, extra = model.forward(p, feats, lengths, tokens,
                                          rng=jax.random.PRNGKey(3),
                                          deterministic=False)
            loss, _ = cif_loss(logits, extra, tokens, lengths, lcfg)
            return loss / (B * U)

    params = model.init(jax.random.PRNGKey(0))
    feats = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, T, 80)), (B, T, 80))
    lengths = jnp.full((B,), T, jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 4100)

    @jax.jit
    def train_step(tc, p):
        f = feats + tc * 1e-30
        loss, grads = jax.value_and_grad(
            lambda p_: loss_fn(p_, f, lengths, tokens))(p)
        from simulst_tpu.train.optim import global_sumsq
        return tc + loss.astype(jnp.float32) + global_sumsq(grads) * 1e-12

    @jax.jit
    def chain(tc, p):
        cc, _ = jax.lax.scan(lambda a, _: (train_step(a, p), None), tc,
                             None, length=CHAIN)
        return cc

    dt = _time(lambda tc: chain(tc, params), n_iter=10, warmup=2) / CHAIN
    return dt, B * T / (dt / 1000.0)


def bench_batcher_eff(headline_mfu, dtype_name="bfloat16"):
    """Whole-epoch effective MFU under the PRODUCTION batcher.

    The synthetic padded lines guess a within-batch length spread; this one
    measures it: run `make_batches` (production defaults — fine frame/token
    ladders + tgt_sort) over a MuST-C-shaped manifest
    (data/synthetic.mustc_like_rows) and accumulate per batch the SLOT
    FLOPs (the padded shapes the device actually computes, batch-padding
    rows included) and the USEFUL FLOPs (per-example exact: source terms by
    each t_i, target-linear by u_i, decoder self-attn by u_i^2, cross-attn
    by t_i*u_i).  Effective MFU = headline device MFU x useful/slot —
    assuming per-bucket device MFU matches the headline's, which the
    fine-bucket line supports (step time unchanged at lengths 897..1024).

    Returns (eff_mfu, eff_fps, fills) for tgt_sort on and off, so the
    target-sorting lever stays measured every round."""
    import tempfile

    import numpy as np

    from simulst_tpu.data.dataset import (BatcherConfig, SpeechDataset,
                                          make_batches)
    from simulst_tpu.data.synthetic import mustc_like_rows
    from simulst_tpu.data.vocab import PAD, Vocabulary
    from simulst_tpu.models import s2t_emformer as s2t

    cfg = s2t.S2TEmformerConfig(vocab_size=4100, ctc_layer=True,
                                compute_dtype=dtype_name)
    out = {}
    with tempfile.TemporaryDirectory() as td:
        rows = mustc_like_rows(tmpdir=td)
        vocab = Vocabulary.build([r["tgt_text"] for r in rows[:400]],
                                 vocab_size=1000)
        for tgt_sort in (True, False):
            bcfg = BatcherConfig(cmvn="none", tgt_sort=tgt_sort)
            ds = SpeechDataset(rows, vocab, bcfg)
            slot = useful = 0.0
            true_frames = f_real = f_slot = t_real = t_slot = 0
            for b in make_batches(ds, bcfg, num_shards=1, shard_id=0):
                Bp, Tb = b["feats"].shape[:2]
                Lb = b["target"].shape[1]
                t_i = np.asarray(b["feat_lengths"], np.float64)
                u_i = (b["target"] != PAD).sum(1).astype(np.float64)
                f_src, f_tgt, f_sq, f_x = _train_matmul_flops(
                    cfg, Bp, Tb, Lb, split=True)
                slot += f_src + f_tgt + f_sq + f_x
                useful += (f_src * t_i.sum() / (Bp * Tb)
                           + f_tgt * u_i.sum() / (Bp * Lb)
                           + f_sq * (u_i ** 2).sum() / (Bp * Lb ** 2)
                           + f_x * (t_i * u_i).sum() / (Bp * Tb * Lb))
                true_frames += int(t_i.sum())
                f_real += int(t_i.sum()); f_slot += Bp * Tb
                t_real += int(u_i.sum()); t_slot += Bp * Lb
            eff = useful / slot
            # epoch wall time the headline-MFU device would take on the
            # slot FLOPs (x3: fwd + bwd convention of the bench)
            secs = slot * 3 / (headline_mfu * _peak_flops(dtype_name))
            out[tgt_sort] = (headline_mfu * eff, true_frames / secs,
                             {"frame_fill": round(f_real / f_slot, 4),
                              "token_fill": round(t_real / t_slot, 4)})
    return out


def _train_matmul_flops(cfg, B, T, U, split=False):
    """Analytic forward matmul FLOPs of the s2t_emformer train step.

    With split=True returns (f_src, f_tgt, f_tgt_sq, f_cross): terms linear
    in source frames, linear in target tokens, quadratic in target tokens,
    and bilinear (cross-attention core) — so the padded bench can scale each
    by its own non-pad fraction."""
    d = cfg.embed_dim
    t4 = T // cfg.stride                       # post-subsample frames
    ecfg = cfg.emformer
    seg, rc, mem = ecfg.segment, ecfg.right_context, ecfg.max_memory
    nseg = t4 // seg
    f_src = 0.0
    # subsampler convs (stride 2 each, GLU halves channels between layers)
    t_half = T // 2
    f_src += B * t_half * 5 * cfg.input_feat * cfg.conv_channels * 2
    f_src += B * t4 * 5 * (cfg.conv_channels // 2) * (2 * d) * 2
    # conv-pos grouped conv (k = conv_pos//2 taps, Cin/g x Cout per tap)
    k = (cfg.conv_pos + 1) // 2
    f_src += B * t4 * k * (d // cfg.conv_pos_groups) * d * 2
    # emformer layers: rows = rc blocks + utterance + summaries
    rows = nseg * rc + t4 + nseg
    ctx = mem + ecfg.left_context + seg + rc   # per-query visible keys
    per_layer = (B * (t4 + nseg * rc) * d * (2 * d) * 2   # emb_to_key_value
                 + B * rows * d * d * 2                   # emb_to_query
                 + B * rows * ctx * d * 2 * 2             # qk^T + pv
                 + B * rows * d * d * 2                   # out_proj
                 + B * rows * d * cfg.ffn_dim * 2 * 2)    # fc1 + fc2
    f_src += ecfg.num_layers * per_layer
    # CTC head
    f_src += B * t4 * d * cfg.vocab_size * 2
    # decoder: 6 layers of self-attn + cross-attn + FFN on U tokens
    nl = cfg.decoder_layers
    f_tgt = nl * (B * U * d * d * 2 * 4                    # self qkvo
                  + B * U * d * d * 2 * 4                  # cross qkvo
                  + B * U * d * cfg.decoder_ffn_dim * 2 * 2)
    f_tgt += B * U * d * cfg.vocab_size * 2                # output projection
    f_tgt_sq = nl * B * U * U * d * 2 * 2                  # self attn core
    f_cross = nl * B * U * t4 * d * 2 * 2                  # cross attn core
    if split:
        return f_src, f_tgt, f_tgt_sq, f_cross
    return f_src + f_tgt + f_tgt_sq + f_cross


def main():
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    dtype = jnp.dtype(os.environ.get("SIMULST_BENCH_DTYPE", "bfloat16"))
    chunk_ms = 640.0  # segment_length(64) * 10ms frame shift

    extra = {}

    # eval runs FIRST: its staged uploads must precede the first
    # scan-of-step executable in this process (docs/perf.md transfer note)
    ev = bench_eval_throughput(dtype)
    ups, xrt = ev[8]
    extra["eval_throughput_utt_per_sec"] = round(ups, 1)
    extra["eval_throughput_x_realtime"] = round(xrt)
    extra["eval_throughput_b64_utt_per_sec"] = round(ev[64][0], 1)
    print(json.dumps({"metric": "scanned_eval_throughput",
                      "value": round(ups, 1), "unit": "utterances_per_sec_b8_10s",
                      "vs_baseline": round(xrt)}))

    cif_ms = bench_fused_chunk("cif", dtype)
    extra["cif_fused_chunk_latency_ms"] = round(cif_ms, 3)
    print(json.dumps({"metric": "cif_fused_chunk_latency",
                      "value": round(cif_ms, 3), "unit": "ms",
                      "vs_baseline": round(cif_ms / chunk_ms, 4)}))

    mma_ms = bench_fused_chunk("mma", dtype)
    extra["mma_fused_chunk_latency_ms"] = round(mma_ms, 3)
    print(json.dumps({"metric": "mma_fused_chunk_latency",
                      "value": round(mma_ms, 3), "unit": "ms",
                      "vs_baseline": round(mma_ms / chunk_ms, 4)}))

    bsz = 8
    bat_ms = bench_fused_chunk("cif", dtype, batch=bsz)
    thr = bsz * chunk_ms / bat_ms
    extra["batched_stream_throughput_x_realtime"] = round(thr, 1)
    extra["batched_stream_chunk_latency_ms"] = round(bat_ms, 3)
    print(json.dumps({"metric": "batched_stream_throughput",
                      "value": round(thr, 1), "unit": "x_realtime_b8",
                      "vs_baseline": round(thr, 1)}))

    mma_t_ms, mma_fps = bench_variant_train_step("mma")
    extra["mma_train_step_latency_ms"] = round(mma_t_ms, 3)
    extra["mma_train_frames_per_sec"] = round(mma_fps)
    print(json.dumps({"metric": "mma_train_step_latency",
                      "value": round(mma_t_ms, 3), "unit": "ms",
                      "vs_baseline": round(mma_fps)}))

    cif_t_ms, cif_fps = bench_variant_train_step("cif")
    extra["cif_train_step_latency_ms"] = round(cif_t_ms, 3)
    extra["cif_train_frames_per_sec"] = round(cif_fps)
    print(json.dumps({"metric": "cif_train_step_latency",
                      "value": round(cif_t_ms, 3), "unit": "ms",
                      "vs_baseline": round(cif_fps)}))

    train_ms, fps, mfu = bench_train_step()
    extra["train_step_latency_ms"] = round(train_ms, 3)
    extra["train_frames_per_sec"] = round(fps)
    if mfu is not None:
        extra["train_mfu"] = round(mfu, 4)
    b64_ms, b64_fps, b64_mfu = bench_train_step(B=64)
    extra["train_b64_step_latency_ms"] = round(b64_ms, 3)
    extra["train_b64_frames_per_sec"] = round(b64_fps)
    extra["train_b64_mfu"] = round(b64_mfu, 4)
    pad_ms, eff_fps, eff_mfu = bench_train_step(padded=True)
    extra["train_padded_step_latency_ms"] = round(pad_ms, 3)
    extra["train_padded_eff_frames_per_sec"] = round(eff_fps)
    extra["train_padded_eff_mfu"] = round(eff_mfu, 4)
    pk_ms, pk_fps, pk_mfu = bench_train_step(packed=True)
    extra["train_packed_step_latency_ms"] = round(pk_ms, 3)
    extra["train_packed_eff_frames_per_sec"] = round(pk_fps)
    extra["train_packed_eff_mfu"] = round(pk_mfu, 4)
    # the finer-bucketing lever (docs/perf.md): same step, narrower
    # within-bucket spread (frame_buckets step 128 -> lengths 897..1024)
    fb_ms, fb_fps, fb_mfu = bench_train_step(bucket_step=128)
    extra["train_fine_bucket_step_latency_ms"] = round(fb_ms, 3)
    extra["train_fine_bucket_eff_frames_per_sec"] = round(fb_fps)
    extra["train_fine_bucket_eff_mfu"] = round(fb_mfu, 4)
    print(json.dumps({"metric": "train_step_latency",
                      "value": round(train_ms, 3), "unit": "ms",
                      "vs_baseline": round(fps),
                      "mfu": None if mfu is None else round(mfu, 4)}))

    if mfu is not None:
        # whole-epoch effective MFU under the PRODUCTION batcher (measured
        # fills on a MuST-C-shaped manifest; host-only, no device work)
        bat = bench_batcher_eff(mfu)
        (bm, bfps, bfill), (nm, nfps, nfill) = bat[True], bat[False]
        extra["train_batcher_eff_mfu"] = round(bm, 4)
        extra["train_batcher_eff_frames_per_sec"] = round(bfps)
        extra["train_batcher_frame_fill"] = bfill["frame_fill"]
        extra["train_batcher_token_fill"] = bfill["token_fill"]
        extra["train_batcher_eff_mfu_no_tgt_sort"] = round(nm, 4)
        extra["train_batcher_token_fill_no_tgt_sort"] = nfill["token_fill"]
        print(json.dumps({"metric": "train_batcher_eff_mfu",
                          "value": round(bm, 4), "unit": "mfu_epoch",
                          "vs_baseline": round(bfps)}))

    dt = bench_read_write(dtype)
    print(json.dumps({
        "metric": "streaming_read_write_step_latency",
        "value": round(dt, 3),
        "unit": "ms",
        "vs_baseline": round(dt / chunk_ms, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
