"""The fused device-side chunk step must emit exactly the same tokens as the
step-by-step host-driven loop."""
import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu.data.vocab import EOS
from simulst_tpu.models import cif as cif_mod
from simulst_tpu.models import s2t_emformer as s2t
from simulst_tpu.stream.fused import cif_fused_init, make_cif_fused_step


def _cfg():
    return cif_mod.CIFConfig(
        vocab_size=24, input_feat=8, conv_channels=16, embed_dim=16,
        ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
        decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
        left_context=32, right_context=8, max_memory=2,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)


def reference_loop(params, cfg, chunks, max_tokens=32):
    """Host-driven step-by-step CIF session (mirrors stream/agents.py)."""
    enc_state = s2t.encoder_init_state(params["encoder"], cfg, 1)
    cif_state = cif_mod.cif_layer_init_state(params["cif"], cfg, 1)
    dec_state = cif_mod.cif_decoder_init_state(cfg, 1, max_tokens)
    cif_buf = jnp.zeros((1, max_tokens, cfg.embed_dim))
    cif_len = 0
    tokens = []
    finished = False
    for i, ch in enumerate(chunks):
        finish = i == len(chunks) - 1
        out, enc_state = s2t.encoder_step(params["encoder"], cfg, enc_state,
                                          ch, finish)
        fired, n_emit, cif_state = cif_mod.cif_layer_step(
            params["cif"], cfg, cif_state, out.encoder_out, finish)
        n = int(n_emit[0])
        if n > 0:
            cif_buf = jax.lax.dynamic_update_slice(
                cif_buf, fired[:, :n], (0, cif_len, 0))
            cif_len += n
        while not finished and (cif_len > len(tokens) or finish) \
                and len(tokens) < max_tokens - 1:
            prev = jnp.array([tokens[-1] if tokens else EOS], jnp.int32)
            logits, new_dec = cif_mod.cif_decoder_step(
                params["decoder"], cfg, dec_state, prev, cif_buf,
                jnp.array([cif_len]))
            tok = int(jnp.argmax(logits[0]))
            if tok == EOS and not finish:
                break  # force-finish: discard attempt, wait for more source
            dec_state = new_dec
            tokens.append(tok)
            if tok == EOS:
                finished = True
    return tokens


def _mma_cfg(**kw):
    from simulst_tpu.models import mma as mma_mod
    d = dict(vocab_size=24, input_feat=8, conv_channels=16, embed_dim=16,
             ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
             decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
             left_context=32, right_context=8, max_memory=2,
             dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
             simul_attn_type="waitk_fixed_pre_decision", waitk_lagging=2,
             fixed_pre_decision_ratio=2)
    d.update(kw)
    return mma_mod.MMAConfig(**d)


def mma_reference_loop(params, cfg, chunks, max_src=64, max_tokens=32):
    from simulst_tpu.models import mma as mma_mod
    enc_state = s2t.encoder_init_state(params["encoder"], cfg, 1)
    dec_state = mma_mod.mma_decoder_init_state(cfg, 1, max_tokens)
    enc_buf = jnp.zeros((1, max_src, cfg.embed_dim))
    src_len = 0
    tokens = []
    finished = False
    for i, ch in enumerate(chunks):
        finish = i == len(chunks) - 1
        out, enc_state = s2t.encoder_step(params["encoder"], cfg, enc_state,
                                          ch, finish)
        n = out.encoder_out.shape[1]
        if n:
            enc_buf = jax.lax.dynamic_update_slice(enc_buf, out.encoder_out,
                                                   (0, src_len, 0))
            src_len += n
        while not finished and len(tokens) < max_tokens - 1:
            prev = jnp.array([tokens[-1] if tokens else EOS], jnp.int32)
            logits, action, new_dec = mma_mod.mma_decoder_step(
                params["decoder"], cfg, dec_state, prev, enc_buf,
                jnp.array([src_len]), jnp.asarray(not finish))
            if int(action[0]) == 0:
                dec_state = mma_mod.adopt_on_read(dec_state, new_dec)
                break
            tok = int(jnp.argmax(logits[0]))
            if tok == EOS and not finish:
                dec_state = mma_mod.adopt_on_read(dec_state, new_dec)
                break
            dec_state = new_dec
            tokens.append(tok)
            if tok == EOS:
                finished = True
    return tokens


def test_mma_fused_equals_stepwise():
    from simulst_tpu.stream.fused import make_mma_fused_step, mma_fused_init
    cfg = _mma_cfg()
    from simulst_tpu.models.mma import MMAModel
    model = MMAModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 120, cfg.input_feat))
    chunks = [feats[:, :24]] + [feats[:, t:t + 16] for t in range(24, 120, 16)]
    ref_tokens = mma_reference_loop(params, cfg, chunks)

    step = make_mma_fused_step(params, cfg)
    state = mma_fused_init(params, cfg, max_src=64, max_tokens=32)
    for i, ch in enumerate(chunks):
        state, n_new = step(state, ch, finish=i == len(chunks) - 1)
    n = int(state.n_tokens[0])
    fused_tokens = [int(t) for t in np.asarray(state.tokens)[0, :n]]
    assert fused_tokens == ref_tokens, (fused_tokens, ref_tokens)


def test_fused_equals_stepwise():
    cfg = _cfg()
    model = cif_mod.CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 120, cfg.input_feat))
    chunks = [feats[:, :24], feats[:, 24:40], feats[:, 40:56],
              feats[:, 56:72], feats[:, 72:88], feats[:, 88:104],
              feats[:, 104:120]]
    ref_tokens = reference_loop(params, cfg, chunks)

    step = make_cif_fused_step(params, cfg)
    state = cif_fused_init(params, cfg, max_tokens=32)
    for i, ch in enumerate(chunks):
        state, n_new = step(state, ch, finish=i == len(chunks) - 1)
    n = int(state.n_tokens[0])
    fused_tokens = [int(t) for t in np.asarray(state.tokens)[0, :n]]
    assert fused_tokens == ref_tokens, (fused_tokens, ref_tokens)
