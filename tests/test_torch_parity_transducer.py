"""Cross-parity vs the reference's Transformer-Transducer modules.

Executes the reference's `AvgPool1dTBCPad`, `SimpleJoiner` and
`TransducerDecoder` (/root/reference/codebase/models/transducer_model.py:
23-270) — the last model family without module-level torch parity — against
our models/transducer.py, with weights exported through the converter's new
`convert_transducer` branch:

  (a) length-aware downsample pooling with the partial-final-window rescale,
  (b) the teacher-forced (B, S, U, V) joiner lattice (incl. the reference's
      bos/eos token fixup), and
  (c) the incremental emit-scan: forced emit at the source EOS, past-frame
      blank masking via prev_emit, first-non-blank selection — the
      prev_emit trajectory and emitted tokens must match step for step.

Builds on the fairseq stubs of tests/test_torch_parity_cif.py, extended here
with the STANDARD TransformerDecoderLayer.forward and
TransformerDecoder.extract_features the transducer relies on (the CIF test's
decoder overrides both, so the stubs only carried init scaffolding).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

from simulst_tpu.compat import fairseq_converter as conv
from simulst_tpu.models import transducer as jtd
from simulst_tpu.nn import transformer as tfm
from tests.test_torch_parity import _load, ref  # noqa: F401
from tests.test_torch_parity_cif import (  # noqa: F401
    _Dictionary, _args, refcif, TransformerDecoder, TransformerDecoderLayer)

REF = "/root/reference/codebase"
D, H, FFN, LAYERS = 16, 2, 32, 2
V = 23
PAD, EOS, BOS = 1, 2, 0


def _install_standard_decoder_surface():
    """Add the fairseq-standard layer forward + decoder extract_features +
    incremental-state accessors to the stub classes (additive: the CIF
    decoder overrides its own versions)."""

    def layer_forward(self, x, encoder_out=None, encoder_padding_mask=None,
                      incremental_state=None, prev_self_attn_state=None,
                      prev_attn_state=None, self_attn_mask=None,
                      self_attn_padding_mask=None, need_attn=False,
                      need_head_weights=False):
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(query=x, key=x, value=x,
                              key_padding_mask=self_attn_padding_mask,
                              incremental_state=incremental_state,
                              need_weights=False, attn_mask=self_attn_mask)
        x = self.dropout_module(x)
        x = self.residual_connection(x, residual)
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)
        if self.encoder_attn is not None and encoder_out is not None:
            residual = x
            if self.normalize_before:
                x = self.encoder_attn_layer_norm(x)
            x, _ = self.encoder_attn(query=x, key=encoder_out,
                                     value=encoder_out,
                                     key_padding_mask=encoder_padding_mask,
                                     incremental_state=incremental_state,
                                     static_kv=True, need_weights=False)
            x = self.dropout_module(x)
            x = self.residual_connection(x, residual)
            if not self.normalize_before:
                x = self.encoder_attn_layer_norm(x)
        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = self.activation_fn(self.fc1(x))
        x = self.activation_dropout_module(x)
        x = self.fc2(x)
        x = self.dropout_module(x)
        x = self.residual_connection(x, residual)
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x, None, None

    def extract_features(self, prev_output_tokens, encoder_out=None,
                         incremental_state=None, **kw):
        positions = self.embed_positions(prev_output_tokens,
                                         incremental_state=incremental_state)
        if incremental_state is not None:
            prev_output_tokens = prev_output_tokens[:, -1:]
        x = self.embed_scale * self.embed_tokens(prev_output_tokens)
        x = x + positions[:, -x.size(1):]
        x = self.dropout_module(x)
        x = x.transpose(0, 1)
        self_attn_padding_mask = None
        if prev_output_tokens.eq(self.padding_idx).any():
            self_attn_padding_mask = prev_output_tokens.eq(self.padding_idx)
        for layer in self.layers:
            mask = (self.buffered_future_mask(x)
                    if incremental_state is None else None)
            x, _, _ = layer(x, None, None, incremental_state,
                            self_attn_mask=mask,
                            self_attn_padding_mask=self_attn_padding_mask)
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        return x.transpose(0, 1), {}

    def get_incremental_state(self, incremental_state, key):
        if incremental_state is None:
            return None
        return incremental_state.get(f"{id(self)}.{key}")

    def set_incremental_state(self, incremental_state, key, value):
        if incremental_state is not None:
            incremental_state[f"{id(self)}.{key}"] = value
        return incremental_state

    TransformerDecoderLayer.forward = layer_forward
    TransformerDecoder.extract_features = extract_features
    TransformerDecoder.get_incremental_state = get_incremental_state
    TransformerDecoder.set_incremental_state = set_incremental_state


class _Dict3(_Dictionary):
    def bos(self):
        return BOS


@pytest.fixture(scope="module")
def reftd(refcif):
    _install_standard_decoder_surface()
    ns = types.SimpleNamespace()
    ns.mod = _load("codebase.models.transducer_model",
                   f"{REF}/models/transducer_model.py")
    return ns


def _targs(downsample=1):
    a = _args()
    a.downsample = downsample
    return a


def _tcfg(downsample=1):
    return jtd.TransducerConfig(
        vocab_size=V, embed_dim=D, ffn_dim=FFN, encoder_layers=LAYERS,
        encoder_heads=H, decoder_layers=LAYERS, decoder_heads=H,
        decoder_ffn_dim=FFN, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, downsample=downsample, ctc_layer=False,
        max_target_positions=64)


def _build_ref_decoder(reftd, args, seed=0):
    torch.manual_seed(seed)
    d = _Dict3(V)
    emb = nn.Embedding(V, D, padding_idx=PAD)
    nn.init.normal_(emb.weight, std=D ** -0.5)
    dec = reftd.mod.TransducerDecoder(args, d, emb).eval()
    return dec


def _export(tdec, cfg):
    sd = {f"decoder.{k}": v.detach().numpy()
          for k, v in tdec.state_dict().items()}
    model = jtd.TransducerModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # encoder not under test (covered by the composed CIF parity file);
    # apply convert_transducer's decoder+joiner mappings directly
    conv.convert_decoder(params, sd, cross_attn="none")
    conv._linear(params["decoder"], ["joiner", "source_projection"], sd,
                 "decoder.joiner.source_projection")
    conv._linear(params["decoder"], ["joiner", "target_projection"], sd,
                 "decoder.joiner.target_projection", bias=False)
    return params


@pytest.mark.parametrize("k", [2, 3])
def test_downsample_pool_matches_reference(reftd, k):
    """AvgPool1dTBCPad with ceil-mode + partial-final-window rescale
    (transducer_model.py:79-98)."""
    B, T, C = 3, 11, 8
    rng = np.random.RandomState(0)
    x = rng.randn(T, B, C).astype(np.float32)
    lengths = np.array([11, 7, 4], np.int64)
    pad_mask = np.arange(T)[None, :] >= lengths[:, None]
    x_m = x.copy()
    x_m[pad_mask.T] = 0.0

    pool = reftd.mod.AvgPool1dTBCPad(kernel_size=k, stride=k, ceil_mode=True)
    with torch.no_grad():
        t_out, t_mask = pool(torch.from_numpy(x_m.copy()),
                             torch.from_numpy(pad_mask))

    j_out, j_lens = jtd.downsample_pool(
        jnp.asarray(x.transpose(1, 0, 2)), jnp.asarray(lengths), k)
    t_np = t_out.numpy().transpose(1, 0, 2)
    # compare valid pooled frames per example
    for b in range(B):
        n = int(j_lens[b])
        np.testing.assert_allclose(np.asarray(j_out)[b, :n], t_np[b, :n],
                                   atol=2e-5, rtol=1e-4, err_msg=f"b={b}")
    # reference's pooled padding mask agrees with our lengths
    t_lens = (~t_mask.numpy()).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(j_lens), t_lens)


@pytest.mark.parametrize("downsample", [1, 2])
def test_teacher_forced_lattice_matches_reference(reftd, downsample):
    """Offline joiner lattice incl. the bos/eos token fixup
    (transducer_model.py:124-162)."""
    B, S, U = 2, 9, 5
    args = _targs(downsample)
    cfg = _tcfg(downsample)
    tdec = _build_ref_decoder(reftd, args)
    p = _export(tdec, cfg)

    rng = np.random.RandomState(1)
    src = rng.randn(S, B, D).astype(np.float32)
    src_lens = np.array([S, S - 3], np.int64)
    pad_mask = np.arange(S)[None, :] >= src_lens[:, None]
    src_m = src.copy()
    src_m[pad_mask.T] = 0.0
    prev = np.full((B, U), PAD, np.int64)
    prev[0] = [EOS, 5, 9, 12, 7]
    prev[1, :3] = [EOS, 8, 3]

    enc_out = {"encoder_out": [torch.from_numpy(src_m.copy())],
               "encoder_padding_mask": [torch.from_numpy(pad_mask)]}
    with torch.no_grad():
        t_logits, t_extra = tdec(torch.from_numpy(prev.copy()), enc_out)
    t_lat = t_logits.numpy()                       # (B, S', U+1, V)

    # ours: replicate model.forward's label prep on raw encoder feats
    pooled, j_lens = jtd.downsample_pool(
        jnp.asarray(src.transpose(1, 0, 2)), jnp.asarray(src_lens),
        downsample)
    toks = jnp.asarray(prev).at[:, 0].set(BOS)
    toks = jnp.concatenate([toks, jnp.full((B, 1), PAD, toks.dtype)], axis=1)
    tl = (toks != PAD).sum(axis=1)
    toks = jnp.where(jnp.arange(toks.shape[1])[None, :] == tl[:, None],
                     EOS, toks)
    tgt = jtd._label_features(p["decoder"], cfg, toks, None, True)
    j_lat = jtd.joiner_forward(p["decoder"]["joiner"], p["decoder"], cfg,
                               pooled, tgt)

    assert j_lat.shape == t_lat.shape
    # mask to valid (source frame, label) cells
    for b in range(B):
        sl = int(j_lens[b])
        ul = int(tl[b]) + 1
        np.testing.assert_allclose(np.asarray(j_lat)[b, :sl, :ul],
                                   t_lat[b, :sl, :ul], atol=3e-5, rtol=1e-4,
                                   err_msg=f"lattice b={b}")


@pytest.mark.parametrize("downsample", [1, 2, 3])
def test_incremental_emit_scan_matches_reference(reftd, downsample):
    """Step-for-step greedy decode: forced emit at source EOS, prev_emit
    masking, first-non-blank frame selection (transducer_model.py:165-209).
    With downsample > 1 both sides pool the visible source inside the
    incremental call (reference :133-135; ours in decode_step), so prev_emit
    trajectories are compared in POOLED coordinates."""
    S, max_steps = 10, 8
    args = _targs(downsample)
    cfg = _tcfg(downsample)
    tdec = _build_ref_decoder(reftd, args, seed=2)
    p = _export(tdec, cfg)

    rng = np.random.RandomState(3)
    src = rng.randn(S, 1, D).astype(np.float32)

    inc = {}
    t_tokens, t_emits = [], []
    prefix = [BOS]
    with torch.no_grad():
        for _ in range(max_steps):
            prev = torch.tensor([prefix], dtype=torch.long)
            logits, extra = tdec(
                prev,
                {"encoder_out": [torch.from_numpy(src.copy())],
                 "encoder_padding_mask": [None]},
                incremental_state=inc)
            buf = tdec._get_input_buffer(inc)
            t_emits.append(int(buf["prev_emit"][0]))
            tok = int(logits[0, 0].argmax())
            t_tokens.append(tok)
            if tok == EOS:
                break
            prefix.append(tok if tok != BOS else BOS)

    model = jtd.TransducerModel(cfg)
    state = model.init_decode_state(1, max_steps + 2)
    src_buf = jnp.asarray(src.transpose(1, 0, 2))
    src_len = jnp.asarray([S])
    j_tokens, j_emits = [], []
    token = jnp.asarray([BOS])
    for _ in range(max_steps):
        logits, emitted, state = model.decode_step(p, state, token, src_buf,
                                                   src_len, online=False)
        j_emits.append(int(state.prev_emit[0]))
        tok = int(np.asarray(logits[0]).argmax())
        j_tokens.append(tok)
        if tok == EOS:
            break
        token = jnp.asarray([tok])

    assert j_tokens == t_tokens, (f"tokens differ\ntorch: {t_tokens}\n"
                                  f"jax:   {j_tokens}")
    assert j_emits == t_emits, (f"prev_emit differs\ntorch: {t_emits}\n"
                                f"jax:   {j_emits}")
    assert len(t_tokens) > 1


@pytest.mark.parametrize("downsample", [2, 3])
def test_streaming_session_matches_reference(reftd, downsample):
    """Chunked ONLINE session with source downsampling (VERDICT r4 missing
    #3): the visible raw source grows chunk by chunk; each chunk runs the
    WRITE policy loop (no forced emit while online, all-blank => READ,
    premature EOS rejected — the fused session's rules, stream/fused.py).

    Torch side: the reference decoder re-run TEACHER-FORCED on the full
    label prefix per attempt, pooling the visible source with its own
    AvgPool1dTBCPad (transducer_model.py:133-135); causal self-attention
    makes label column t independent of the bos/eos fixup's appended tail,
    so column t of the offline lattice IS the incremental step's frame
    lattice (incremental == offline for the label encoder is separately
    covered by test_incremental_emit_scan_matches_reference).  The emit-scan
    rules are replayed on that lattice in numpy.

    Our side: model.decode_step on the RAW frame buffer (it pools the
    visible prefix per call) with rollback = not adopting the attempted
    state.  Emitted tokens, their chunk indices and the pooled prev_emit
    trajectory must match exactly — including the partial-last-window
    re-pooling as the source grows."""
    args = _targs(downsample)
    cfg = _tcfg(downsample)
    tdec = _build_ref_decoder(reftd, args, seed=4)
    p = _export(tdec, cfg)

    S, cap = 11, 12
    rng = np.random.RandomState(5)
    src = rng.randn(S, 1, D).astype(np.float32)
    chunk_ends = [3, 6, 9, S]

    # ---- torch side ----
    t_tokens, t_emits = [], []
    prefix = [BOS]
    prev_emit = 0
    finished = False
    with torch.no_grad():
        for ci, end in enumerate(chunk_ends):
            online = ci < len(chunk_ends) - 1
            visible = torch.from_numpy(src[:end].copy())
            while not finished and len(prefix) < cap:
                prev = torch.tensor([prefix], dtype=torch.long)
                logits, _ = tdec(
                    prev.clone(),
                    {"encoder_out": [visible.clone()],
                     "encoder_padding_mask": [None]})
                lat = logits[0, :, len(prefix) - 1, :].numpy().copy()
                sp = lat.shape[0]          # pooled visible length
                lat[np.arange(sp) < prev_emit] = np.eye(V)[BOS]
                if not online:
                    lat[sp - 1, BOS] = -1e4
                preds = lat.argmax(-1)
                nonblank = preds != BOS
                if not nonblank.any():
                    break                  # READ
                e = int(np.argmax(nonblank))
                tok = int(preds[e])
                if tok == EOS and online:
                    break                  # premature EOS rejected -> READ
                prev_emit = e
                prefix.append(tok)
                t_tokens.append((ci, tok))
                t_emits.append(e)
                if tok == EOS:
                    finished = True

    # ---- ours ----
    model = jtd.TransducerModel(cfg)
    state = model.init_decode_state(1, cap + 2)
    # capacity buffer with GARBAGE beyond the valid prefix: decode_step's
    # pooling must mask it via src_len before any window mean
    src_buf = jnp.asarray(
        np.concatenate([src.transpose(1, 0, 2),
                        7.0 + rng.randn(1, 5, D).astype(np.float32)], axis=1))
    j_tokens, j_emits = [], []
    token = jnp.asarray([BOS])
    finished = False
    for ci, end in enumerate(chunk_ends):
        online = ci < len(chunk_ends) - 1
        src_len = jnp.asarray([end])
        while not finished and len(j_tokens) + 1 < cap:
            logits, emitted, new_state = model.decode_step(
                p, state, token, src_buf, src_len, online=online)
            if not bool(emitted[0]):
                break                      # READ: attempt not adopted
            tok = int(np.asarray(logits[0]).argmax())
            if tok == EOS and online:
                break                      # rejected EOS: attempt not adopted
            state = new_state
            token = jnp.asarray([tok])
            j_tokens.append((ci, tok))
            j_emits.append(int(state.prev_emit[0]))
            if tok == EOS:
                finished = True

    assert j_tokens == t_tokens, (f"(chunk, token) differ\n"
                                  f"torch: {t_tokens}\njax: {j_tokens}")
    assert j_emits == t_emits, (f"prev_emit differs\ntorch: {t_emits}\n"
                                f"jax: {j_emits}")
    assert len(t_tokens) >= 1
