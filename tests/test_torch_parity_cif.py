"""COMPOSED-model cross-parity vs the reference's CIF transformer.

Round-2 verdict item #1 (second half): execute the reference's own
`S2TEmformerEncoder` -> `CIFLayer` -> `CIFDecoder` composition
(/root/reference/codebase/models/s2t_emformer.py:37-294,
cif_transformer.py:111-735) end-to-end — training forward, streaming
`infer()`, teacher-forced decoding, and a closed-loop incremental decode with
the length-comparison policy + EOS overshoot bias — against our JAX model,
with the torch weights exported through `compat/fairseq_converter.convert_cif`
on the modules' REAL state_dict names, so a broken converter mapping or a
composition-order bug cannot pass.

fairseq is stubbed to the surface these modules actually use (FairseqEncoder /
FairseqDropout / lengths_to_padding_mask / full MultiheadAttention with
incremental KV caching / TransformerDecoderLayer+TransformerDecoder init
scaffolding / sinusoidal positions).  The empty `torch_cif` submodule's
`cif_function` is provided by wrapping OUR jax implementation (its
integrate-and-fire semantics are unit-tested separately in tests/test_cif.py
against hand cases); everything around it — the alpha predictor, masking,
carry/unscale logic, gather/overshoot — is the reference's own code.
"""
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simulst_tpu.compat import fairseq_converter as conv
from simulst_tpu.models import cif as jcif
from simulst_tpu.models import s2t_emformer as js2t
from tests.test_torch_parity import _load, ref  # noqa: F401

REF = "/root/reference/codebase"

# tiny geometry (pre-stride context sizes; conv stride = 4)
D, H, FFN, LAYERS = 16, 2, 32, 2
FEAT, MID = 6, 12
SEG, LC, RC, MEM = 16, 8, 8, 2
V = 23
PAD, EOS = 1, 2


# ---------------------------------------------------------------------------
# fairseq stubs (surface used by s2t_emformer.py / cif_transformer.py)
# ---------------------------------------------------------------------------

class FairseqDropout(nn.Module):
    def __init__(self, p, module_name=None):
        super().__init__()
        self.p = p

    def forward(self, x, inplace=False):
        return F.dropout(x, p=self.p, training=self.training, inplace=inplace)


class FairseqEncoder(nn.Module):
    def __init__(self, dictionary=None):
        super().__init__()

    def set_num_updates(self, num_updates):
        pass


def lengths_to_padding_mask(lengths):
    max_len = int(lengths.max()) if lengths.numel() else 0
    return (torch.arange(max_len, device=lengths.device)[None, :]
            >= lengths[:, None])


class SamePad(nn.Module):
    def __init__(self, kernel_size, causal=False):
        super().__init__()
        self.remove = 1 if kernel_size % 2 == 0 else 0

    def forward(self, x):
        return x[:, :, : -self.remove] if self.remove > 0 else x


def Embedding(num_embeddings, embedding_dim, padding_idx):
    m = nn.Embedding(num_embeddings, embedding_dim, padding_idx=padding_idx)
    nn.init.normal_(m.weight, mean=0, std=embedding_dim ** -0.5)
    nn.init.constant_(m.weight[padding_idx], 0)
    return m


class MultiheadAttentionFull(nn.Module):
    """fairseq MultiheadAttention's used surface, incl. the incremental
    prev_key/prev_value append (static_kv=False path) that CIFDecoderLayer
    relies on (cif_transformer.py:494-504)."""

    def __init__(self, embed_dim, num_heads, kdim=None, vdim=None, dropout=0.0,
                 self_attention=False, encoder_decoder_attention=False, **kw):
        super().__init__()
        self.embed_dim = embed_dim
        self.kdim = kdim if kdim is not None else embed_dim
        self.vdim = vdim if vdim is not None else embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scaling = self.head_dim ** -0.5
        self.k_proj = nn.Linear(self.kdim, embed_dim, bias=True)
        self.v_proj = nn.Linear(self.vdim, embed_dim, bias=True)
        self.q_proj = nn.Linear(embed_dim, embed_dim, bias=True)
        self.out_proj = nn.Linear(embed_dim, embed_dim, bias=True)

    def _get_input_buffer(self, incremental_state):
        if incremental_state is None:
            return {}
        return incremental_state.get(f"{id(self)}.attn_state", {})

    def _set_input_buffer(self, incremental_state, buffer):
        if incremental_state is not None:
            incremental_state[f"{id(self)}.attn_state"] = buffer
        return incremental_state

    def forward(self, query, key, value, key_padding_mask=None,
                incremental_state=None, need_weights=True, static_kv=False,
                attn_mask=None, need_head_weights=False, **kw):
        tgt_len, bsz, _ = query.size()
        q = self.q_proj(query) * self.scaling
        saved = self._get_input_buffer(incremental_state)
        if incremental_state is not None and static_kv and "prev_key" in saved:
            k, v = saved["prev_key"], saved["prev_value"]
        else:
            k = (self.k_proj(key).contiguous()
                 .view(-1, bsz * self.num_heads, self.head_dim).transpose(0, 1))
            v = (self.v_proj(value).contiguous()
                 .view(-1, bsz * self.num_heads, self.head_dim).transpose(0, 1))
            if incremental_state is not None:
                if "prev_key" in saved and not static_kv:
                    k = torch.cat([saved["prev_key"], k], dim=1)
                    v = torch.cat([saved["prev_value"], v], dim=1)
                saved = {"prev_key": k, "prev_value": v}
                self._set_input_buffer(incremental_state, saved)
        q = (q.contiguous().view(tgt_len, bsz * self.num_heads, self.head_dim)
             .transpose(0, 1))
        attn_weights = torch.bmm(q, k.transpose(1, 2))
        if attn_mask is not None:
            attn_weights = attn_weights + attn_mask[None, :, :]
        if key_padding_mask is not None and key_padding_mask.any():
            w = attn_weights.view(bsz, self.num_heads, tgt_len, -1)
            w = w.masked_fill(key_padding_mask[:, None, None, :].to(torch.bool),
                              float("-inf"))
            attn_weights = w.view(bsz * self.num_heads, tgt_len, -1)
        probs = F.softmax(attn_weights, dim=-1, dtype=torch.float32
                          ).type_as(attn_weights)
        attn = torch.bmm(probs, v)
        attn = (attn.transpose(0, 1).contiguous()
                .view(tgt_len, bsz, self.embed_dim))
        return self.out_proj(attn), None


class TransformerDecoderLayer(nn.Module):
    """init scaffolding only — CIFDecoderLayer overrides forward() entirely
    and uses just the attributes built here (cif_transformer.py:392-537)."""

    def __init__(self, args, no_encoder_attn=False, add_bias_kv=False,
                 add_zero_attn=False):
        super().__init__()
        self.embed_dim = args.decoder_embed_dim
        self.dropout_module = FairseqDropout(args.dropout)
        self.activation_dropout_module = FairseqDropout(args.activation_dropout)
        self.cross_self_attention = False
        self.self_attn = self.build_self_attention(self.embed_dim, args)
        self.activation_fn = (F.gelu if args.activation_fn == "gelu"
                              else F.relu)
        self.normalize_before = args.decoder_normalize_before
        self.self_attn_layer_norm = nn.LayerNorm(self.embed_dim)
        self.nh = args.decoder_attention_heads
        self.head_dim = self.embed_dim // self.nh
        self.c_attn = None
        self.attn_ln = None
        self.ffn_layernorm = None
        self.w_resid = None
        if no_encoder_attn:
            self.encoder_attn = None
            self.encoder_attn_layer_norm = None
        else:
            self.encoder_attn = self.build_encoder_attention(self.embed_dim,
                                                             args)
            self.encoder_attn_layer_norm = nn.LayerNorm(self.embed_dim)
        self.fc1 = nn.Linear(self.embed_dim, args.decoder_ffn_embed_dim)
        self.fc2 = nn.Linear(args.decoder_ffn_embed_dim, self.embed_dim)
        self.final_layer_norm = nn.LayerNorm(self.embed_dim)
        self.need_attn = False
        self.onnx_trace = False

    def build_self_attention(self, embed_dim, args, **kw):
        return MultiheadAttentionFull(embed_dim, args.decoder_attention_heads,
                                      dropout=args.attention_dropout,
                                      self_attention=True)

    def build_encoder_attention(self, embed_dim, args):
        return MultiheadAttentionFull(embed_dim, args.decoder_attention_heads,
                                      kdim=args.encoder_embed_dim,
                                      vdim=args.encoder_embed_dim,
                                      dropout=args.attention_dropout,
                                      encoder_decoder_attention=True)

    def residual_connection(self, x, residual):
        return residual + x


class SinusoidalPositionalEmbedding(nn.Module):
    """fairseq's sinusoidal table: interleaved-by-half sin|cos rows offset by
    padding_idx + 1, padding row zeroed."""

    def __init__(self, embedding_dim, padding_idx, init_size=1024):
        super().__init__()
        self.embedding_dim = embedding_dim
        self.padding_idx = padding_idx
        half = embedding_dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half, dtype=torch.float) * -emb)
        pos = torch.arange(init_size, dtype=torch.float)[:, None] * emb[None, :]
        table = torch.cat([torch.sin(pos), torch.cos(pos)], dim=1)
        if embedding_dim % 2 == 1:
            table = torch.cat([table, torch.zeros(init_size, 1)], dim=1)
        table[padding_idx, :] = 0
        self.weights = table

    def forward(self, input, incremental_state=None, timestep=None):
        bsz, seq_len = input.shape
        if incremental_state is not None:
            pos = self.padding_idx + seq_len
            return self.weights[pos, :].view(1, 1, -1).expand(bsz, 1, -1)
        mask = input.ne(self.padding_idx).int()
        positions = (torch.cumsum(mask, dim=1).type_as(mask) * mask
                     ).long() + self.padding_idx
        return (self.weights.index_select(0, positions.view(-1))
                .view(bsz, seq_len, -1))


class TransformerDecoder(nn.Module):
    """init scaffolding for CIFDecoder (which overrides forward +
    extract_features_scriptable)."""

    def __init__(self, args, dictionary, embed_tokens, no_encoder_attn=False,
                 output_projection=None):
        super().__init__()
        self.dictionary = dictionary
        self.padding_idx = embed_tokens.padding_idx
        self.embed_tokens = embed_tokens
        embed_dim = args.decoder_embed_dim
        self.embed_scale = (1.0 if args.no_scale_embedding
                            else math.sqrt(embed_dim))
        self.embed_positions = SinusoidalPositionalEmbedding(
            embed_dim, self.padding_idx,
            init_size=args.max_target_positions + self.padding_idx + 1)
        self.quant_noise = None
        self.project_in_dim = None
        self.project_out_dim = None
        self.layernorm_embedding = None
        self.cross_self_attention = False
        self.dropout_module = FairseqDropout(args.dropout)
        self.layers = nn.ModuleList(
            self.build_decoder_layer(args, no_encoder_attn)
            for _ in range(args.decoder_layers))
        self.layer_norm = (nn.LayerNorm(embed_dim)
                           if args.decoder_normalize_before else None)
        if output_projection is None:
            output_projection = nn.Linear(embed_dim, len(dictionary),
                                          bias=False)
            output_projection.weight = embed_tokens.weight  # shared
        self.output_projection = output_projection
        self._future_mask = torch.empty(0)

    def build_decoder_layer(self, args, no_encoder_attn=False):
        return TransformerDecoderLayer(args, no_encoder_attn)

    def buffered_future_mask(self, tensor):
        dim = tensor.size(0)
        if self._future_mask.size(0) < dim:
            self._future_mask = torch.triu(
                torch.full((dim, dim), float("-inf")), 1)
        return self._future_mask[:dim, :dim].to(tensor)

    def output_layer(self, features):
        return self.output_projection(features)


class _Dictionary:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def eos(self):
        return EOS

    def pad(self):
        return PAD


def _torch_cif_function(x, alpha, beta=1.0, tail_thres=0.5,
                        padding_mask=None, target_lengths=None, eps=1e-4):
    """torch_cif submodule replacement: wraps OUR jax cif_function (empty
    submodule upstream; contract from cif_transformer.py:171-186,228-261),
    returning the upstream dict-of-lists format trimmed to max(cif_lengths)
    rows like upstream."""
    from simulst_tpu.ops.cif import cif_function as jax_cif
    xs = jnp.asarray(x.detach().numpy())
    al = jnp.asarray(alpha.detach().numpy())
    tl = (None if target_lengths is None
          else jnp.asarray(target_lengths.detach().numpy()))
    if tl is not None:
        mol = int(target_lengths.max())
    else:
        mol = int(math.ceil(x.shape[1] / beta)) + 2
    out = jax_cif(xs, al, beta=beta, tail_thres=tail_thres,
                  target_lengths=tl, max_out_len=mol)
    t = lambda a: torch.from_numpy(np.asarray(a))
    n = max(int(np.asarray(out.cif_lengths).max()), 1)
    return {"cif_out": [t(out.cif_out[:, :n])],
            "cif_lengths": [t(out.cif_lengths)],
            "alpha_sum": [t(out.alpha_sum)],
            "delays": [t(out.delays[:, :n])],
            "tail_weights": [t(out.tail_weights)]}


@pytest.fixture(scope="module")
def refcif(ref):
    """Load the reference's s2t_emformer + cif_transformer with fairseq
    stubbed (builds on the round-2 `ref` fixture's module stubs)."""
    fsm = sys.modules["fairseq.modules"]
    fsm.FairseqDropout = FairseqDropout
    fsm.SamePad = SamePad
    fsm.TransformerDecoderLayer = TransformerDecoderLayer
    fsm.LayerNorm = nn.LayerNorm
    fs = sys.modules["fairseq"]
    fs.checkpoint_utils = types.ModuleType("fairseq.checkpoint_utils")
    sys.modules["fairseq.checkpoint_utils"] = fs.checkpoint_utils
    fmodels = sys.modules.get("fairseq.models") or types.ModuleType(
        "fairseq.models")
    fmodels.FairseqEncoder = FairseqEncoder
    fmodels.register_model = lambda name: (lambda cls: cls)
    fmodels.register_model_architecture = (
        lambda arch, name: (lambda fn: fn))
    sys.modules["fairseq.models"] = fmodels
    fmt = sys.modules.get("fairseq.models.transformer") or types.ModuleType(
        "fairseq.models.transformer")
    fmt.Linear = lambda i, o, bias=True: nn.Linear(i, o, bias)
    fmt.Embedding = Embedding
    fmt.TransformerDecoder = TransformerDecoder
    sys.modules["fairseq.models.transformer"] = fmt
    fmodels.transformer = fmt
    fdd = types.ModuleType("fairseq.data.data_utils")
    fdd.lengths_to_padding_mask = lengths_to_padding_mask
    fdata = types.ModuleType("fairseq.data")
    fdata.data_utils = fdd
    sys.modules["fairseq.data"] = fdata
    sys.modules["fairseq.data.data_utils"] = fdd

    class S2TTransformerEncoder:
        @staticmethod
        def reorder_encoder_out(self_, encoder_out, new_order):
            raise NotImplementedError

    s2t_mod = types.ModuleType("fairseq.models.speech_to_text.s2t_transformer")
    s2t_mod.S2TTransformerEncoder = S2TTransformerEncoder
    s2t_mod.S2TTransformerModel = type("S2TTransformerModel", (nn.Module,), {})
    s2t_mod.s2t_transformer_s = lambda args: None
    sys.modules["fairseq.models.speech_to_text"] = types.ModuleType(
        "fairseq.models.speech_to_text")
    sys.modules["fairseq.models.speech_to_text.s2t_transformer"] = s2t_mod

    for pkg in ("codebase", "codebase.models", "codebase.modules"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    sys.modules["codebase.modules.causal_conv"] = ref.causal_conv
    ta = types.ModuleType("codebase.models.torchaudio_models")
    ta.Emformer = ref.emformer.Emformer
    sys.modules["codebase.models.torchaudio_models"] = ta
    tc = types.ModuleType("codebase.models.torch_cif")
    tc.cif_function = _torch_cif_function
    sys.modules["codebase.models.torch_cif"] = tc

    ns = types.SimpleNamespace()
    ns.s2t_transformer = _load("codebase.models.s2t_transformer",
                               f"{REF}/models/s2t_transformer.py")
    ns.s2t_emformer = _load("codebase.models.s2t_emformer",
                            f"{REF}/models/s2t_emformer.py")
    ns.cif = _load("codebase.models.cif_transformer",
                   f"{REF}/models/cif_transformer.py")
    return ns


def _args(**over):
    a = types.SimpleNamespace(
        encoder_freezing_updates=0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, activation_fn="gelu",
        encoder_embed_dim=D, encoder_ffn_embed_dim=FFN, encoder_layers=LAYERS,
        encoder_attention_heads=H, encoder_normalize_before=True,
        no_scale_embedding=False, input_feat_per_channel=FEAT,
        input_channels=1, conv_channels=MID, conv_kernel_sizes="3,3",
        conv_pos=8, conv_pos_groups=4,
        segment_length=SEG, segment_left_context=LC, segment_right_context=RC,
        max_memory_size=MEM, tanh_on_mem=True, fp16=False, ctc_layer=True,
        cif_beta=1.0, cif_sg_alpha=False, cif_conv_kernel=3,
        cif_highway=False, cif_infinite_lookback=False,
        decoder_embed_dim=D, decoder_ffn_embed_dim=FFN,
        decoder_layers=LAYERS, decoder_attention_heads=H,
        decoder_normalize_before=True, share_decoder_input_output_embed=True,
        max_target_positions=64, decoder_learned_pos=False)
    for k, v in over.items():
        setattr(a, k, v)
    return a


def _cfg(**over):
    return jcif.CIFConfig(
        vocab_size=V, input_feat=FEAT, conv_kernel_sizes=(3, 3),
        conv_channels=MID, embed_dim=D, ffn_dim=FFN, encoder_layers=LAYERS,
        encoder_heads=H, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, conv_pos=8, conv_pos_groups=4,
        segment_length=SEG, left_context=LC, right_context=RC,
        max_memory=MEM, tanh_on_mem=True, ctc_layer=True,
        decoder_layers=LAYERS, decoder_heads=H, decoder_ffn_dim=FFN,
        max_target_positions=64, **over)


def _export(tenc, tdec, cfg):
    """torch state dicts -> our param pytree THROUGH convert_cif (the full
    fairseq key set — both sides always present, as in a real checkpoint)."""
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in tenc.state_dict().items()}
    sd.update({f"decoder.{k}": v.detach().numpy()
               for k, v in tdec.state_dict().items()})
    model = jcif.CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return conv.convert_cif(params, sd)


# ---------------------------------------------------------------------------
# 1. composed encoder: subsampler -> conv-pos -> emformer -> CTC -> CIF
# ---------------------------------------------------------------------------

def _build_ref_encoder(refcif, args, seed=0):
    torch.manual_seed(seed)
    enc = refcif.cif.CIFEncoder(args, _Dictionary(V)).eval()
    return enc


def test_composed_cif_encoder_forward_matches_reference(refcif):
    B, T = 2, 40
    args = _args()
    cfg = _cfg()
    tenc = _build_ref_encoder(refcif, args)
    tdec = _build_ref_decoder(refcif, args)
    p = _export(tenc, tdec, cfg)

    rng = np.random.RandomState(0)
    feats = rng.randn(B, T, FEAT).astype(np.float32)
    lengths = np.array([T, 33], np.int64)
    tgt_lens = np.array([6, 4], np.int64)
    feats[1, 33:] = 0.0

    with torch.no_grad():
        t_out = tenc(torch.from_numpy(feats), torch.from_numpy(lengths),
                     target_lengths=torch.from_numpy(tgt_lens))

    enc = js2t.encoder_forward(p["encoder"], cfg, jnp.asarray(feats),
                               jnp.asarray(lengths))
    valid = np.arange(enc.encoder_out.shape[1])[None, :] < np.asarray(enc.lengths)[:, None]
    cif_out, alpha = jcif.cif_layer_forward(
        p["cif"], cfg, enc.encoder_out, jnp.asarray(valid),
        target_lengths=jnp.asarray(tgt_lens), max_out_len=int(tgt_lens.max()))

    t_enc = t_out["encoder_out"][0].permute(1, 0, 2).numpy()  # (B, T', C)
    j_enc = np.asarray(enc.encoder_out)
    assert t_enc.shape == j_enc.shape
    m = valid[:, :, None]
    np.testing.assert_allclose(np.where(m, j_enc, 0), np.where(m, t_enc, 0),
                               atol=3e-5, rtol=1e-4, err_msg="encoder_out")
    t_ctc = t_out["ctc_logits"][0].numpy()
    np.testing.assert_allclose(np.where(m, np.asarray(enc.ctc_logits), 0),
                               np.where(m, t_ctc, 0), atol=3e-5, rtol=1e-4,
                               err_msg="ctc_logits")
    np.testing.assert_allclose(np.asarray(alpha),
                               t_out["alpha"][0].numpy(), atol=3e-5,
                               rtol=1e-4, err_msg="alpha")
    t_cif = t_out["cif_out"][0].permute(1, 0, 2).numpy()
    np.testing.assert_array_equal(np.asarray(cif_out.cif_lengths),
                                  t_out["cif_lengths"][0].numpy())
    cm = (np.arange(t_cif.shape[1])[None, :, None]
          < np.asarray(cif_out.cif_lengths)[:, None, None])
    np.testing.assert_allclose(
        np.where(cm, np.asarray(cif_out.cif_out)[:, :t_cif.shape[1]], 0),
        np.where(cm, t_cif, 0), atol=3e-5, rtol=1e-4, err_msg="cif_out")


def test_composed_cif_encoder_infer_streaming_matches_reference(refcif):
    """Chunked CIFEncoder.infer (carry + CIF partial-weight carry) vs our
    encoder stepper + cif_layer_step, cumulative outputs equal."""
    args = _args()
    cfg = _cfg()
    tenc = _build_ref_encoder(refcif, args, seed=1)
    tdec = _build_ref_decoder(refcif, args)
    p = _export(tenc, tdec, cfg)

    rng = np.random.RandomState(1)
    # agent chunk protocol (default_agent.py:364-376): first chunk
    # (seg+rc)*stride input frames, then seg*stride per READ
    chunks = [(SEG + RC), SEG, SEG]
    T = sum(chunks)
    feats = rng.randn(1, T, FEAT).astype(np.float32)

    # reference: cumulative features per call
    inc = {}
    t_enc_parts, t_cif_parts, t_lens = [], [], []
    seen = 0
    with torch.no_grad():
        for ci, c in enumerate(chunks):
            seen += c
            finish = ci == len(chunks) - 1
            out = tenc.infer(torch.from_numpy(feats[:, :seen]),
                             torch.tensor([seen]), inc, finish=finish)
            t_enc_parts.append(out["encoder_out"][0].permute(1, 0, 2).numpy())
            t_cif_parts.append(out["cif_out"][0].permute(1, 0, 2).numpy())
            t_lens.append(int(out["cif_lengths"][0][0]))

    # ours: new frames per call
    step = js2t.make_encoder_stepper(p["encoder"], cfg)
    est = js2t.encoder_init_state(p["encoder"], cfg, 1)
    cst = jcif.cif_layer_init_state(p["cif"], cfg, 1)
    j_enc_parts, j_cif_parts, j_lens = [], [], []
    o = 0
    for ci, c in enumerate(chunks):
        finish = ci == len(chunks) - 1
        eo, est = step(est, jnp.asarray(feats[:, o:o + c]), finish=finish)
        o += c
        if eo.encoder_out.shape[1]:
            j_enc_parts.append(np.asarray(eo.encoder_out))
            buf, n_emit, cst = jcif.cif_layer_step(
                p["cif"], cfg, cst, eo.encoder_out, finish=finish)
            n = int(n_emit[0])
            j_cif_parts.append(np.asarray(buf)[:, :n])
            j_lens.append(n)

    t_enc = np.concatenate(t_enc_parts, axis=1)
    j_enc = np.concatenate(j_enc_parts, axis=1)
    assert t_enc.shape == j_enc.shape
    np.testing.assert_allclose(j_enc, t_enc, atol=5e-5, rtol=1e-4,
                               err_msg="streamed encoder_out")
    t_cif = np.concatenate([x for x in t_cif_parts if x.shape[1]], axis=1)
    j_cif = np.concatenate([x for x in j_cif_parts if x.shape[1]], axis=1)
    assert sum(t_lens) == sum(j_lens), (t_lens, j_lens)
    assert t_cif.shape == j_cif.shape
    np.testing.assert_allclose(j_cif, t_cif, atol=5e-5, rtol=1e-4,
                               err_msg="streamed cif features")


# ---------------------------------------------------------------------------
# 2. decoder: teacher-forced forward + closed-loop incremental decode
# ---------------------------------------------------------------------------

def _build_ref_decoder(refcif, args, seed=0):
    torch.manual_seed(seed)
    d = _Dictionary(V)
    embed = Embedding(V, D, PAD)
    dec = refcif.cif.CIFDecoder(args, d, embed).eval()
    return dec


DEC_VARIANTS = [
    dict(),
    dict(cif_highway=True),
    dict(cif_infinite_lookback=True),
    dict(cif_infinite_lookback=True, cif_highway=True),
]


@pytest.mark.parametrize("variant", DEC_VARIANTS,
                         ids=["fake", "highway", "il", "il_highway"])
def test_cif_decoder_teacher_forced_matches_reference(refcif, variant):
    B, T = 2, 6
    args = _args(**variant)
    cfg = _cfg(**variant)
    tdec = _build_ref_decoder(refcif, args)
    tenc = _build_ref_encoder(refcif, args)
    p = _export(tenc, tdec, cfg)

    rng = np.random.RandomState(2)
    cif_feats = rng.randn(B, T, D).astype(np.float32)
    cif_lengths = np.array([6, 4], np.int64)
    prev = np.full((B, T), PAD, np.int64)
    prev[0] = [EOS, 5, 9, 12, 7, 4]
    prev[1, :4] = [EOS, 8, 3, 11]

    enc_out = {"cif_out": [torch.from_numpy(cif_feats).permute(1, 0, 2)],
               "cif_lengths": [torch.from_numpy(cif_lengths)]}
    with torch.no_grad():
        t_logits, _ = tdec(torch.from_numpy(prev), enc_out)
    j_logits = jcif.cif_decoder_forward(
        p["decoder"], cfg, jnp.asarray(prev), jnp.asarray(cif_feats),
        jnp.asarray(cif_lengths))

    m = (prev != PAD)[:, :, None]
    np.testing.assert_allclose(np.where(m, np.asarray(j_logits), 0),
                               np.where(m, t_logits.numpy(), 0),
                               atol=3e-5, rtol=1e-4, err_msg="logits")


@pytest.mark.parametrize("variant", DEC_VARIANTS,
                         ids=["fake", "highway", "il", "il_highway"])
def test_cif_closed_loop_incremental_decode_matches_reference(refcif, variant):
    """Length-comparison policy (cif_agent.py:385-412) driven closed loop:
    reveal CIF features chunk by chunk, WRITE argmax tokens incrementally,
    finish with EOS-overshoot-biased extra steps; token sequences must match
    step for step."""
    Tmax, reveal, max_writes, ow = 7, [2, 2, 3], 10, 1.7
    args = _args(**variant)
    cfg = _cfg(**variant)
    tdec = _build_ref_decoder(refcif, args, seed=3)
    tenc = _build_ref_encoder(refcif, args)
    p = _export(tenc, tdec, cfg)

    rng = np.random.RandomState(4)
    cif_feats = rng.randn(1, Tmax, D).astype(np.float32)

    def policy(cif_len, n_tok, finished):
        return cif_len > n_tok or finished   # WRITE iff

    # reference
    inc = {}
    t_tokens = []
    revealed, ri = 0, 0
    with torch.no_grad():
        while len(t_tokens) < max_writes:
            finished = ri >= len(reveal)
            if not policy(revealed, len(t_tokens), finished):
                revealed += reveal[ri]
                ri += 1
                continue
            prev = torch.tensor([[EOS] + t_tokens], dtype=torch.long)
            eo = {"cif_out": [torch.from_numpy(
                      cif_feats[:, :revealed]).permute(1, 0, 2)],
                  "cif_lengths": [torch.tensor([revealed])]}
            logits, _ = tdec(prev, eo, incremental_state=inc,
                             overshoot_weight=ow)
            tok = int(logits[0, -1].argmax())
            t_tokens.append(tok)
            if finished and tok == EOS:
                break

    # ours
    st = jcif.cif_decoder_init_state(cfg, 1, max_writes + 2)
    j_tokens = []
    revealed, ri = 0, 0
    token = jnp.asarray([EOS])
    buf = jnp.asarray(cif_feats)
    while len(j_tokens) < max_writes:
        finished = ri >= len(reveal)
        if not policy(revealed, len(j_tokens), finished):
            revealed += reveal[ri]
            ri += 1
            continue
        logits, st = jcif.cif_decoder_step(
            p["decoder"], cfg, st, token, buf, jnp.asarray([revealed]),
            overshoot_weight=ow)
        tok = int(np.asarray(logits[0]).argmax())
        j_tokens.append(tok)
        token = jnp.asarray([tok])
        if finished and tok == EOS:
            break

    assert j_tokens == t_tokens, (f"{variant}: closed-loop tokens differ\n"
                                  f"torch: {t_tokens}\njax:   {j_tokens}")
    # the session must exercise the overshoot region (writes beyond cif_len)
    assert len(t_tokens) > sum(reveal) or EOS in t_tokens
