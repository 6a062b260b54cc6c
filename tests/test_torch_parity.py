"""Numerical cross-parity against the reference's own PyTorch code.

Round-1 verdict item #1: the fairseq->JAX converter was only validated against
fabricated state dicts.  Here we execute the reference's actual modules --
the vendored torchaudio Emformer
(/root/reference/codebase/models/torchaudio_models/emformer.py:609-896, its
only fairseq dep `LayerNorm` stubbed with torch.nn.LayerNorm) and the
monotonic-attention math
(/root/reference/codebase/utils/monotonic_attention.py:12-197,
p_choose_strategy.py:6-53) -- export the torch weights into our param pytree
through the SAME layout transforms as compat/fairseq_converter.py, and assert
the JAX forward/infer paths match the torch ones numerically.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from simulst_tpu.compat.fairseq_converter import _set, _t
from simulst_tpu.nn.emformer import (EmformerConfig, emformer_forward,
                                     emformer_init, emformer_init_state,
                                     emformer_step)
from simulst_tpu.ops import monotonic as ours

REF = "/root/reference/codebase"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    # The vendored Emformer's only fairseq dependency is LayerNorm
    # (emformer.py:5); stub it so the module imports without fairseq.
    if "fairseq.modules" not in sys.modules:
        fs = types.ModuleType("fairseq")
        fsm = types.ModuleType("fairseq.modules")
        fsm.LayerNorm = torch.nn.LayerNorm
        fs.modules = fsm
        sys.modules.setdefault("fairseq", fs)
        sys.modules["fairseq.modules"] = fsm
    # Fake `codebase.utils` package so the intra-package import in
    # monotonic_attention.py:5 resolves without running codebase/__init__.py
    # (which would pull in all of fairseq).
    for pkg in ("codebase", "codebase.utils"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    # Minimal stubs for causal_conv.py's three fairseq imports (:6-8):
    # with_incremental_state (per-module state keying), ConvTBC (thin
    # torch.conv_tbc wrapper), Linear (plain nn.Linear factory).
    if "fairseq.incremental_decoding_utils" not in sys.modules:
        inc = types.ModuleType("fairseq.incremental_decoding_utils")

        def with_incremental_state(cls):
            def get_inc(self, st, key):
                return None if st is None else st.get(f"{id(self)}.{key}")

            def set_inc(self, st, key, val):
                if st is not None:
                    st[f"{id(self)}.{key}"] = val
                return st

            cls.get_incremental_state = get_inc
            cls.set_incremental_state = set_inc
            return cls

        inc.with_incremental_state = with_incremental_state
        sys.modules["fairseq.incremental_decoding_utils"] = inc

        class ConvTBC(torch.nn.Module):
            def __init__(self, in_channels, out_channels, kernel_size, padding=0):
                super().__init__()
                self.kernel_size = (kernel_size,)
                self.padding = (padding,)
                self.weight = torch.nn.Parameter(
                    torch.randn(kernel_size, in_channels, out_channels) * 0.1)
                self.bias = torch.nn.Parameter(torch.zeros(out_channels))

            def forward(self, x):
                return torch.conv_tbc(x.contiguous(), self.weight, self.bias,
                                      self.padding[0])

        sys.modules["fairseq.modules"].ConvTBC = ConvTBC
        fmt = types.ModuleType("fairseq.models.transformer")
        fmt.Linear = lambda i, o, bias=True: torch.nn.Linear(i, o, bias)
        fm = types.ModuleType("fairseq.models")
        fm.transformer = fmt
        sys.modules["fairseq.models"] = fm
        sys.modules["fairseq.models.transformer"] = fmt
    ns = types.SimpleNamespace()
    ns.causal_conv = _load("ref_causal_conv", f"{REF}/modules/causal_conv.py")
    ns.functions = _load("codebase.utils.functions", f"{REF}/utils/functions.py")
    ns.monotonic = _load("codebase.utils.monotonic_attention",
                         f"{REF}/utils/monotonic_attention.py")
    ns.p_choose = _load("codebase.utils.p_choose_strategy",
                        f"{REF}/utils/p_choose_strategy.py")
    ns.emformer = _load("ref_torchaudio_emformer",
                        f"{REF}/models/torchaudio_models/emformer.py")
    return ns


# ---------------------------------------------------------------------------
# Emformer
# ---------------------------------------------------------------------------

CFG = EmformerConfig(input_dim=32, num_heads=2, ffn_dim=48, num_layers=3,
                     dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
                     activation="gelu", left_context=6, right_context=2,
                     segment=4, max_memory=3, tanh_on_mem=True)


def _build_torch_emformer(ref, seed=0):
    torch.manual_seed(seed)
    return ref.emformer.Emformer(
        input_dim=CFG.input_dim, num_heads=CFG.num_heads, ffn_dim=CFG.ffn_dim,
        num_layers=CFG.num_layers, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, activation="gelu",
        left_context_length=CFG.left_context,
        right_context_length=CFG.right_context, segment_length=CFG.segment,
        max_memory_size=CFG.max_memory,
        weight_init_scale_strategy="depthwise", tanh_on_mem=True,
        normalize_before=True).eval()


def _port_weights(tmod, params):
    """torch Emformer state_dict -> our pytree, same transforms the
    checkpoint converter applies (fairseq_converter.convert_encoder)."""
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    for i in range(len(params["layers"])):
        pre = f"emformer_layers.{i}"
        for name in ("emb_to_key_value", "emb_to_query", "out_proj"):
            _set(params, ["layers", i, "attention", name, "weight"],
                 _t(sd[f"{pre}.attention.{name}.weight"]))
            _set(params, ["layers", i, "attention", name, "bias"],
                 sd[f"{pre}.attention.{name}.bias"])
        _set(params, ["layers", i, "ln_input", "scale"],
             sd[f"{pre}.layer_norm_input.weight"])
        _set(params, ["layers", i, "ln_input", "bias"],
             sd[f"{pre}.layer_norm_input.bias"])
        _set(params, ["layers", i, "pos_ff", "ln", "scale"],
             sd[f"{pre}.pos_ff.0.weight"])
        _set(params, ["layers", i, "pos_ff", "ln", "bias"],
             sd[f"{pre}.pos_ff.0.bias"])
        _set(params, ["layers", i, "pos_ff", "fc1", "weight"],
             _t(sd[f"{pre}.pos_ff.1.weight"]))
        _set(params, ["layers", i, "pos_ff", "fc1", "bias"],
             sd[f"{pre}.pos_ff.1.bias"])
        _set(params, ["layers", i, "pos_ff", "fc2", "weight"],
             _t(sd[f"{pre}.pos_ff.4.weight"]))
        _set(params, ["layers", i, "pos_ff", "fc2", "bias"],
             sd[f"{pre}.pos_ff.4.bias"])
    _set(params, ["final_ln", "scale"], sd["final_layer_norm.weight"])
    _set(params, ["final_ln", "bias"], sd["final_layer_norm.bias"])
    return params


@pytest.mark.parametrize("segmented", [True, False])
def test_emformer_forward_matches_reference(ref, segmented):
    """Training/offline forward: reference Emformer.forward (emformer.py:795-839)
    vs our emformer_forward, real torch weights through the converter layout."""
    tmod = _build_torch_emformer(ref)
    cfg = EmformerConfig(**{**CFG.__dict__, "segmented_attention": segmented})
    params = _port_weights(tmod, emformer_init(jax.random.PRNGKey(0), cfg))

    B, U = 2, 19  # non-multiple of segment: exercises ceil-mode paths
    rng = np.random.RandomState(1)
    x = rng.randn(B, U + cfg.right_context, cfg.input_dim).astype(np.float32)
    lengths = np.array([U, 13], np.int32)
    # zero the padded utterance tail like the bucketing batcher does
    x[1, 13:U] = 0.0

    with torch.no_grad():
        t_out, t_lens, _ = tmod(torch.from_numpy(x), torch.from_numpy(lengths))
    j_out, _ = emformer_forward(params, cfg, jnp.asarray(x),
                                jnp.asarray(lengths))

    got = np.asarray(j_out)
    want = t_out.numpy()
    # only valid frames are comparable (padding-frame treatment may differ)
    np.testing.assert_allclose(got[0], want[0], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got[1, :13], want[1, :13], atol=2e-5, rtol=1e-4)


def test_emformer_infer_matches_reference(ref):
    """Streaming: reference Emformer.infer (emformer.py:841-896) vs our
    emformer_step, chunk by chunk with carried state."""
    tmod = _build_torch_emformer(ref)
    params = _port_weights(tmod, emformer_init(jax.random.PRNGKey(0), CFG))

    S, R, D = CFG.segment, CFG.right_context, CFG.input_dim
    n_chunks = 6
    rng = np.random.RandomState(2)
    stream = rng.randn(1, n_chunks * S + R, D).astype(np.float32)

    t_states = None
    j_state = emformer_init_state(CFG, batch=1)
    utt_valid = jnp.full((1,), S, jnp.int32)
    for c in range(n_chunks):
        chunk = stream[:, c * S:(c + 1) * S + R]
        with torch.no_grad():
            t_out, t_lens, t_states = tmod.infer(
                torch.from_numpy(chunk),
                torch.full((1,), S + R, dtype=torch.int64), t_states)
        j_out, j_valid, j_state = emformer_step(params, CFG, j_state,
                                                jnp.asarray(chunk), utt_valid)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"chunk {c}")
        assert int(j_valid[0]) == int(t_lens[0]) == S


# ---------------------------------------------------------------------------
# monotonic attention math
# ---------------------------------------------------------------------------

def _random_p_choose(B=3, T=5, S=11, seed=0):
    rng = np.random.RandomState(seed)
    p = 1.0 / (1.0 + np.exp(-rng.randn(B, T, S).astype(np.float32)))
    pad = np.zeros((B, S), bool)
    pad[1, 8:] = True   # right padding
    pad[2, 5:] = True
    return p, pad


def test_expected_alignment_matches_reference(ref):
    p, pad = _random_p_choose()
    want = ref.monotonic.expected_alignment_from_p_choose(
        torch.from_numpy(p), torch.from_numpy(pad)).numpy()
    got = np.asarray(ours.expected_alignment_from_p_choose(
        jnp.asarray(p), jnp.asarray(pad)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_mass_preservation_matches_reference(ref):
    p, pad = _random_p_choose(seed=3)
    alpha_t = ref.monotonic.expected_alignment_from_p_choose(
        torch.from_numpy(p), torch.from_numpy(pad))
    want = ref.monotonic.mass_preservation(
        alpha_t.clone(), torch.from_numpy(pad)).numpy()
    alpha_j = ours.expected_alignment_from_p_choose(jnp.asarray(p),
                                                    jnp.asarray(pad))
    got = np.asarray(ours.mass_preservation(alpha_j, jnp.asarray(pad)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("chunk_size", [None, 3])
def test_expected_soft_attention_matches_reference(ref, chunk_size):
    p, pad = _random_p_choose(seed=4)
    rng = np.random.RandomState(5)
    energy = rng.randn(*p.shape).astype(np.float32) * 3.0
    alpha_t = ref.monotonic.expected_alignment_from_p_choose(
        torch.from_numpy(p), torch.from_numpy(pad))
    alpha_t = ref.monotonic.mass_preservation(alpha_t, torch.from_numpy(pad))
    want = ref.monotonic.expected_soft_attention(
        alpha_t, torch.from_numpy(energy), padding_mask=torch.from_numpy(pad),
        chunk_size=chunk_size).numpy()
    alpha_j = ours.mass_preservation(
        ours.expected_alignment_from_p_choose(jnp.asarray(p), jnp.asarray(pad)),
        jnp.asarray(pad))
    got = np.asarray(ours.expected_soft_attention(
        alpha_j, jnp.asarray(energy), key_padding_mask=jnp.asarray(pad),
        chunk_size=chunk_size))
    # chunkwise: our moving_sum is a cumsum difference, the reference's is a
    # conv1d (functions.py:69-125) -- same math, different fp32 association
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize("online", [False, True])
def test_waitk_p_choose_matches_reference(ref, online):
    """Reference waitk_p_choose is only callable with an incremental_state
    dict and returns the last row (p_choose_strategy.py:35-51) -- exactly how
    inference drives it.  Rebuild the full (T, S) pattern row by row and
    compare against our offline/online matrices."""
    B, T, S, k = 3, 5, 9, 3
    pad = np.zeros((B, S), bool)
    pad[1, 6:] = True
    rows = []
    for t in range(1, T + 1):
        r = ref.p_choose.waitk_p_choose(
            tgt_len=t, src_len=S, bsz=B, waitk_lagging=k,
            key_padding_mask=torch.from_numpy(pad),
            incremental_state={"online": online}).float().numpy()
        rows.append(r[:, 0])
    want = np.stack(rows, axis=1)  # (B, T, S)
    got = np.asarray(ours.waitk_p_choose(
        T, S, B, k, key_padding_mask=jnp.asarray(pad), online=online))
    np.testing.assert_allclose(got, want)


# ---------------------------------------------------------------------------
# causal convolutions (subsampler, conv-pos, TBC)
# ---------------------------------------------------------------------------

def test_subsampler_matches_reference(ref):
    """CausalConv1dSubsampler (causal_conv.py:101-162) offline forward and
    incremental chunked forward vs our subsampler + ring-buffer step."""
    from simulst_tpu.compat.fairseq_converter import _conv
    from simulst_tpu.nn import conv as cnv

    torch.manual_seed(7)
    tmod = ref.causal_conv.CausalConv1dSubsampler(12, 32, 20, [3, 3]).eval()
    params = cnv.subsampler_init(jax.random.PRNGKey(0), 12, 32, 20, (3, 3))
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    for i in range(2):
        _set(params, ["layers", i, "weight"], _conv(sd[f"conv_layers.{i}.weight"]))
        _set(params, ["layers", i, "bias"], sd[f"conv_layers.{i}.bias"])

    B, T = 2, 24
    rng = np.random.RandomState(8)
    x = rng.randn(B, T, 12).astype(np.float32)
    lengths = np.array([T, 17], np.int32)

    with torch.no_grad():
        t_out, t_lens = tmod(torch.from_numpy(x), torch.from_numpy(lengths))
    t_out = t_out.permute(1, 0, 2).numpy()  # T B C -> B T C
    j_out, j_lens = cnv.subsampler_apply(params, jnp.asarray(x),
                                         jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())

    # incremental: reference re-feeds the growing prefix (causal_conv.py:144-148),
    # ours steps on new chunks with a fixed ring cache
    chunk = 8  # multiple of total stride 4
    inc_state = {}
    cache = cnv.subsampler_init_cache(params, batch=B)
    for c in range(T // chunk):
        hi = (c + 1) * chunk
        with torch.no_grad():
            t_c, _ = tmod(torch.from_numpy(x[:, :hi]),
                          torch.from_numpy(np.full((B,), hi, np.int64)),
                          incremental_state=inc_state)
        t_c = t_c.permute(1, 0, 2).numpy()
        j_c, cache = cnv.subsampler_step(params, cache,
                                         jnp.asarray(x[:, hi - chunk:hi]))
        np.testing.assert_allclose(np.asarray(j_c), t_c, atol=1e-5, rtol=1e-4,
                                   err_msg=f"chunk {c}")


def test_conv_pos_matches_reference(ref):
    """Weight-normed causal conv positional embedding.  Reference
    construction per s2t_transformer.py:114-153 (causal branch): CausalConv1d
    with kernel (conv_pos+1)//2, groups, weight_norm(dim=2), then GELU.
    Validates the converter's weight-norm g/v axis transposes."""
    from simulst_tpu.nn import conv as cnv

    torch.manual_seed(9)
    D, groups, conv_pos = 16, 4, 15
    k = (conv_pos + 1) // 2
    tconv = ref.causal_conv.CausalConv1d(D, D, kernel_size=k, groups=groups)
    tconv = torch.nn.utils.weight_norm(tconv, name="weight", dim=2).eval()

    params = cnv.conv_pos_init(jax.random.PRNGKey(0), D, conv_pos, groups)
    g = tconv.weight_g.detach().numpy()           # (1, 1, K)
    v = tconv.weight_v.detach().numpy()           # (Cout, Cin/g, K)
    _set(params, ["g"], np.transpose(g, (2, 1, 0)))
    _set(params, ["v"], np.transpose(v, (2, 1, 0)))
    _set(params, ["bias"], tconv.bias.detach().numpy())

    B, T = 2, 13
    rng = np.random.RandomState(10)
    x = rng.randn(B, T, D).astype(np.float32)
    with torch.no_grad():
        # reference ConvPosWrapper: conv (B,C,T) then GELU
        t_out = torch.nn.functional.gelu(
            tconv(torch.from_numpy(x).transpose(1, 2))).transpose(1, 2).numpy()
    j_out = cnv.conv_pos_apply(params, jnp.asarray(x), groups)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-4)


def test_causal_conv_tbc_matches_reference(ref):
    """CausalConvTBC (causal_conv.py:94-98, the CIF alpha predictor's conv,
    cif_transformer.py:124-130): fairseq TBC weight (K, Cin, Cout) maps to our
    layout unchanged."""
    from simulst_tpu.nn import conv as cnv

    torch.manual_seed(11)
    D, k = 10, 3
    tconv = ref.causal_conv.CausalConvTBC(D, D, k).eval()
    params = {"weight": jnp.asarray(tconv.weight.detach().numpy()),
              "bias": jnp.asarray(tconv.bias.detach().numpy())}

    B, T = 2, 9
    rng = np.random.RandomState(12)
    x = rng.randn(B, T, D).astype(np.float32)
    with torch.no_grad():
        t_out = tconv(torch.from_numpy(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()
    j_out = cnv.causal_conv1d(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5, rtol=1e-4)
