import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu.train.optim import OptimConfig, inverse_sqrt_schedule
from simulst_tpu.train.state import create_train_state, make_train_step


def _toy():
    params = {"encoder": {"w": jnp.ones((4,))}, "decoder": {"w": jnp.ones((4,))}}

    def loss_fn(p, batch, rng):
        loss = ((p["encoder"]["w"] * batch["x"]).sum()
                + (p["decoder"]["w"] * batch["x"]).sum()) ** 2
        return loss, {"loss": loss, "sample_size": jnp.asarray(1)}
    return params, loss_fn


def test_encoder_freeze_until():
    params, loss_fn = _toy()
    ocfg = OptimConfig(lr=0.1, warmup_updates=2, clip_norm=0.0)
    step = make_train_step(loss_fn, ocfg, freeze_until={"encoder": 2})
    state = create_train_state(params, ocfg)
    batch = {"x": jnp.ones((4,))}
    rng = jax.random.PRNGKey(0)
    enc0 = np.asarray(state.params["encoder"]["w"])
    for i in range(3):
        enc_before = np.asarray(state.params["encoder"]["w"])
        dec_before = np.asarray(state.params["decoder"]["w"])
        state, m = step(state, batch, rng)
        if i < 2:
            np.testing.assert_array_equal(
                np.asarray(state.params["encoder"]["w"]), enc_before)
        else:
            assert not np.allclose(
                np.asarray(state.params["encoder"]["w"]), enc_before)
        assert not np.allclose(
            np.asarray(state.params["decoder"]["w"]), dec_before)


def test_update_freq_accumulation_matches_big_batch():
    params, loss_fn = _toy()
    ocfg = OptimConfig(lr=0.01, warmup_updates=100, clip_norm=0.0)
    rng = jax.random.PRNGKey(0)

    # microbatched: 2 microbatches stacked on axis 0
    step2 = make_train_step(loss_fn, ocfg, update_freq=2)
    s2 = create_train_state(params, ocfg)
    mb = {"x": jnp.stack([jnp.ones((4,)), 2 * jnp.ones((4,))])}
    s2, m2 = step2(s2, mb, rng)

    # equivalent single step whose grads/sample_size sum the two microbatches
    def big_loss(p, batch, rng):
        l1, m1 = loss_fn(p, {"x": batch["x"][0]}, rng)
        l2, mm = loss_fn(p, {"x": batch["x"][1]}, rng)
        return l1 + l2, {"loss": l1 + l2, "sample_size": jnp.asarray(2)}

    step1 = make_train_step(big_loss, ocfg)
    s1 = create_train_state(params, ocfg)
    s1, m1 = step1(s1, mb, rng)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_inverse_sqrt_schedule():
    cfg = OptimConfig(lr=1e-3, warmup_updates=100, warmup_init_lr=1e-7)
    sched = inverse_sqrt_schedule(cfg)
    assert float(sched(0)) < float(sched(50)) < float(sched(98))
    # after warmup: lr * sqrt(warmup/step)
    np.testing.assert_allclose(float(sched(399)), 1e-3 * (100 / 400) ** 0.5,
                               rtol=1e-5)


def test_trainer_update_freq_host_accumulation(tmp_path):
    """Trainer with update_freq=2 over differently-shaped batches equals a
    single step over their union."""
    from simulst_tpu.train.loop import LoopConfig, Trainer
    params, loss_fn = _toy()
    ocfg = OptimConfig(lr=0.01, warmup_updates=100, clip_norm=0.0)
    lcfg = LoopConfig(max_updates=1, log_interval=1000,
                      validate_interval_updates=10000,
                      save_dir=str(tmp_path / "a"))

    b1 = {"x": jnp.ones((4,))}
    b2 = {"x": 2 * jnp.ones((4,))}

    tr = Trainer(loss_fn, ocfg, lcfg, params, update_freq=2)
    tr.fit(lambda epoch: iter([dict(b1), dict(b2)]))

    def big_loss(p, batch, rng):
        l1, _ = loss_fn(p, b1, rng)
        l2, _ = loss_fn(p, b2, rng)
        return l1 + l2, {"loss": l1 + l2, "sample_size": jnp.asarray(2)}

    tr1 = Trainer(big_loss, ocfg,
                  LoopConfig(max_updates=1, log_interval=1000,
                             validate_interval_updates=10000,
                             save_dir=str(tmp_path / "b")), params)
    tr1.fit(lambda epoch: iter([dict(b1)]))
    for a, b in zip(jax.tree.leaves(tr.state.params),
                    jax.tree.leaves(tr1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_nonfinite_grads_skip_update():
    """A batch producing inf/nan gradients must leave params, optimizer
    moments and the step counter untouched (fairseq overflow semantics)."""
    from simulst_tpu.train.state import (OptimConfig, create_train_state,
                                         make_train_step)
    params = {"w": jnp.ones((4,))}

    def loss_fn(p, batch, rng):
        loss = (p["w"] * batch["x"]).sum()
        return loss, {"loss": loss, "sample_size": jnp.asarray(1)}

    step = jax.jit(make_train_step(loss_fn, OptimConfig(lr=0.1)))
    state = create_train_state(params, OptimConfig(lr=0.1))
    state1, m1 = step(state, {"x": jnp.ones((4,))}, jax.random.PRNGKey(0))
    assert int(state1.step) == 1 and float(m1["skipped"]) == 0.0
    w1 = np.asarray(state1.params["w"]).copy()   # donation deletes state1
    bad = {"x": jnp.array([1.0, jnp.inf, 1.0, 1.0])}
    state2, m2 = step(state1, bad, jax.random.PRNGKey(0))
    assert float(m2["skipped"]) == 1.0
    assert int(state2.step) == 1, "skipped step must not advance the counter"
    np.testing.assert_array_equal(np.asarray(state2.params["w"]), w1)
    state3, m3 = step(state2, {"x": jnp.ones((4,))}, jax.random.PRNGKey(0))
    assert int(state3.step) == 2 and float(m3["skipped"]) == 0.0


def test_flat_global_norm_matches_optax():
    """global_sumsq/global_norm/clip_by_global_norm_flat are drop-in
    equivalents of the optax forms (they exist purely to compile into fewer
    reduce kernels; see train/optim.py)."""
    import optax
    from simulst_tpu.train.optim import (clip_by_global_norm_flat,
                                         global_norm, global_sumsq)
    rng = np.random.RandomState(0)
    tree = {
        "big": jnp.asarray(rng.randn(300, 300).astype(np.float32)),
        "bf16": jnp.asarray(rng.randn(257, 513).astype(np.float32)).astype(jnp.bfloat16),
        "small": [jnp.asarray(rng.randn(7).astype(np.float32)),
                  jnp.asarray(rng.randn(1, 5).astype(np.float32))],
        "scalar": jnp.asarray(3.0),
    }
    # fp64 numpy reference (ours accumulates bf16 leaves in fp32, which is
    # MORE accurate than optax's in-dtype vdot — compare both to the truth)
    want = np.sqrt(sum(np.asarray(l, np.float64).ravel() @
                       np.asarray(l, np.float64).ravel()
                       for l in jax.tree_util.tree_leaves(tree)))
    np.testing.assert_allclose(np.asarray(global_norm(tree)), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(global_sumsq(tree)), want ** 2,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(optax.global_norm(tree)), want,
                               rtol=2e-2)  # sanity: same quantity
    for clip in (0.1, 5.0, 1e9):
        ours, _ = clip_by_global_norm_flat(clip).update(tree, optax.EmptyState())
        ref, _ = optax.clip_by_global_norm(clip).update(tree, optax.EmptyState())
        for a, b in zip(jax.tree_util.tree_leaves(ours),
                        jax.tree_util.tree_leaves(ref)):
            # rtol covers the bf16-leaf rounding (one ulp = 2^-8) on top
            # of the accumulation-precision scale difference
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), rtol=1e-2)


def test_from_dict_coerces_scalars_and_parses_bool_strings():
    """from_dict must coerce numpy scalars by field annotation and PARSE
    bool strings (bool("False") is True — a silent model-changing footgun
    for yaml/--override values)."""
    import pytest
    from simulst_tpu import config as cfglib
    from simulst_tpu.models.s2t_emformer import S2TEmformerConfig
    c = cfglib.from_dict(S2TEmformerConfig,
                         {"ctc_layer": "False", "remat": "true",
                          "conv_pos_groups": np.float64(16.0)})
    assert c.ctc_layer is False and c.remat is True
    assert type(c.conv_pos_groups) is int and c.conv_pos_groups == 16
    with pytest.raises(ValueError):
        cfglib.from_dict(S2TEmformerConfig, {"ctc_layer": "maybe"})
