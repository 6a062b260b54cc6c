"""Guards for the driver-critical bench.py helpers (the driver runs
bench.py at the end of every round; a broken FLOPs model or peak table
would corrupt the recorded MFU silently)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_train_matmul_flops_model():
    import bench
    from simulst_tpu.models.s2t_emformer import S2TEmformerConfig
    cfg = S2TEmformerConfig(vocab_size=4100, ctc_layer=True)
    f = bench._train_matmul_flops(cfg, 32, 1024, 64)
    # the 32x1024 production geometry is ~0.5 TFLOP forward; sanity-bound it
    assert 1e11 < f < 1e13, f
    # scales ~linearly in batch
    f2 = bench._train_matmul_flops(cfg, 64, 1024, 64)
    assert 1.8 < f2 / f < 2.2


def test_peak_flops_table_falls_back():
    import bench
    import jax
    peak = bench._peak_flops("bfloat16")
    assert 1e14 < peak < 1e15          # all listed chips are in this range
    assert bench._peak_flops("float32") == peak / 8
