"""simulst-tpu: a TPU-native framework for simultaneous speech translation.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
George0828Zhang/simulst reference (a fairseq/PyTorch plugin), re-designed
TPU-first: static-shape streaming state, jitted per-chunk steps, pjit data
parallelism over a device mesh.
"""

__version__ = "0.1.0"
