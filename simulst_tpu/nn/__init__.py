from simulst_tpu.nn import core, conv, attention, transformer, emformer  # noqa: F401
