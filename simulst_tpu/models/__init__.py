"""Model registry."""

_MODELS = {}


def register_model(name):
    def deco(cls):
        _MODELS[name] = cls
        return cls
    return deco


def get_model(name):
    import simulst_tpu.models.s2t_emformer  # noqa: F401
    import simulst_tpu.models.mma  # noqa: F401
    import simulst_tpu.models.cif  # noqa: F401
    import simulst_tpu.models.mt_transformer  # noqa: F401
    import simulst_tpu.models.transducer  # noqa: F401
    return _MODELS[name]


def available_models():
    for mod in ("s2t_emformer", "mma", "cif", "mt_transformer", "transducer"):
        __import__(f"simulst_tpu.models.{mod}")
    return sorted(_MODELS)
