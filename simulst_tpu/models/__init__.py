"""Model registry."""

_MODELS = {}


def register_model(name):
    def deco(cls):
        _MODELS[name] = cls
        return cls
    return deco


_ALL = ("s2t_emformer", "mma", "cif", "mt_transformer", "transducer",
        "s2t_convpos")


def get_model(name):
    for mod in _ALL:
        __import__(f"simulst_tpu.models.{mod}")
    return _MODELS[name]


def available_models():
    for mod in _ALL:
        __import__(f"simulst_tpu.models.{mod}")
    return sorted(_MODELS)
