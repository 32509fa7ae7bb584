from .spec import LayerSpec, SubModelSpec, ModelSpec, parse_model_config
from .network import init_model, apply_model, l2_regularization, fold_batch_norm

__all__ = [
    "LayerSpec",
    "SubModelSpec",
    "ModelSpec",
    "parse_model_config",
    "init_model",
    "apply_model",
    "l2_regularization",
    "fold_batch_norm",
]
