from .darknet import load_darknet_weights
from .checkpoint import save_checkpoint, load_checkpoint, load_tf_keras_checkpoint

__all__ = [
    "load_darknet_weights",
    "save_checkpoint",
    "load_checkpoint",
    "load_tf_keras_checkpoint",
]
