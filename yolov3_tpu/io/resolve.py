"""Checkpoint path resolution: native .npz or legacy Keras TF-format.

The reference configs point at TF-checkpoint prefixes like
``checkpoints/output/yolov3_train_tiny.tf`` (train_config.yaml:60). To keep
those configs working unchanged, loading tries, in order:
  1. the exact path / path + '.npz' as a native checkpoint;
  2. path + '.index' as a Keras save_weights TF-format checkpoint
     (requires tensorflow, gated import).
Saving always writes the native format (path + '.npz' unless the path
already ends in .npz).
"""

from __future__ import annotations

import os

from .checkpoint import load_checkpoint, load_tf_keras_checkpoint, save_checkpoint


def native_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_weights(spec, params, state, path: str, step=None):
    save_checkpoint(native_path(path), {"params": params, "bn_state": state}, step=step)


def load_weights(spec, params, state, path: str):
    """Load into existing (params, state); partial loads tolerated
    (expect_partial — reference inference.py:102). Returns (params, state)."""
    for candidate in (path, native_path(path)):
        if os.path.exists(candidate) and candidate.endswith(".npz"):
            tree, _ = load_checkpoint(candidate,
                                      like={"params": params, "bn_state": state},
                                      partial=True)
            return tree["params"], tree["bn_state"]
    if os.path.exists(path + ".index"):
        params, state, loaded = load_tf_keras_checkpoint(spec, params, state, path)
        if loaded == 0:
            raise ValueError(f"TF checkpoint {path} matched no variables")
        return params, state
    raise FileNotFoundError(f"no checkpoint found at {path}(.npz/.index)")
