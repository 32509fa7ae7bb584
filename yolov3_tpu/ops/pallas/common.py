"""Shared int8 epilogue math for the Pallas kernels.

One definition of the requant contract (leaky slope 0.1, round-half-even,
clip to the symmetric int8 range [-127, 127]) so the kernels stay
bit-compatible with the unfused path (models/layers.py::requantize /
leaky_relu) — a change to either constant must land everywhere at once.
"""

from __future__ import annotations

import jax.numpy as jnp

LEAKY_SLOPE = 0.1


def leaky(y):
    """LeakyReLU(0.1) on f32 kernel values."""
    return jnp.where(y >= 0, y, y * jnp.float32(LEAKY_SLOPE))


def requant_clip(y, inv_scale):
    """f32 → symmetric int8 lattice (round-half-even, clip ±127), as f32.

    Callers cast to int8 where the value leaves the kernel; intermediate
    chain stages may keep the f32 representation for the next matmul.
    """
    return jnp.clip(jnp.round(y * inv_scale), -127, 127)
