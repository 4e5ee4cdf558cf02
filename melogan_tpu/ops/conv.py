"""Conv front-end: Pallas fast path with XLA fallback.

``conv1d`` / ``conv_transpose1d`` take (B, L, C) inputs and HIO kernels and
dispatch to the Pallas implementation when enabled (and when shapes are
TPU-friendly), else to ``lax.conv_general_dilated``. The two paths are
numerically validated against each other in tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_USE_PALLAS = False


def set_use_pallas(enabled: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = bool(enabled)


def use_pallas() -> bool:
    return _USE_PALLAS


def _xla_conv1d(x, w, stride: int, padding: int, precision=None):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def _xla_conv_transpose1d(x, w, stride: int, padding: int, output_padding: int, precision=None):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=0),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def conv1d(x, w, stride: int = 1, padding: int = 0, precision=None):
    """(B, L, Cin) ⊛ (K, Cin, Cout) → (B, Lout, Cout), torch geometry."""
    if _USE_PALLAS and jax.default_backend() == "tpu":
        from melogan_tpu.ops.pallas.conv1d import pallas_conv1d

        return pallas_conv1d(x, w, stride=stride, padding=padding)
    return _xla_conv1d(x, w, stride, padding, precision)


def conv_transpose1d(x, w, stride: int = 2, padding: int = 0, output_padding: int = 0, precision=None):
    """(B, L, Cin) transposed-conv (K, Cin, Cout) → torch ConvTranspose1d geometry."""
    if _USE_PALLAS and jax.default_backend() == "tpu":
        from melogan_tpu.ops.pallas.conv1d import pallas_conv_transpose1d

        return pallas_conv_transpose1d(
            x, w, stride=stride, padding=padding, output_padding=output_padding
        )
    return _xla_conv_transpose1d(x, w, stride, padding, output_padding, precision)
