"""Shared neural-net building blocks.

Flax modules whose numerical semantics match the reference's torch layers
exactly (initializers, batch-norm statistics, activation variants), so that a
model trained here is distribution-equivalent to the reference and converted
reference checkpoints drop in.

Layout convention: sequences are (batch, length, channels) — channels last on
the TPU lane dimension. Convolutions lower to XLA ``conv_general_dilated``
(MXU-tiled); an optional Pallas path lives in ``melogan_tpu.ops``.
"""
from __future__ import annotations

import math
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from melogan_tpu.ops import conv as conv_ops

# Default MXU precision for parity-sensitive layers. 'highest' keeps f32
# accumulation semantics matching the reference (the models are small enough
# that v5e f32-via-bf16-passes is nowhere near the bottleneck); switch to
# 'default' for max-throughput bf16 experiments.
_PRECISION_TLS = threading.local()  # per-thread: concurrent traces (e.g. the
# pipeline's background precompile threads vs the AE train) must not see each
# other's set/reset — a shared global let one thread's finally-reset flip
# precision mid-trace in another, producing mixed-precision programs


def set_default_precision(precision) -> None:
    _PRECISION_TLS.value = precision


def default_precision():
    return getattr(_PRECISION_TLS, "value", jax.lax.Precision.HIGHEST)

# ---------------------------------------------------------------------------
# Initializers with torch-default semantics
# ---------------------------------------------------------------------------


def torch_kaiming_uniform(fan_in: int):
    """torch's default weight init: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int):
    """torch's default bias init: U(±1/√fan_in)."""
    return torch_kaiming_uniform(fan_in)


def normal_002(key, shape, dtype=jnp.float32):
    """GAN init N(0, 0.02) for conv/linear weights (reference weights_init)."""
    return jax.random.normal(key, shape, dtype) * 0.02


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def gelu_exact(x):
    """Exact (erf) GELU — torch ``nn.GELU()`` default, NOT the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu_02(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


# ---------------------------------------------------------------------------
# Linear / Dense with torch defaults
# ---------------------------------------------------------------------------


class TorchLinear(nn.Module):
    """Dense layer with torch-default initialization.

    ``gan_init=True`` switches to N(0, 0.02) weights + zero bias, the
    reference's ``weights_init`` applied to all GAN modules.
    """

    features: int
    use_bias: bool = True
    gan_init: bool = False

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if self.gan_init:
            kernel_init, bias_init = normal_002, zeros_init
        else:
            kernel_init = torch_kaiming_uniform(fan_in)
            bias_init = torch_bias_uniform(fan_in)
        kernel = self.param("kernel", kernel_init, (fan_in, self.features))
        y = jnp.dot(x, kernel, precision=default_precision(), preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias
        return y


class SpectralNormLinear(nn.Module):
    """Dense layer with spectral normalization (power iteration).

    The reference exposes optional spectral norm on the ED MLP and the
    feature encoder (ed_model.py:28-33, feature_encoder.py:22-29; disabled in
    the shipped configs). One power-iteration step per forward in train mode,
    matching torch's ``spectral_norm`` semantics; the left singular vector
    estimate lives in the ``spectral`` variable collection.
    """

    features: int
    eps: float = 1e-12
    gan_init: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        fan_in = x.shape[-1]
        if self.gan_init:
            # reference weights_init applies N(0, 0.02)/zero-bias to every
            # Linear in GAN modules, including spectral-normed ones
            kernel_init, bias_init = normal_002, zeros_init
        else:
            kernel_init = torch_kaiming_uniform(fan_in)
            bias_init = torch_bias_uniform(fan_in)
        kernel = self.param("kernel", kernel_init, (fan_in, self.features))
        bias = self.param("bias", bias_init, (self.features,))
        u_var = self.variable(
            "spectral",
            "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
        )
        u = u_var.value
        # one power-iteration step on W^T (features, fan_in)
        v = kernel @ u
        v = v / (jnp.linalg.norm(v) + self.eps)
        u_new = kernel.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + self.eps)
        sigma = v @ (kernel @ u_new)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        w = kernel / jnp.maximum(jax.lax.stop_gradient(sigma), self.eps)
        return jnp.dot(x, w, precision=default_precision(), preferred_element_type=jnp.float32) + bias


# ---------------------------------------------------------------------------
# Conv1d / ConvTranspose1d with torch-exact geometry
# ---------------------------------------------------------------------------


class Conv1d(nn.Module):
    """1-D convolution over (B, L, C) with torch Conv1d geometry.

    out_len = floor((L + 2·padding − kernel_size) / stride) + 1

    Dispatches through ``melogan_tpu.ops.conv`` — the Pallas TPU kernel when
    the global pallas mode enables it, XLA ``conv_general_dilated`` otherwise.
    ``pallas=False`` pins this layer to XLA (required where the conv must be
    twice-differentiable, e.g. the WGAN-GP critic).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    gan_init: bool = False
    pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size
        if self.gan_init:
            kernel_init, bias_init = normal_002, zeros_init
        else:
            kernel_init = torch_kaiming_uniform(fan_in)
            bias_init = torch_bias_uniform(fan_in)
        # kernel layout HIO: (width, in_ch, out_ch)
        kernel = self.param(
            "kernel", kernel_init, (self.kernel_size, in_ch, self.features)
        )
        y = conv_ops.conv1d(
            x,
            kernel,
            stride=self.stride,
            padding=self.padding,
            precision=default_precision(),
            pallas=self.pallas,
        )
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias
        return y


class ConvTranspose1d(nn.Module):
    """1-D transposed convolution with torch ConvTranspose1d geometry.

    out_len = (L−1)·stride − 2·padding + kernel_size + output_padding

    Implemented as an input-dilated correlation with the flipped kernel —
    XLA lowers this to the same MXU-tiled convolution as the forward op.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    gan_init: bool = False
    pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch fan_in for ConvTranspose default init is out_ch via weight
        # shape (in_ch, out_ch, k): kaiming_uniform uses fan_in = out_ch·k?
        # torch._calculate_fan_in_and_fan_out on (in_ch, out_ch, k) gives
        # fan_in = out_ch · k (dim-1 features · receptive field).
        fan_in = self.features * self.kernel_size
        if self.gan_init:
            kernel_init, bias_init = normal_002, zeros_init
        else:
            kernel_init = torch_kaiming_uniform(fan_in)
            bias_init = torch_bias_uniform(fan_in)
        # stored in HIO layout (width, in_ch, out_ch) like Conv1d
        kernel = self.param(
            "kernel", kernel_init, (self.kernel_size, in_ch, self.features)
        )
        y = conv_ops.conv_transpose1d(
            x,
            kernel,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            precision=default_precision(),
            pallas=self.pallas,
        )
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias
        return y


# ---------------------------------------------------------------------------
# BatchNorm with torch-exact statistics
# ---------------------------------------------------------------------------


class TorchBatchNorm(nn.Module):
    """BatchNorm over (B, L, C) (channel axis last) matching torch BatchNorm1d.

    torch semantics replicated exactly:
    - normalization uses the *biased* batch variance
    - running variance is updated with the *unbiased* batch variance
    - running = (1 − momentum)·running + momentum·batch, momentum = 0.1
    - eps = 1e-5, affine scale init 1, bias init 0

    ``use_running_average=True`` is eval mode. Running stats live in the
    ``batch_stats`` collection.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        n = 1
        for ax in reduce_axes:
            n *= x.shape[ax]

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32), (features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (features,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean(jnp.square(x - mean), axis=reduce_axes)  # biased
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class TorchLayerNorm(nn.Module):
    """LayerNorm over the last axis matching torch nn.LayerNorm (eps 1e-5)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32), (features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class Dropout(nn.Module):
    """Standard inverted dropout; deterministic (identity) in eval mode."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


def adaptive_avg_pool_1(x):
    """AdaptiveAvgPool1d(1) over (B, L, C): mean over the length axis."""
    return jnp.mean(x, axis=-2)


def trim_or_pad_length(x, target_len: int):
    """Trim or zero-pad the length axis of (B, L, C) to ``target_len``."""
    cur = x.shape[-2]
    if cur > target_len:
        return x[..., :target_len, :]
    if cur < target_len:
        pad = [(0, 0)] * x.ndim
        pad[-2] = (0, target_len - cur)
        return jnp.pad(x, pad)
    return x
