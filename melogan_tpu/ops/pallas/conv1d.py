"""Pallas TPU kernels for strided 1-D convolution and transposed convolution.

Design (see /opt/skills/guides/pallas_guide.md):
- strided access never happens inside the kernel (Mosaic supports neither
  strided vector slices nor lane-folding reshapes): the input is pre-split
  into ``stride`` parity streams by XLA outside the kernel, and transposed
  convolutions emit parity-planar outputs that XLA interleaves afterwards
- inside the kernel everything is contiguous slices: an in-VMEM im2col
  (K static shifts concatenated on the channel axis) followed by ONE MXU
  matmul (BT·Lout, K·Cin) @ (K·Cin, Cout) with f32 accumulation
- grid over batch tiles; each program holds its input slab and the full
  weights in VMEM
- backward passes are registered via ``jax.custom_vjp``: dx is itself a
  transposed convolution and dw an input×cotangent contraction, both
  expressed as MXU convs (first-order training supported; the WGAN-GP
  critic keeps the twice-differentiable XLA path for its second-order
  gradient penalty)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # compiled Mosaic kernels need real TPU; elsewhere run interpreted
    return jax.default_backend() != "tpu"


def _pick_batch_tile(b: int, vmem_per_sample: int, max_tile: int = 64) -> int:
    """Largest power-of-two batch tile ≤ max_tile that divides b within a
    conservative VMEM budget (16 MB scoped limit; leave headroom for double
    buffering). Shared by the conv kernels (max 64) and the fused decoder
    (max 128)."""
    budget = 6 * 1024 * 1024
    bt = max_tile
    while bt > 1:
        if b % bt == 0 and bt * vmem_per_sample <= budget:
            return bt
        bt //= 2
    return 1


def _tiled(sublane: int, lane: int) -> int:
    """f32 element count of a (…, sublane, lane) buffer after Mosaic (8, 128)
    tile padding — narrow channel counts (e.g. the 4-channel note dim) pad to
    a full 128 lane, inflating VMEM 32×; budgeting with raw sizes OOMs."""
    return ((sublane + 7) // 8 * 8) * ((lane + 127) // 128 * 128)


def _conv_out_len(l: int, k: int, stride: int, padding: int) -> int:
    return (l + 2 * padding - k) // stride + 1


# ---------------------------------------------------------------------------
# Forward conv1d: parity-stream im2col + matmul
# ---------------------------------------------------------------------------


def _conv1d_kernel(x_ref, w_ref, o_ref, *, k, stride, lout):
    xs = x_ref[...]  # (S, BT, Ls, Cin) parity streams
    w = w_ref[...]  # (K, Cin, Cout)
    s, bt, ls, cin = xs.shape
    cout = w.shape[-1]
    # out[t] = Σ_k xp[s·t + k]·w[k]; tap k lives in stream r = k mod s at
    # offset q = k div s — all contiguous slices. Accumulate one MXU matmul
    # per tap (Mosaic cannot concat slices with mismatched sublane offsets).
    acc = jnp.zeros((bt, lout, cout), jnp.float32)
    for kk in range(k):
        r, q = kk % stride, kk // stride
        col = jax.lax.slice(xs, (r, 0, q, 0), (r + 1, bt, q + lout, cin))[0]
        acc = acc + jax.lax.dot_general(
            col, w[kk], (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = acc


def _pallas_conv1d_fwd_impl(x, w, stride: int, padding: int):
    b, l, cin = x.shape
    k, _, cout = w.shape
    lout = _conv_out_len(l, k, stride, padding)
    # pad so every parity stream covers q_max + lout rows
    q_max = (k - 1) // stride
    ls = lout + q_max
    need = stride * ls
    xp = jnp.pad(x, ((0, 0), (padding, max(0, need - l - padding)), (0, 0)))
    xp = xp[:, :need, :]
    # (B, S·Ls, Cin) → (S, B, Ls, Cin) parity streams (XLA-side reshuffle)
    streams = jnp.stack([xp[:, r::stride, :] for r in range(stride)], axis=0)

    # per-sample VMEM (tile-padded): parity streams + K live (Lout, Cout)
    # accumulator temporaries from the unrolled tap chain (on-stack) + col slices
    vmem = (
        stride * _tiled(ls, cin)
        + (k + 2) * _tiled(lout, cout)
        + k * _tiled(lout, cin)
    ) * 4
    bt = _pick_batch_tile(b, vmem)
    kernel = functools.partial(_conv1d_kernel, k=k, stride=stride, lout=lout)
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((stride, bt, ls, cin), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, lout, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lout, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lout * k * cin * cout,
            bytes_accessed=(b * l * cin + k * cin * cout + b * lout * cout) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(streams.astype(jnp.float32), w.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Forward transposed conv1d: parity-planar output + XLA interleave
# ---------------------------------------------------------------------------


def _convt_taps(k: int, stride: int, padding: int, r: int):
    """Output parity class r: (tap_j, x_offset) pairs with
    out[s·t + r] = Σ_j x[t + off_j] · w_flipped[j]."""
    padlo = k - 1 - padding
    return [
        (j, (r + j - padlo) // stride)
        for j in range(k)
        if (r + j - padlo) % stride == 0
    ]


def _convt_kernel(x_ref, w_ref, o_ref, *, k, stride, padding, lmax, off0):
    x = x_ref[...]  # (BT, Lp, Cin), already padded by |off0| up front
    wf = w_ref[...]  # (K, Cin, Cout), already flipped on k (Mosaic has no rev)
    bt, lp, cin = x.shape
    cout = wf.shape[-1]
    for r in range(stride):
        taps = _convt_taps(k, stride, padding, r)
        acc = jnp.zeros((bt, lmax, cout), jnp.float32)
        for (j, off) in taps:
            col = jax.lax.slice(x, (0, off - off0, 0), (bt, off - off0 + lmax, cin))
            acc = acc + jax.lax.dot_general(
                col, wf[j], (((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        o_ref[:, r] = acc


def _pallas_convt_fwd_impl(x, w, stride: int, padding: int, output_padding: int):
    b, l, cin = x.shape
    k, _, cout = w.shape
    lout = (l - 1) * stride - 2 * padding + k + output_padding
    lmax = (lout + stride - 1) // stride

    # global offset range across all parity classes
    all_taps = [t for r in range(stride) for t in _convt_taps(k, stride, padding, r)]
    off_min = min(off for _, off in all_taps)
    off_max = max(off for _, off in all_taps)
    # pad x so slices [off-off0, off-off0+lmax) are in range
    pad_lo = max(0, -off_min)
    pad_hi = max(0, off_max + lmax - l)
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    lp = xp.shape[1]

    vmem = (
        _tiled(lp, cin)
        + (k + 2) * stride * _tiled(lmax, cout)
        + k * _tiled(lmax, cin)
    ) * 4
    bt = _pick_batch_tile(b, vmem)
    kernel = functools.partial(
        _convt_kernel, k=k, stride=stride, padding=padding, lmax=lmax, off0=-pad_lo
    )
    planar = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, lp, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, stride, lmax, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, stride, lmax, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * k * cin * cout,
            bytes_accessed=(b * l * cin + k * cin * cout + b * lout * cout) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xp.astype(jnp.float32), jnp.flip(w, axis=0).astype(jnp.float32))
    # XLA-side interleave: (B, S, Lmax, C) → (B, Lmax, S, C) → (B, S·Lmax, C)
    out = jnp.transpose(planar, (0, 2, 1, 3)).reshape(b, stride * lmax, cout)
    return out[:, :lout, :]


# ---------------------------------------------------------------------------
# custom_vjp wiring (backwards as XLA convs — still MXU work)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_conv1d(x, w, stride: int = 1, padding: int = 0):
    return _pallas_conv1d_fwd_impl(x, w, stride, padding)


def _conv1d_fwd(x, w, stride, padding):
    return _pallas_conv1d_fwd_impl(x, w, stride, padding), (x, w)


def _conv1d_bwd(stride, padding, res, g):
    """Cotangents via the XLA reference conv's own VJP — guaranteed to match
    the forward semantics; the conv grads are themselves MXU convolutions."""
    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: jax.lax.conv_general_dilated(
            x_, w_, window_strides=(stride,), padding=[(padding, padding)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        ),
        x, w,
    )
    return vjp(g)


pallas_conv1d.defvjp(_conv1d_fwd, _conv1d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_conv_transpose1d(x, w, stride: int = 2, padding: int = 0, output_padding: int = 0):
    return _pallas_convt_fwd_impl(x, w, stride, padding, output_padding)


def _convt_fwd(x, w, stride, padding, output_padding):
    return _pallas_convt_fwd_impl(x, w, stride, padding, output_padding), (x, w)


def _convt_bwd(stride, padding, output_padding, res, g):
    x, w = res
    k = w.shape[0]
    _, vjp = jax.vjp(
        lambda x_, w_: jax.lax.conv_general_dilated(
            x_, jnp.flip(w_, axis=0), window_strides=(1,),
            padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
            lhs_dilation=(stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        ),
        x, w,
    )
    return vjp(g)


pallas_conv_transpose1d.defvjp(_convt_fwd, _convt_bwd)
