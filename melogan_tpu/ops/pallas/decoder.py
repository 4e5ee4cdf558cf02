"""Fused generator-decoder tail: three transposed convolutions in ONE kernel.

The sampling hot path (reference src/gan/models.py:103-130 as rebuilt in
models/gan.py GeneratorDecoder) upsamples (B, 64, 256) → (B, 512, 4) through
three stride-2 k5 transposed convs with BN+ReLU between. Run separately, each
stage round-trips its activations through HBM (~0.5 GB per direction at batch
8192). This kernel keeps the whole chain in VMEM.

The trick that makes chaining possible under Mosaic (no strided slices, no
lane-folding reshapes): **parity-planar streams**. A stride-2 transposed conv
doubles the logical length; instead of interleaving, each stage doubles the
number of parity PLANES while the per-plane length M stays constant:

    logical x[S·m + s] = plane[s][m],   S: 1 → 2 → 4 → 8,  M = 64 throughout

For output plane c = 2s + r of a stage with S input planes:

    out[c][m] = Σ_j  in[(s + off_j(r)) mod S][m + ⌊(s + off_j(r)) / S⌋] · Wf[j]

with off_j(r) = (r + j − (k−1−p)) // stride over the taps j where that
division is exact. Every tap is a CONTIGUOUS m-slice of one plane (the m-shift
is in {−1, 0, 1} for k5/s2/p2), so each is one MXU matmul. Planes carry one
zero margin rows on each side (MARGIN=8 — Mosaic sublane concatenation wants
tile-aligned operands); out-of-signal taps read zeros, exactly matching
transposed-conv boundary semantics. The final (B, 8, M, C) planar tensor is
interleaved once by XLA.

Eval-mode BatchNorm folds into the weights/biases ahead of the kernel
(γ/σ scale per output channel), so the fused chain is inference-exact.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from melogan_tpu.ops.pallas.conv1d import _interpret, _pick_batch_tile, _tiled

K = 5
STRIDE = 2
PADDING = 2
_PADLO = K - 1 - PADDING  # 2


def _taps(r: int) -> List[Tuple[int, int]]:
    """(tap_j, logical_offset) pairs for output parity class r."""
    return [
        (j, (r + j - _PADLO) // STRIDE)
        for j in range(K)
        if (r + j - _PADLO) % STRIDE == 0
    ]


# margin rows on each side of every plane's length axis. Only 1 row is
# semantically needed (tap shifts are in {−1, 0, 1}), but Mosaic concatenate
# along the sublane dim wants tile-aligned (multiple-of-8) operands —
# dynamic_update_slice is not lowerable at all on TC.
MARGIN = 8


def _pad_margin(x):
    """Zero margin rows on the length (second-minor) axis via tile-aligned
    concatenation (Mosaic-safe)."""
    bt, m, c = x.shape
    z = jnp.zeros((bt, MARGIN, c), x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def _decoder_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref, *, m):
    """x: (BT, M+2·MARGIN, C0) zero-margined input; w_i pre-flipped
    (K, Cin, Cout); o: (BT, 8, M, C3) parity planes of the logical
    (BT, 8·M, C3) output."""
    planes = [x_ref[...]]  # margined planes (BT, M+2·MARGIN, Cin)
    stages = (
        (w1_ref[...], b1_ref[...], True),
        (w2_ref[...], b2_ref[...], True),
        (w3_ref[...], b3_ref[...], False),
    )
    for stage_i, (w, b, relu) in enumerate(stages):
        last = stage_i == len(stages) - 1
        s_in = len(planes)
        bt = planes[0].shape[0]
        cout = w.shape[-1]
        new_planes = []
        for c in range(2 * s_in):
            s, r = c // 2, c % 2
            acc = jnp.zeros((bt, m, cout), jnp.float32)
            for j, off in _taps(r):
                u = s + off
                p_idx, delta = u % s_in, u // s_in
                # margined read: logical row (m' + delta) = index m' + delta + MARGIN
                col = jax.lax.slice(
                    planes[p_idx],
                    (0, MARGIN + delta, 0),
                    (bt, MARGIN + delta + m, planes[p_idx].shape[-1]),
                )
                acc = acc + jax.lax.dot_general(
                    col, w[j], (((2,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            acc = acc + b
            if relu:
                acc = jnp.maximum(acc, 0.0)
            if last:  # no downstream taps — write straight out, no margins
                o_ref[:, c] = acc
            else:
                new_planes.append(_pad_margin(acc))
        planes = new_planes


def fused_decoder_tail(x, stages: Sequence[Tuple[jnp.ndarray, jnp.ndarray]]):
    """(B, M, C0) → (B, 8·M, C3) through three fused k5/s2/p2/op1 transposed
    convs. ``stages``: three (weight (K, Cin, Cout) HIO as stored by
    ConvTranspose1d, bias (Cout,)) pairs with any BN affine already folded.
    """
    assert len(stages) == 3
    b, m, c0 = x.shape
    (w1, b1), (w2, b2), (w3, b3) = stages
    assert w1.shape[0] == K and w1.shape[1] == c0
    c1, c2, c3 = w1.shape[2], w2.shape[2], w3.shape[2]

    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (MARGIN, MARGIN), (0, 0)))

    # per-sample VMEM (Mosaic tile-padded sizes — narrow channel counts pad
    # to full 128 lanes): margined planes of two live stages + accumulators
    # live peak = max over stage transitions (earlier planes are dead)
    mm = m + 2 * MARGIN
    accs = 3 * _tiled(m, max(c1, c2, c3))
    vmem = 4 * max(
        _tiled(mm, c0) + 2 * _tiled(mm, c1) + accs,
        2 * _tiled(mm, c1) + 4 * _tiled(mm, c2) + accs,
        4 * _tiled(mm, c2) + 8 * _tiled(m, c3) + accs,
    )
    bt = _pick_batch_tile(b, vmem, max_tile=128)
    kernel = functools.partial(_decoder_kernel, m=m)

    flip = lambda w: jnp.flip(w, axis=0).astype(jnp.float32)
    planar = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, m + 2 * MARGIN, c0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, c0, c1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c1,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, c1, c2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, c2, c3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c3,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 8, m, c3), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, m, c3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * K * (c0 * c1 * 2 + c1 * c2 * 4 + c2 * c3 * 8) // STRIDE,
            bytes_accessed=(b * m * c0 + b * 8 * m * c3) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        xp,
        flip(w1), b1.astype(jnp.float32),
        flip(w2), b2.astype(jnp.float32),
        flip(w3), b3.astype(jnp.float32),
    )
    # ONE XLA interleave: (B, 8, M, C) → (B, M, 8, C) → (B, 8·M, C)
    return jnp.transpose(planar, (0, 2, 1, 3)).reshape(b, 8 * m, c3)


def fold_bn_affine(w, b, bn_mean, bn_var, bn_scale, bn_bias, eps: float = 1e-5):
    """Fold a torch-semantics eval BatchNorm into (w, b) of the preceding
    transposed conv: y = ((conv + b) − µ)·γ/√(σ²+ε) + β."""
    g = bn_scale * jax.lax.rsqrt(bn_var + eps)
    return w * g, (b - bn_mean) * g + bn_bias
