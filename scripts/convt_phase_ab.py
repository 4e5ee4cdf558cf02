#!/usr/bin/env python3
"""A/B: transposed conv via lhs_dilation vs phase decomposition (sub-pixel).

A stride-2 ConvTranspose1d computes y[2j+r] from a fixed tap subset per
parity r, so it is exactly two stride-1 convs (3-tap even / 2-tap odd for
k=5) interleaved along L. If XLA's TPU conv emitter executes the
input-dilated formulation naively, half its MACs multiply interleaved
zeros; the phase form does only the logical work.

Usage: python scripts/convt_phase_ab.py [batch ...]
Prints per-shape device times for the generator's three convT stages,
both formulations, f32 and bf16-fastmath.
"""
import sys
import time

import jax
import jax.numpy as jnp

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)

from melogan_tpu.ops.conv import _xla_conv_transpose1d  # noqa: E402


def phase_conv_transpose1d(x, w, stride=2, padding=2, output_padding=1, precision=None):
    """Exact phase-decomposed stride-2 k-5 transposed conv, torch geometry.

    y[o] = sum_{t: o = 2i - p + t} x[i] w[t].  For p=2, op=1, k=5:
      even o=2j: taps t in {0,2,4} with i = j+1, j, j-1
      odd  o=2j+1: taps t in {1,3} with i = j+1, j
    Each parity is a stride-1 conv over x; outputs interleave to length 2L.
    """
    assert stride == 2 and padding == 2 and output_padding == 1 and w.shape[0] == 5
    # conv_general_dilated with NHC/HIO computes cross-correlation:
    #   y[j] = sum_s x[j - pad + s] w[s]
    # even: y_e[j] = x[j-1] w4 + x[j] w2 + x[j+1] w0  -> taps (w4, w2, w0), pad (1,1)
    # odd:  y_o[j] = x[j] w3 + x[j+1] w1              -> taps (w3, w1), pad (0,1)
    w_e = jnp.stack([w[4], w[2], w[0]], axis=0)
    w_o = jnp.stack([w[3], w[1]], axis=0)
    dn = ("NHC", "HIO", "NHC")
    y_e = jax.lax.conv_general_dilated(
        x, w_e, window_strides=(1,), padding=[(1, 1)], dimension_numbers=dn,
        precision=precision, preferred_element_type=jnp.float32)
    y_o = jax.lax.conv_general_dilated(
        x, w_o, window_strides=(1,), padding=[(0, 1)], dimension_numbers=dn,
        precision=precision, preferred_element_type=jnp.float32)
    b, l, c = y_e.shape
    return jnp.stack([y_e, y_o], axis=2).reshape(b, 2 * l, c)


def packed_conv_transpose1d(x, w, stride=2, padding=2, output_padding=1, precision=None):
    """Both parities from ONE stride-1 k=3 conv with 2*Cout channels.

    even: y_e[j] = x[j-1] w4 + x[j] w2 + x[j+1] w0
    odd:  y_o[j] = x[j-1]·0  + x[j] w3 + x[j+1] w1
    Kernel (3, Cin, 2, Cout): tap u, parity r.  Interleave via reshape.
    """
    assert stride == 2 and padding == 2 and output_padding == 1 and w.shape[0] == 5
    zero = jnp.zeros_like(w[0])
    k_e = jnp.stack([w[4], w[2], w[0]], axis=0)       # (3, Cin, Cout)
    k_o = jnp.stack([zero, w[3], w[1]], axis=0)
    kp = jnp.stack([k_e, k_o], axis=2)                # (3, Cin, 2, Cout)
    cin, cout = w.shape[1], w.shape[2]
    kp = kp.reshape(3, cin, 2 * cout)
    y = jax.lax.conv_general_dilated(
        x, kp, window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision, preferred_element_type=jnp.float32)
    b, l, _ = y.shape
    return y.reshape(b, 2 * l, cout)


def bench_one(fn, x, w, iters=30, warmup=3):
    jitted = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jitted(x, w))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(x, w)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    batches = [int(a) for a in sys.argv[1:]] or [2048, 65536]
    stages = [(64, 256, 128), (128, 128, 64), (256, 64, 4)]
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} chip={jax.devices()[0].device_kind}")
    for b in batches:
        for (l, cin, cout) in stages:
            kx, kw = jax.random.split(jax.random.fold_in(key, l + b))
            for dtype, prec in (("f32", jax.lax.Precision.HIGHEST), ("bf16", None)):
                x = jax.random.normal(kx, (b, l, cin), jnp.float32)
                w = jax.random.normal(kw, (5, cin, cout), jnp.float32) * 0.02
                if dtype == "bf16":
                    x = x.astype(jnp.bfloat16)
                    w = w.astype(jnp.bfloat16)
                base = lambda x, w: _xla_conv_transpose1d(x, w, 2, 2, 1, precision=prec)
                phase = lambda x, w: phase_conv_transpose1d(x, w, precision=prec)
                packed = lambda x, w: packed_conv_transpose1d(x, w, precision=prec)
                yb = jax.jit(base)(x, w)
                errs = []
                for f in (phase, packed):
                    yf = jax.jit(f)(x, w)
                    errs.append(float(jnp.max(jnp.abs(
                        yb.astype(jnp.float32) - yf.astype(jnp.float32)))))
                    del yf
                del yb
                tb = bench_one(base, x, w)
                tp = bench_one(phase, x, w)
                tk = bench_one(packed, x, w)
                print(f"b={b:6d} L={l:4d} {cin:4d}->{cout:4d} {dtype}: "
                      f"dilated {tb:7.3f} | phase {tp:7.3f} ({tb/tp:4.2f}x) | "
                      f"packed {tk:7.3f} ({tb/tk:4.2f}x) ms | "
                      f"maxerr {max(errs):.2e}")


if __name__ == "__main__":
    main()
