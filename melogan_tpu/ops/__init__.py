"""Custom TPU ops: Pallas kernels for the framework's hot paths.

The models' conv stacks are the FLOP carriers (BASELINE north star: conv
fwd/bwd as Pallas kernels; CNN classifiers as single XLA programs). The
kernels here implement:

- ``pallas.conv1d``: strided 1-D convolution as an in-VMEM im2col + MXU
  matmul, with a custom VJP whose backward passes are Pallas kernels too
- ``pallas.fused_stack``: whole conv/deconv stacks (conv → bias → activation
  chains) executed in one kernel — intermediates never round-trip to HBM

Every kernel is flag-gated with an XLA fallback and validated against the
XLA path in tests. XLA's own conv lowering is already MXU-tiled; the wins
here come from fusion (single HBM round-trip per stack) and from controlling
accumulation precision explicitly.
"""

from melogan_tpu.ops.conv import conv1d, conv_transpose1d, use_pallas, set_use_pallas

__all__ = ["conv1d", "conv_transpose1d", "use_pallas", "set_use_pallas"]
