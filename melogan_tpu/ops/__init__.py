"""Custom TPU ops: Pallas kernels for the framework's hot paths.

The models' conv stacks are the FLOP carriers (BASELINE north star: conv
fwd/bwd as Pallas kernels; CNN classifiers as single XLA programs). The
kernels here implement:

- ``pallas.conv1d``: strided 1-D convolution as an in-VMEM per-tap MXU
  matmul accumulation over parity streams
- ``pallas.conv_transpose1d``: parity-planar transposed convolution
  (no zero-stuffed dilation buffers)
- both with custom VJPs (cotangents via the XLA reference conv's own VJP —
  themselves MXU convolutions)

Every kernel is flag-gated (``set_use_pallas``) with an XLA fallback and
validated against the XLA path both in interpret-mode tests and on real TPU
hardware. XLA's own conv lowering is already MXU-tiled; the Pallas path
exists to control tiling/precision explicitly and as the substrate for
further fusion work.
"""

from melogan_tpu.ops.conv import (
    conv1d,
    conv_transpose1d,
    pallas_mode,
    set_use_pallas,
    use_pallas,
)

__all__ = ["conv1d", "conv_transpose1d", "pallas_mode", "use_pallas", "set_use_pallas"]
