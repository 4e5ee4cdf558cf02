"""Analytic FLOP accounting + chip-peak lookup for MFU reporting.

``bench.py`` converts measured throughput into TFLOP/s and percent-of-peak
(MFU) so "is it actually fast" is a roofline statement, not a CPU multiple.

Conventions (standard MFU accounting):
- 1 MAC = 2 FLOPs; only matmul/conv FLOPs are counted (elementwise, BN,
  activations, pooling are bandwidth-bound and excluded — this makes the
  analytic number a slight *under*-count, i.e. conservative MFU).
- Conv1d (stride s):        FLOPs = 2 · L_out · C_in · C_out · k
- ConvTranspose1d (stride s): FLOPs = 2 · L_in · C_in · C_out · k
  (input-centric: every input element feeds k taps; equals the output-
  centric sum because only ~k/s taps land on each output position)
- Linear:                   FLOPs = 2 · d_in · d_out

The analytic totals are cross-checked against XLA's own cost analysis in
``tests/test_flops.py`` (the compiled-program count must sit within a small
band above the matmul-only analytic count).

Chip peaks are the published per-chip bf16 matmul numbers (the "How to
Scale Your Model" roofline tables). f32 matmuls on TPU run through the same
MXU via multi-pass emulation, so f32 throughput is also reported as a
fraction of the bf16 peak — unambiguous and conservative.
"""
from __future__ import annotations

from typing import Dict, Optional

from melogan_tpu.config import GANConfig


def _linear(d_in: int, d_out: int) -> int:
    return 2 * d_in * d_out


def _conv1d(l_out: int, c_in: int, c_out: int, k: int) -> int:
    return 2 * l_out * c_in * c_out * k


def _convt1d(l_in: int, c_in: int, c_out: int, k: int) -> int:
    return 2 * l_in * c_in * c_out * k


def feature_encoder_flops(cfg: GANConfig) -> int:
    """LayerNorm(6) → Linear chain (models/gan.py:234-252)."""
    total = 0
    d = cfg.numeric_input_dim
    for h in cfg.encoder_hidden:
        total += _linear(d, h)
        d = h
    total += _linear(d, cfg.encoder_out_dim)
    return total


def generator_flops(cfg: GANConfig) -> int:
    """NoiseToLatent MLP + decoder pre-net + 3 stride-2 transposed convs
    (models/gan.py:43-128; reference src/gan/models.py:20-130)."""
    in_dim = cfg.noise_dim + (cfg.encoder_out_dim if cfg.use_numeric_encoder else 0)
    if cfg.integration_mode == "conditioning":
        in_dim += cfg.latent_dim
    total = _linear(in_dim, cfg.gen_hidden) + _linear(cfg.gen_hidden, cfg.latent_dim)
    reduced = max(1, cfg.max_notes // 8)
    total += _linear(cfg.latent_dim, 512) + _linear(512, 256 * reduced)
    # convT stages: (L_in, C_in, C_out): (r,256,128) → (2r,128,64) → (4r,64,note_dim)
    total += _convt1d(reduced, 256, 128, 5)
    total += _convt1d(2 * reduced, 128, 64, 5)
    total += _convt1d(4 * reduced, 64, cfg.note_dim, 5)
    return total


def critic_flops(cfg: GANConfig) -> int:
    """3 stride-2 convs + emb/score heads (models/gan.py:187-225)."""
    l = cfg.max_notes
    total = 0
    c_in = cfg.note_dim
    for c_out in (64, 128, 256):
        l = (l + 1) // 2  # stride-2, 'same'-style padding
        total += _conv1d(l, c_in, c_out, 5)
        c_in = c_out
    emb = 256
    total += _linear(256, emb)
    cond = cfg.encoder_out_dim if cfg.use_numeric_encoder else 0
    total += _linear(emb + cond, 1)
    return total


def sampling_flops_per_sample(cfg: GANConfig) -> int:
    """The serving/sampling pipeline: feature encoder + generator forward."""
    return feature_encoder_flops(cfg) + generator_flops(cfg)


def ed_flops(ed_cfg) -> int:
    """Emotion-discriminator forward, notes mode (models/ed.py:55-68):
    stride-1 conv blocks k5 then k3, channels 4→64→…→notes_hidden, pooled
    linear + MLP head."""
    l = ed_cfg.max_notes
    total = 0
    c_in, ch = ed_cfg.note_dim, 64
    for i in range(ed_cfg.notes_blocks):
        k = 5 if i == 0 else 3
        total += _conv1d(l, c_in, ch, k)
        c_in, ch = ch, min(ch * 2, ed_cfg.notes_hidden)
    total += _linear(c_in, ed_cfg.notes_hidden)
    d = ed_cfg.notes_hidden
    for h in ed_cfg.mlp_hidden:
        total += _linear(d, h)
        d = h
    total += _linear(d, ed_cfg.n_classes)
    return total


def train_flops_per_step(cfg: GANConfig, ed_cfg) -> int:
    """Analytic FLOPs per reference batch-step of the WGAN-GP loop
    (train/gan_step.py; reference src/gan/train_gan.py:183-251).

    A batch-step = one critic update on batch B; every ``critic_iters``-th
    step additionally runs the G+FE update, amortized in here. Standard
    reverse-mode accounting: forward+backward = 3× forward (1 fwd + data-grad
    + weight-grad); the gradient penalty's inner graph is fwd + data-grad
    (2×) and differentiating it w.r.t. critic params costs ~2× that graph
    again ⇒ GP ≈ 6× critic forward. These factors are the conventional
    estimate (exact transcendental/elementwise costs excluded), so treat the
    resulting MFU as accurate to ~±15%, not to the digit.

    NOTE: XLA's ``cost_analysis`` cannot be used for this program — it counts
    ``lax.scan`` bodies ONCE, not × trip count, undercounting the fused
    multi-epoch program ~100×.
    """
    b = cfg.batch_size
    f_c = critic_flops(cfg)
    f_g = generator_flops(cfg)
    f_f = feature_encoder_flops(cfg)
    f_e = ed_flops(ed_cfg)
    # critic update: G fwd (no grad) + FE fwd (no grad) + d_real (3×) +
    # d_fake (3×) + gradient penalty (≈6×)
    critic_step = b * (f_g + f_f + 12 * f_c)
    # generator update: fwd+bwd through FE, G, critic score, frozen ED
    gen_step = 3 * b * (f_g + f_f + f_c + f_e)
    return int(critic_step + gen_step / max(1, cfg.critic_iters))


def program_flops(compiled) -> Optional[float]:
    """FLOPs of a compiled XLA program via its own cost analysis (exact for
    arbitrary graphs, e.g. the double-backward WGAN-GP step). ``compiled``
    is the result of ``jitted.lower(*args).compile()``. Returns None when
    the backend doesn't expose a usable count."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", -1.0))
        return f if f > 0 else None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        return None


# Published per-chip dense bf16 matmul peaks, TFLOP/s (scaling-book tables).
_CHIP_PEAKS_BF16 = (
    ("v6", 918.0),  # v6e (Trillium)
    ("v5p", 459.0),
    ("v5 lite", 197.0),
    ("v5e", 197.0),
    ("v5litepod", 197.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def chip_peak_bf16_tflops(device_kind: str) -> Optional[float]:
    """Per-chip bf16 peak for a jax ``device_kind`` string, if recognized."""
    kind = device_kind.lower()
    for tag, peak in _CHIP_PEAKS_BF16:
        if tag in kind:
            return peak
    return None
