"""Emotion-conditioned sampling pipeline: emotion → features → generator → MIDI.

Reimplements the reference generation path (app.py:53-119 and the missing
src/gan/test_gan.py, reconstructed per SURVEY.md §2.3/§2.10) as a single jitted
XLA program over batched emotion prompts:

- hand-tuned 6-d feature vectors per emotion + N(0, 0.15²) jitter
- numeric FeatureEncoder (inference dropout 0) → 128-d embedding
- Generator(noise, zeros-latent, embedding) → (B, 512, 4) notes
- emotion → bpm {happy 140, sad 70, angry 160, calm 90} and scale
  (major for happy/calm, minor otherwise)
- vectorized MIDI codec at the file boundary

The jitted step is batched over samples; throughput scales with batch on one
chip and with data sharding across a mesh.
"""
from __future__ import annotations

import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from melogan_tpu import EMOTIONS
from melogan_tpu.config import GANConfig
from melogan_tpu.midi.codec import save_piano_roll_to_midi
from melogan_tpu.models.gan import FeatureEncoder, Generator

# Hand-tuned per-emotion numeric feature bases (reference app.py:55-61).
EMOTION_FEATURES: Dict[str, list] = {
    "happy": [1.0, 1.0, 0.8, 0.8, 0.5, 0.5],
    "sad": [-1.0, -1.0, -0.5, -0.5, -0.5, -0.5],
    "angry": [1.0, -1.0, 1.0, 1.0, -0.8, 0.8],
    "calm": [-1.0, 1.0, -0.8, -0.8, 0.5, -0.5],
}

# Serving bpm map (reference app.py:110) and scale selection (app.py:109).
# Single source of truth lives in melogan_tpu.constants (shared with the
# quality gate's band derivation); re-exported here for the serving path.
from melogan_tpu.constants import EMOTION_BPM  # noqa: E402,F401


def emotion_scale(emotion: str) -> str:
    return "major" if emotion in ("happy", "calm") else "minor"


FEATURE_JITTER_STD = 0.15


class Sampler:
    """Holds generator + feature-encoder params and a compiled sample step."""

    def __init__(
        self,
        cfg: Optional[GANConfig] = None,
        gen_variables=None,
        fe_variables=None,
        seed: int = 42,
        fast_math: bool = False,
        mesh=None,
        emotion_features=None,
    ):
        """``fast_math=True`` traces the sample step with default (bf16-pass)
        MXU precision — ~2× throughput at large batch; note bytes differ from
        the deterministic f32 default.

        ``mesh``: optional Mesh with a 'data' axis — the sample step then runs
        SPMD with the batch sharded over the mesh (serving refill / bulk
        generation scale linearly with chips). The threefry RNG is
        counter-based per element and the eval-mode networks are
        row-independent (BN uses stored stats), so values match the
        single-device step up to XLA's per-placement fusion/reduction order
        (observed ≤3e-12 absolute); a given mesh's step is fully
        deterministic run-to-run (tested:
        tests/test_sampling.py::test_dp_sampling_matches_single_device)."""
        self.cfg = cfg or GANConfig()
        self.fast_math = fast_math
        self.mesh = mesh
        from melogan_tpu.parallel.mesh import microbatch_constrainer

        self._shard_mb = microbatch_constrainer(mesh)
        self.generator = Generator.from_config(self.cfg)
        # serving uses dropout 0.0 in the feature encoder (app.py:41)
        self.feature_encoder = FeatureEncoder.from_config(self.cfg, dropout=0.0)

        key = jax.random.PRNGKey(seed)
        kf, kg = jax.random.split(key)
        dummy_feat = jnp.zeros((1, self.cfg.numeric_input_dim))
        if fe_variables is None:
            fe_variables = self.feature_encoder.init(kf, dummy_feat, train=False)
        if gen_variables is None:
            dummy_emb = jnp.zeros((1, self.cfg.encoder_out_dim))
            dummy_noise = jnp.zeros((1, self.cfg.noise_dim))
            dummy_latent = (
                jnp.zeros((1, self.cfg.latent_dim))
                if self.cfg.integration_mode == "conditioning"
                else None
            )
            gen_variables = self.generator.init(
                kg, dummy_noise, dummy_latent, dummy_emb, train=False
            )
        self.gen_variables = gen_variables
        self.fe_variables = fe_variables
        # guards paired reads/writes of (gen_variables, fe_variables): a
        # checkpoint hot-swap concurrent with sample_notes must never mix an
        # old generator with a new feature encoder
        self._var_lock = threading.Lock()
        # Conditioning base vectors. The reference app ships HAND-TUNED
        # per-emotion vectors (app.py:53-65) that were tuned for ITS model's
        # scaler; against a framework-trained E_num they are out-of-
        # distribution and scramble the emotion mapping at sample time
        # (measured round 5: judge-ED confusion swapped sad<->calm while the
        # training-time feature-matching residual was tiny — RESULTS.md).
        # Framework checkpoints therefore carry the TRAIN CORPUS's
        # per-emotion standardized-feature centroids ("emotion_features" in
        # gan_final.ckpt); pass them here to condition sampling exactly the
        # way E_num was trained. Fallback (None) keeps the reference map —
        # bug-for-bug parity and old-checkpoint compatibility.
        if emotion_features is not None:
            base = np.asarray(emotion_features, np.float32)
            if base.shape != (len(EMOTIONS), self.cfg.numeric_input_dim):
                raise ValueError(
                    f"emotion_features must be {(len(EMOTIONS), self.cfg.numeric_input_dim)}, "
                    f"got {base.shape}")
        else:
            base = np.stack([EMOTION_FEATURES[e] for e in EMOTIONS])
        self.emotion_features = None if emotion_features is None else base
        self._base_features = jnp.asarray(base, dtype=jnp.float32)
        self._step = self._build_step()

    def _build_step(self):
        """(Re)bind the jitted sample step against the CURRENT base-feature
        constants (called from __init__ and from swap_variables when a
        reload changes the conditioning centroids)."""
        jitted = jax.jit(self._sample_step, static_argnames=("batch",))
        if not self.fast_math:
            return jitted
        from melogan_tpu.models.layers import default_precision, set_default_precision

        def step_fast(gen_vars, fe_vars, rng, emotion_idx, batch):
            # precision is read at trace time; flip it around each trace
            prev = default_precision()
            set_default_precision(jax.lax.Precision.DEFAULT)
            try:
                return jitted(gen_vars, fe_vars, rng, emotion_idx, batch=batch)
            finally:
                set_default_precision(prev)

        return step_fast

    # ------------------------------------------------------------------
    def _sample_step(self, gen_vars, fe_vars, rng, emotion_idx, batch: int):
        """(rng, emotion_idx (B,)) → notes (B, 512, 4); fully on-device."""
        k_feat, k_noise = jax.random.split(rng)
        base = self._base_features[emotion_idx]
        features = base + FEATURE_JITTER_STD * jax.random.normal(k_feat, base.shape)
        # with a mesh: pin the batch over 'data' — GSPMD propagates the
        # sharding through the whole step (values unchanged; see __init__)
        features = self._shard_mb(features)
        emb = self.feature_encoder.apply(fe_vars, features, train=False)
        noise = self._shard_mb(jax.random.normal(k_noise, (batch, self.cfg.noise_dim)))
        latent = (
            jnp.zeros((batch, self.cfg.latent_dim))
            if self.cfg.integration_mode == "conditioning"
            else None
        )
        notes, _ = self.generator.apply(gen_vars, noise, latent, emb, train=False)
        return notes

    def sample_notes(self, emotions, seed: int = 0) -> np.ndarray:
        """Generate (B, max_notes, 4) note arrays for a list of emotion names."""
        unknown = [e for e in emotions if e not in EMOTIONS]
        if unknown:
            raise ValueError(
                f"unknown emotion(s) {unknown}; valid emotions are {list(EMOTIONS)}"
            )
        idx = jnp.asarray([EMOTIONS.index(e) for e in emotions], dtype=jnp.int32)
        rng = jax.random.PRNGKey(seed)
        with self._var_lock:  # pair the two reads (see swap_variables)
            gen_vars, fe_vars = self.gen_variables, self.fe_variables
        notes = self._step(gen_vars, fe_vars, rng, idx, batch=len(emotions))
        return np.asarray(notes)

    def swap_variables(self, gen_variables, fe_variables,
                       emotion_features=None) -> None:
        """Atomically replace the generator + feature-encoder weights.

        Checkpoint hot-reload for a running server: the weights are ordinary
        arguments of the jitted step (same shapes/dtypes → same compiled
        program), so a swap costs nothing — no re-trace, no recompile. The
        lock only pairs the two attribute writes with sample_notes' reads.

        ``emotion_features``: the new checkpoint's conditioning centroids.
        The base vectors are trace-time constants, so a CHANGE re-traces the
        step (one recompile) — only ever happens when a reload brings a
        checkpoint trained on a different corpus."""
        with self._var_lock:
            self.gen_variables = gen_variables
            self.fe_variables = fe_variables
            if emotion_features is not None:
                new = np.asarray(emotion_features, np.float32)
                if (self.emotion_features is None
                        or not np.array_equal(new, self.emotion_features)):
                    self.emotion_features = new
                    self._base_features = jnp.asarray(new, jnp.float32)
                    # the old jitted step traced the previous constants —
                    # bind a fresh one so the stale trace can't be reused
                    self._step = self._build_step()

    def generate_many(
        self,
        emotions,
        out_paths,
        seed: int = 0,
        bpms=None,
    ):
        """Bulk generation: ONE device batch for all prompts, then per-file
        byte encoding (native codec). Returns the written paths."""
        from melogan_tpu.midi.codec import render_to_bytes

        assert len(emotions) == len(out_paths)
        notes = self.sample_notes(list(emotions), seed=seed)
        written = []
        for i, (emotion, path) in enumerate(zip(emotions, out_paths)):
            bpm = bpms[i] if bpms is not None else EMOTION_BPM[emotion]
            data = render_to_bytes(notes[i], bpm=bpm, scale=emotion_scale(emotion))
            with open(path, "wb") as f:
                f.write(data)
            written.append(path)
        return written

    def generate_midi(
        self,
        emotion: str,
        output_path: str,
        seed: int = 0,
        bpm: Optional[float] = None,
        instrument_name: str = "Acoustic Grand Piano",
    ):
        """End-to-end: one emotion prompt → .mid on disk. Returns the song."""
        notes = self.sample_notes([emotion], seed=seed)[0]
        return save_piano_roll_to_midi(
            notes,
            output_path,
            bpm=bpm if bpm is not None else EMOTION_BPM[emotion],
            scale=emotion_scale(emotion),
            instrument_name=instrument_name,
            verbose=False,
        )
