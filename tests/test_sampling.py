"""End-to-end sampling pipeline: emotion prompt → jitted generator → .mid."""
import numpy as np

from melogan_tpu import EMOTIONS
from melogan_tpu.config import GANConfig
from melogan_tpu.midi.midifile import read_midi
from melogan_tpu.sampling import EMOTION_BPM, Sampler, emotion_scale


def small_sampler():
    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    return Sampler(cfg, seed=0)


def test_sample_notes_shapes_and_determinism():
    s = small_sampler()
    notes = s.sample_notes(["happy", "sad", "angry", "calm"], seed=7)
    assert notes.shape == (4, 64, 4)
    assert np.isfinite(notes).all()
    notes2 = s.sample_notes(["happy", "sad", "angry", "calm"], seed=7)
    np.testing.assert_array_equal(notes, notes2)
    notes3 = s.sample_notes(["happy", "sad", "angry", "calm"], seed=8)
    assert not np.array_equal(notes, notes3)


def test_corpus_calibrated_conditioning():
    """emotion_features: valid (4, 6) centroids change the samples (they
    really feed E_num), invalid shapes are rejected, and a hot-swap that
    changes them re-traces the step so the new conditioning takes effect."""
    import pytest

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    base = Sampler(cfg, seed=0)
    ef = np.arange(24, dtype=np.float32).reshape(4, 6) / 24.0
    cal = Sampler(cfg, seed=0, emotion_features=ef)
    np.testing.assert_array_equal(cal.emotion_features, ef)
    a = base.sample_notes(["happy", "sad"], seed=3)
    b = cal.sample_notes(["happy", "sad"], seed=3)
    assert not np.array_equal(a, b)

    with pytest.raises(ValueError, match="emotion_features"):
        Sampler(cfg, seed=0, emotion_features=np.zeros((3, 6), np.float32))

    # hot-swap with NEW centroids: subsequent samples use them
    base.swap_variables(cal.gen_variables, cal.fe_variables,
                        emotion_features=ef)
    c = base.sample_notes(["happy", "sad"], seed=3)
    np.testing.assert_array_equal(b, c)


def test_generate_midi_end_to_end(tmp_path):
    s = small_sampler()
    for emotion in EMOTIONS:
        out = tmp_path / f"test_{emotion}_1.mid"
        s.generate_midi(emotion, str(out), seed=3)
        song = read_midi(str(out))
        expected_bpm = max(60.0, min(EMOTION_BPM[emotion], 180.0))
        assert abs(song.initial_tempo - expected_bpm) < 0.01
        assert len(song.instruments) == 1


def test_emotion_scale_map():
    assert emotion_scale("happy") == "major"
    assert emotion_scale("calm") == "major"
    assert emotion_scale("sad") == "minor"
    assert emotion_scale("angry") == "minor"


def test_fast_math_sampler():
    """fast_math traces under default precision without leaking the global."""
    from melogan_tpu.config import GANConfig
    from melogan_tpu.models.layers import default_precision
    import jax

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    before = default_precision()
    s = Sampler(cfg, seed=0, fast_math=True)
    notes = s.sample_notes(["happy"], seed=1)
    assert notes.shape == (1, 64, 4)
    assert np.isfinite(notes).all()
    assert default_precision() == before == jax.lax.Precision.HIGHEST


def test_dp_sampling_matches_single_device(tmp_path):
    """A dp-sharded sample step computes the same values as single-device up
    to XLA's per-placement fusion/reduction order (the threefry RNG is
    counter-based per element and the eval-mode nets are row-independent;
    observed diff ≤3e-12 absolute), and is fully deterministic run-to-run on
    its mesh. This is the multi-chip serving-refill contract
    (`melogan serve --dp N`)."""
    from melogan_tpu.parallel.mesh import make_mesh

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    single = Sampler(cfg, seed=0)
    sharded = Sampler(cfg, seed=0, mesh=make_mesh(n_devices=8))

    emotions = ["happy", "sad", "angry", "calm"] * 4  # 16 rows = 8 devices × 2
    ref = single.sample_notes(emotions, seed=11)
    got = sharded.sample_notes(emotions, seed=11)
    np.testing.assert_allclose(ref, got, rtol=1e-3, atol=1e-9)

    # determinism on the sharded path: same mesh → same bytes, every run
    sharded.generate_many(emotions[:8], [str(tmp_path / f"a{i}.mid") for i in range(8)], seed=5)
    sharded.generate_many(emotions[:8], [str(tmp_path / f"b{i}.mid") for i in range(8)], seed=5)
    for i in range(8):
        assert (tmp_path / f"a{i}.mid").read_bytes() == (tmp_path / f"b{i}.mid").read_bytes()


def test_dp_sampling_non_divisible_batch_still_works():
    """Batches that don't divide the data axis run replicated (constrainer
    skips them) — correctness over sharding."""
    from melogan_tpu.parallel.mesh import make_mesh

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    single = Sampler(cfg, seed=0)
    sharded = Sampler(cfg, seed=0, mesh=make_mesh(n_devices=8))
    emotions = ["happy", "sad", "calm"]  # 3 rows over an 8-device axis
    np.testing.assert_array_equal(
        single.sample_notes(emotions, seed=2), sharded.sample_notes(emotions, seed=2)
    )


def test_hot_swap_on_dp_sharded_sampler(tmp_path):
    """Checkpoint hot-reload must work while serving with --dp N: the swapped
    numpy weight pytrees are ordinary jit args (auto-replicated over the
    mesh), so post-swap values match a single-device sampler built from the
    same weights — `melogan serve --dp N` + POST /reload contract."""
    import jax

    from melogan_tpu.parallel.mesh import make_mesh

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sharded = Sampler(cfg, seed=0, mesh=make_mesh(n_devices=8))
    donor = Sampler(cfg, seed=9)

    emotions = ["happy", "sad", "angry", "calm"] * 4
    before = sharded.sample_notes(emotions, seed=3)
    # what AppState.reload_checkpoint hands over: host numpy pytrees
    gen_np = jax.tree.map(np.asarray, donor.gen_variables)
    fe_np = jax.tree.map(np.asarray, donor.fe_variables)
    sharded.swap_variables(gen_np, fe_np)
    after = sharded.sample_notes(emotions, seed=3)
    want = donor.sample_notes(emotions, seed=3)
    assert not np.allclose(before, after)
    np.testing.assert_allclose(after, want, rtol=1e-3, atol=1e-9)
