"""Config layer: must ingest both our configs/ and the reference YAMLs verbatim."""
import os

import pytest

from melogan_tpu.config import AEConfig, EDConfig, GANConfig, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ae_config_defaults():
    cfg = AEConfig.from_yaml(os.path.join(REPO, "configs/ae.yaml"))
    assert cfg.max_notes == 512
    assert cfg.latent_dim == 8
    assert cfg.batch_size == 32
    assert cfg.lr == 1e-4
    assert cfg.beta == 10.0
    assert cfg.kld_warmup_epochs == 1
    assert cfg.early_stop_patience == 15
    assert cfg.augment.tempo_jitter == 0.0


def test_gan_config_defaults():
    cfg = GANConfig.from_yaml(os.path.join(REPO, "configs/gan.yaml"))
    assert cfg.epochs == 50
    assert cfg.batch_size == 32
    assert cfg.integration_mode == "warm_start"
    assert cfg.noise_dim == 128
    assert cfg.latent_dim == 64
    assert cfg.max_notes == 512
    assert cfg.lr_g == 2e-4 and cfg.lr_d == 1e-4
    assert cfg.beta1 == 0.5 and cfg.beta2 == 0.9
    assert cfg.lambda_gp == 10.0 and cfg.critic_iters == 5
    assert cfg.lambda_emotion == 5.0
    assert cfg.numeric_input_dim == 6
    assert cfg.encoder_hidden == (256, 128)
    assert cfg.encoder_out_dim == 128


def test_ed_config_defaults():
    cfg = EDConfig.from_yaml(os.path.join(REPO, "configs/ed.yaml"))
    assert cfg.input_mode == "notes"
    assert cfg.n_classes == 4
    assert cfg.labels == ("happy", "sad", "angry", "calm")
    assert cfg.notes_blocks == 4 and cfg.notes_hidden == 256
    assert cfg.mlp_hidden == (256, 128)
    assert cfg.batch_size == 64 and cfg.num_epochs == 50
    assert cfg.optimizer.lr == 2e-4
    assert cfg.optimizer.betas == (0.5, 0.999)
    assert cfg.use_weighted_sampler is False


@pytest.mark.parametrize(
    "ref_yaml,loader",
    [
        ("config/ae_config.yaml", AEConfig.from_yaml),
        ("config/gan_config.yaml", GANConfig.from_yaml),
        ("config/ed_config.yaml", EDConfig.from_yaml),
    ],
)
def test_reference_yaml_ingestion(reference_dir, ref_yaml, loader):
    """The loader must read the reference's own YAML files byte-for-byte."""
    path = os.path.join(reference_dir, ref_yaml)
    cfg = loader(path)
    assert cfg is not None


def test_reference_and_local_configs_agree(reference_dir):
    """Our configs/ must reproduce the reference hyperparameters exactly."""
    ours = GANConfig.from_yaml(os.path.join(REPO, "configs/gan.yaml"))
    theirs = GANConfig.from_yaml(os.path.join(reference_dir, "config/gan_config.yaml"))
    assert ours == theirs

    ours_ae = AEConfig.from_yaml(os.path.join(REPO, "configs/ae.yaml"))
    theirs_ae = AEConfig.from_yaml(os.path.join(reference_dir, "config/ae_config.yaml"))
    assert ours_ae == theirs_ae

    ours_ed = EDConfig.from_yaml(os.path.join(REPO, "configs/ed.yaml"))
    theirs_ed = EDConfig.from_yaml(os.path.join(reference_dir, "config/ed_config.yaml"))
    assert ours_ed == theirs_ed


def test_configdict_case_insensitive():
    d = load_config(os.path.join(REPO, "configs/gan.yaml"))
    assert d.get("noise_dim") == 128
    assert d.get("NOISE_DIM") == 128
    assert d["batch_size"] == 32
    assert "lambda_gp" in d
