"""torch state_dict conversion: synthesize reference-layout state dicts from
our param trees (inverse mapping), convert, and require exact round-trip plus
a working forward pass."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from melogan_tpu.config import AEConfig, EDConfig, GANConfig
from melogan_tpu.models.ed import EmotionDiscriminator
from melogan_tpu.models.gan import Critic, FeatureEncoder, Generator
from melogan_tpu.models.vae import VAE
from melogan_tpu.utils import torch_interop as ti


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    lb = {jax.tree_util.keystr(k): v for k, v in lb.items()}
    assert len(la) == len(lb)
    for k, v in la:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(lb[key]), atol=0, err_msg=key)


def _inv_linear(p, prefix, sd):
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_conv(p, prefix, sd):
    sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (2, 1, 0))
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_convt(p, prefix, sd):
    sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (1, 2, 0))
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_bn(p, s, prefix, sd):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])
    sd[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    sd[f"{prefix}.running_var"] = np.asarray(s["var"])


def test_vae_conversion_roundtrip():
    cfg = AEConfig(max_notes=64)
    model = VAE.from_config(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 4)),
        train=False,
    )
    p, st = variables["params"], variables["batch_stats"]

    sd = {}
    for i, t in enumerate((0, 3, 6)):
        _inv_conv(p["encoder"][f"Conv1d_{i}"], f"encoder.conv.{t}", sd)
    for i, t in enumerate((1, 4, 7)):
        _inv_bn(p["encoder"][f"TorchBatchNorm_{i}"], st["encoder"][f"TorchBatchNorm_{i}"], f"encoder.conv.{t}", sd)
    _inv_linear(p["encoder"]["TorchLinear_0"], "encoder._linear.1", sd)
    _inv_linear(p["fc_mu"], "fc_mu", sd)
    _inv_linear(p["fc_log_var"], "fc_log_var", sd)
    _inv_linear(p["decoder"]["TorchLinear_0"], "decoder.pre.0", sd)
    _inv_linear(p["decoder"]["TorchLinear_1"], "decoder.pre.2", sd)
    for i, t in enumerate((0, 3, 6)):
        _inv_convt(p["decoder"][f"ConvTranspose1d_{i}"], f"decoder.deconv.{t}", sd)
    for i, t in enumerate((1, 4)):
        _inv_bn(p["decoder"][f"TorchBatchNorm_{i}"], st["decoder"][f"TorchBatchNorm_{i}"], f"decoder.deconv.{t}", sd)

    converted = ti.convert_vae(sd)
    tree_equal(converted["params"], p)
    tree_equal(converted["batch_stats"], st)

    # converted tree drives a real forward
    recon, z, mu, lv = model.apply(converted, jnp.ones((2, 64, 4)), train=False)
    assert recon.shape == (2, 64, 4)


def test_gan_final_conversion_roundtrip():
    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    gen = Generator.from_config(cfg)
    fe = FeatureEncoder.from_config(cfg)
    gv = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16)), None, jnp.zeros((1, 128)), train=False
    )
    fv = fe.init(jax.random.PRNGKey(1), jnp.zeros((1, 6)), train=False)

    sd_g = {}
    p, st = gv["params"], gv["batch_stats"]
    _inv_linear(p["noise_to_latent"]["TorchLinear_0"], "noise_to_latent.net.0", sd_g)
    _inv_linear(p["noise_to_latent"]["TorchLinear_1"], "noise_to_latent.net.2", sd_g)
    _inv_linear(p["decoder"]["TorchLinear_0"], "decoder.pre.0", sd_g)
    _inv_linear(p["decoder"]["TorchLinear_1"], "decoder.pre.2", sd_g)
    for i, t in enumerate((0, 3, 6)):
        _inv_convt(p["decoder"][f"ConvTranspose1d_{i}"], f"decoder.deconv.{t}", sd_g)
    for i, t in enumerate((1, 4)):
        _inv_bn(p["decoder"][f"TorchBatchNorm_{i}"], st["decoder"][f"TorchBatchNorm_{i}"], f"decoder.deconv.{t}", sd_g)

    sd_f = {}
    pf = fv["params"]
    sd_f["net.0.weight"] = np.asarray(pf["TorchLayerNorm_0"]["scale"])
    sd_f["net.0.bias"] = np.asarray(pf["TorchLayerNorm_0"]["bias"])
    _inv_linear(pf["TorchLinear_0"], "net.1", sd_f)
    _inv_linear(pf["TorchLinear_1"], "net.4", sd_f)
    _inv_linear(pf["TorchLinear_2"], "net.7", sd_f)

    gen_vars, fe_vars = ti.convert_gan_final({"G": sd_g, "E_num": sd_f})
    tree_equal(gen_vars["params"], p)
    tree_equal(gen_vars["batch_stats"], st)
    tree_equal(fe_vars["params"], pf)

    # converted vars run through the sampler
    from melogan_tpu.sampling import Sampler

    sampler = Sampler(cfg, gen_variables=gen_vars, fe_variables=fe_vars)
    notes = sampler.sample_notes(["sad"], seed=0)
    assert notes.shape == (1, 64, 4)


def test_critic_and_ed_conversion_shapes():
    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8)
    critic = Critic.from_config(cfg)
    cv = critic.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 4)), jnp.zeros((1, 128)))
    p = cv["params"]
    sd = {}
    for i, t in enumerate((0, 2, 4)):
        _inv_conv(p[f"Conv1d_{i}"], f"conv.{t}", sd)
    _inv_linear(p["TorchLinear_0"], "fc.1", sd)
    _inv_linear(p["TorchLinear_1"], "real_fake", sd)
    converted = ti.convert_critic(sd)
    tree_equal(converted["params"], p)

    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16, 8))
    ed = EmotionDiscriminator.from_config(ed_cfg)
    ev = ed.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 4)), train=False)
    p, st = ev["params"], ev["batch_stats"]
    sd = {}
    for i in range(2):
        _inv_conv(p["encoder"][f"ConvBlock1D_{i}"]["Conv1d_0"], f"encoder.conv.{i}.net.0", sd)
        _inv_bn(
            p["encoder"][f"ConvBlock1D_{i}"]["TorchBatchNorm_0"],
            st["encoder"][f"ConvBlock1D_{i}"]["TorchBatchNorm_0"],
            f"encoder.conv.{i}.net.1",
            sd,
        )
    _inv_linear(p["encoder"]["TorchLinear_0"], "encoder.project", sd)
    _inv_linear(p["classifier"]["TorchLinear_0"], "classifier.net.0", sd)
    _inv_linear(p["classifier"]["TorchLinear_1"], "classifier.net.3", sd)
    _inv_linear(p["classifier"]["TorchLinear_2"], "classifier.head", sd)
    converted = ti.convert_ed(sd, notes_blocks=2, mlp_hidden=2)
    tree_equal(converted["params"], p)
    tree_equal(converted["batch_stats"], st)


def test_cli_import_checkpoint_gan(tmp_path, capsys):
    """End-to-end migration: a reference-format torch gan_final.pth on disk →
    `melogan import-checkpoint` → sampling from the imported .ckpt."""
    torch = pytest.importorskip("torch")
    from melogan_tpu.cli import main as cli
    from melogan_tpu.train.gan_loop import load_gan_final

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    gen = Generator.from_config(cfg)
    fe = FeatureEncoder.from_config(cfg)
    gv = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16)), None, jnp.zeros((1, 128)), train=False
    )
    fv = fe.init(jax.random.PRNGKey(1), jnp.zeros((1, 6)), train=False)

    sd_g = {}
    p, st = gv["params"], gv["batch_stats"]
    _inv_linear(p["noise_to_latent"]["TorchLinear_0"], "noise_to_latent.net.0", sd_g)
    _inv_linear(p["noise_to_latent"]["TorchLinear_1"], "noise_to_latent.net.2", sd_g)
    _inv_linear(p["decoder"]["TorchLinear_0"], "decoder.pre.0", sd_g)
    _inv_linear(p["decoder"]["TorchLinear_1"], "decoder.pre.2", sd_g)
    for i, t in enumerate((0, 3, 6)):
        _inv_convt(p["decoder"][f"ConvTranspose1d_{i}"], f"decoder.deconv.{t}", sd_g)
    for i, t in enumerate((1, 4)):
        _inv_bn(p["decoder"][f"TorchBatchNorm_{i}"], st["decoder"][f"TorchBatchNorm_{i}"], f"decoder.deconv.{t}", sd_g)
    sd_f = {}
    pf = fv["params"]
    sd_f["net.0.weight"] = np.asarray(pf["TorchLayerNorm_0"]["scale"])
    sd_f["net.0.bias"] = np.asarray(pf["TorchLayerNorm_0"]["bias"])
    _inv_linear(pf["TorchLinear_0"], "net.1", sd_f)
    _inv_linear(pf["TorchLinear_1"], "net.4", sd_f)
    _inv_linear(pf["TorchLinear_2"], "net.7", sd_f)

    # a real torch.save file, tensors included (the reference artifact format)
    pth = str(tmp_path / "gan_final.pth")
    torch.save(
        {
            "G": {k: torch.tensor(v) for k, v in sd_g.items()},
            "E_num": {k: torch.tensor(v) for k, v in sd_f.items()},
        },
        pth,
    )
    out = str(tmp_path / "gan_final.ckpt")
    cli(["import-checkpoint", pth, out, "--kind", "gan"])
    assert "imported gan checkpoint" in capsys.readouterr().out

    gen_vars, fe_vars = load_gan_final(out)
    tree_equal(gen_vars["params"], p)
    from melogan_tpu.sampling import Sampler

    sampler = Sampler(cfg, gen_variables=gen_vars, fe_variables=fe_vars)
    assert sampler.sample_notes(["happy"], seed=0).shape == (1, 64, 4)


def test_cli_import_checkpoint_ae(tmp_path):
    torch = pytest.importorskip("torch")
    from melogan_tpu.cli import main as cli
    from melogan_tpu.utils.checkpoint import load_checkpoint

    cfg = AEConfig(max_notes=64)
    vae = VAE.from_config(cfg)
    variables = vae.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 4)),
        train=False,
    )
    p, st = variables["params"], variables["batch_stats"]
    sd = {}
    for i, t in enumerate((0, 3, 6)):
        _inv_conv(p["encoder"][f"Conv1d_{i}"], f"encoder.conv.{t}", sd)
    for i, t in enumerate((1, 4, 7)):
        _inv_bn(p["encoder"][f"TorchBatchNorm_{i}"], st["encoder"][f"TorchBatchNorm_{i}"], f"encoder.conv.{t}", sd)
    _inv_linear(p["encoder"]["TorchLinear_0"], "encoder._linear.1", sd)
    _inv_linear(p["fc_mu"], "fc_mu", sd)
    _inv_linear(p["fc_log_var"], "fc_log_var", sd)
    _inv_linear(p["decoder"]["TorchLinear_0"], "decoder.pre.0", sd)
    _inv_linear(p["decoder"]["TorchLinear_1"], "decoder.pre.2", sd)
    for i, t in enumerate((0, 3, 6)):
        _inv_convt(p["decoder"][f"ConvTranspose1d_{i}"], f"decoder.deconv.{t}", sd)
    for i, t in enumerate((1, 4)):
        _inv_bn(p["decoder"][f"TorchBatchNorm_{i}"], st["decoder"][f"TorchBatchNorm_{i}"], f"decoder.deconv.{t}", sd)

    pth = str(tmp_path / "ae_best.pth")
    torch.save({"epoch": 7, "model_state": {k: torch.tensor(v) for k, v in sd.items()}}, pth)
    out = str(tmp_path / "ae_best.ckpt")
    cli(["import-checkpoint", pth, out, "--kind", "ae"])

    raw = load_checkpoint(out)
    assert int(raw["epoch"]) == 7
    # imported params drive the model
    recon, _, mu, _ = vae.apply(
        {"params": raw["params"], "batch_stats": raw["batch_stats"]},
        jnp.zeros((2, 64, 4)),
        train=False,
    )
    assert recon.shape == (2, 64, 4) and mu.shape == (2, cfg.latent_dim)


# ---------------------------------------------------------------------------
# VERDICT-r2 #7: two-way migration — import(export(x)) ≡ x for all three
# artifact kinds, through the real CLI and real torch.save files.
# ---------------------------------------------------------------------------


def test_roundtrip_ae_checkpoint(tmp_path):
    pytest.importorskip("torch")
    from melogan_tpu.cli import main as cli
    from melogan_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = AEConfig(max_notes=64)
    vae = VAE.from_config(cfg)
    variables = vae.init(
        {"params": jax.random.PRNGKey(2), "reparam": jax.random.PRNGKey(3)},
        jnp.zeros((1, 64, 4)),
        train=False,
    )
    src = str(tmp_path / "ae_best.ckpt")
    save_checkpoint(src, {"epoch": 11, "params": variables["params"],
                          "batch_stats": variables["batch_stats"]})
    pth = str(tmp_path / "ae_best.pth")
    cli(["export-checkpoint", src, pth, "--kind", "ae"])
    back = str(tmp_path / "ae_back.ckpt")
    cli(["import-checkpoint", pth, back, "--kind", "ae"])

    raw = load_checkpoint(back)
    assert int(raw["epoch"]) == 11
    tree_equal(raw["params"], variables["params"])
    tree_equal(raw["batch_stats"], variables["batch_stats"])


def test_roundtrip_ed_checkpoint(tmp_path):
    pytest.importorskip("torch")
    from melogan_tpu.cli import main as cli
    from melogan_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16, 8))
    ed = EmotionDiscriminator.from_config(ed_cfg)
    ev = ed.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 4)), train=False)
    src = str(tmp_path / "ed_best.ckpt")
    save_checkpoint(src, {"epoch": 3, "params": ev["params"],
                          "batch_stats": ev["batch_stats"]})
    pth = str(tmp_path / "ed_best.pth")
    cli(["export-checkpoint", src, pth, "--kind", "ed"])
    back = str(tmp_path / "ed_back.ckpt")
    # import needs the matching layer counts (export inferred them from the tree)
    import yaml

    cfg_yaml = str(tmp_path / "ed.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump({"max_notes": 64, "notes_blocks": 2, "notes_hidden": 32,
                        "mlp_hidden": [16, 8]}, f)
    cli(["import-checkpoint", pth, back, "--kind", "ed", "--ed-config", cfg_yaml])

    raw = load_checkpoint(back)
    assert int(raw["epoch"]) == 3
    tree_equal(raw["params"], ev["params"])
    tree_equal(raw["batch_stats"], ev["batch_stats"])


def test_roundtrip_gan_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    from melogan_tpu.cli import main as cli
    from melogan_tpu.train.gan_loop import load_gan_final
    from melogan_tpu.utils.checkpoint import save_checkpoint

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    gen = Generator.from_config(cfg)
    fe = FeatureEncoder.from_config(cfg)
    gv = gen.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 16)), None, jnp.zeros((1, 128)), train=False
    )
    fv = fe.init(jax.random.PRNGKey(5), jnp.zeros((1, 6)), train=False)
    src = str(tmp_path / "gan_final.ckpt")
    save_checkpoint(src, {"G": gv, "E_num": {"params": fv["params"]}})
    pth = str(tmp_path / "gan_final.pth")
    cli(["export-checkpoint", src, pth, "--kind", "gan"])

    # the exported file is a genuine reference-layout torch artifact
    raw = torch.load(pth, map_location="cpu", weights_only=False)
    assert set(raw) == {"G", "E_num"}
    assert "decoder.deconv.0.weight" in raw["G"]
    assert raw["G"]["decoder.deconv.1.num_batches_tracked"].dtype == torch.int64

    back = str(tmp_path / "gan_back.ckpt")
    cli(["import-checkpoint", pth, back, "--kind", "gan"])
    gen_vars, fe_vars = load_gan_final(back)
    tree_equal(gen_vars["params"], gv["params"])
    tree_equal(gen_vars["batch_stats"], gv["batch_stats"])
    tree_equal(fe_vars["params"], fv["params"])

    # and the round-tripped weights still drive the sampler
    from melogan_tpu.sampling import Sampler

    sampler = Sampler(cfg, gen_variables=gen_vars, fe_variables=fe_vars)
    assert sampler.sample_notes(["calm"], seed=0).shape == (1, 64, 4)
