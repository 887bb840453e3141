"""Reference-checkpoint importer: load the reference's own torch modules
(Lightning stubbed), export a Lightning-style checkpoint dict, import it
through pai_tpu.interop, and require the flax forward to reproduce the
torch forward — for every model family, at configs DEEPER than the
forward-parity fixtures (multiple levels, skips, attention at several
blocks) so the structural name maps are exercised, not just the tiny
fixture shapes.  Reference anatomy: models/wrapper.py:29-34 (unet./
discriminator. prefixes), save_hyperparameters (pix2pix.py:43),
callbacks/ema.py (torch_ema shadow_params)."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # torch model builds + ckpt round-trips, multi-minute

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from make_parity_fixture import _install_stubs, deterministic_weights  # noqa: E402

from pai_tpu.interop import import_lightning_state_dict  # noqa: E402
from pai_tpu.models import build_generator  # noqa: E402

IMG = 32
MULTS = (1, 2, 4)


def _randomize(module, prefix):
    """Load deterministic non-degenerate weights into a torch module."""
    import torch

    manifest = []
    for name, tensor in module.state_dict().items():
        if name.endswith("num_batches_tracked"):
            continue
        manifest.append((f"{prefix}.{name}", list(tensor.shape)))
    values = deterministic_weights(manifest)
    sd = module.state_dict()
    for name in sd:
        key = f"{prefix}.{name}"
        if key in values:
            sd[name] = torch.from_numpy(values[key])
    module.load_state_dict(sd)
    module.eval()
    return {f"{prefix}.{k}": v.numpy() for k, v in module.state_dict().items()
            if not k.endswith("num_batches_tracked")}


@pytest.fixture(scope="module")
def reference():
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    import models.pix2pix  # noqa: F401
    yield


def _compare(model_name, sd, hparams, torch_out_nchw, x_nhwc,
             extra_apply=None, rtol=2e-4, atol=2e-5):
    params, stats, d_params, ema = import_lightning_state_dict(
        model_name, sd, hparams)
    gen = build_generator(
        model_name,
        hparams["in_channels"], hparams["out_channels"],
        channel_mults=tuple(int(m) for m in
                            hparams["channel_mults"].split(",")),
        attention_res=tuple(int(a) for a in
                            hparams["attention_res"].split(",")),
        dropout=0.0, learn_var=hparams.get("learn_variance", False),
        image_size=hparams.get("image_size", IMG))
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    if extra_apply is None:
        out = gen.apply(variables, jnp.asarray(x_nhwc), train=False)
    else:
        out = extra_apply(gen, variables)
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, torch_out_nchw, rtol=rtol, atol=atol)
    return params, stats, d_params, ema


def _gan_hparams(model_name):
    return {"model": model_name, "in_channels": 1, "out_channels": 1,
            "channel_mults": ",".join(str(m) for m in MULTS),
            "attention_res": "8,4,2", "dropout": 0.0, "loss_type": "mse",
            "learn_variance": False, "image_size": IMG, "ema": False,
            "precision": "32"}


def test_import_pix2pix(reference):
    import torch
    from models.pix2pix import Unet

    net = Unet(1, 1, channel_mults=MULTS, dropout=0.0)
    sd = _randomize(net, "unet")
    x = np.random.default_rng(0).uniform(-1, 1, (2, 1, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    _compare("pix2pix", sd, _gan_hparams("pix2pix"), ref,
             np.transpose(x, (0, 2, 3, 1)))


def test_import_attention_unet(reference):
    import torch
    from models.attention_unet import AttentionUnet

    net = AttentionUnet(1, 1, channel_mults=MULTS, dropout=0.0)
    sd = _randomize(net, "unet")
    x = np.random.default_rng(1).uniform(-1, 1, (2, 1, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    _compare("attention_unet", sd, _gan_hparams("attention_unet"), ref,
             np.transpose(x, (0, 2, 3, 1)))


@pytest.mark.parametrize("res_type,model_name", [
    ("18", "res18_unet"), ("50", "res50_unet"),
    ("v2", "resv2_unet"), ("next", "resnext_unet")])
def test_import_res_unet(reference, res_type, model_name):
    import torch
    from models.res_unet import ResUnet

    net = ResUnet(1, 1, res_type=res_type, channel_mults=MULTS, dropout=0.0)
    sd = _randomize(net, "unet")
    x = np.random.default_rng(2).uniform(-1, 1, (2, 1, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    _compare(model_name, sd, _gan_hparams(model_name), ref,
             np.transpose(x, (0, 2, 3, 1)))


def test_import_trans_unet(reference):
    import torch
    from models.trans_unet import TransUnet

    net = TransUnet(1, 1, image_size=IMG, channel_mults=(1, 1),
                    patch_size=4, dropout=0.0)
    # The reference's TransformerEncoder silently attends across the batch
    # axis (built without batch_first, trans_unet.py:151-161); flip
    # batch_first so torch computes the intended patch attention that
    # pai_tpu implements (same correction as the forward-parity fixture).
    for layer in net.vit_bottleneck.transformer.layers:
        layer.self_attn.batch_first = True
    sd = _randomize(net, "unet")
    x = np.random.default_rng(3).uniform(-1, 1, (2, 1, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    h = _gan_hparams("trans_unet")
    h["channel_mults"] = "1,1"
    _compare("trans_unet", sd, h, ref, np.transpose(x, (0, 2, 3, 1)),
             rtol=5e-4, atol=5e-4)


def test_import_palette_with_discriminator_and_ema(reference):
    """Palette UNet at registry width (inner 128, palette.py:50-61) plus a
    GAN checkpoint with discriminator + torch_ema shadow params."""
    import torch
    from models.guided_diffusion.unet import UNet as GDUNet

    size = 16
    net = GDUNet(image_size=size, in_channel=2, inner_channel=128,
                 out_channel=1, res_blocks=2, attn_res=(2,),
                 channel_mults=(1, 2), num_heads=4, dropout=0.0)
    sd = _randomize(net, "unet")
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (2, 1, size, size)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 1, size, size)).astype(np.float32)
    gammas = np.array([0.3, 0.9], np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x), torch.from_numpy(y),
                  torch.from_numpy(gammas)).numpy()

    hparams = {"model": "palette", "in_channels": 1, "out_channels": 1,
               "channel_mults": "1,2", "attention_res": "2", "dropout": 0.0,
               "learn_variance": False, "image_size": size, "ema": True,
               "precision": "32", "loss_type": "mse",
               "schedule_type": "linear"}

    # torch_ema shadow params: parameters() order == state-dict order minus
    # buffers; shadow = 2x the live weights so imported EMA is diagnosable.
    param_names = [k for k, v in net.named_parameters()]
    shadow = [torch.from_numpy(sd[f"unet.{k}"] * 2.0) for k in param_names]
    ema_state = {"decay": 0.9999, "num_updates": 7, "shadow_params": shadow}

    def apply_palette(gen, variables):
        return gen.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                         jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
                         jnp.asarray(gammas), train=False)

    params, stats, d_params, ema = _compare(
        "palette", sd, hparams, ref,
        np.transpose(x, (0, 2, 3, 1)), extra_apply=apply_palette)
    assert d_params is None

    params2, stats2, _, ema2 = import_lightning_state_dict(
        "palette", sd, hparams, ema_state=ema_state)
    assert ema2 is not None and "unet" in ema2
    for a, b in zip(jax.tree.leaves(ema2["unet"]),
                    jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), 2.0 * np.asarray(b),
                                   rtol=1e-6)


def test_import_checkpoint_ema_metadata(reference, tmp_path):
    """import_lightning_checkpoint: torch_ema callback payloads anywhere in
    checkpoint['callbacks'] are found, shadow params map through, and
    num_updates survives into meta (the decay ramp min(d,(1+n)/(10+n))
    must resume from the checkpoint's n, not 0)."""
    import torch
    from models.pix2pix import Unet

    from pai_tpu.interop import import_lightning_checkpoint

    net = Unet(1, 1, channel_mults=(1, 2), dropout=0.0)
    sd = _randomize(net, "unet")
    param_names = [k for k, _ in net.named_parameters()]
    shadow = [torch.from_numpy(sd[f"unet.{k}"] * 0.5) for k in param_names]
    ckpt = {
        "state_dict": {k: torch.from_numpy(v) for k, v in sd.items()},
        "hyper_parameters": {"in_channels": 1, "out_channels": 1,
                             "channel_mults": (1, 2), "dropout": 0.0,
                             "loss_type": "mse"},
        "epoch": 5, "global_step": 1234,
        "callbacks": {"EMACallback": {
            "decay": 0.9999, "num_updates": 777, "shadow_params": shadow}},
    }
    src = tmp_path / "ema.ckpt"
    torch.save(ckpt, src)

    (params, stats, d_params, ema), h, meta = import_lightning_checkpoint(
        str(src), "pix2pix", hparams_override={"image_size": IMG})
    assert h["ema"] is True
    assert meta["ema_num_updates"] == 777
    assert d_params is None
    for a, b in zip(jax.tree.leaves(ema["generator"]),
                    jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), 0.5 * np.asarray(b),
                                   rtol=1e-6)


def test_import_cli_roundtrip(reference, tmp_path):
    """End to end: torch.save a Lightning-format .ckpt of the reference
    Pix2Pix wrapper -> tools/import_reference_ckpt.py -> CheckpointManager
    restore path (restore.rebuild_eval_model) reproduces the torch
    forward."""
    import subprocess
    import torch
    from models.pix2pix import Unet

    net = Unet(1, 1, channel_mults=(1, 2), dropout=0.0)
    sd = _randomize(net, "unet")
    x = np.random.default_rng(6).uniform(-1, 1, (2, 1, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()

    ckpt = {
        "state_dict": {k: torch.from_numpy(v) for k, v in sd.items()},
        "hyper_parameters": {
            "in_channels": 1, "out_channels": 1, "channel_mults": (1, 2),
            "dropout": 0.0, "loss_type": "mse"},
        "epoch": 3, "global_step": 42,
    }
    src = tmp_path / "best.ckpt"
    torch.save(ckpt, src)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/import_reference_ckpt.py"),
         str(src), "-m", "pix2pix", "-o", str(tmp_path / "ck"),
         "--name", "imported", "--image-size", str(IMG)],
        capture_output=True, text=True, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]

    from pai_tpu.restore import rebuild_eval_model
    from pai_tpu.utils.checkpoint import load_checkpoint

    state_dict, meta = load_checkpoint(str(tmp_path / "ck/imported/last"))
    assert meta["step"] == 42 and meta["epoch"] == 3
    gen, params, stats, _ = rebuild_eval_model(state_dict, meta["hparams"])
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out = gen.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=2e-4, atol=2e-5)


def test_api_from_lightning_checkpoint(reference, tmp_path):
    """Library facade: Pix2Pix.from_lightning_checkpoint(path).predict(x)
    reproduces the reference torch forward."""
    import torch
    from models.pix2pix import Unet
    from pai_tpu.api import Pix2Pix

    net = Unet(1, 1, channel_mults=(1, 2), dropout=0.0)
    sd = _randomize(net, "unet")
    x = np.random.default_rng(7).uniform(-1, 1, (2, 1, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()

    ckpt = {"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()},
            "hyper_parameters": {
                "in_channels": 1, "out_channels": 1,
                "channel_mults": (1, 2), "dropout": 0.0,
                "loss_type": "mse"},
            "epoch": 0, "global_step": 0}
    src = tmp_path / "best.ckpt"
    torch.save(ckpt, src)

    model = Pix2Pix.from_lightning_checkpoint(
        str(src), image_size=IMG)
    pred = model.predict(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(pred), (0, 3, 1, 2)), ref,
        rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("model_name,mults", [
    ("pix2pix", MULTS), ("attention_unet", MULTS), ("res18_unet", MULTS),
    ("res50_unet", MULTS), ("resv2_unet", MULTS), ("resnext_unet", MULTS),
    ("trans_unet", (1, 1))])
def test_export_roundtrip(reference, model_name, mults):
    """Reverse direction: init a pai_tpu model, export_lightning_state_dict,
    load into the reference torch module with strict=True, and require the
    torch forward to reproduce the flax forward."""
    import torch

    from pai_tpu.interop.torch_import import export_lightning_state_dict

    h = _gan_hparams(model_name)
    h["channel_mults"] = ",".join(str(m) for m in mults)
    gen = build_generator(model_name, 1, 1, channel_mults=mults,
                          dropout=0.0, image_size=IMG)
    variables = gen.init(jax.random.key(11), jnp.zeros((1, IMG, IMG, 1)),
                         train=False)
    sd = export_lightning_state_dict(
        model_name, variables["params"], variables.get("batch_stats", {}), h)
    sd = {k[len("unet."):]: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in sd.items()}

    if model_name == "pix2pix":
        from models.pix2pix import Unet

        net = Unet(1, 1, channel_mults=mults, dropout=0.0)
    elif model_name == "attention_unet":
        from models.attention_unet import AttentionUnet

        net = AttentionUnet(1, 1, channel_mults=mults, dropout=0.0)
    elif model_name.startswith("res"):
        from models.res_unet import ResUnet

        res_type = {"res18_unet": "18", "res50_unet": "50",
                    "resv2_unet": "v2", "resnext_unet": "next"}[model_name]
        net = ResUnet(1, 1, res_type=res_type, channel_mults=mults,
                      dropout=0.0)
    else:
        from models.trans_unet import TransUnet

        net = TransUnet(1, 1, image_size=IMG, channel_mults=mults,
                        patch_size=4, dropout=0.0)
        for layer in net.vit_bottleneck.transformer.layers:
            layer.self_attn.batch_first = True
    net.load_state_dict(sd, strict=True)
    net.eval()

    x = np.random.default_rng(8).uniform(-1, 1, (2, 1, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    out = gen.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=5e-4, atol=5e-4)


def test_export_cli_roundtrip(reference, tmp_path):
    """End to end: train a tiny run, tools/export_reference_ckpt.py the
    best checkpoint, torch.load the .ckpt and load_state_dict(strict=True)
    into the reference wrapper's modules (generator AND discriminator);
    forwards match."""
    import subprocess
    import torch
    from models.pix2pix import Unet
    from models.wrapper import Discriminator as TorchDisc

    from pai_tpu.train.loop import fit
    from pai_tpu.utils.images import write_png

    rng = np.random.default_rng(10)
    entries = []
    for i in range(4):
        img = rng.integers(0, 255, size=(IMG, IMG), dtype=np.uint8)
        write_png(img, str(tmp_path / f"in_{i}.png"))
        write_png(255 - img, str(tmp_path / f"gt_{i}.png"))
        entries.append(f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n")
    (tmp_path / "d.yaml").write_text("".join(entries))
    h = {
        "name": "exprun", "data": str(tmp_path / "d.yaml"),
        "val_data": str(tmp_path / "d.yaml"), "epochs": 1, "steps": -1,
        "batch_size": 4, "val_epochs": 1, "precision": "32", "ema": False,
        "channel_mults": "1,2", "attention_res": "2", "dropout": 0.0,
        "loss_type": "gan", "schedule_type": "linear",
        "learn_variance": False, "model": "pix2pix", "seed": 0,
        "resume": False, "image_size": IMG,
        "log_dir": str(tmp_path / "logs"), "ckpt_dir": str(tmp_path / "ck"),
    }
    fit(h)

    out_ckpt = tmp_path / "exported.ckpt"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/export_reference_ckpt.py"),
         str(tmp_path / "ck/exprun/best"), "-o", str(out_ckpt)],
        capture_output=True, text=True, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]

    ckpt = torch.load(out_ckpt, map_location="cpu", weights_only=False)
    assert ckpt["hyper_parameters"]["loss_type"] == "gan"
    unet_sd = {k[len("unet."):]: v for k, v in ckpt["state_dict"].items()
               if k.startswith("unet.")}
    disc_sd = {k[len("discriminator."):]: v
               for k, v in ckpt["state_dict"].items()
               if k.startswith("discriminator.")}
    net = Unet(1, 1, channel_mults=(1, 2), dropout=0.0)
    net.load_state_dict(unet_sd, strict=True)
    net.eval()
    disc = TorchDisc(in_channels=1)
    disc.load_state_dict(disc_sd, strict=True)
    disc.eval()

    from pai_tpu.restore import rebuild_eval_model
    from pai_tpu.utils.checkpoint import load_checkpoint

    state_dict, meta = load_checkpoint(str(tmp_path / "ck/exprun/best"))
    gen, params, stats, _ = rebuild_eval_model(state_dict, meta["hparams"])
    x = np.random.default_rng(11).uniform(-1, 1, (2, 1, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out = gen.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=2e-4, atol=2e-5)


def test_export_palette_strict_load(reference):
    """Palette export: the reference Palette module (unet + registered
    diffusion schedule buffers, palette.py:50-77,202-212) loads the
    exported state_dict with strict=True and its UNet reproduces the flax
    forward."""
    import torch
    from models.palette import Palette

    from pai_tpu.interop.torch_import import export_lightning_state_dict

    size = 16
    hparams = {"model": "palette", "in_channels": 1, "out_channels": 1,
               "channel_mults": "1,2", "attention_res": "2", "dropout": 0.0,
               "learn_variance": False, "image_size": size,
               "schedule_type": "linear"}
    gen = build_generator("palette", 1, 1, channel_mults=(1, 2),
                          attention_res=(2,), image_size=size)
    variables = gen.init(jax.random.key(12),
                         jnp.zeros((1, size, size, 1)),
                         jnp.zeros((1, size, size, 1)),
                         jnp.ones((1,)), train=False)
    sd = export_lightning_state_dict(
        "palette", variables["params"], variables.get("batch_stats", {}),
        hparams)
    palette = Palette(in_channels=1, out_channels=1, channel_mults=(1, 2),
                      attention_res=(2,), dropout=0.0,
                      schedule_type="linear", learn_var=False)
    palette.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    palette.eval()

    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, (2, 1, size, size)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 1, size, size)).astype(np.float32)
    gammas = np.array([0.4, 0.8], np.float32)
    with torch.no_grad():
        ref = palette.unet(torch.from_numpy(x), torch.from_numpy(y),
                           torch.from_numpy(gammas)).numpy()
    out = gen.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
                    jnp.asarray(gammas), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=2e-4, atol=2e-5)


def test_import_gan_checkpoint_discriminator(reference):
    """A gan-loss checkpoint carries discriminator.* tensors; they import
    into pai_tpu's Discriminator and reproduce its patch logits."""
    import torch
    from models.wrapper import Discriminator as TorchDisc
    from pai_tpu.models import Discriminator

    net = TorchDisc(in_channels=1)  # per-image channels; D sees cat(x, y)
    sd = _randomize(net, "discriminator")
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, 1, IMG, IMG)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 1, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    from pai_tpu.interop.torch_import import (_discriminator_key,
                                              _materialize)

    disc = Discriminator()
    abstract = jax.eval_shape(lambda: disc.init(
        jax.random.key(0), jnp.zeros((2, IMG, IMG, 1)),
        jnp.zeros((2, IMG, IMG, 1))))
    d_params = _materialize(abstract["params"], sd, _discriminator_key)
    out = disc.apply({"params": d_params},
                     jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                     jnp.asarray(np.transpose(y, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=2e-4, atol=2e-5)
