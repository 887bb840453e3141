"""Generate the forward-parity golden fixture (tests/fixtures/pix2pix_tiny.npz).

Runs the *reference* torch Pix2Pix UNet + PatchGAN discriminator (mults
(1, 2), 32x32, eval mode) on a fixed input with weights drawn from a
deterministic numpy stream, and records input + outputs + the (name, shape)
weight manifest. The test regenerates the identical weight values from the
same stream and loads them into the pai_tpu flax models, pinning full-model
numerical parity against the reference operator chain without shipping the
weights themselves.

Requires /root/reference mounted (Lightning and torchvision stubbed; only
the reference's plain nn.Modules run). Run:
    python tools/make_parity_fixture.py
"""

import json
import os
import sys
import types

import numpy as np

WEIGHT_SEED = 777


def deterministic_weights(manifest):
    """Regenerate the weight stream: iterate the manifest in order; conv /
    linear weights ~ N(0, 0.02); BN weight ~ U(0.5, 1.5), BN bias ~
    N(0, 0.1); running_mean ~ N(0, 0.1); running_var ~ U(0.5, 1.5)."""
    rng = np.random.default_rng(WEIGHT_SEED)
    values = {}
    for name, shape in manifest:
        shape = tuple(shape)
        if name.endswith("running_var") or (
                name.endswith("weight") and len(shape) == 1):
            # BN scale / running variance: positive, near 1
            values[name] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        elif name.endswith("running_mean") or name.endswith("bias"):
            values[name] = (rng.standard_normal(shape) * 0.1).astype(
                np.float32)
        else:  # conv / linear kernels
            values[name] = (rng.standard_normal(shape) * 0.02).astype(
                np.float32)
    return values


def _install_stubs():
    import torch.nn as nn

    pl_stub = types.ModuleType("pytorch_lightning")

    class FakeLM(nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

        @property
        def device(self):  # LightningModule property (Palette reads it)
            import torch

            return torch.device("cpu")

    pl_stub.LightningModule = FakeLM
    pl_stub.LightningDataModule = object
    pl_stub.callbacks = types.SimpleNamespace(
        Callback=object, ModelCheckpoint=object)
    sys.modules["pytorch_lightning"] = pl_stub

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Lambda = lambda f: f

    class _CID:
        def __init__(self, d):
            pass

        def __call__(self, x):
            return x

    tvt.ConvertImageDtype = _CID
    tvio = types.ModuleType("torchvision.io")
    tvio.write_png = lambda *a, **k: None
    tvio.read_image = None
    tvio.ImageReadMode = types.SimpleNamespace(GRAY=0)
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.io"] = tvio

    import torch

    tm = types.ModuleType("torchmetrics.functional")
    tm.structural_similarity_index_measure = lambda *a, **k: torch.tensor(0.)
    tm.peak_signal_noise_ratio = lambda *a, **k: torch.tensor(0.)
    tm.mean_squared_error = lambda *a, **k: torch.tensor(0.)
    sys.modules["torchmetrics"] = types.ModuleType("torchmetrics")
    sys.modules["torchmetrics.functional"] = tm


def _load_deterministic(model, prefix, manifest_out):
    """Record the manifest for ``model`` and load deterministic weights.
    NOTE: uses a per-model stream seeded by WEIGHT_SEED via the shared
    manifest ordering — callers must regenerate with the same manifest."""
    import torch

    manifest = []
    for name, tensor in model.state_dict().items():
        if name.endswith("num_batches_tracked"):
            continue
        manifest.append((f"{prefix}.{name}", list(tensor.shape)))
    manifest_out.extend(manifest)
    return manifest


def make_diffusion_fixture():
    """guided_diffusion UNet forward-parity fixture (FiLM ResBlocks,
    attention, gamma embedding — the full conditioned chain)."""
    import torch

    sys.path.insert(0, "/root/reference")
    from models.guided_diffusion.unet import UNet as GDUNet

    unet = GDUNet(image_size=16, in_channel=2, inner_channel=32,
                  out_channel=1, res_blocks=2, attn_res=(2,),
                  channel_mults=(1, 2), num_heads=4, dropout=0.0)

    manifest = []
    _load_deterministic(unet, "gd", manifest)
    values = deterministic_weights(manifest)
    sd = unet.state_dict()
    for name in sd:
        key = f"gd.{name}"
        if key in values:
            sd[name] = torch.from_numpy(values[key])
    unet.load_state_dict(sd)
    unet.eval()

    rng = np.random.default_rng(55)
    x = rng.uniform(-1, 1, (2, 1, 16, 16)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 1, 16, 16)).astype(np.float32)
    gammas = np.array([0.3, 0.9], np.float32)
    with torch.no_grad():
        out = unet(torch.from_numpy(x), torch.from_numpy(y),
                   torch.from_numpy(gammas)).numpy()

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "tests", "fixtures", "diffusion_tiny.npz")
    np.savez_compressed(path, x=x, y=y, gammas=gammas, out=out,
                        manifest=json.dumps(manifest))
    print(f"wrote {path}: out mean {out.mean():.6f}, "
          f"manifest {len(manifest)}")
    # Dump the torch module names once for mapping reference.
    for name, shape in manifest[:200]:
        print("  ", name, shape)


def _fixture_for(model, prefix, inputs, fname, forward):
    """Shared: deterministic weights -> eval forward -> npz fixture."""
    import torch

    manifest = []
    _load_deterministic(model, prefix, manifest)
    values = deterministic_weights(manifest)
    sd = model.state_dict()
    for name in sd:
        key = f"{prefix}.{name}"
        if key in values:
            sd[name] = torch.from_numpy(values[key])
    model.load_state_dict(sd)
    model.eval()
    with torch.no_grad():
        out = forward(model, *[torch.from_numpy(i) for i in inputs]).numpy()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "tests", "fixtures", fname)
    blob = {f"in{i}": arr for i, arr in enumerate(inputs)}
    np.savez_compressed(path, out=out, manifest=json.dumps(manifest), **blob)
    print(f"wrote {path}: out mean {out.mean():.6f}, "
          f"manifest {len(manifest)}")
    return manifest


def make_res18_fixture():
    sys.path.insert(0, "/root/reference")
    from models.res_unet import ResUnet

    model = ResUnet(1, 1, "18", channel_mults=(1, 2), dropout=0.0)
    rng = np.random.default_rng(21)
    x = rng.uniform(-1, 1, (2, 1, 32, 32)).astype(np.float32)
    manifest = _fixture_for(model, "res", (x,), "res18_tiny.npz",
                            lambda m, a: m(a))
    for name, shape in manifest:
        print("  ", name, shape)


def make_attention_unet_fixture():
    sys.path.insert(0, "/root/reference")
    from models.attention_unet import AttentionUnet

    model = AttentionUnet(1, 1, channel_mults=(1, 2), dropout=0.0)
    rng = np.random.default_rng(22)
    x = rng.uniform(-1, 1, (2, 1, 32, 32)).astype(np.float32)
    manifest = _fixture_for(model, "att", (x,), "attention_tiny.npz",
                            lambda m, a: m(a))
    for name, shape in manifest:
        print("  ", name, shape)


def make_trans_unet_fixture():
    """TransUNet full chain (bottleneck encoders, 12-layer ViT, conv dec).
    Smallest legal config: mults (1,1) at 32² -> patch_dim 1024 (~100M
    params, regenerated from the deterministic stream at test time).

    The reference feeds (N, patches, dim) into a TransformerEncoder built
    without batch_first (trans_unet.py:151-161), silently attending across
    the batch axis; pai_tpu implements the intended per-sample patch
    attention (documented deviation). The fixture therefore flips
    batch_first on the reference's MHA modules so it computes the intended
    semantics — everything else is the untouched reference chain."""
    sys.path.insert(0, "/root/reference")
    from models.trans_unet import TransUnet

    model = TransUnet(1, 1, image_size=32, channel_mults=(1, 1),
                      patch_size=4, num_heads=8, dropout=0.0)
    for layer in model.vit_bottleneck.transformer.layers:
        layer.self_attn.batch_first = True
    rng = np.random.default_rng(23)
    x = rng.uniform(-1, 1, (1, 1, 32, 32)).astype(np.float32)
    manifest = _fixture_for(model, "tr", (x,), "trans_tiny.npz",
                            lambda m, a: m(a))
    for name, shape in manifest:
        print("  ", name, shape)


def main():
    import torch

    _install_stubs()
    sys.path.insert(0, "/root/reference")
    from models.pix2pix import Unet
    from models.wrapper import Discriminator

    unet = Unet(1, 1, channel_mults=(1, 2), dropout=0.0)
    disc = Discriminator(in_channels=1)

    manifest = []
    for prefix, model in (("unet", unet), ("disc", disc)):
        for name, tensor in model.state_dict().items():
            if name.endswith("num_batches_tracked"):
                continue
            manifest.append((f"{prefix}.{name}", list(tensor.shape)))

    values = deterministic_weights(manifest)
    for prefix, model in (("unet", unet), ("disc", disc)):
        sd = model.state_dict()
        for name in sd:
            key = f"{prefix}.{name}"
            if key in values:
                sd[name] = torch.from_numpy(values[key])
        model.load_state_dict(sd)

    unet.eval()
    disc.eval()
    rng = np.random.default_rng(99)
    x = rng.uniform(-1, 1, (2, 1, 32, 32)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        gen_out = unet(torch.from_numpy(x)).numpy()
        disc_out = disc(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                       "tests", "fixtures", "pix2pix_tiny.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, x=x, y=y, gen_out=gen_out, disc_out=disc_out,
        manifest=json.dumps(manifest))
    print(f"wrote {out}: gen_out mean {gen_out.mean():.6f}, "
          f"disc_out mean {disc_out.mean():.6f}, manifest {len(manifest)}")


if __name__ == "__main__":
    main()
    make_diffusion_fixture()
    make_res18_fixture()
    make_attention_unet_fixture()
    make_trans_unet_fixture()
