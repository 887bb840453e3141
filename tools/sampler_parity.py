"""Weight-level palette sampler pin (reference: models/palette.py:79-100,
233-306).

The training head-to-head's final-SSIM delta mixes two things: sampler
*semantics* and 100-step training-trajectory chaos. This tool separates
them. It drives the REFERENCE's own ``DiffusionModel`` reverse chain at
256² from briefly-trained reference weights (a few real ``training_step``
-math optimizer steps, so weights AND BatchNorm running stats are off
init), with the sampler noise stream generated from a shared numpy seed,
then exports the weights as a reference-format Lightning checkpoint.

``tests/test_sampler_parity.py`` imports that checkpoint through the
production interop name maps and runs ``pai_tpu``'s ``ddpm_sample`` from
the IDENTICAL weights and IDENTICAL noise — so any output difference is
pure sampler semantics, which must agree at float level.

The UNet is the reference ``guided_diffusion.UNet`` with
``inner_channel=16`` (the reference ``Palette`` hard-codes 128, which is
CPU-prohibitive at 256² x 100 steps; the sampler math is width-agnostic).
The generated fixture is committed under tests/fixtures/sampler_pin/ so
CI only runs the jax side.

Usage: python tools/sampler_parity.py <outdir>
Writes ckpt.pt (Lightning-format checkpoint) and io.npz (x, reference
sampler output, noise seed).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_parity_fixture import _install_stubs  # noqa: E402
from train_parity import _load_deterministic  # noqa: E402

IMG = 256
B = 1
INNER = 16
MULTS = (1, 2)
ATTN = (8,)
TRAIN_STEPS = 5
TIMESTEPS = 100
NOISE_SEED = 20260817
DATA_SEED = 777


def make_io_data():
    """Smooth synthetic inversion pair at IMG², NCHW in [-1, 1]."""
    rng = np.random.default_rng(DATA_SEED)
    x = rng.uniform(-1, 1, (B, 1, IMG, IMG)).astype(np.float32)
    smooth = np.cumsum(np.cumsum(
        rng.normal(0, 0.02, x.shape), axis=2), axis=3).astype(np.float32)
    x = np.clip(0.7 * x + smooth, -1, 1).astype(np.float32)
    y0 = np.clip(-x, -1, 1).astype(np.float32)
    return x, y0


def sampler_noise():
    """The shared numpy noise stream: y_T plus one draw per reverse step,
    ordered t = T-1 .. 0 (the order both samplers consume it)."""
    rng = np.random.default_rng(NOISE_SEED)
    y_T = rng.standard_normal((B, 1, IMG, IMG)).astype(np.float32)
    steps = rng.standard_normal(
        (TIMESTEPS, B, 1, IMG, IMG)).astype(np.float32)
    return y_T, steps


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    _install_stubs()
    import torch

    sys.path.insert(0, "/root/reference")
    from models.guided_diffusion.unet import UNet
    from models.palette import DiffusionModel

    torch.manual_seed(0)
    unet = UNet(in_channel=2, out_channel=1, res_blocks=2,
                inner_channel=INNER, channel_mults=MULTS, attn_res=ATTN,
                num_heads=4, dropout=0.0, conv_resample=True, image_size=IMG)
    _load_deterministic([("unet", unet)])
    diffusion = DiffusionModel("linear", 2000, 1e-6, 0.01)
    diffusion_inf = DiffusionModel("cosine", TIMESTEPS)

    x_np, y0_np = make_io_data()
    x = torch.from_numpy(x_np)
    y0 = torch.from_numpy(y0_np)

    # Brief training (palette.py:110-140 math, Adam lr 1e-4): weights and
    # BN running stats move off init, so the pin runs from genuinely
    # trained eval-mode state. Torch-native randomness is fine here — the
    # jax side imports the FINAL weights, it never replays training.
    opt = torch.optim.Adam(unet.parameters(), lr=1e-4)
    rng = np.random.default_rng(1)
    unet.train()
    for _ in range(TRAIN_STEPS):
        t = torch.from_numpy(rng.integers(0, 2000, size=(B,)))
        y_t, noise, gamma = diffusion.forward(y0, t)
        pred = unet(x, y_t, gamma)
        loss = torch.nn.functional.mse_loss(pred, noise)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()

    # Reference reverse chain (palette.py:79-100 loop; backward() math at
    # palette.py:233-252 inlined only to inject the shared noise stream —
    # p_mean_variance and the schedules are the reference's own code).
    y_T, step_noise = sampler_noise()
    unet.eval()
    with torch.no_grad():
        y_t = torch.from_numpy(y_T)
        for j, i in enumerate(reversed(range(TIMESTEPS))):
            t = torch.full((B,), i, dtype=torch.long)
            gamma = diffusion_inf.gammas[t]
            model_output = unet(x, y_t, gamma)
            mean, log_variance = diffusion_inf.p_mean_variance(
                model_output, y_t, t)
            noise = torch.from_numpy(step_noise[j]) * \
                (t > 1).view(-1, 1, 1, 1)
            y_t = mean + torch.exp(0.5 * log_variance) * noise
    ref_y0 = y_t.numpy()

    torch.save(
        {"state_dict": {f"unet.{k}": v.cpu()
                        for k, v in unet.state_dict().items()},
         "hyper_parameters": {
             "in_channels": 1, "out_channels": 1,
             "channel_mults": list(MULTS), "attention_res": list(ATTN),
             "dropout": 0.0, "schedule_type": "linear",
             "learn_var": False}},
        os.path.join(outdir, "ckpt.pt"))
    np.savez_compressed(os.path.join(outdir, "io.npz"),
                        x=x_np, ref_y0=ref_y0,
                        noise_seed=np.int64(NOISE_SEED),
                        train_loss=np.float32(float(loss.detach())))
    print(f"wrote {outdir}: ref sampler y0 range "
          f"[{ref_y0.min():.4f}, {ref_y0.max():.4f}], "
          f"final train loss {float(loss.detach()):.4f}")


if __name__ == "__main__":
    main()
