"""Production-width palette pin: inner_channel=128 at 256².

The reference ``Palette`` hard-codes ``inner_channel=128``
(/root/reference/models/palette.py:50-61), but every other palette
head-to-head narrows the width for single-core-torch tractability
(train tier inner=32, sampler pin inner=16, full width only at 16²).
Width-dependent numerics — BatchNorm1d statistics inside the 128-ch
attention blocks (/root/reference/models/guided_diffusion/nn.py:51-58),
f32 accumulation across 4x-wider convs — are pinned here at the
reference's LITERAL width and resolution:

* ONE training-step forward in train mode (BN batch statistics), its
  MSE loss, its full backward (per-tensor gradient rms plus four
  representative tensors elementwise), and the post-forward BN
  running-stat summaries;
* a TRUNCATED reverse chain — the first 10 of 100 sampler steps in
  eval mode with an injected noise stream (a full 100-step 256² CPU
  chain at this width is intractable; 10 steps expose any
  width-dependent semantic break at float level).

Weights are NOT committed (128-wide UNet is 133M params): they come from
``deterministic_weights`` over the state_dict manifest, which this tool
commits as JSON — ``tests/test_width_parity.py`` regenerates the
identical stream, ports it through the production interop name maps,
and runs only the jax side against the goldens saved here.

Usage: python tools/width_parity.py <outdir>
Writes manifest.json + io.npz (inputs, loss, grad summaries, BN stat
summaries, 10-step chain prefix).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_parity_fixture import _install_stubs  # noqa: E402
from train_parity import _load_deterministic  # noqa: E402

IMG = 256
B = 1
INNER = 128                      # palette.py:53 — the production width
MULTS = (1, 1, 2, 2, 4, 4)       # palette.py:37 default
ATTN = (16, 8)                   # palette.py:38 default
TIMESTEPS = 100
PREFIX_STEPS = 10
NOISE_SEED = 20260821
DATA_SEED = 881


def pick_elem_keys(named_params):
    """Elementwise-committed gradient tensors: the width-sensitive spots —
    the first conv off the 128-ch trunk, the first ResBlock conv, the
    first qkv projection under an attention-block BatchNorm1d, and the
    zero-init head (picked by name pattern so the selection tracks the
    reference's actual module tree)."""
    names = [n for n, _ in named_params]
    keys = [names[0]]
    keys.append(next(n for n in names if "in_layers.2.weight" in n))
    keys.append(next(n for n in names if n.endswith("qkv.weight")))
    keys.append(next(n for n in reversed(names) if n.startswith("out.") and
                     n.endswith("weight")))
    return tuple(f"unet.{k}" for k in keys)


def make_io_data():
    rng = np.random.default_rng(DATA_SEED)
    x = rng.uniform(-1, 1, (B, 1, IMG, IMG)).astype(np.float32)
    smooth = np.cumsum(np.cumsum(
        rng.normal(0, 0.02, x.shape), axis=2), axis=3).astype(np.float32)
    x = np.clip(0.7 * x + smooth, -1, 1).astype(np.float32)
    y0 = np.clip(-x, -1, 1).astype(np.float32)
    return x, y0


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    _install_stubs()
    import torch

    torch.manual_seed(0)
    sys.path.insert(0, "/root/reference")
    from models.guided_diffusion.unet import UNet
    from models.palette import DiffusionModel

    t0 = time.time()
    unet = UNet(in_channel=2, out_channel=1, res_blocks=2,
                inner_channel=INNER, channel_mults=MULTS, attn_res=ATTN,
                num_heads=4, dropout=0.0, conv_resample=True, image_size=IMG)
    manifest = _load_deterministic([("unet", unet)])
    n_params = sum(p.numel() for p in unet.parameters())
    print(f"built {n_params/1e6:.1f}M-param UNet in {time.time()-t0:.1f}s",
          flush=True)

    x_np, y0_np = make_io_data()
    x = torch.from_numpy(x_np)
    y0 = torch.from_numpy(y0_np)

    # --- training-step pin (palette.py:110-140 math, noise injected) ---
    diffusion = DiffusionModel("linear", 2000, 1e-6, 0.01)
    rng = np.random.default_rng(NOISE_SEED)
    t_int = int(rng.integers(0, 2000))
    t = torch.full((B,), t_int, dtype=torch.long)
    noise_np = rng.standard_normal(y0_np.shape).astype(np.float32)
    u = rng.random((B,)).astype(np.float32)
    # inline palette.py:214-231 with the injected noise/uniform streams
    gamma_prev = diffusion.gammas_prev[t]
    gamma_cur = diffusion.gammas[t]
    gamma = (gamma_cur - gamma_prev) * torch.from_numpy(u) + gamma_prev
    noise = torch.from_numpy(noise_np) * (t > 0).view(-1, 1, 1, 1)
    y_t = torch.sqrt(gamma).view(-1, 1, 1, 1) * y0 + \
        torch.sqrt(1 - gamma).view(-1, 1, 1, 1) * noise

    # --- truncated reverse chain FIRST (palette.py:79-100 loop, first 10
    # of 100 steps, eval mode) — run BEFORE the training step so both
    # frameworks sample from the IDENTICAL ported init running stats (the
    # training forward's running-stat update carries the documented
    # biased-variance deviation, which would otherwise leak into the
    # chain comparison) ---
    diffusion_inf = DiffusionModel("cosine", TIMESTEPS)
    y_T = rng.standard_normal((B, 1, IMG, IMG)).astype(np.float32)
    step_noise = rng.standard_normal(
        (PREFIX_STEPS, B, 1, IMG, IMG)).astype(np.float32)
    unet.eval()
    chain = []
    with torch.no_grad():
        y_cur = torch.from_numpy(y_T)
        for j, i in enumerate(range(TIMESTEPS - 1, TIMESTEPS - 1 -
                                    PREFIX_STEPS, -1)):
            t0 = time.time()
            tt = torch.full((B,), i, dtype=torch.long)
            g = diffusion_inf.gammas[tt]
            model_output = unet(x, y_cur, g)
            mean, log_variance = diffusion_inf.p_mean_variance(
                model_output, y_cur, tt)
            n_j = torch.from_numpy(step_noise[j]) * \
                (tt > 1).view(-1, 1, 1, 1)
            y_cur = mean + torch.exp(0.5 * log_variance) * n_j
            chain.append(y_cur.numpy().astype(np.float32))
            print(f"chain step t={i} {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    unet.train()
    pred = unet(x, y_t, gamma.view(-1))
    loss = torch.nn.functional.mse_loss(pred, noise)
    print(f"train fwd {time.time()-t0:.1f}s loss={float(loss):.6f}",
          flush=True)
    t0 = time.time()
    loss.backward()
    print(f"bwd {time.time()-t0:.1f}s", flush=True)

    ELEM_KEYS = pick_elem_keys(list(unet.named_parameters()))
    grad_rms = {}
    gsq = 0.0
    elem = {}
    for name, p in unet.named_parameters():
        if p.grad is None:
            continue
        g = p.grad.detach().numpy().astype(np.float64)
        grad_rms[f"unet.{name}"] = float(np.sqrt(np.mean(g * g)))
        gsq += float(np.sum(g * g))
        if f"unet.{name}" in ELEM_KEYS:
            elem[f"unet.{name}"] = g.astype(np.float32)
    missing = [k for k in ELEM_KEYS if k not in elem]
    if missing:
        raise SystemExit(f"ELEM_KEYS not found in grads: {missing}")

    # post-forward BN running stats (the train forward updates them once)
    bn_stats = {}
    for name, buf in unet.named_buffers():
        if name.endswith("running_mean") or name.endswith("running_var"):
            a = buf.detach().numpy().astype(np.float64)
            bn_stats[f"unet.{name}"] = (float(a.mean()),
                                        float(np.sqrt(np.mean(a * a))))

    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    np.savez_compressed(
        os.path.join(outdir, "io.npz"),
        x=x_np, y0=y0_np, y_t=y_t.numpy(), gamma=gamma.numpy(),
        noise=noise.numpy(), t=np.int64(t_int),
        loss=np.float64(float(loss)),
        grad_global_norm=np.float64(np.sqrt(gsq)),
        grad_rms_keys=np.asarray(sorted(grad_rms)),
        grad_rms_vals=np.asarray([grad_rms[k] for k in sorted(grad_rms)]),
        bn_keys=np.asarray(sorted(bn_stats)),
        bn_vals=np.asarray([bn_stats[k] for k in sorted(bn_stats)]),
        y_T=y_T, step_noise=step_noise,
        chain=np.stack(chain),
        **{f"grad_elem__{k.replace('.', '_')}": v for k, v in elem.items()})
    print(f"wrote {outdir}: {n_params} params, loss {float(loss):.6f}, "
          f"chain[{PREFIX_STEPS}] range [{chain[-1].min():.4f}, "
          f"{chain[-1].max():.4f}]")


if __name__ == "__main__":
    main()
