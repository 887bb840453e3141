"""pai_tpu side of the training-quality parity experiment.

Trains the production ``make_gan_train_step`` from the reference fixture's
deterministic-stream initial weights on the identical batch sequence, then
evaluates with the reference validation protocol (batch SSIM, whole-tensor
PSNR). Run in a CLEAN subprocess (tests/test_train_parity.py does this):
XLA's CPU reduction strategy depends on the virtual-device/thread
configuration, and at 200 optimizer steps that reduction-order noise is the
dominant term of any cross-framework f32 comparison — a fixed environment
makes the measurement reproducible.

Usage: python tools/pai_train_parity.py <gan|res18|attention> <fixture.npz>
Prints one JSON line: {"losses0": ..., "ssim": ..., "psnr": ...}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def run(config, fixture_path):
    from make_parity_fixture import deterministic_weights
    from parity_port import (
        port_attention,
        port_discriminator,
        port_pix2pix,
        port_res18,
    )
    from train_parity import BATCH, N_TRAIN, make_data

    from pai_tpu.models import Discriminator, build_generator
    from pai_tpu.train import steps as steps_lib
    from pai_tpu.train.state import GanTrainState, gan_optimizer
    from pai_tpu.utils import metrics as M
    from pai_tpu.utils.images import denormalize

    z = np.load(fixture_path)
    w = deterministic_weights(json.loads(str(z["manifest"])))
    steps = int(z["steps"])

    if config == "palette":
        return _run_palette(z, w)

    if config == "gan":
        gen = build_generator("pix2pix", channel_mults=(1, 2))
        gp, gs = port_pix2pix(w)
        disc, dparams, loss_type = Discriminator(), port_discriminator(w), \
            "gan"
    elif config == "res18":
        gen = build_generator("res18_unet", channel_mults=(1, 2))
        gp, gs = port_res18(w, prefix="unet")
        disc, dparams, loss_type = None, None, "mse"
    elif config == "attention":
        gen = build_generator("attention_unet", channel_mults=(1, 2))
        gp, gs = port_attention(w, prefix="unet")
        disc, dparams, loss_type = None, None, "ssim+psnr"
    elif config == "trans":
        # Weight port via the general checkpoint-importer name maps
        # (pai_tpu/interop) — 2-layer ViT matching the fixture's truncated
        # reference (see tools/train_parity.py _build_wrapper).
        from train_parity import IMG

        from pai_tpu.interop.torch_import import _materialize, _trans_key
        from pai_tpu.models.trans_unet import TransUnet

        gen = TransUnet(out_channels=1, image_size=IMG,
                        channel_mults=(1, 1), patch_size=4, vit_layers=2)
        abstract = jax.eval_shape(lambda: gen.init(
            jax.random.key(0), jnp.zeros((1, IMG, IMG, 1)), train=False))
        key_fn = lambda p: _trans_key(p, 2)  # noqa: E731
        gp = _materialize(abstract["params"], w, key_fn)
        gs = _materialize(abstract["batch_stats"], w, key_fn)
        disc, dparams, loss_type = None, None, "mse"
    else:
        raise ValueError(config)

    state = GanTrainState(
        step=jnp.zeros((), jnp.int32), g_params=gp, g_stats=gs,
        g_opt=gan_optimizer().init(gp), d_params=dparams,
        d_opt=gan_optimizer().init(dparams) if dparams is not None else None,
        ema=None)
    step_fn = jax.jit(steps_lib.make_gan_train_step(
        gen, disc, loss_type, compute_metrics=False))

    (tx, ty), (vx, vy) = make_data()
    tx, ty, vx, vy = (np.transpose(a, (0, 2, 3, 1)) for a in (tx, ty, vx, vy))
    n_batches = N_TRAIN // BATCH
    losses = []
    for s in range(steps):
        b = s % n_batches
        state, m = step_fn(state, jnp.asarray(tx[b * BATCH:(b + 1) * BATCH]),
                           jnp.asarray(ty[b * BATCH:(b + 1) * BATCH]),
                           jax.random.key(0))
        losses.append(float(m["loss"]))

    variables = {"params": state.g_params}
    if state.g_stats:
        variables["batch_stats"] = state.g_stats
    pred = gen.apply(variables, jnp.asarray(vx), train=False)
    dp, dt = denormalize(pred), denormalize(jnp.asarray(vy))
    return {"losses0": losses[0], "losses": losses,
            "ssim": float(M.ssim(dp, dt)),
            "psnr": float(M.psnr(dp, dt))}


def _run_palette(z, w):
    """Deterministic-replay palette head-to-head: identical weights,
    batches, t / q-noise / gamma-u draws, and sampling noise as the
    reference run recorded (models/palette.py:110-174)."""
    from parity_port import port_diffusion_unet
    from train_parity import (
        PAL_ATTN,
        PAL_BATCH,
        PAL_IMG,
        PAL_INNER,
        PAL_MULTS,
        PAL_N_TRAIN,
        PAL_N_VAL,
        make_data,
    )

    from pai_tpu.diffusion import ddpm_sample, make_schedule
    from pai_tpu.models.diffusion_unet import DiffusionUNet
    from pai_tpu.train import steps as steps_lib
    from pai_tpu.train.state import PaletteTrainState, palette_optimizer
    from pai_tpu.utils import metrics as M
    from pai_tpu.utils.images import denormalize

    steps = int(z["steps"])
    # Direct construction so the 256² tier's narrowed width (PAL_INNER)
    # matches the torch side; at the defaults this is exactly
    # build_generator("palette", channel_mults=(1, 2), attention_res=(2,)).
    gen = DiffusionUNet(in_channels=2, out_channels=1,
                        inner_channel=PAL_INNER, res_blocks=2,
                        channel_mults=PAL_MULTS, attn_res=PAL_ATTN,
                        num_heads=4)
    shapes = ((1, PAL_IMG, PAL_IMG, 1), (1, PAL_IMG, PAL_IMG, 1), (1,))
    params, stats = port_diffusion_unet(gen, w, shapes, prefix="unet")

    n_batches = PAL_N_TRAIN // PAL_BATCH
    state = PaletteTrainState(
        step=jnp.zeros((), jnp.int32), params=params, stats=stats,
        opt=palette_optimizer().init(params), ema=None)
    step_fn = jax.jit(steps_lib.make_palette_train_step(
        gen, make_schedule("linear", 2000, 1e-6, 0.01), False,
        warmup_steps_per_epoch=n_batches, external_rand=True))

    (tx, ty), (vx, vy) = make_data(PAL_IMG, PAL_N_TRAIN, PAL_N_VAL)
    tx, ty, vx, vy = (np.transpose(a, (0, 2, 3, 1)) for a in (tx, ty, vx, vy))
    nchw = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))  # noqa: E731
    losses = []
    for s in range(steps):
        b = s % n_batches
        rand = {"t": jnp.asarray(np.asarray(z["ts"][s]), jnp.int32),
                "noise": nchw(z["q_noise"][s]),
                "u": jnp.asarray(np.asarray(z["us"][s]).reshape(-1))}
        state, m = step_fn(state, jnp.asarray(tx[b * PAL_BATCH:(b + 1) * PAL_BATCH]),
                           jnp.asarray(ty[b * PAL_BATCH:(b + 1) * PAL_BATCH]),
                           rand)
        losses.append(float(m["loss"]))

    sched_inf = make_schedule("cosine", 100)
    variables = {"params": state.params}
    if state.stats:
        variables["batch_stats"] = state.stats

    def denoise(c, y_t, gamma):
        return gen.apply(variables, c, y_t, gamma, train=False)

    y_pred = ddpm_sample(
        sched_inf, denoise, jnp.asarray(vx), jax.random.key(0),
        learn_var=False, y_T=nchw(z["y_T"]),
        step_noise=jnp.asarray(np.transpose(z["samp_noise"],
                                            (0, 1, 3, 4, 2))))
    dp, dt = denormalize(y_pred), denormalize(jnp.asarray(vy))
    return {"losses0": losses[0], "losses": losses,
            "ssim": float(M.ssim(dp, dt)),
            "psnr": float(M.psnr(dp, dt))}


if __name__ == "__main__":
    print(json.dumps(run(sys.argv[1], sys.argv[2])))
