"""Convert a reference PyTorch Lightning ``.ckpt`` into a pai_tpu checkpoint.

Usage:
    python tools/import_reference_ckpt.py path/to/best.ckpt -m pix2pix \
        -o checkpoints --name myrun [--slot best]

The result is ``checkpoints/<name>/<slot>/`` (Orbax state + meta.yaml) that
``report.py`` can evaluate and ``main.py --resume`` can continue training
from.  Model weights, BatchNorm running statistics, the PatchGAN
discriminator, and torch_ema EMA shadow weights (when present in the
checkpoint) are imported; Adam moments start fresh (the reference's eval
path never reads them and resumed training re-warms them within a few
steps).

Reference checkpoint anatomy: ``state_dict`` with ``unet.`` /
``discriminator.`` prefixes (models/wrapper.py:29-34, models/palette.py:50),
``hyper_parameters`` from save_hyperparameters() (pix2pix.py:43 etc.),
``epoch`` / ``global_step``, and optionally the EMA callback payload
(callbacks/ema.py:54-62).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoint", help="Reference Lightning .ckpt file")
    parser.add_argument("-m", "--model", required=True,
                        help="Model name (pix2pix, attention_unet, "
                             "res18_unet, res50_unet, resv2_unet, "
                             "resnext_unet, trans_unet, palette)")
    parser.add_argument("-o", "--ckpt-dir", default="checkpoints")
    parser.add_argument("--name", required=True,
                        help="Run name (output goes to <ckpt-dir>/<name>/)")
    parser.add_argument("--slot", default="last", choices=("last", "best"),
                        help="Checkpoint slot to write (default: last, "
                             "which --resume reads)")
    parser.add_argument("--image-size", default=256, type=int)
    args = parser.parse_args()

    import jax

    # A registered TPU plugin can override the JAX_PLATFORMS env var;
    # honor it explicitly so e.g. JAX_PLATFORMS=cpu imports host-side.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from flax import serialization

    from pai_tpu.interop import import_lightning_checkpoint
    from pai_tpu.restore import build_generator_from_hparams
    from pai_tpu.train import steps as steps_lib
    from pai_tpu.train.ema import EmaState
    from pai_tpu.utils.checkpoint import CheckpointManager
    from pai_tpu.models import Discriminator

    (params, stats, d_params, ema_params), hparams, src_meta = \
        import_lightning_checkpoint(
            args.checkpoint, args.model,
            hparams_override={"image_size": args.image_size})

    # Build a full train state (fresh optimizer) and graft the weights in.
    import jax.numpy as jnp

    generator = build_generator_from_hparams(hparams, args.image_size)
    in_ch = hparams["in_channels"]
    batch_shape = (1, args.image_size, args.image_size, in_ch)
    rng = jax.random.key(0)
    step = jnp.asarray(src_meta["step"], jnp.int32)
    ema_n = jnp.asarray(src_meta.get("ema_num_updates", 0), jnp.int32)
    if args.model == "palette":
        state = steps_lib.init_palette_state(
            generator, rng, batch_shape, hparams["ema"])
        state = state.replace(params=params, stats=stats, step=step)
        if ema_params is not None:
            state = state.replace(ema=EmaState(
                params=ema_params, num_updates=ema_n))
    else:
        disc = Discriminator() if d_params is not None else None
        if d_params is None and hparams.get("loss_type") == "gan":
            # a gan checkpoint without discriminator tensors cannot resume
            # the two-optimizer step; keep meta consistent with the state
            hparams["loss_type"] = "mse"
        loss_type = hparams["loss_type"] if d_params is not None else "mse"
        state = steps_lib.init_gan_state(
            generator, disc, rng, batch_shape, loss_type, hparams["ema"])
        state = state.replace(g_params=params, g_stats=stats, step=step)
        if d_params is not None:
            state = state.replace(d_params=d_params)
        if ema_params is not None:
            state = state.replace(ema=EmaState(
                params=ema_params, num_updates=ema_n))

    ckpt = CheckpointManager(args.ckpt_dir, args.name)
    state_dict = serialization.to_state_dict(state)
    if args.slot == "best":
        ckpt._save("best", state_dict, {
            "hparams": hparams, "step": src_meta["step"],
            "epoch": src_meta["epoch"], "monitor_value": None})
    else:
        ckpt.save_last(state_dict, hparams, src_meta["step"],
                       src_meta["epoch"])
    print(f"[pai_tpu] imported {args.checkpoint} -> "
          f"{os.path.join(args.ckpt_dir, args.name, args.slot)} "
          f"(model={args.model}, ema={hparams['ema']}, "
          f"epoch={src_meta['epoch']}, step={src_meta['step']})")


if __name__ == "__main__":
    main()
