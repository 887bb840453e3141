"""Train CLI — verbatim flag surface of the reference ``main.py:139-231``.

Usage:
    python main.py <name> -d train.yaml -vd val.yaml -m pix2pix --loss-type gan

Model names, defaults and flag spellings match the reference exactly; the
implementation underneath is the TPU-native pai_tpu engine (jitted SPMD train
step over the device mesh, Orbax best-val-SSIM checkpoints, CSV logs).
Extensions beyond the reference surface: --seed, --resume, --log-dir,
--ckpt-dir.
"""

import argparse
import pathlib
from argparse import ArgumentParser


def main(hparams):
    from pai_tpu.train.loop import fit

    summary = fit(vars(hparams))
    print(f"[pai_tpu] done: {summary}")


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("name")
    parser.add_argument(
        "-d",
        "--data",
        type=pathlib.Path,
        help="""
            YAML file containing filenames of images that make up the training
            data.
        """,
    )
    parser.add_argument(
        "-vd",
        "--val-data",
        type=pathlib.Path,
        help="""
            YAML file containing filenames of images that make up the
            validation data.
        """,
    )
    parser.add_argument("-e", "--epochs", default=200, type=int)
    parser.add_argument("-s", "--steps", default=-1, type=int)
    parser.add_argument("--batch-size", default=8, type=int)
    parser.add_argument(
        "--val-epochs",
        default=10,
        help="Validation run every n epochs.",
        type=int,
    )
    parser.add_argument(
        "--precision",
        default="32",
        help="Floating-point precision",
    )
    parser.add_argument(
        "--ema",
        default=False,
        action=argparse.BooleanOptionalAction,
        help="Whether to use EMA weight updating.",
    )
    parser.add_argument(
        "--channel-mults",
        default="1,2,4,8,8,8,8,8",
        help="""
            Defines the U-net architecture's depth and width. Should be
            comma-separated powers of 2.
        """,
    )
    parser.add_argument(
        "--attention-res",
        default="8,4,2",
        help="""
            At what downsample multiples attention should be used, if the model
            supports it. Should be comma-separated powers of 2.
        """,
    )
    parser.add_argument(
        "--dropout",
        default=0.0,
        type=float,
    )
    parser.add_argument(
        "--loss-type",
        default="gan",
        choices=["gan", "ssim", "psnr", "ssim+psnr", "mse"],
    )
    parser.add_argument(
        "--schedule-type",
        default="linear",
        choices=["linear", "cosine"],
    )
    parser.add_argument(
        "--learn-variance",
        default=False,
        action=argparse.BooleanOptionalAction,
    )
    parser.add_argument(
        "-m",
        "--model",
        default="pix2pix",
        choices=[
            "pix2pix",
            "attention_unet",
            "res18_unet",
            "res50_unet",
            "resv2_unet",
            "resnext_unet",
            "trans_unet",
            "palette",
        ],
    )
    # pai_tpu extensions
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--resume", default=False,
                        action=argparse.BooleanOptionalAction,
                        help="Resume from the last checkpoint of this run.")
    parser.add_argument("--log-dir", default="logs")
    parser.add_argument("--ckpt-dir", default="checkpoints")
    parser.add_argument("--profile-dir", default=None,
                        help="Write a JAX profiler trace of the first "
                             "training steps to this directory.")
    parser.add_argument("--tp", default=1, type=int,
                        help="Tensor-parallel degree (Megatron channel "
                             "sharding over the mesh 'tp' axis).")
    parser.add_argument("--scan-steps", default=1, type=int,
                        help="Fold this many optimizer steps into one "
                             "compiled lax.scan dispatch (must divide the "
                             "10-step log cadence).")
    parser.add_argument("--sp", default=1, type=int,
                        help="Sequence-parallel degree: diffusion-UNet "
                             "attention tokens sharded over the mesh 'sp' "
                             "axis (exact ring attention).")
    parser.add_argument("--fsdp", default=False,
                        action=argparse.BooleanOptionalAction,
                        help="Shard parameters and optimizer state over the "
                             "mesh 'dp' axis (ZeRO-3 via GSPMD) — fits the "
                             "1B-param TransUNet's Adam state across chips.")
    parser.add_argument("--warmup-unit", default="epoch",
                        choices=("epoch", "step"),
                        help="Palette LinearLR warmup unit: 'epoch' matches "
                             "the reference (Lightning steps the scheduler "
                             "per epoch); 'step' warms up per optimizer "
                             "step.")
    args = parser.parse_args()

    main(args)
