"""Report CLI — verbatim flag surface of the reference ``report.py:236-268``.

Usage:
    python report.py <name> -c checkpoints/<run>/best -d data.yaml -m pix2pix

Loads the checkpoint (model rebuilt from its embedded hyperparameters), runs
prediction over the whole dataset, and writes per-image SSIM/PSNR/MSE, mean
stats + RMSE, SSIM-over-depth, FLOPs, parameter count, afmhot output PNGs and
SSIM-map PNGs under ``reports/<name>/``. ``-m identity`` evaluates the data
against itself without a checkpoint.
"""

import pathlib
from argparse import ArgumentParser


def main(hparams):
    from pai_tpu.reporting import run_report

    stats = run_report(
        hparams.name,
        str(hparams.checkpoint) if hparams.checkpoint else None,
        str(hparams.data),
        hparams.model,
        batch_size=hparams.batch_size,
        output_process=hparams.output_process,
    )
    print(f"[pai_tpu] report written to reports/{hparams.name}: {stats}")


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("name")
    parser.add_argument(
        "-c",
        "--checkpoint",
        type=pathlib.Path,
        help="Path to checkpoint",
    )
    parser.add_argument(
        "-d",
        "--data",
        type=pathlib.Path,
        help="YAML file of all data points",
    )
    parser.add_argument("-bs", "--batch-size", default=2, type=int)
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
            "identity",
        ],
    )
    # pai_tpu extension (palette only): also write the 8-frame
    # reverse-diffusion process (y_T + every (T//7)-th step, the
    # reference's forward(output_process=True), models/palette.py:79-100)
    # to reports/<name>/process/.
    parser.add_argument("--output-process", default=False,
                        action="store_true")
    args = parser.parse_args()

    main(args)
