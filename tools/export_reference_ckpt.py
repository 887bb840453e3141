"""Convert a pai_tpu checkpoint into a reference-loadable Lightning .ckpt.

Usage:
    python tools/export_reference_ckpt.py checkpoints/myrun/best \
        -o myrun_best.ckpt

The inverse of tools/import_reference_ckpt.py: model weights, BatchNorm
running stats, the discriminator, and the palette diffusion buffers are
written in the reference's state_dict layout (models/wrapper.py:29-34,
models/palette.py:50,202-212) with hyper_parameters, so the PyTorch
reference's ``load_from_checkpoint`` (report.py:26-43) or a bare
``load_state_dict(strict=True)`` consumes it. When the pai_tpu run used
EMA, the EMA weights are exported (they are what the reference's
validation/checkpoint-selection sees, callbacks/ema.py:35-52)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoint",
                        help="pai_tpu checkpoint slot (.../best or .../last)")
    parser.add_argument("-o", "--output", required=True,
                        help="Output .ckpt path")
    args = parser.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from pai_tpu.interop.torch_import import export_lightning_checkpoint
    from pai_tpu.restore import rebuild_eval_model
    from pai_tpu.utils.checkpoint import load_checkpoint

    state_dict, meta = load_checkpoint(args.checkpoint)
    h = meta["hparams"]
    _, params, stats, _ = rebuild_eval_model(state_dict, h)

    d_params = None
    gan_state = state_dict.get("d_params")
    if h.get("loss_type") == "gan" and gan_state:
        d_params = gan_state

    export_lightning_checkpoint(
        args.output, h["model"], params, stats, h, d_params=d_params,
        epoch=meta.get("epoch", 0), step=meta.get("step", 0))
    print(f"[pai_tpu] exported {args.checkpoint} -> {args.output} "
          f"(model={h['model']}, ema={bool(h.get('ema'))})")


if __name__ == "__main__":
    main()
