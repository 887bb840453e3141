"""Evaluation / report generation (capability parity with reference
``report.py``).

Given a checkpoint and a data manifest, produces under ``reports/<name>/``:
* ``stats.txt`` — mean SSIM (over per-image values), mean PSNR, whole-set
  RMSE, FLOPs, parameter count (``report.py:143-161``);
* ``depth_ssim.csv`` — mean/std SSIM over 16 vertical depth bands
  (``report.py:103-115``, ``report.py:188-217``);
* ``outputs/*.png`` — predictions colormapped with matplotlib afmhot
  (``report.py:117-126``, ``report.py:220-233``);
* ``ssim_images/*.png`` — full-resolution SSIM maps (``report.py:128-141``);
* ``ssim_per_image.csv`` / ``psnr_per_image.csv`` / ``mse_per_image.csv``
  (``report.py:163-185``).

The model is rebuilt purely from the hyperparameters embedded in the
checkpoint (``report.py:26-43`` + Lightning save_hyperparameters), and the
``identity`` passthrough model is supported without a checkpoint
(``report.py:45-46``).

TPU-first differences: predictions and targets stream through one jitted
eval step per batch (the reference iterates the dataloader twice and decodes
every PNG twice, SURVEY §5.1 quirk 9); metrics are computed on device.
FLOPs use XLA's cost analysis on the real (1, 256, 256, C) forward — the
reference probes fvcore with a hardcoded 3-channel input regardless of the
model (quirk 4).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pai_tpu.data import BatchLoader, ImageDataset
from pai_tpu.diffusion import make_schedule
from pai_tpu.utils import metrics
from pai_tpu.utils.checkpoint import load_checkpoint
from pai_tpu.utils.flops import count_flops, parameter_count
from pai_tpu.utils.images import afmhot_rgb, denormalize, to_int_np, write_png

IMAGE_SIZE = 256


def _rebuild_from_checkpoint(model_name: str, ckpt_path: str):
    """Reconstruct the eval-mode model + parameters from a checkpoint alone
    (shared logic in pai_tpu.restore)."""
    from pai_tpu.restore import rebuild_eval_model

    state_dict, meta = load_checkpoint(ckpt_path)
    h = dict(meta["hparams"], model=model_name)
    generator, params, stats, image_size = rebuild_eval_model(state_dict, h)
    return generator, params, stats, h, h.get("learn_variance",
                                              False), image_size


def run_report(name: str, checkpoint: Optional[str], data: str,
               model_name: str, batch_size: int = 2,
               reports_dir: str = "reports",
               output_process: bool = False) -> Dict[str, float]:
    """``output_process=True`` (palette only) additionally writes the
    reverse-diffusion process — y_T plus every (timesteps // 7)-th frame,
    the reference's ``forward(output_process=True)`` capture
    (models/palette.py:79-100) — to ``reports/<name>/process/``."""
    if output_process and model_name != "palette":
        raise ValueError("--output-process is only supported by palette")
    image_size = IMAGE_SIZE
    learn_var = False
    generator = params = stats = None
    if model_name == "identity":
        pass  # passthrough (report.py:45-46)
    else:
        generator, params, stats, hparams, learn_var, image_size = \
            _rebuild_from_checkpoint(model_name, checkpoint)

    dataset = ImageDataset(data, image_size)
    loader = BatchLoader(dataset, batch_size, shuffle=False, pad_mode="zero")

    # params/stats are explicit jit arguments — closing over them would bake
    # multi-GB weight constants into the lowered program (observed 4.11 GB
    # for the 1B-param trans_unet).
    if model_name == "identity":
        def predict(x, rng):
            return x
    elif model_name == "palette":
        sched_inf = make_schedule("cosine", 100)
        from pai_tpu.diffusion import ddpm_sample

        capture = sched_inf.timesteps // 7 if output_process else None

        @jax.jit
        def _predict(params_, stats_, x, rng):
            def denoise(c, y_t, gamma):
                variables = {"params": params_}
                if stats_:
                    variables["batch_stats"] = stats_
                return generator.apply(variables, c, y_t, gamma, train=False)

            return ddpm_sample(sched_inf, denoise, x, rng, learn_var,
                               capture_every=capture)

        if output_process:
            def predict(x, rng):
                y_0, frames = _predict(params, stats, x, rng)
                return y_0, frames
        else:
            def predict(x, rng):
                return _predict(params, stats, x, rng)
    else:
        @jax.jit
        def _predict(params_, stats_, x):
            variables = {"params": params_}
            if stats_:
                variables["batch_stats"] = stats_
            return generator.apply(variables, x, train=False)

        def predict(x, rng):
            return _predict(params, stats, x)

    report_dir = os.path.join(reports_dir, name)
    outputs_dir = os.path.join(report_dir, "outputs")
    maps_dir = os.path.join(report_dir, "ssim_images")
    process_dir = os.path.join(report_dir, "process")
    for d in (report_dir, outputs_dir, maps_dir) + (
            (process_dir,) if output_process else ()):
        os.makedirs(d, exist_ok=True)

    # One decode pass, fully streaming (the reference decodes the dataset
    # twice, quirk 9, and holds every prediction in RAM): each batch is
    # predicted, measured and written out before the next arrives — host
    # memory stays O(batch), not O(dataset) (at 10k+ images the SSIM maps
    # alone would be ~2.6 GB).
    @jax.jit
    def chunk_metrics(p, t):
        per_image, full = metrics.ssim_parts(p, t)
        return (per_image, full, metrics.psnr_per_image(p, t),
                metrics.mse_per_image(p, t),
                metrics.depth_ssim_per_image(p, t))

    ssims, psnrs, mses, bands = [], [], [], []
    index = 0
    rng = jax.random.key(0)
    for batch in loader:
        rng, sub = jax.random.split(rng)
        pred = predict(jnp.asarray(batch.x), sub)
        process = None
        if output_process:
            pred, process = pred
        p = denormalize(pred)
        t = denormalize(jnp.asarray(batch.y))
        per_image, full, per_psnr, per_mse, per_band = chunk_metrics(p, t)
        nv = batch.n_valid
        ssims.append(np.asarray(per_image)[:nv])
        psnrs.append(np.asarray(per_psnr)[:nv])
        mses.append(np.asarray(per_mse)[:nv])
        bands.append(np.asarray(per_band)[:nv])
        p_np = np.asarray(p)[:nv]
        if process is not None:
            proc_np = np.asarray(denormalize(process))[:nv]  # (n, F, H, W, C)
        for i, (img, m) in enumerate(zip(p_np, np.asarray(full)[:nv])):
            write_png(to_int_np(afmhot_rgb(img[..., 0])),
                      os.path.join(outputs_dir,
                                   f"{str(index).zfill(5)}.png"))
            write_png(to_int_np(np.clip(m, 0.0, 1.0)),
                      os.path.join(maps_dir, f"{str(index).zfill(5)}.png"))
            if process is not None:
                for k, frame in enumerate(proc_np[i]):
                    write_png(
                        to_int_np(afmhot_rgb(frame[..., 0])),
                        os.path.join(
                            process_dir,
                            f"{str(index).zfill(5)}_{k}.png"))
            index += 1
    ssims = np.concatenate(ssims)
    psnrs = np.concatenate(psnrs)
    mses = np.concatenate(mses)
    bands = np.concatenate(bands)  # (N, num_depths)

    # SSIM over depth (16 vertical bands): mean/std over images per band.
    with open(os.path.join(report_dir, "depth_ssim.csv"), "w") as f:
        f.write("depth,mean,std\n")
        for d in range(bands.shape[1]):
            mean = float(bands[:, d].mean())
            std = float(bands[:, d].std(ddof=1)) if bands.shape[0] > 1 \
                else 0.0
            f.write(f"{d + 1},{mean},{std}\n")

    # Whole-set stats (report.py:143-161). All images share one resolution
    # (256² resize), so sqrt(mean(per-image MSEs)) IS the whole-set RMSE —
    # no second pass over pixels.
    ssim_stat = float(ssims.mean())
    psnr_stat = float(psnrs.mean())
    rmse_stat = float(np.sqrt(mses.mean()))

    flops = 0
    n_params = 0
    if model_name != "identity":
        n_params = parameter_count(params)
        probe = jnp.zeros((1, image_size, image_size, 1), jnp.float32)

        def _vars(p, s):
            return {"params": p, **({"batch_stats": s} if s else {})}

        if model_name == "palette":
            gam = jnp.ones((1,), jnp.float32)
            flops = count_flops(
                lambda p, s, a, b, g: generator.apply(
                    _vars(p, s), a, b, g, train=False),
                params, stats, probe, probe, gam)
        else:
            flops = count_flops(
                lambda p, s, a: generator.apply(_vars(p, s), a, train=False),
                params, stats, probe)

    with open(os.path.join(report_dir, "stats.txt"), "w") as f:
        f.write(f"SSIM: {ssim_stat}\n")
        f.write(f"PSNR: {psnr_stat}\n")
        f.write(f"RMSE: {rmse_stat}\n")
        f.write(f"FLOPs: {flops}\n")
        f.write(f"Parameter count: {n_params}\n")

    for metric_name, values in (("ssim", ssims), ("psnr", psnrs),
                                ("mse", mses)):
        with open(os.path.join(report_dir, f"{metric_name}_per_image.csv"),
                  "w") as f:
            f.write(f"image,{metric_name}\n")
            for index, v in enumerate(values):
                f.write(f"{str(index).zfill(5)},{v}\n")

    return {"ssim": ssim_stat, "psnr": psnr_stat, "rmse": rmse_stat,
            "flops": flops, "params": n_params}
