"""Report CLI path tests: identity model and a trained-checkpoint round trip
(reference report.py behaviors: file outputs, per-image CSVs, stats)."""

import os

import numpy as np
import pytest

from pai_tpu.utils.images import write_png


@pytest.fixture()
def small_dataset(tmp_path):
    rng = np.random.default_rng(3)
    entries = []
    for i in range(5):
        x = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        y = (255 - x.astype(np.int32)).astype(np.uint8)
        write_png(x, str(tmp_path / f"in_{i}.png"))
        write_png(y, str(tmp_path / f"gt_{i}.png"))
        entries.append(f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n")
    data = tmp_path / "data.yaml"
    data.write_text("".join(entries))
    return str(data)


def test_identity_report(tmp_path, small_dataset, monkeypatch):
    import pai_tpu.reporting as reporting

    monkeypatch.setattr(reporting, "IMAGE_SIZE", 32)
    stats = reporting.run_report(
        "idrep", None, small_dataset, "identity", batch_size=2,
        reports_dir=str(tmp_path / "reports"))
    rdir = tmp_path / "reports" / "idrep"
    for fname in ("stats.txt", "depth_ssim.csv", "ssim_per_image.csv",
                  "psnr_per_image.csv", "mse_per_image.csv"):
        assert (rdir / fname).exists()
    assert len(os.listdir(rdir / "outputs")) == 5
    assert len(os.listdir(rdir / "ssim_images")) == 5
    # identity vs inverted target: metrics well-defined, ssim < 1
    assert -1.0 <= stats["ssim"] < 1.0
    assert stats["params"] == 0
    # per-image csv uses zero-padded indices (report.py:163-169)
    lines = (rdir / "ssim_per_image.csv").read_text().splitlines()
    assert lines[0] == "image,ssim"
    assert lines[1].startswith("00000,")
    # depth csv: 16 bands, H=32 -> 2-row bands; header + 16 rows
    depth_lines = (rdir / "depth_ssim.csv").read_text().splitlines()
    assert len(depth_lines) == 17


@pytest.mark.heavy
def test_palette_report_output_process(tmp_path, small_dataset, monkeypatch):
    """--output-process: a palette report additionally writes the
    reverse-diffusion capture (y_T + every (T//7)-th step,
    models/palette.py:79-100) to reports/<name>/process/.

    The inference schedule is shrunk to 20 steps to keep the CPU compile
    tractable; the T=100 capture-set math itself is pinned by
    tests/test_diffusion.py and the api output_process test."""
    import pai_tpu.reporting as reporting
    from pai_tpu.diffusion import make_schedule
    from pai_tpu.train.loop import fit
    from pai_tpu.reporting import run_report

    monkeypatch.setattr(reporting, "make_schedule",
                        lambda kind, n, *a: make_schedule(kind, 20))

    h = {
        "name": "palrep", "data": small_dataset, "val_data": None,
        "epochs": 1, "steps": 2, "batch_size": 4, "val_epochs": 10,
        "precision": "32", "ema": False, "channel_mults": "1,2",
        "attention_res": "2", "dropout": 0.0, "loss_type": "mse",
        "schedule_type": "linear", "learn_variance": False,
        "model": "palette", "seed": 0, "resume": False, "image_size": 32,
        "log_dir": str(tmp_path / "logs"), "ckpt_dir": str(tmp_path / "ck"),
    }
    fit(h)
    ckpt = str(tmp_path / "ck" / "palrep" / "last")
    stats = run_report("palrep", ckpt, small_dataset, "palette",
                       batch_size=5, reports_dir=str(tmp_path / "reports"),
                       output_process=True)
    assert np.isfinite(stats["ssim"])
    pdir = tmp_path / "reports" / "palrep" / "process"
    frames = sorted(os.listdir(pdir))
    # 5 images x 11 frames: y_T plus the steps of the 20-step chain where
    # t % (20 // 7) == 0 (t = 18, 16, ..., 2, 0) — the reference's capture
    # rule i % (T // 7) == 0 applied to this T (palette.py:83-95)
    assert len(frames) == 5 * 11, frames[:12]
    assert "00000_0.png" in frames and "00004_10.png" in frames

    with pytest.raises(ValueError):
        run_report("bad", None, small_dataset, "identity",
                   reports_dir=str(tmp_path / "reports"),
                   output_process=True)


@pytest.mark.heavy
def test_trained_checkpoint_report(tmp_path, small_dataset):
    """Train 1 epoch, then rebuild the model from the checkpoint alone and
    report (report.py:24-43 load_from_checkpoint semantics)."""
    from pai_tpu.train.loop import fit
    from pai_tpu.reporting import run_report

    h = {
        "name": "reprun", "data": small_dataset, "val_data": small_dataset,
        "epochs": 1, "steps": -1, "batch_size": 4, "val_epochs": 1,
        "precision": "32", "ema": True, "channel_mults": "1,2",
        "attention_res": "2", "dropout": 0.0, "loss_type": "mse",
        "schedule_type": "linear", "learn_variance": False,
        "model": "pix2pix", "seed": 0, "resume": False, "image_size": 32,
        "log_dir": str(tmp_path / "logs"), "ckpt_dir": str(tmp_path / "ck"),
    }
    fit(h)
    ckpt = str(tmp_path / "ck" / "reprun" / "best")
    stats = run_report("reprun", ckpt, small_dataset, "pix2pix",
                       batch_size=2, reports_dir=str(tmp_path / "reports"))
    assert stats["params"] > 0
    assert np.isfinite(stats["ssim"])
    content = (tmp_path / "reports" / "reprun" / "stats.txt").read_text()
    assert "Parameter count:" in content
