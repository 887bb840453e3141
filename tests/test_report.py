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
