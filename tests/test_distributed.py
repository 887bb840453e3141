"""REAL multi-process distributed execution (SURVEY §2.5).

Two worker processes (4 virtual CPU devices each) form one 8-device 'dp'
mesh via ``jax.distributed.initialize`` with a localhost coordinator and
run the production ``Trainer.fit()`` — per-host batch loading, Gloo-backed
cross-process gradient psum, rank-0 checkpointing, allgathered validation.
The resulting validation metrics must match a single-process 8-device run
of the identical config: the multi-host path changes the communication
topology, not the math.

This is executed evidence for ``pai_tpu/parallel/distributed.py`` — the
faked-process unit tests in test_data_pipeline.py pin the row-selection
logic; this test actually runs with ``jax.process_count() == 2``.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 2-process clusters with per-process jit compiles, multi-minute

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_dataset(workdir: str, n_train: int = 16, n_val: int = 6) -> None:
    from PIL import Image

    rng = np.random.default_rng(7)
    train, val = [], []
    for i in range(n_train + n_val):
        x = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        y = (255 - x.astype(np.int32)).astype(np.uint8)
        Image.fromarray(x).save(os.path.join(workdir, f"in_{i}.png"))
        Image.fromarray(y).save(os.path.join(workdir, f"gt_{i}.png"))
        row = f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n"
        (train if i < n_train else val).append(row)
    with open(os.path.join(workdir, "train.yaml"), "w") as f:
        f.write("".join(train))
    with open(os.path.join(workdir, "val.yaml"), "w") as f:
        f.write("".join(val))


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_two_workers(workdir: str, model: str = "pix2pix",
                     tp: int = 1, sp: int = 1, fsdp: bool = False) -> None:
    """Launch the 2-process cluster and wait for both workers.

    Worker stdout goes to FILES, not pipes: with pipes, sequentially
    draining worker 0 while worker 1 blocks on a full pipe buffer inside
    a collective worker 0 is waiting on would deadlock all three
    processes until the timeout."""
    port = _free_port()
    worker = os.path.join(REPO, "tests", "distributed_worker.py")
    logs = [open(os.path.join(workdir, f"worker_{pid}.log"), "w+")
            for pid in (0, 1)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), workdir, model,
             str(tp), str(sp), str(int(fsdp))],
            env=_clean_env(), cwd=REPO,
            stdout=log, stderr=subprocess.STDOUT, text=True)
        for pid, log in zip((0, 1), logs)
    ]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, log in zip(procs, logs):
        log.seek(0)
        out = log.read()
        log.close()
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"


def test_two_process_training_matches_single_process(tmp_path):
    workdir = str(tmp_path)
    _make_dataset(workdir)
    _run_two_workers(workdir, "pix2pix")

    with open(os.path.join(workdir, "summary_0.json")) as f:
        dist = json.load(f)["summary"]
    with open(os.path.join(workdir, "summary_1.json")) as f:
        dist1 = json.load(f)["summary"]
    # both processes computed the same replicated metrics
    assert dist["val_ssim"] == pytest.approx(dist1["val_ssim"], abs=1e-7)

    # rank-0-only IO: exactly one CSV logger version dir, ckpts written once
    log_base = os.path.join(workdir, "logs", "dist2p_pix2pix")
    assert os.listdir(log_base) == ["version_0"]
    assert os.path.isdir(os.path.join(workdir, "ckpts", "dist2p_pix2pix", "last"))

    # single-process 8-virtual-device run of the identical config
    single = subprocess.run(
        [sys.executable, "-c", f"""
import os, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from pai_tpu.train.loop import Trainer
hp = {{
    "name": "single8", "model": "pix2pix",
    "data": r"{workdir}/train.yaml", "val_data": r"{workdir}/val.yaml",
    "epochs": 2, "steps": -1, "batch_size": 8, "val_epochs": 2,
    "precision": "32", "ema": False, "channel_mults": "1,2",
    "attention_res": "8,4,2", "dropout": 0.0, "loss_type": "gan",
    "seed": 0, "log_dir": r"{workdir}/logs1p", "ckpt_dir": r"{workdir}/ck1p",
}}
print("SUMMARY=" + json.dumps(Trainer(hp, image_size=32).fit()))
"""],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True,
        timeout=900)
    assert single.returncode == 0, single.stdout[-4000:] + single.stderr[-4000:]
    line = [ln for ln in single.stdout.splitlines()
            if ln.startswith("SUMMARY=")][-1]
    ref = json.loads(line[len("SUMMARY="):])

    # same global batches, same seed, same mesh width — only the process
    # topology differs, so metrics agree to f32 reduction-order noise
    assert dist["val_ssim"] == pytest.approx(ref["val_ssim"], abs=5e-5)
    assert dist["val_psnr"] == pytest.approx(ref["val_psnr"], abs=5e-3)
    assert dist["val_rmse"] == pytest.approx(ref["val_rmse"], abs=5e-5)
    assert dist["steps"] == ref["steps"] == 4


def test_two_process_dp_tp_training_matches_single_process(tmp_path):
    """dp x tp over a REAL 2-process pod: with --tp 2 the mesh is
    ('dp'=4, 'tp'=2) laid out so the Megatron channel-sharding psums run
    as genuine cross-process collectives (each host owns 4 of the 8
    devices). Metrics must match the single-process 8-device run of the
    identical dp x tp config — topology, not math."""
    workdir = str(tmp_path)
    _make_dataset(workdir)
    _run_two_workers(workdir, "pix2pix", tp=2)

    with open(os.path.join(workdir, "summary_0.json")) as f:
        dist = json.load(f)["summary"]
    with open(os.path.join(workdir, "summary_1.json")) as f:
        dist1 = json.load(f)["summary"]
    assert dist["val_ssim"] == pytest.approx(dist1["val_ssim"], abs=1e-7)

    single = subprocess.run(
        [sys.executable, "-c", f"""
import os, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from pai_tpu.train.loop import Trainer
hp = {{
    "name": "single8tp2", "model": "pix2pix", "tp": 2,
    "data": r"{workdir}/train.yaml", "val_data": r"{workdir}/val.yaml",
    "epochs": 2, "steps": -1, "batch_size": 8, "val_epochs": 2,
    "precision": "32", "ema": False, "channel_mults": "1,2",
    "attention_res": "8,4,2", "dropout": 0.0, "loss_type": "gan",
    "seed": 0, "log_dir": r"{workdir}/logs1p", "ckpt_dir": r"{workdir}/ck1p",
}}
print("SUMMARY=" + json.dumps(Trainer(hp, image_size=32).fit()))
"""],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True,
        timeout=900)
    assert single.returncode == 0, single.stdout[-4000:] + single.stderr[-4000:]
    line = [ln for ln in single.stdout.splitlines()
            if ln.startswith("SUMMARY=")][-1]
    ref = json.loads(line[len("SUMMARY="):])

    assert dist["val_ssim"] == pytest.approx(ref["val_ssim"], abs=5e-5)
    assert dist["val_psnr"] == pytest.approx(ref["val_psnr"], abs=5e-3)
    assert dist["steps"] == ref["steps"] == 4


def test_two_process_ring_attention_matches_single_process(tmp_path):
    """--sp 2 over a REAL 2-process pod: the exact ring-attention
    ppermute ring crosses the process boundary (mesh ('dp'=4,'sp'=2),
    each host owning half the devices), exercised through the palette
    task whose diffusion-UNet attention is the sp dispatch target.
    Metrics must match the single-process 8-device sp=2 run."""
    workdir = str(tmp_path)
    _make_dataset(workdir)
    _run_two_workers(workdir, "palette", tp=1, sp=2)

    with open(os.path.join(workdir, "summary_0.json")) as f:
        dist = json.load(f)["summary"]
    with open(os.path.join(workdir, "summary_1.json")) as f:
        dist1 = json.load(f)["summary"]
    assert dist["val_ssim"] == pytest.approx(dist1["val_ssim"], abs=1e-7)

    single = subprocess.run(
        [sys.executable, "-c", f"""
import os, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from pai_tpu.train.loop import Trainer
hp = {{
    "name": "single8sp2", "model": "palette", "sp": 2,
    "data": r"{workdir}/train.yaml", "val_data": r"{workdir}/val.yaml",
    "epochs": 1, "steps": -1, "batch_size": 8, "val_epochs": 1,
    "precision": "32", "ema": False, "channel_mults": "1,2",
    "attention_res": "2", "dropout": 0.0, "loss_type": "mse",
    "schedule_type": "linear", "learn_variance": False,
    "seed": 0, "log_dir": r"{workdir}/logs1p", "ckpt_dir": r"{workdir}/ck1p",
}}
print("SUMMARY=" + json.dumps(Trainer(hp, image_size=32).fit()))
"""],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True,
        timeout=900)
    assert single.returncode == 0, single.stdout[-4000:] + single.stderr[-4000:]
    line = [ln for ln in single.stdout.splitlines()
            if ln.startswith("SUMMARY=")][-1]
    ref = json.loads(line[len("SUMMARY="):])

    assert dist["val_ssim"] == pytest.approx(ref["val_ssim"], abs=5e-5)
    assert dist["val_psnr"] == pytest.approx(ref["val_psnr"], abs=5e-3)


def test_two_process_fsdp_matches_single_process_and_resumes(tmp_path):
    """--fsdp over a REAL 2-process pod (VERDICT r3 item 1): params + Adam
    moments ZeRO-3 sharded over a 'dp' axis that spans the process
    boundary, orbax checkpoints written as genuinely multi-host SHARDED
    saves (each process writes its own shards — no single host ever
    materialises the full state), and a fresh Trainer --resume restores
    the sharded 'last' slot collectively and continues training (asserted
    inside the worker). Metrics must match the single-process 8-device
    fsdp run: ZeRO-3 changes array placement, not math."""
    workdir = str(tmp_path)
    _make_dataset(workdir)
    _run_two_workers(workdir, "pix2pix", fsdp=True)

    with open(os.path.join(workdir, "summary_0.json")) as f:
        dist = json.load(f)["summary"]
    with open(os.path.join(workdir, "summary_1.json")) as f:
        dist1 = json.load(f)["summary"]
    assert dist["val_ssim"] == pytest.approx(dist1["val_ssim"], abs=1e-7)

    # the worker's resume leg ran and continued past the first run
    for pid in (0, 1):
        with open(os.path.join(workdir, f"resume_{pid}.json")) as f:
            resumed = json.load(f)["summary"]
        assert resumed["steps"] > dist["steps"]

    single = subprocess.run(
        [sys.executable, "-c", f"""
import os, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from pai_tpu.train.loop import Trainer
hp = {{
    "name": "single8fsdp", "model": "pix2pix", "fsdp": True,
    "data": r"{workdir}/train.yaml", "val_data": r"{workdir}/val.yaml",
    "epochs": 2, "steps": -1, "batch_size": 8, "val_epochs": 2,
    "precision": "32", "ema": False, "channel_mults": "1,2",
    "attention_res": "8,4,2", "dropout": 0.0, "loss_type": "gan",
    "seed": 0, "log_dir": r"{workdir}/logs1p", "ckpt_dir": r"{workdir}/ck1p",
}}
print("SUMMARY=" + json.dumps(Trainer(hp, image_size=32).fit()))
"""],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True,
        timeout=900)
    assert single.returncode == 0, single.stdout[-4000:] + single.stderr[-4000:]
    line = [ln for ln in single.stdout.splitlines()
            if ln.startswith("SUMMARY=")][-1]
    ref = json.loads(line[len("SUMMARY="):])

    assert dist["val_ssim"] == pytest.approx(ref["val_ssim"], abs=5e-5)
    assert dist["val_psnr"] == pytest.approx(ref["val_psnr"], abs=5e-3)
    assert dist["steps"] == ref["steps"] == 4


def test_two_process_palette_sampling_validation(tmp_path):
    """Palette on a real 2-process pod: every process must join the
    sampling collectives in validate() (param selection is NOT rank-gated
    — regression for the GAN-branch crash), frame gathers run as real
    process_allgather, and only rank 0 writes the per-epoch sample PNGs
    (asserted inside the worker). Metrics are replicated across ranks."""
    import json

    workdir = str(tmp_path)
    _make_dataset(workdir)
    _run_two_workers(workdir, "palette")

    summaries = []
    for pid in (0, 1):
        with open(os.path.join(workdir, f"summary_{pid}.json")) as f:
            summaries.append(json.load(f)["summary"])
    assert summaries[0]["val_ssim"] == pytest.approx(
        summaries[1]["val_ssim"], abs=1e-7)
    # rank-0-only logger dir
    log_base = os.path.join(workdir, "logs", "dist2p_palette")
    assert os.listdir(log_base) == ["version_0"]
