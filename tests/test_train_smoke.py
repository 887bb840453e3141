"""End-to-end training smoke tests on a tiny synthetic dataset (SURVEY §4):
loss decreases, metrics are logged, the best checkpoint appears, and resume
works. Runs on the 8-device CPU mesh, exercising the full SPMD path."""

import csv
import os

import numpy as np
import pytest

from pai_tpu.utils.images import write_png


@pytest.fixture()
def synthetic_manifest(tmp_path):
    """16 paired 32x32 PNGs where target = blurred input (learnable map)."""
    rng = np.random.default_rng(0)
    entries = []
    for i in range(16):
        x = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        # target: smooth function of input
        y = (255 - x.astype(np.int32)).astype(np.uint8)
        write_png(x, str(tmp_path / f"in_{i}.png"))
        write_png(y, str(tmp_path / f"gt_{i}.png"))
        entries.append(f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n")
    train = tmp_path / "train.yaml"
    train.write_text("".join(entries[:12]))
    val = tmp_path / "val.yaml"
    val.write_text("".join(entries[12:]))
    return str(train), str(val)


def _hparams(tmp_path, train, val, **kw):
    h = {
        "name": "smoke",
        "data": train,
        "val_data": val,
        "epochs": 2,
        "steps": -1,
        "batch_size": 4,
        "val_epochs": 1,
        "precision": "32",
        "ema": False,
        "channel_mults": "1,2",
        "attention_res": "2",
        "dropout": 0.0,
        "loss_type": "mse",
        "schedule_type": "linear",
        "learn_variance": False,
        "model": "pix2pix",
        "seed": 0,
        "resume": False,
        "image_size": 32,
        "log_dir": str(tmp_path / "logs"),
        "ckpt_dir": str(tmp_path / "ckpts"),
    }
    h.update(kw)
    return h


def _read_metrics(log_root):
    version = sorted(os.listdir(os.path.join(log_root, "smoke")))[0]
    path = os.path.join(log_root, "smoke", version, "metrics.csv")
    with open(path) as f:
        return list(csv.DictReader(f))


@pytest.mark.heavy
def test_pix2pix_mse_end_to_end(tmp_path, synthetic_manifest):
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    h = _hparams(tmp_path, train, val, epochs=4)
    summary = fit(h)
    assert summary["steps"] == 12  # 3 batches * 4 epochs
    assert "val_ssim" in summary

    # best + last checkpoints exist
    assert os.path.isdir(tmp_path / "ckpts" / "smoke" / "best")
    assert os.path.isdir(tmp_path / "ckpts" / "smoke" / "last")

    rows = _read_metrics(h["log_dir"])
    assert any("loss" in r and r["loss"] for r in rows)
    assert any(r.get("val_ssim") for r in rows)


@pytest.mark.heavy
def test_pix2pix_gan_two_optimizer_step(tmp_path, synthetic_manifest):
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    h = _hparams(tmp_path, train, val, loss_type="gan", epochs=4, steps=10)
    summary = fit(h)
    assert summary["steps"] == 10
    rows = _read_metrics(h["log_dir"])
    # d_loss logged alongside generator loss (wrapper.py:132)
    assert any(r.get("d_loss") for r in rows)


@pytest.mark.heavy
def test_ema_and_resume(tmp_path, synthetic_manifest):
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    h = _hparams(tmp_path, train, val, ema=True, epochs=1)
    s1 = fit(h)
    h2 = dict(h, resume=True, epochs=2)
    s2 = fit(h2)
    assert s2["steps"] > s1["steps"]


@pytest.mark.heavy
def test_palette_end_to_end(tmp_path, synthetic_manifest):
    """Diffusion training + scan-sampled validation + output PNGs
    (palette.py:110-174)."""
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    h = _hparams(tmp_path, train, val, model="palette", epochs=1,
                 channel_mults="1,2", attention_res="2", val_epochs=1)
    summary = fit(h)
    assert summary["steps"] == 3
    assert "val_ssim" in summary
    # sampled validation outputs written under log_dir/<epoch+1>/
    version = sorted(os.listdir(os.path.join(h["log_dir"], "smoke")))[0]
    epoch_dir = os.path.join(h["log_dir"], "smoke", version, "1")
    assert os.path.isdir(epoch_dir)
    assert len(os.listdir(epoch_dir)) == 4  # 4 val images
    rows = _read_metrics(h["log_dir"])
    assert any(r.get("val_ssim") for r in rows)


@pytest.mark.heavy
def test_palette_resume(tmp_path, synthetic_manifest):
    """Palette checkpoint/resume round trip (no sampling: val_epochs high)."""
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    h = _hparams(tmp_path, train, val, model="palette", epochs=1,
                 val_epochs=99, ema=True)
    s1 = fit(h)
    s2 = fit(dict(h, resume=True, epochs=2))
    assert s2["steps"] == 2 * s1["steps"]


@pytest.mark.heavy
def test_bf16_precision_policy(tmp_path, synthetic_manifest):
    """--precision bf16: bfloat16 compute, float32 params/metrics."""
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    h = _hparams(tmp_path, train, val, precision="bf16", epochs=1,
                 val_epochs=1)
    summary = fit(h)
    assert np.isfinite(summary["val_ssim"])


@pytest.mark.heavy
def test_loss_decreases(tmp_path, synthetic_manifest):
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    h = _hparams(tmp_path, train, val, epochs=10, val_epochs=10)
    fit(h)
    rows = _read_metrics(h["log_dir"])
    losses = [float(r["loss"]) for r in rows if r.get("loss")]
    assert len(losses) >= 2
    assert losses[-1] < losses[0]


def test_palette_warmup_unit_epoch():
    """Per-epoch LinearLR warmup (reference parity: Lightning steps the
    scheduler once per epoch, models/palette.py:102-108): the effective lr
    is constant within an epoch and steps up between epochs; per-step mode
    advances every optimizer step."""
    import jax
    import jax.numpy as jnp
    import optax
    from pai_tpu.train.state import palette_optimizer

    def update_mags(tx, n):
        params = {"w": jnp.ones(())}
        grads = {"w": jnp.ones(())}  # constant grads: |update_k| ~ lr(k)
        opt = tx.init(params)
        mags = []
        for _ in range(n):
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            mags.append(abs(float(updates["w"])))
        return mags

    per_epoch = update_mags(
        palette_optimizer(warmup_iters=10, steps_per_epoch=2), 4)
    assert per_epoch[0] == pytest.approx(per_epoch[1], rel=1e-4)
    assert per_epoch[2] == pytest.approx(per_epoch[3], rel=1e-4)
    assert per_epoch[2] > per_epoch[0]
    # epoch 0 trains at the 1/3 start factor of lr=1e-4
    assert per_epoch[0] == pytest.approx(1e-4 / 3.0, rel=1e-3)

    per_step = update_mags(palette_optimizer(warmup_iters=10), 3)
    assert per_step[0] < per_step[1] < per_step[2]


@pytest.mark.heavy
def test_scan_steps_matches_single_steps(tmp_path, synthetic_manifest,
                                         monkeypatch):
    """--scan-steps K folds K steps into one lax.scan dispatch; the math is
    identical (same rng folding by state.step, same batch order), so the
    final validation metrics must match plain stepping to float precision,
    with the same total step count."""
    from pai_tpu.train import steps as steps_lib
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    # 12 train images / batch 2 = 6 steps per epoch; 5 epochs = 30 steps.
    base = fit(_hparams(tmp_path, train, val, name="plain", epochs=5,
                        batch_size=2, val_epochs=5))

    scans_traced = []
    orig = steps_lib.make_gan_train_scan

    def spy(*a, **k):
        fn = orig(*a, **k)

        def wrapped(*args):
            scans_traced.append(1)  # records the (one-time) jit trace
            return fn(*args)

        return wrapped

    monkeypatch.setattr(steps_lib, "make_gan_train_scan", spy)
    scanned = fit(_hparams(tmp_path, train, val, name="scanned", epochs=5,
                           batch_size=2, val_epochs=5, scan_steps=5))
    assert scans_traced, "the lax.scan fast path never executed"
    assert scanned["steps"] == base["steps"] == 30
    assert scanned["val_ssim"] == pytest.approx(base["val_ssim"], abs=2e-5)
    assert scanned["val_psnr"] == pytest.approx(base["val_psnr"], rel=1e-4)


def test_scan_steps_must_divide_cadence(tmp_path, synthetic_manifest):
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    with pytest.raises(ValueError, match="scan-steps"):
        fit(_hparams(tmp_path, train, val, name="bad", scan_steps=3))


def test_gan_step_batch_stats_match_reference_double_forward():
    """The GAN step applies the reference's TWO BatchNorm running-stat EMA
    updates per step (wrapper.py:126 + wrapper.py:147 both forward the
    generator) in closed form from ONE forward (steps.py). The closed form
    s2 = 1.9*s1 - 0.9*s0 must equal the literal sequential double update —
    exact because both forwards normalise with the same batch statistics."""
    import jax
    import jax.numpy as jnp

    from pai_tpu.models import Discriminator, build_generator
    from pai_tpu.train import steps as steps_lib

    gen = build_generator("pix2pix", channel_mults=(1, 2))
    disc = Discriminator()
    state = steps_lib.init_gan_state(
        gen, disc, jax.random.key(0), (4, 32, 32, 1), "gan", False)
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (4, 32, 32, 1), jnp.float32)
    y = jax.random.normal(ky, (4, 32, 32, 1), jnp.float32)

    step = jax.jit(steps_lib.make_gan_train_step(
        gen, disc, "gan", compute_metrics=False))
    new_state, _ = step(state, x, y, jax.random.key(2))

    # Literal reference semantics: two sequential mutable-stat forwards.
    rng_dropout = jax.random.fold_in(jax.random.key(2), state.step)
    stats = state.g_stats
    for _ in range(2):
        _, mutated = gen.apply(
            {"params": state.g_params, "batch_stats": stats},
            x, train=True, rngs={"dropout": rng_dropout},
            mutable=["batch_stats"])
        stats = mutated["batch_stats"]

    leaves_closed = jax.tree.leaves(new_state.g_stats)
    leaves_literal = jax.tree.leaves(stats)
    assert leaves_closed and len(leaves_closed) == len(leaves_literal)
    for a, b in zip(leaves_closed, leaves_literal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.heavy
def test_gan_step_dropout_exact_double_forward():
    """With active dropout the closed-form single-forward composition is
    wrong (the reference's two forwards — wrapper.py:126 and wrapper.py:147
    — draw independent Dropout2d masks, pix2pix.py:107), so the step must
    take the literal exact path: fwd#1 (own mask, stats s0->s1) feeds the
    D phase, fwd#2 (fresh mask, stats s1->s2) feeds the G phase. Pin all
    three observables against a hand-rolled replication: the running
    stats, the D loss (computed from fwd#1's sample), and the G loss
    (fwd#2's sample against the updated discriminator)."""
    import jax
    import jax.numpy as jnp

    from pai_tpu.models import Discriminator, build_generator
    from pai_tpu.train import losses, steps as steps_lib

    # Dropout lives only in decoders with mult == max(mults)
    # (dropout_for_level; decoders iterate mults[:-1]), so the max mult
    # must repeat for any mask to fire — (1,2,4,8,8) drops in exactly one
    # decoder.
    gen = build_generator("pix2pix", channel_mults=(1, 2, 4, 8, 8),
                          dropout=0.5)
    disc = Discriminator()
    state = steps_lib.init_gan_state(
        gen, disc, jax.random.key(0), (4, 32, 32, 1), "gan", False)
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (4, 32, 32, 1), jnp.float32)
    y = jax.random.normal(ky, (4, 32, 32, 1), jnp.float32)

    step = jax.jit(steps_lib.make_gan_train_step(
        gen, disc, "gan", compute_metrics=False))
    new_state, step_metrics = step(state, x, y, jax.random.key(2))

    # Literal reference semantics with the SAME rng splits as the step.
    rng_dropout = jax.random.fold_in(jax.random.key(2), state.step)
    rng_d_phase, rng_g_phase = jax.random.split(rng_dropout)
    pred1, mut1 = gen.apply(
        {"params": state.g_params, "batch_stats": state.g_stats},
        x, train=True, rngs={"dropout": rng_d_phase},
        mutable=["batch_stats"])
    pred2, mut2 = gen.apply(
        {"params": state.g_params, "batch_stats": mut1["batch_stats"]},
        x, train=True, rngs={"dropout": rng_g_phase},
        mutable=["batch_stats"])

    # The two masks genuinely differ (otherwise this test pins nothing).
    assert float(jnp.max(jnp.abs(pred1 - pred2))) > 1e-6

    for a, b in zip(jax.tree.leaves(new_state.g_stats),
                    jax.tree.leaves(mut2["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    d_loss_manual = losses.discriminator_loss(
        disc.apply({"params": state.d_params}, x, pred1),
        disc.apply({"params": state.d_params}, x, y))
    np.testing.assert_allclose(float(step_metrics["d_loss"]),
                               float(d_loss_manual), rtol=1e-5)

    g_loss_manual = losses.generator_loss(
        "gan", pred2, y,
        disc.apply({"params": new_state.d_params}, x, pred2))
    np.testing.assert_allclose(float(step_metrics["loss"]),
                               float(g_loss_manual), rtol=1e-5)


@pytest.mark.heavy
def test_palette_validate_on_non_main_process(tmp_path, synthetic_manifest):
    """Non-main pod processes must still select PALETTE eval params/stats in
    validate() — they join the sampling collectives; only the PNG/log IO is
    rank-0 gated. Regression: the is_main gate once also guarded the param
    selection, sending non-main palette processes into the GAN branch
    (AttributeError on PaletteTrainState) and deadlocking the pod."""
    from pai_tpu.train.loop import Trainer

    train, val = synthetic_manifest
    h = _hparams(tmp_path, train, val, model="palette", epochs=1,
                 channel_mults="1,2", attention_res="2", val_epochs=1)
    trainer = Trainer(h, image_size=32)
    # Simulate rank 1: process_count stays 1, so sampling and _gather run
    # locally with no collectives — this isolates the branch logic.
    trainer.is_main = False
    summary = trainer.fit()
    assert "val_ssim" in summary
    # rank-gated IO: no per-epoch sample dir was written
    version_root = os.path.join(h["log_dir"], "smoke")
    assert not os.path.isdir(version_root) or all(
        not os.path.isdir(os.path.join(version_root, v, "1"))
        for v in os.listdir(version_root))


@pytest.mark.heavy
def test_nan_halt_saves_postmortem_and_preserves_last(
        tmp_path, synthetic_manifest, monkeypatch):
    """Failure detection (SURVEY §5 — the reference has none): a non-finite
    loss at a logging boundary must (1) halt with FloatingPointError rather
    than burn the remaining epochs on NaNs, (2) save the diverged state to
    its own postmortem slot — in a real divergence its params are NaN too
    (the grads flow from the NaN loss), so it must NOT clobber (3) the
    known-good 'last' checkpoint from the previous validation boundary,
    which a plain --resume then recovers from."""
    import jax.numpy as jnp
    import yaml

    from pai_tpu.train import steps as steps_lib
    from pai_tpu.train.loop import fit

    train, val = synthetic_manifest
    real_make = steps_lib.make_gan_train_step

    def poisoned_make(*a, **k):
        step = real_make(*a, **k)

        def wrapped(state, x, y, rng):
            new_state, m = step(state, x, y, rng)
            if "loss" in m:
                # state.step counts from 0: step>=9 poisons the 10th
                # optimizer step — exactly the first logging boundary.
                m = dict(m)
                m["loss"] = jnp.where(state.step >= 9, jnp.nan, m["loss"])
            return new_state, m

        return wrapped

    def meta(slot):
        path = os.path.join(h["ckpt_dir"], "smoke", slot, "meta.yaml")
        assert os.path.exists(path), f"missing {slot} checkpoint"
        with open(path) as f:
            return yaml.safe_load(f)

    # 12 train images / batch 4 = 3 steps/epoch, validation (and a 'last'
    # save) every epoch; the poison fires at step 10, inside epoch 4.
    h = _hparams(tmp_path, train, val, epochs=6, val_epochs=1)
    with monkeypatch.context() as mp:
        mp.setattr(steps_lib, "make_gan_train_step", poisoned_make)
        with pytest.raises(FloatingPointError, match="non-finite loss"):
            fit(h)

    # Diverged state captured for postmortem at the halting step...
    assert meta("diverged")["step"] == 10
    # ...while 'last' still holds the epoch-3 validation-boundary save.
    assert meta("last")["step"] == 9
    assert meta("last")["epoch"] == 2

    # Un-poisoned resume recovers from 'last' and completes epochs 4-6.
    summary = fit(dict(h, resume=True))
    assert summary["steps"] == 18


def test_csv_logger_header_growth_and_o1_memory(tmp_path):
    """CSVLogger appends rows in O(1) memory (no row retention — a long
    run logs a row per 10 steps forever) and rewrites the file only when
    the header gains columns (first validation row); earlier rows keep
    their values with empty cells under the new columns."""
    import csv

    from pai_tpu.utils.logging import CSVLogger

    logger = CSVLogger(str(tmp_path), "csvtest")
    for step in (10, 20):
        logger.log_metrics({"loss": 1.0 / step}, step, epoch=0)
    logger.log_metrics({"val_ssim": 0.5}, 20, epoch=0)  # header grows
    logger.log_metrics({"loss": 0.01}, 30, epoch=1)

    assert not hasattr(logger, "_rows")  # O(1): no retained rows
    with open(os.path.join(logger.log_dir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["10", "20", "20", "30"]
    assert rows[0]["loss"] == "0.1"
    assert rows[0]["val_ssim"] == ""    # backfilled empty cell
    assert rows[2]["val_ssim"] == "0.5"
    assert rows[3]["loss"] == "0.01"


def test_progress_live_fetch_rate_limit(monkeypatch):
    """The off-boundary live-loss readback is TTY-gated and rate-limited
    to ~2 Hz (one RTT per fetch, never per step): Lightning prog_bar
    parity (wrapper.py:132) without per-step device sync."""
    import time as time_mod

    from pai_tpu.train.loop import _Progress

    p = _Progress()
    monkeypatch.setattr(p, "_tty", False)
    assert not p.should_fetch()  # piped: never fetches

    monkeypatch.setattr(p, "_tty", True)
    p._last_fetch = 0.0
    assert p.should_fetch()          # first fetch allowed
    assert not p.should_fetch()      # immediately after: blocked
    p._last_fetch = time_mod.time() - (_Progress._FETCH_INTERVAL + 0.01)
    assert p.should_fetch()          # interval elapsed: allowed again


def test_generator_dropout_active_gating():
    """exact_double must engage only when a dropout layer actually fires:
    the conv U-Nets drop only where dropout_for_level > 0 over the decoder
    levels, so mults without a repeated max never drop at any rate and
    keep the ~25%-cheaper single-forward path; TransUNet's ViT drops
    unconditionally."""
    from pai_tpu.models import build_generator
    from pai_tpu.models.trans_unet import TransUnet
    from pai_tpu.train.steps import _generator_dropout_active

    g = build_generator("pix2pix", channel_mults=(1, 2, 4, 8), dropout=0.5)
    assert not _generator_dropout_active(g)  # max mult never repeats

    g = build_generator("pix2pix", channel_mults=(1, 2, 4, 8, 8),
                        dropout=0.5)
    assert _generator_dropout_active(g)

    g = build_generator("pix2pix", channel_mults=(1, 2, 4, 8, 8),
                        dropout=0.0)
    assert not _generator_dropout_active(g)

    g = TransUnet(out_channels=1, image_size=32, channel_mults=(1, 2),
                  patch_size=4, vit_layers=2, dropout=0.1)
    assert _generator_dropout_active(g)
