"""The training engine: epoch loop, validation cadence, metric logging,
best/last checkpointing — the capabilities the reference imports from
PyTorch Lightning (configured at ``main.py:113-136``), rebuilt natively.

* epochs / max-steps limits, validation every ``val_epochs`` epochs
  (Lightning ``check_val_every_n_epoch``), CSV metric rows every 10 steps
  (``log_every_n_steps=10``).
* Best checkpoint on max ``val_ssim``; "last" saved at every validation and
  at the end of training (the reference *intends* this for palette but its
  ``save_last`` is always False — SURVEY §5.1 quirk 1); optional resume.
* EMA: updated after every train batch; validation and checkpoints run under
  EMA weights (``callbacks/ema.py:24-52``).
* SPMD: one jitted train step over the device mesh, batch sharded on 'dp',
  state replicated and donated (no per-step host round-trips; metrics are
  fetched only on logging boundaries).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

from pai_tpu.config import compute_dtype, parse_int_list, sanitize_hparams
from pai_tpu.data import BatchLoader, ImageDataset
from pai_tpu.diffusion import make_schedule
from pai_tpu.models import Discriminator, build_generator
from pai_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_state,
)
from pai_tpu.train import steps as steps_lib
from pai_tpu.utils.checkpoint import CheckpointManager
from pai_tpu.utils.images import denormalize, to_int_np, write_png
from pai_tpu.utils.logging import CSVLogger

IMAGE_SIZE = 256
IN_CHANNELS = 1
OUT_CHANNELS = 1


class _Progress:
    """Per-step progress display — the reference shows live loss/metric
    values on EVERY step via Lightning's ``prog_bar=True``
    (``models/wrapper.py:132``). On a TTY: an inline ``\\r`` line updated
    every step (rate-limited to ~20 Hz, like Lightning's tqdm bar) showing
    the step counter plus live metric values: the LOSS refreshes at ~2 Hz
    from the previous step's already-completed device metrics (a one-RTT
    readback of a value the device has finished computing — the current
    step is dispatched first, so compute/H2D overlap is preserved and the
    queue never drains), and the quality metrics refresh at each 10-step
    boundary fetch. Piped logs get plain lines only at log boundaries, so
    files stay clean and non-TTY runs pay zero extra readbacks."""

    _MIN_INTERVAL = 0.05   # seconds between inline redraws
    _FETCH_INTERVAL = 0.5  # seconds between live off-boundary loss fetches

    def __init__(self):
        self._open = False
        self._tty = sys.stderr.isatty()
        self._last_draw = 0.0
        self._last_fetch = 0.0

    @property
    def live(self) -> bool:
        """Whether per-step (non-boundary) updates will be displayed."""
        return self._tty

    def should_fetch(self) -> bool:
        """Rate-limit the off-boundary device readback (~2 Hz): live
        enough for a human, and at most 2 RTTs/second of host cost even
        on a slow link."""
        now = time.time()
        if not self._tty or now - self._last_fetch < self._FETCH_INTERVAL:
            return False
        self._last_fetch = now
        return True

    def update(self, msg: str, throttle: bool = False) -> None:
        if self._tty:
            now = time.time()
            if throttle and now - self._last_draw < self._MIN_INTERVAL:
                return
            self._last_draw = now
            # \x1b[K clears any longer previous line's tail
            print("\r[pai_tpu] " + msg + "\x1b[K", end="", file=sys.stderr,
                  flush=True)
            self._open = True
        elif not throttle:
            print("[pai_tpu] " + msg, file=sys.stderr, flush=True)

    def close(self) -> None:
        """End an open inline line before other output takes the terminal."""
        if self._open:
            print(file=sys.stderr, flush=True)
            self._open = False


class Trainer:
    """Drives one training run for any of the 8 model names."""

    def __init__(self, hparams: Dict, image_size: Optional[int] = None):
        self.hparams = dict(hparams)
        self.image_size = (image_size or hparams.get("image_size")
                           or IMAGE_SIZE)
        self.name = hparams["name"]
        self.model_name = hparams["model"]
        self.is_palette = self.model_name == "palette"
        self.dtype = compute_dtype(hparams["precision"])
        self.mults = parse_int_list(hparams["channel_mults"])
        self.attn_res = parse_int_list(hparams["attention_res"])

        # Multi-process pod runtime (SURVEY §2.5): initialise the JAX
        # distributed system when launcher env is present, BEFORE the first
        # backend touch — jax.devices() below is then the global pod list.
        from pai_tpu.parallel.distributed import maybe_initialize_distributed

        self.process_index, self.process_count = \
            maybe_initialize_distributed()
        # Lightning-style rank-zero IO: in a multi-process pod only process
        # 0 writes logs/checkpoints/PNGs; compute and collectives still run
        # on every process.
        self.is_main = self.process_index == 0

        # Mesh: 'tp' from --tp (tensor parallel, Megatron channel sharding);
        # data-parallel degree = the largest device count that divides the
        # global batch (reference trains unsharded, dataset.py drop_last=False).
        import math as _math

        devices = jax.devices()
        self.tp = int(hparams.get("tp", 1) or 1)
        self.sp = int(hparams.get("sp", 1) or 1)
        self.fsdp = bool(hparams.get("fsdp", False))
        if len(devices) % (self.tp * self.sp):
            raise ValueError(
                f"--tp {self.tp} x --sp {self.sp} does not divide "
                f"{len(devices)} devices")
        dp = _math.gcd(hparams["batch_size"],
                       len(devices) // (self.tp * self.sp))
        if (self.process_count > 1
                and dp * self.tp * self.sp != len(devices)):
            # Multi-process input assembly (local_batch_rows +
            # make_array_from_process_local_data) requires the mesh to span
            # every process's devices — a prefix mesh would leave some
            # hosts' chips outside the computation while they still load
            # batch rows.
            raise ValueError(
                f"multi-process run: batch_size {hparams['batch_size']} x "
                f"tp {self.tp} x sp {self.sp} yields dp={dp}, which does "
                f"not span all {len(devices)} pod devices; choose a batch "
                f"size divisible by {len(devices) // (self.tp * self.sp)}")
        self.mesh = make_mesh(devices[:dp * self.tp * self.sp],
                              tp=self.tp, sp=self.sp)
        self.batch_shard = batch_sharding(self.mesh)
        # Install the mesh for trace-time op dispatch (ContextVar-scoped):
        # ring attention when --sp > 1 (exact ppermute K/V streaming over
        # ICI), and shard_map-wrapped Pallas kernels (flash attention,
        # fused SSIM) on multi-device dp/tp meshes.
        from pai_tpu.parallel.context import set_mesh_context

        set_mesh_context(self.mesh,
                         sp_axis="sp" if self.sp > 1 else None)

        # channel counts: 1 for the CLI (grayscale PAI data, main.py:25-101);
        # the class API may override via hparams
        self.in_channels = int(hparams.get("in_channels", IN_CHANNELS) or
                               IN_CHANNELS)
        self.out_channels = int(hparams.get("out_channels", OUT_CHANNELS) or
                                OUT_CHANNELS)
        self.generator = build_generator(
            self.model_name, self.in_channels, self.out_channels,
            channel_mults=self.mults, attention_res=self.attn_res,
            dropout=hparams["dropout"],
            learn_var=hparams.get("learn_variance", False),
            image_size=self.image_size, dtype=self.dtype)
        self.discriminator = (
            Discriminator(dtype=self.dtype)
            if (not self.is_palette and hparams["loss_type"] == "gan")
            else None)

        if self.is_palette:
            self.sched_train = make_schedule(
                hparams["schedule_type"], 2000, 1e-6, 0.01)
            self.sched_inf = make_schedule("cosine", 100)

        # non-main processes create no logger (version-dir discovery would
        # race over the shared filesystem); the checkpoint manager exists
        # everywhere for the read-only resume path, saves are main-only.
        self.logger = (CSVLogger(hparams.get("log_dir", "logs"), self.name)
                       if self.is_main else None)
        if self.is_main:
            self.logger.log_hparams(sanitize_hparams(self.hparams))
        self.ckpt = CheckpointManager(
            hparams.get("ckpt_dir", "checkpoints"), self.name,
            process_index=self.process_index,
            process_count=self.process_count)

        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self, palette_steps_per_epoch: Optional[int] = None):
        h = self.hparams
        if self.is_palette:
            train_step = steps_lib.make_palette_train_step(
                self.generator, self.sched_train,
                h.get("learn_variance", False),
                warmup_steps_per_epoch=palette_steps_per_epoch)
            self.sample_step = jax.jit(steps_lib.make_palette_sample_step(
                self.generator, self.sched_inf,
                h.get("learn_variance", False)))
        else:
            train_step = steps_lib.make_gan_train_step(
                self.generator, self.discriminator, h["loss_type"])
            # Lean variant without per-step metric evaluation for the 9/10
            # steps that are never logged (log_every_n_steps=10).
            self.train_step_lean = jax.jit(
                steps_lib.make_gan_train_step(
                    self.generator, self.discriminator, h["loss_type"],
                    compute_metrics=False),
                donate_argnums=(0,))
            self.eval_step = jax.jit(
                steps_lib.make_gan_eval_step(self.generator))
        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        if self.is_palette:
            self.train_step_lean = self.train_step
        if int(h.get("scan_steps", 1) or 1) > 1:
            scan = (steps_lib.make_palette_train_scan(
                        self.generator, self.sched_train,
                        h.get("learn_variance", False),
                        warmup_steps_per_epoch=palette_steps_per_epoch)
                    if self.is_palette else
                    steps_lib.make_gan_train_scan(
                        self.generator, self.discriminator, h["loss_type"]))
            self.train_scan = jax.jit(scan, donate_argnums=(0,))

    def init_state(self, rng):
        batch_shape = (self.hparams["batch_size"], self.image_size,
                       self.image_size, self.in_channels)
        if self.is_palette:
            state = steps_lib.init_palette_state(
                self.generator, rng, batch_shape, self.hparams["ema"])
        else:
            state = steps_lib.init_gan_state(
                self.generator, self.discriminator, rng, batch_shape,
                self.hparams["loss_type"], self.hparams["ema"])
        return shard_state(state, self.mesh, self.tp, self.fsdp)

    # ------------------------------------------------------------------
    def _state_dict(self, state):
        # Live jax.Arrays, shardings intact: orbax saves each shard from
        # its owning process (and restores with the target sharding), so
        # dp-replicated AND fsdp/tp-sharded state checkpoint identically —
        # no host materialisation, which an fsdp pod could not do anyway
        # (no single process addresses the whole array).
        return serialization.to_state_dict(state)

    def _gather(self, tree):
        """Fetch possibly dp-sharded per-image arrays as full host values
        (multi-process: the rows live on other hosts' devices)."""
        if self.process_count > 1:
            from jax.experimental import multihost_utils as mhu

            tree = mhu.process_allgather(tree, tiled=True)
        return jax.tree.map(np.asarray, tree)

    def _restore_state(self, template_state, state_dict):
        return serialization.from_state_dict(template_state, state_dict)

    # ------------------------------------------------------------------
    def validate(self, state, epoch: int) -> Dict[str, float]:
        """Eval-mode pass over the val set.

        Aggregation matches the reference exactly: each validation batch
        logs torchmetrics scalars computed over the WHOLE batch tensor
        (``models/utils.py:38-47`` with dim=None — batch PSNR/RMSE derive
        from the batch-mean MSE, not from per-image PSNRs), and Lightning
        epoch-reduces those logs as a batch-size-weighted mean. So here:
        batch_mse = mean of per-image MSEs over the batch's valid rows,
        val_psnr = Σ n_b·10·log10(1/batch_mse_b) / Σ n_b, val_rmse =
        Σ n_b·sqrt(batch_mse_b) / Σ n_b. val_ssim is the per-image mean,
        which equals the weighted mean of batch means at equal image
        sizes — identical to torchmetrics' elementwise-mean reduction."""
        import math as _math

        h = self.hparams
        val_loader = self.val_loader
        ssim_sum = 0.0
        psnr_wsum = 0.0
        rmse_wsum = 0.0
        total = 0
        out_index = 0
        epoch_dir = None
        if self.is_palette:
            params = steps_lib.palette_eval_params(state)
            stats = state.stats
            if self.is_main:
                # palette writes its sampled outputs per epoch dir
                # (palette.py:142-167); IO is rank-0-only, the param/stat
                # selection above must run on EVERY process (non-main
                # processes still join the sampling collectives)
                epoch_dir = os.path.join(self.logger.log_dir, str(epoch + 1))
                os.makedirs(epoch_dir, exist_ok=True)
        else:
            params = steps_lib.gan_eval_params(state)
            stats = state.g_stats

        rng = jax.random.key(self.hparams.get("seed", 0) + 7919 + epoch)
        for batch in val_loader:
            if self.is_palette:
                rng, sub = jax.random.split(rng)
                y_pred, per_image = self.sample_step(
                    params, stats, batch.x, batch.y, sub)
                # gather on every process (collective in multi-process
                # mode); only rank 0 writes the PNGs
                frames = self._gather(denormalize(y_pred))
                if self.is_main:
                    for frame in frames[: batch.n_valid]:
                        write_png(to_int_np(frame),
                                  os.path.join(epoch_dir,
                                               f"output_{out_index}.png"))
                        out_index += 1
            else:
                _, per_image = self.eval_step(params, stats, batch.x, batch.y)
            per_image = self._gather(per_image)
            n = batch.n_valid
            ssim_sum += float(np.asarray(per_image["ssim"])[:n].sum())
            batch_mse = float(np.asarray(per_image["mse"])[:n].mean())
            psnr_wsum += n * 10.0 * _math.log10(1.0 / max(batch_mse, 1e-20))
            rmse_wsum += n * _math.sqrt(batch_mse)
            total += n

        if total == 0:
            return {}
        out = {
            "val_ssim": ssim_sum / total,
            "val_psnr": psnr_wsum / total,
            "val_rmse": rmse_wsum / total,
        }
        return out

    # ------------------------------------------------------------------
    def fit(self) -> Dict[str, float]:
        try:
            return self._fit()
        finally:
            # clear the dispatch context so later work in the same
            # process/task (class-API predict, reports) does not route
            # through a stale mesh
            from pai_tpu.parallel.context import set_mesh_context

            set_mesh_context(None)

    def _fit(self) -> Dict[str, float]:
        h = self.hparams
        self.train_dataset = ImageDataset(h["data"], self.image_size)
        if self.is_palette and h.get("warmup_unit", "epoch") == "epoch":
            # Reference parity: Lightning steps the LinearLR scheduler once
            # per epoch (models/palette.py:102-108), so the 10k-iteration
            # warmup is measured in epochs. --warmup-unit step opts into
            # per-step warmup instead.
            import math as _math

            spe = max(1, _math.ceil(len(self.train_dataset)
                                    / h["batch_size"]))
            self._build_steps(palette_steps_per_epoch=spe)
        self.val_dataset = ImageDataset(h["val_data"], self.image_size) \
            if h.get("val_data") else None
        # One val loader for the whole fit (thread pool reused per epoch).
        self.val_loader = BatchLoader(
            self.val_dataset, h["batch_size"], shuffle=False,
            pad_mode="zero", sharding=self.batch_shard,
            process_index=self.process_index,
            process_count=self.process_count) \
            if self.val_dataset else None

        rng = jax.random.key(h.get("seed", 0))
        rng, init_rng, train_rng = jax.random.split(rng, 3)
        state = self.init_state(init_rng)
        start_epoch = 0

        if h.get("resume"):
            try:
                restored, meta = self.ckpt.restore(
                    "last", self._state_dict(state))
                state = shard_state(
                    self._restore_state(state, restored), self.mesh,
                    self.tp, self.fsdp)
                start_epoch = meta["epoch"] + 1
                if self.is_main:
                    print(f"[pai_tpu] resumed from epoch {meta['epoch']} "
                          f"(step {meta['step']})")
            except FileNotFoundError:
                pass

        max_steps = h["steps"]
        last_val: Dict[str, float] = {}
        global_step = int(jax.device_get(state.step))
        done = False
        t0 = time.time()
        images_seen = 0
        progress = _Progress()

        profile_dir = h.get("profile_dir")
        profiling = False
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
            profiling = True

        loader = BatchLoader(
            self.train_dataset, h["batch_size"], shuffle=True,
            pad_mode="cycle", seed=h.get("seed", 0),
            sharding=self.batch_shard,
            process_index=self.process_index,
            process_count=self.process_count)

        scan_k = int(h.get("scan_steps", 1) or 1)
        if scan_k > 1 and 10 % scan_k:
            raise ValueError("--scan-steps must divide the 10-step log "
                             "cadence (1, 2, 5 or 10)")

        last_vals: Dict[str, float] = {}
        prev_metrics = None  # previous step's device-resident metrics

        def process_single(state, batch, epoch):
            """One optimizer step + the logging/failure/profile bookkeeping."""
            nonlocal global_step, images_seen, profiling, done, prev_metrics
            log_this = (global_step + 1) % 10 == 0
            step_fn = self.train_step if log_this else self.train_step_lean
            state, metrics = step_fn(state, batch.x, batch.y, train_rng)
            global_step += 1
            images_seen += batch.n_valid
            if log_this:
                # fetch and log (only host sync point in the loop)
                vals = {k: float(v) for k, v in
                        jax.device_get(metrics).items()}
                last_vals.clear()
                last_vals.update(vals)
                if self.is_main:
                    self.logger.log_metrics(vals, global_step, epoch)
                    rate = images_seen / max(time.time() - t0, 1e-9)
                    progress.update(
                        f"epoch {epoch + 1} step {global_step} "
                        + " ".join(f"{k}={v:.4f}" for k, v in vals.items())
                        + f" | {rate:.1f} img/s")
                # failure detection (SURVEY §5: reference has none):
                # halt on divergence rather than burning the remaining
                # epochs on NaNs. The diverged state goes to its own
                # postmortem slot — its params are typically NaN too, so
                # it must NOT overwrite 'last' (the most recent known-good
                # validation-boundary save that --resume recovers from).
                if not np.isfinite(vals.get("loss", 0.0)):
                    # collective: every process enters the orbax save
                    self.ckpt.save_diverged(self._state_dict(state),
                                            sanitize_hparams(h),
                                            global_step, epoch)
                    raise FloatingPointError(
                        f"non-finite loss at step {global_step} "
                        f"(diverged state saved for postmortem; "
                        f"--resume recovers from the last checkpoint)")
            elif self.is_main and progress.live:
                # per-step live line (Lightning prog_bar parity). At most
                # every _FETCH_INTERVAL the PREVIOUS lean step's loss is
                # fetched — that step has already finished on the device
                # (the current step was just dispatched above), so the
                # readback costs one RTT and never drains the dispatch
                # queue; quality metrics refresh at the 10-step boundary.
                if prev_metrics is not None and progress.should_fetch():
                    last_vals.update(
                        {k: float(v) for k, v in
                         jax.device_get(prev_metrics).items()})
                progress.update(
                    f"epoch {epoch + 1} step {global_step} "
                    + " ".join(f"{k}={v:.4f}" for k, v in last_vals.items()),
                    throttle=True)
            prev_metrics = metrics
            if profiling and global_step >= 12:
                jax.profiler.stop_trace()
                profiling = False
                print(f"[pai_tpu] profile written to {profile_dir}")
            if max_steps > 0 and global_step >= max_steps:
                done = True
            return state

        epoch = start_epoch - 1  # resume may already satisfy the epoch budget
        for epoch in range(start_epoch, h["epochs"]):
            loader.epoch = epoch  # deterministic per-epoch shuffle
            pending = []
            for batch in loader:
                # --scan-steps: fold K-1 lean steps into one lax.scan
                # dispatch, then one regular step so logging-boundary
                # metrics (train_ssim etc.) stay intact. Chunks start only
                # on K-aligned steps so boundaries land on chunk ends.
                if (scan_k > 1 and not profiling
                        and global_step % scan_k == 0
                        and (max_steps <= 0
                             or global_step + scan_k <= max_steps)):
                    pending.append(batch)
                    if len(pending) < scan_k:
                        continue
                    head, last = pending[:-1], pending[-1]
                    pending = []
                    xs = jnp.stack([b.x for b in head])
                    ys = jnp.stack([b.y for b in head])
                    state, _ = self.train_scan(state, xs, ys, train_rng)
                    global_step += scan_k - 1
                    images_seen += sum(b.n_valid for b in head)
                    state = process_single(state, last, epoch)
                else:
                    state = process_single(state, batch, epoch)
                if done:
                    break
            for batch in pending:  # epoch-end remainder: plain steps
                state = process_single(state, batch, epoch)
                if done:
                    break

            if (epoch + 1) % h["val_epochs"] == 0 and self.val_dataset:
                progress.close()
                last_val = self.validate(state, epoch)
                if last_val:
                    if self.is_main:
                        self.logger.log_metrics(last_val, global_step, epoch)
                        print(f"[pai_tpu] epoch {epoch + 1} "
                              f"step {global_step}: "
                              + " ".join(f"{k}={v:.4f}"
                                         for k, v in last_val.items()),
                              flush=True)
                    # collective saves: metrics are replicated, so every
                    # process reaches the same maybe_save_best decision
                    sd = self._state_dict(state)
                    hp = sanitize_hparams(h)
                    self.ckpt.maybe_save_best(
                        sd, hp, global_step, epoch, last_val["val_ssim"])
                    self.ckpt.save_last(sd, hp, global_step, epoch,
                                        last_val["val_ssim"])
            if done:
                break

        progress.close()
        if profiling:
            jax.profiler.stop_trace()

        # end-of-fit: persist final state as last (collective save)
        self.ckpt.save_last(self._state_dict(state), sanitize_hparams(h),
                            global_step, epoch,
                            last_val.get("val_ssim"))
        wall = time.time() - t0
        summary = {
            "steps": global_step,
            "images_per_sec": images_seen / wall if wall > 0 else 0.0,
            **last_val,
        }
        return summary


def fit(hparams: Dict) -> Dict[str, float]:
    return Trainer(hparams).fit()
