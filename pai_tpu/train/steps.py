"""Jitted train / eval steps — the hot loop of the framework.

GAN step (mirrors ``models/wrapper.py:117-162``, D-then-G ordering):
  1. one generator forward captured with ``jax.vjp`` (batch_stats updated);
  2. discriminator update against ``stop_gradient(pred)`` and the real pair —
     BCE(fake->0) + BCE(real->1);
  3. generator loss against the *updated* discriminator, differentiated
     through the saved vjp — so the generator backward reuses the forward's
     residuals instead of re-running the forward.
  TPU-first deviation (SURVEY §5.1 quirk 6, explicitly sanctioned): the
  reference runs the generator forward twice per step with fresh dropout
  noise (``wrapper.py:126`` + ``wrapper.py:147``); since the generator
  weights are identical in both phases, a single forward is mathematically
  the same model sample and saves ~25% of the step FLOPs. The single
  forward (plus the closed-form double BatchNorm-stat update below) is
  bit-exact to the reference ONLY while no dropout layer fires (the CLI
  default, and also any nonzero rate whose config never places an active
  layer — see ``_generator_dropout_active``): with active dropout the
  reference's two forwards draw independent masks, so the step
  auto-switches to a literal exact path —
  fwd#1 (own mask, stats s0→s1) feeds the D phase, fwd#2 (fresh mask,
  stats s1→s2, vjp-captured) feeds the G phase — paying the same second
  forward the reference always pays.

Palette step (mirrors ``models/palette.py:110-140``): uniform t, continuous-
gamma q-sample, MSE on predicted noise, VLB term (added with weight 1e-3 only
when learning the variance, logged always).

Everything is a pure function of (state, batch, rng); under a data-parallel
mesh the batch argument arrives sharded over 'dp' and XLA inserts the psum
for gradients automatically (global-batch semantics, including synced
BatchNorm statistics — SURVEY §2.5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from pai_tpu.diffusion import DiffusionSchedule, q_sample, vlb_term, ddpm_sample
from pai_tpu.ops import layers
from pai_tpu.train import losses
from pai_tpu.train.ema import EmaState, init_ema, update_ema
from pai_tpu.train.state import (
    GanTrainState,
    PaletteTrainState,
    gan_optimizer,
    palette_optimizer,
)
from pai_tpu.utils import metrics
from pai_tpu.utils.images import denormalize


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------
def init_gan_state(generator, discriminator, rng, batch_shape,
                   loss_type: str, use_ema: bool) -> GanTrainState:
    """Whole-state init under one jit — eager init would dispatch thousands
    of tiny ops (pathological over a remote-tunnel TPU)."""

    def build(rng_):
        rng_g, rng_d = jax.random.split(rng_)
        x = jnp.zeros(batch_shape, jnp.float32)
        g_vars = generator.init(rng_g, x, train=False)
        g_params = g_vars["params"]
        g_stats = g_vars.get("batch_stats", {})
        g_opt = gan_optimizer().init(g_params)

        d_params = None
        d_opt = None
        if loss_type == "gan":
            d_vars = discriminator.init(rng_d, x, x)
            d_params = d_vars["params"]
            d_opt = gan_optimizer().init(d_params)

        ema = None
        if use_ema:
            # EMA spans all parameters (callbacks/ema.py:19-22).
            ema = init_ema({"generator": g_params,
                            "discriminator": d_params if d_params is not None
                            else {}})
        return GanTrainState(step=jnp.zeros((), jnp.int32), g_params=g_params,
                             g_stats=g_stats, g_opt=g_opt, d_params=d_params,
                             d_opt=d_opt, ema=ema)

    return jax.jit(build)(rng)


def init_palette_state(unet, rng, batch_shape, use_ema: bool
                       ) -> PaletteTrainState:
    def build(rng_):
        x = jnp.zeros(batch_shape, jnp.float32)
        gammas = jnp.ones((batch_shape[0],), jnp.float32)
        variables = unet.init(rng_, x, x, gammas, train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        opt = palette_optimizer().init(params)
        ema = init_ema({"unet": params}) if use_ema else None
        return PaletteTrainState(step=jnp.zeros((), jnp.int32), params=params,
                                 stats=stats, opt=opt, ema=ema)

    return jax.jit(build)(rng)


# --------------------------------------------------------------------------
# GAN families
# --------------------------------------------------------------------------
def _generator_dropout_active(generator) -> bool:
    """Whether ANY dropout layer actually fires in a training forward.

    A nonzero ``--dropout`` rate is not sufficient: the conv U-Nets place
    dropout only in the deepest widest decoders —
    ``dropout_for_level(level, mult, mults, rate) > 0`` over the decoder
    iteration ``enumerate(mults[:-1])`` (pix2pix.py:173-179; same loop in
    attention/res U-Nets) — so e.g. mults (1,2,4,8) never drops at any
    rate. Only when a layer really fires is the literal double-forward
    path needed; otherwise the single-forward closed-form BN composition
    is provably exact and ~25% cheaper. TransUNet's ViT applies dropout
    unconditionally, so any nonzero rate is active there."""
    rate = float(getattr(generator, "dropout", 0.0) or 0.0)
    if rate <= 0.0:
        return False
    mults = getattr(generator, "channel_mults", None)
    if mults is None:
        return True
    from pai_tpu.models.trans_unet import TransUnet

    if isinstance(generator, TransUnet):
        return True
    from pai_tpu.models.pix2pix import dropout_for_level

    return any(dropout_for_level(level, mult, mults, rate) > 0.0
               for level, mult in enumerate(mults[:-1]))


def make_gan_train_step(generator, discriminator, loss_type: str,
                        compute_metrics: bool = True,
                        with_grads: bool = False):
    """``compute_metrics=False`` builds a lean variant without the per-step
    SSIM/PSNR/RMSE evaluation; the training loop uses it on non-logging
    steps (the reference computes metrics every step but only records every
    10th — wrapper.py:150-156 + main.py:126 — so logged values are
    identical). ``with_grads=True`` additionally returns the raw generator
    and discriminator gradients in the metrics dict (SPMD equivalence
    tests only — comparing post-Adam params is reduction-order fragile)."""
    g_tx = gan_optimizer()
    d_tx = gan_optimizer()
    # With active dropout the reference's two per-step generator forwards
    # (wrapper.py:126 D phase, wrapper.py:147 G phase) draw INDEPENDENT
    # masks; the single-forward fast path would share one mask across both
    # phases and the closed-form BN composition below would assume equal
    # batch statistics downstream of dropout. Exactness over the ~25% FLOP
    # saving: run the literal double forward whenever the generator
    # actually drops (the reference pays the second forward always).
    exact_double = loss_type == "gan" and _generator_dropout_active(generator)

    def train_step(state: GanTrainState, x, y, rng):
        rng_dropout = jax.random.fold_in(rng, state.step)

        def g_forward(g_params, rng_drop, stats_in):
            variables = {"params": g_params}
            if stats_in:
                variables["batch_stats"] = stats_in
            out = generator.apply(
                variables, x, train=True, rngs={"dropout": rng_drop},
                mutable=["batch_stats"] if stats_in else [],
            )
            if stats_in:
                pred, new_vars = out
                return pred, new_vars["batch_stats"]
            return out, stats_in

        if exact_double:
            rng_d_phase, rng_g_phase = jax.random.split(rng_dropout)
            # fwd#1 (wrapper.py:126): D-phase sample with its own mask;
            # no generator gradient flows (Lightning toggle_optimizer
            # freezes G during the D step), stats s0 -> s1.
            pred_d, stats_1 = g_forward(state.g_params, rng_d_phase,
                                        state.g_stats)
            pred_d = jax.lax.stop_gradient(pred_d)
            stats_1 = jax.lax.stop_gradient(stats_1)
            # fwd#2 (wrapper.py:147): fresh mask, vjp-captured for the G
            # phase; BatchNorm's EMA composes on s1, so new_gstats is the
            # literal sequential s2.
            pred, g_vjp, new_gstats = jax.vjp(
                lambda p: g_forward(p, rng_g_phase, stats_1),
                state.g_params, has_aux=True)
        else:
            # --- single generator forward, vjp-captured; has_aux=True: the
            # updated batch_stats ride along undifferentiated ---
            pred, g_vjp, new_gstats = jax.vjp(
                lambda p: g_forward(p, rng_dropout, state.g_stats),
                state.g_params, has_aux=True)
            pred_d = jax.lax.stop_gradient(pred)
        if loss_type == "gan" and state.g_stats and not exact_double:
            # The reference's GAN step runs the generator forward TWICE
            # (D phase wrapper.py:126, G phase wrapper.py:147) with
            # identical weights and batch, so every BatchNorm running stat
            # takes TWO EMA updates toward the same batch statistics.
            # Compose the second update in closed form: with torch momentum
            # m (flax decay d = 1-m), s1 = d·s0 + m·b  ⇒  s2 = (1+d)·s1 −
            # d·s0. Exact when the two forwards see the same batch
            # statistics — guaranteed on this path, because the one case
            # where they differ (an active dropout layer upstream of a
            # BatchNorm) takes the exact_double branch above instead.
            # At long horizons the EMA converges and this is
            # invisible; at short horizons (e.g. the 50-step 256² parity
            # tier) the stats-lag difference is a systematic val-forward
            # offset. The decay is read from the shared BatchNorm layer so
            # the coefficients cannot desynchronize from the model.
            decay = layers.BatchNorm.momentum  # flax convention (torch 1-m)
            new_gstats = jax.tree.map(
                lambda s1, s0: (1.0 + decay) * s1 - decay * s0,
                new_gstats, state.g_stats)
        aux_metrics = {}

        new_d_params, new_d_opt = state.d_params, state.d_opt
        if loss_type == "gan":
            # --- discriminator phase (wrapper.py:120-138) ---
            pred_sg = pred_d

            def d_loss_fn(d_params):
                # One batched D pass over [real | fake]: InstanceNorm is
                # per-sample, so this is numerically identical to the
                # reference's two separate calls (wrapper.py:128-129) while
                # doubling the conv batch for MXU utilisation.
                both = discriminator.apply(
                    {"params": d_params},
                    jnp.concatenate([x, x], axis=0),
                    jnp.concatenate([y, pred_sg], axis=0))
                n = x.shape[0]
                target_logits, pred_logits = both[:n], both[n:]
                return losses.discriminator_loss(pred_logits, target_logits)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            d_updates, new_d_opt = d_tx.update(
                d_grads, state.d_opt, state.d_params)
            new_d_params = optax.apply_updates(state.d_params, d_updates)
            aux_metrics["d_loss"] = d_loss
            if with_grads:
                aux_metrics["d_grads"] = d_grads

        # --- generator phase against the updated D (wrapper.py:140-162) ---
        def g_loss_from_pred(pred_):
            pred_logits = None
            if loss_type == "gan":
                pred_logits = discriminator.apply(
                    {"params": new_d_params}, x, pred_)
            return losses.generator_loss(loss_type, pred_, y, pred_logits)

        g_loss, dpred = jax.value_and_grad(g_loss_from_pred)(pred)
        (g_grads,) = g_vjp(dpred)
        if with_grads:
            aux_metrics["g_grads"] = g_grads
        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        new_ema = state.ema
        if state.ema is not None:
            new_ema = update_ema(state.ema, {
                "generator": new_g_params,
                "discriminator": new_d_params if new_d_params is not None
                else {},
            })

        step_metrics = {"loss": g_loss, **aux_metrics}
        if compute_metrics:
            dp, dt = denormalize(pred), denormalize(y)
            step_metrics.update(
                train_ssim=metrics.ssim(dp, dt),
                train_psnr=metrics.psnr(dp, dt),
                train_rmse=metrics.rmse(dp, dt),
            )
        new_state = state.replace(
            step=state.step + 1, g_params=new_g_params, g_stats=new_gstats,
            g_opt=new_g_opt, d_params=new_d_params, d_opt=new_d_opt,
            ema=new_ema)
        return new_state, step_metrics

    return train_step


def make_gan_train_scan(generator, discriminator, loss_type: str):
    """K optimizer steps per dispatch: ``lax.scan`` over K stacked batches
    (xs, ys: [K, B, H, W, C]) — no host round-trips between steps, and XLA
    overlaps batch k+1's transfer with step k. Returns the final step's
    loss metrics (the logging boundary); use with K dividing the 10-step
    log cadence."""
    step = make_gan_train_step(generator, discriminator, loss_type,
                               compute_metrics=False)

    def scan_steps(state: GanTrainState, xs, ys, rng):
        def body(s, xy):
            x, y = xy
            s, m = step(s, x, y, rng)  # step folds rng by s.step
            return s, m

        state, metrics = jax.lax.scan(body, state, (xs, ys))
        return state, jax.tree.map(lambda a: a[-1], metrics)

    return scan_steps


def make_palette_train_scan(unet, sched: DiffusionSchedule, learn_var: bool,
                            warmup_steps_per_epoch=None):
    """Palette counterpart of :func:`make_gan_train_scan`."""
    step = make_palette_train_step(
        unet, sched, learn_var,
        warmup_steps_per_epoch=warmup_steps_per_epoch)

    def scan_steps(state: PaletteTrainState, xs, ys, rng):
        def body(s, xy):
            x, y = xy
            s, m = step(s, x, y, rng)
            return s, m

        state, metrics = jax.lax.scan(body, state, (xs, ys))
        return state, jax.tree.map(lambda a: a[-1], metrics)

    return scan_steps


def make_gan_eval_step(generator):
    """Eval-mode forward + per-image metrics; rows >= n_valid are masked out
    by the caller via the returned per-image arrays."""

    def eval_step(g_params, g_stats, x, y):
        variables = {"params": g_params}
        if g_stats:
            variables["batch_stats"] = g_stats
        pred = generator.apply(variables, x, train=False)
        dp, dt = denormalize(pred), denormalize(y)
        per_ssim = metrics.ssim_per_image(dp, dt)
        per_psnr = metrics.psnr_per_image(dp, dt)
        per_mse = metrics.mse_per_image(dp, dt)
        return pred, {"ssim": per_ssim, "psnr": per_psnr, "mse": per_mse}

    return eval_step


def gan_eval_params(state: GanTrainState):
    """Parameters validation should run under: EMA weights when EMA is
    enabled (callbacks/ema.py:35-43), raw weights otherwise."""
    if state.ema is not None:
        return state.ema.params["generator"]
    return state.g_params


# --------------------------------------------------------------------------
# Palette diffusion
# --------------------------------------------------------------------------
def make_palette_train_step(unet, sched: DiffusionSchedule, learn_var: bool,
                            warmup_steps_per_epoch=None,
                            external_rand: bool = False):
    """``warmup_steps_per_epoch`` set => the LinearLR warmup advances once
    per epoch, replicating Lightning's per-epoch scheduler stepping
    (models/palette.py:102-108); None => per-step warmup (opt-in).

    ``external_rand=True`` builds a deterministic-replay variant whose
    ``rng`` argument is instead a dict {"t", "noise", "u"} of precomputed
    draws (the cross-framework parity harness feeds both frameworks the
    same stream)."""
    tx = palette_optimizer(steps_per_epoch=warmup_steps_per_epoch)

    def train_step(state: PaletteTrainState, x, y_0, rng):
        n = y_0.shape[0]
        if external_rand:
            rng_drop = jax.random.key(0)
            t = rng["t"]
            y_t, noise, gamma = q_sample(sched, y_0, t, None,
                                         noise=rng["noise"], u=rng["u"])
        else:
            rng = jax.random.fold_in(rng, state.step)
            rng_t, rng_q, rng_drop = jax.random.split(rng, 3)
            t = jax.random.randint(rng_t, (n,), 0, sched.timesteps)
            y_t, noise, gamma = q_sample(sched, y_0, t, rng_q)

        def loss_fn(params):
            variables = {"params": params}
            if state.stats:
                variables["batch_stats"] = state.stats
            out = unet.apply(
                variables, x, y_t, gamma, train=True,
                rngs={"dropout": rng_drop},
                mutable=["batch_stats"] if state.stats else [],
            )
            if state.stats:
                model_output, new_vars = out
                new_stats = new_vars["batch_stats"]
            else:
                model_output, new_stats = out, state.stats
            c = y_0.shape[-1]
            noise_pred = model_output[..., :c] if learn_var else model_output
            mse_loss = jnp.mean((noise_pred - noise) ** 2)
            vlb = jnp.mean(vlb_term(sched, model_output, y_0, y_t, t,
                                    learn_var))
            loss = mse_loss + (0.001 * vlb if learn_var else 0.0)
            return loss, (mse_loss, vlb, new_stats)

        (loss, (mse_loss, vlb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema
        if state.ema is not None:
            new_ema = update_ema(state.ema, {"unet": new_params})

        step_metrics = {"loss": loss, "mse_loss": mse_loss, "vlb_loss": vlb}
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  stats=new_stats, opt=new_opt, ema=new_ema)
        return new_state, step_metrics

    return train_step


def make_palette_sample_step(unet, sched_inf: DiffusionSchedule,
                             learn_var: bool):
    """Full reverse-diffusion sampling as one compiled lax.scan
    (palette.py:79-100) plus per-image metrics."""

    def sample(params, stats, x, y_0, rng):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats

        def denoise_fn(cond, y_t, gamma):
            return unet.apply(variables, cond, y_t, gamma, train=False)

        y_pred = ddpm_sample(sched_inf, denoise_fn, x, rng, learn_var)
        dp, dt = denormalize(y_pred), denormalize(y_0)
        per_ssim = metrics.ssim_per_image(dp, dt)
        per_psnr = metrics.psnr_per_image(dp, dt)
        per_mse = metrics.mse_per_image(dp, dt)
        return y_pred, {"ssim": per_ssim, "psnr": per_psnr, "mse": per_mse}

    return sample


def palette_eval_params(state: PaletteTrainState):
    if state.ema is not None:
        return state.ema.params["unet"]
    return state.params
