"""Library facade mirroring the reference's Python class surface.

The reference exposes five Lightning classes — ``Pix2Pix``,
``AttentionUnetGAN``, ``ResUnetGAN``, ``TransUnetGAN`` (models/*.py, all
``UnetWrapper`` subclasses) and ``Palette`` (models/palette.py) — each
constructed from hyperparameters, trained with ``trainer.fit`` and reloaded
with ``load_from_checkpoint``. This module provides the same names with the
same constructor vocabulary on top of the functional pai_tpu engine:

    model = Pix2Pix(in_channels=1, out_channels=1, loss_type="gan")
    model.fit(name="run1", data="train.yaml", val_data="val.yaml", epochs=10)
    pred = model.predict(x)                      # NHWC in [-1, 1]
    model = Pix2Pix.load_from_checkpoint("checkpoints/run1/best")

Checkpoints are argument-free reloadable (hyperparameters embedded), exactly
like the reference's save_hyperparameters/load_from_checkpoint pair
(report.py:26-43).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from pai_tpu.config import TRAIN_DEFAULTS
from pai_tpu.data import ImageDataModule  # noqa: F401  (public facade)
from pai_tpu.train.loop import Trainer


class _Experiment:
    """Shared engine-facing logic for the five public classes."""

    model_name: str = ""

    def __init__(self, in_channels: int = 1, out_channels: int = 1,
                 channel_mults: Sequence[int] = (1, 2, 4, 8, 8, 8, 8, 8),
                 attention_res: Sequence[int] = (8, 4, 2),
                 dropout: float = 0.0, loss_type: str = "gan",
                 schedule_type: str = "linear", learn_var: bool = False,
                 precision: str = "32", image_size: int = 256,
                 res_type: Optional[str] = None):
        if res_type is not None:
            self.model_name = f"res{res_type}_unet"
        self.hparams: Dict = dict(
            TRAIN_DEFAULTS,
            model=self.model_name,
            in_channels=in_channels,
            out_channels=out_channels,
            channel_mults=",".join(str(m) for m in channel_mults),
            attention_res=",".join(str(a) for a in attention_res),
            dropout=dropout, loss_type=loss_type,
            schedule_type=schedule_type, learn_variance=learn_var,
            precision=precision, image_size=image_size,
        )
        self._params = None
        self._stats = None
        self._module = None
        self._predict_fns = None

    @property
    def image_size(self) -> int:
        return int(self.hparams.get("image_size") or 256)

    # -- training -------------------------------------------------------
    def fit(self, name: str, data: str, val_data: Optional[str] = None,
            **overrides) -> Dict[str, float]:
        # overrides become part of this model's configuration so the
        # post-fit weight adoption (and any reload) sees the same structure.
        self.hparams.update(overrides)
        h = dict(self.hparams, name=name, data=str(data),
                 val_data=str(val_data) if val_data else None)
        trainer = Trainer(h)
        summary = trainer.fit()
        state_dict, _ = trainer.ckpt.restore("last")
        self._adopt_state_dict(state_dict, h)
        return summary

    def _adopt_state_dict(self, state_dict, h: Dict) -> None:
        from pai_tpu.restore import rebuild_eval_model

        self._module, self._params, self._stats, _ = rebuild_eval_model(
            state_dict, h)
        self._predict_fns = None  # rebuilt lazily against the new module

    @classmethod
    def load_from_checkpoint(cls, path: str):
        """Rebuild the model purely from a checkpoint (report.py:26-43)."""
        from pai_tpu.utils.checkpoint import load_checkpoint

        state_dict, meta = load_checkpoint(str(path))
        h = dict(TRAIN_DEFAULTS, **meta["hparams"])
        obj = cls.__new__(cls)
        # the checkpoint's hyperparameters are authoritative (e.g. a
        # ResUnetGAN checkpoint knows which residual block type it is)
        obj.model_name = h["model"]
        obj.hparams = h
        obj._params = None
        obj._stats = None
        obj._module = None
        obj._predict_fns = None
        obj._adopt_state_dict(state_dict, h)
        return obj

    @classmethod
    def from_lightning_checkpoint(cls, path: str, **hparams_override):
        """Rebuild the model from a PyTorch-reference Lightning ``.ckpt``
        (weights + BN stats + EMA mapped via pai_tpu.interop; same
        conversion as ``tools/import_reference_ckpt.py``)."""
        from pai_tpu.interop import import_lightning_checkpoint
        from pai_tpu.restore import build_generator_from_hparams

        # ResUnetGAN variants: pass model="res50_unet" etc. to override the
        # class default.
        model_name = hparams_override.pop("model", None) or cls.model_name
        if not model_name:
            raise ValueError(
                "call on a concrete class (e.g. Pix2Pix) or pass model=...")
        (params, stats, _, ema), h, _ = import_lightning_checkpoint(
            str(path), model_name, hparams_override=hparams_override)
        obj = cls.__new__(cls)
        obj.model_name = model_name
        obj.hparams = dict(TRAIN_DEFAULTS, **h)
        obj._module = build_generator_from_hparams(
            obj.hparams, int(obj.hparams.get("image_size") or 256))
        obj._predict_fns = None
        eval_params = params
        if ema is not None:
            # reference semantics: validation/eval runs EMA weights
            eval_params = ema.get("unet", ema.get("generator", params))
        obj._params = jax.device_put(eval_params)
        obj._stats = jax.device_put(stats)
        return obj

    # -- inference ------------------------------------------------------
    def _build_predict_fn(self, output_process: bool = False):
        module = self._module
        learn_var = self.hparams.get("learn_variance", False)
        if self.model_name == "palette":
            from pai_tpu.diffusion import ddpm_sample, make_schedule

            sched_inf = make_schedule("cosine", 100)
            # Reference's 8-frame reverse-process capture: y_T plus every
            # (timesteps // 7)-th step (models/palette.py:79-100).
            capture = sched_inf.timesteps // 7 if output_process else None

            @jax.jit
            def run(p, s, xb, key):
                def denoise(c, y_t, gamma):
                    variables = {"params": p}
                    if s:
                        variables["batch_stats"] = s
                    return module.apply(variables, c, y_t, gamma, train=False)

                return ddpm_sample(sched_inf, denoise, xb, key, learn_var,
                                   capture_every=capture)

            return run

        @jax.jit
        def run(p, s, xb):
            variables = {"params": p}
            if s:
                variables["batch_stats"] = s
            return module.apply(variables, xb, train=False)

        return lambda p, s, xb, key: run(p, s, xb)

    def predict(self, x, rng: Optional[jax.Array] = None,
                output_process: bool = False):
        """Eval-mode prediction on an NHWC batch in [-1, 1]. The jitted
        program is cached on the instance (params are jit arguments, so no
        weight constants are baked in).

        ``output_process=True`` (Palette only) additionally returns the
        reverse-diffusion process frames — ``(y_0, process[N, F, H, W, C])``:
        y_T plus every (timesteps // 7)-th intermediate (F = 9 for the
        100-step inference schedule), matching the reference's
        ``forward(output_process=True)`` (models/palette.py:79-100)."""
        if self._params is None:
            raise ValueError("no weights: call fit() or load_from_checkpoint")
        if output_process and self.model_name != "palette":
            raise ValueError("output_process is only supported by Palette")
        if self._predict_fns is None:
            self._predict_fns = {}
        if output_process not in self._predict_fns:
            self._predict_fns[output_process] = self._build_predict_fn(
                output_process)
        key = rng if rng is not None else jax.random.key(0)
        return self._predict_fns[output_process](
            self._params, self._stats, jnp.asarray(x), key)

    __call__ = predict


class Pix2Pix(_Experiment):
    model_name = "pix2pix"


class AttentionUnetGAN(_Experiment):
    model_name = "attention_unet"


class ResUnetGAN(_Experiment):
    model_name = "res18_unet"  # default; res_type kwarg selects the block


class TransUnetGAN(_Experiment):
    model_name = "trans_unet"


class Palette(_Experiment):
    model_name = "palette"

    def __init__(self, in_channels: int = 1, out_channels: int = 1,
                 channel_mults: Sequence[int] = (1, 1, 2, 2, 4, 4),
                 attention_res: Sequence[int] = (16, 8),
                 dropout: float = 0.1, schedule_type: str = "linear",
                 learn_var: bool = False, precision: str = "32",
                 image_size: int = 256):
        super().__init__(in_channels, out_channels, channel_mults,
                         attention_res, dropout, "mse", schedule_type,
                         learn_var, precision, image_size)
