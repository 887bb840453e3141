"""Shared checkpoint -> eval-model reconstruction.

Used by the report CLI (reporting.py) and the class API (api.py). Builds the
generator from checkpoint-embedded hyperparameters, restores through an
*abstract* (eval_shape) train-state template — restoring through a concrete
state would materialise params + Adam moments on device (12+ GB for the
1B-param trans_unet) just to discard them — extracts the eval parameters
(EMA weights when EMA was enabled, callbacks/ema.py:35-52 semantics), and
device_puts them once.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from flax import serialization

from pai_tpu.config import compute_dtype, parse_int_list
from pai_tpu.models import Discriminator, build_generator
from pai_tpu.train import steps as steps_lib

DEFAULT_IMAGE_SIZE = 256


def build_generator_from_hparams(h: Dict, image_size: int):
    return build_generator(
        h["model"],
        int(h.get("in_channels", 1)), int(h.get("out_channels", 1)),
        channel_mults=parse_int_list(h["channel_mults"]),
        attention_res=parse_int_list(h["attention_res"]),
        dropout=h.get("dropout", 0.0),
        learn_var=h.get("learn_variance", False),
        image_size=image_size,
        dtype=compute_dtype(h.get("precision", "32")))


def rebuild_eval_model(state_dict: Any, h: Dict
                       ) -> Tuple[Any, Any, Any, int]:
    """(generator, eval_params, batch_stats, image_size) from a restored
    state dict + its hparams."""
    image_size = int(h.get("image_size") or DEFAULT_IMAGE_SIZE)
    generator = build_generator_from_hparams(h, image_size)

    rng = jax.random.key(0)
    in_ch = int(h.get("in_channels", 1))
    batch_shape = (1, image_size, image_size, in_ch)
    if h["model"] == "palette":
        template = jax.eval_shape(lambda: steps_lib.init_palette_state(
            generator, rng, batch_shape, h.get("ema", False)))
        state = serialization.from_state_dict(template, state_dict)
        params = steps_lib.palette_eval_params(state)
        stats = state.stats
    else:
        discriminator = Discriminator(
            dtype=compute_dtype(h.get("precision", "32"))) \
            if h.get("loss_type") == "gan" else None
        template = jax.eval_shape(lambda: steps_lib.init_gan_state(
            generator, discriminator, rng, batch_shape,
            h.get("loss_type", "gan"), h.get("ema", False)))
        state = serialization.from_state_dict(template, state_dict)
        params = steps_lib.gan_eval_params(state)
        stats = state.g_stats
    params = jax.device_put(params)
    stats = jax.device_put(stats)
    return generator, params, stats, image_size
