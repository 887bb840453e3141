"""Run configuration: a plain dict pinned to the reference CLI surface
(``main.py:139-231``), plus helpers for dtype policy and persistence."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

# Verbatim flag defaults (main.py:139-231).
TRAIN_DEFAULTS: Dict = {
    "data": None,
    "val_data": None,
    "epochs": 200,
    "steps": -1,
    "batch_size": 8,
    "val_epochs": 10,
    "precision": "32",
    "ema": False,
    "channel_mults": "1,2,4,8,8,8,8,8",
    "attention_res": "8,4,2",
    "dropout": 0.0,
    "loss_type": "gan",
    "schedule_type": "linear",
    "learn_variance": False,
    "model": "pix2pix",
    # rebuild extensions (not in the reference CLI)
    "seed": 0,
    "resume": False,
    "log_dir": "logs",
    "ckpt_dir": "checkpoints",
    "tp": 1,
    "sp": 1,
    "scan_steps": 1,
    "profile_dir": None,
    # palette LinearLR warmup unit: "epoch" replicates Lightning's
    # per-epoch scheduler stepping (models/palette.py:102-108);
    # "step" advances the warmup per optimizer step.
    "warmup_unit": "epoch",
}


def parse_int_list(spec: str):
    """\"1,2,4,8\" -> (1, 2, 4, 8) (main.py:19-20)."""
    return tuple(int(x) for x in str(spec).split(","))


def compute_dtype(precision: str):
    """Map the reference --precision strings onto a TPU dtype policy:
    "32" -> float32 (with XLA's default bf16-multiply matmuls, the analogue
    of torch's float32_matmul_precision("medium"), main.py:15); any 16-bit
    spec -> bfloat16 compute with float32 params."""
    p = str(precision)
    if p in ("16", "16-mixed", "bf16", "bf16-mixed", "bf16-true"):
        return jnp.bfloat16
    return jnp.float32


def sanitize_hparams(hparams: Dict) -> Dict:
    """YAML/JSON-safe copy (paths -> str) for checkpoint persistence."""
    out = {}
    for k, v in hparams.items():
        if v is None or isinstance(v, (bool, int, float, str, list)):
            out[k] = v
        else:
            out[k] = str(v)
    return out
