"""Shared numerics and host-side utilities (metrics, images, logging,
checkpointing, FLOP counting)."""

from pai_tpu.utils.images import denormalize, to_int
