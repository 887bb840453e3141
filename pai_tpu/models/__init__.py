"""Model zoo: the six generator families and the PatchGAN discriminator.

All models are flax.linen modules over NHWC tensors with a uniform call
signature ``apply(variables, x, train=...)`` (diffusion UNet additionally
takes ``(x, y_t, gammas)``). See ``pai_tpu.models.registry`` for the
CLI-name -> builder mapping mirroring the reference ``main.py:23-104``.
"""

from pai_tpu.models.registry import build_generator, GENERATOR_NAMES
from pai_tpu.models.discriminator import Discriminator
