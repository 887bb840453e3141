"""pai_tpu — TPU-native photoacoustic-imaging reconstruction framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capability surface of
``cristianpjensen/thesis-pai-reconstruction`` (PyTorch + Lightning, single GPU):
six U-Net-family generators (Pix2Pix, Attention U-Net, ResUNet x4 block types,
TransUNet) trained against an optional PatchGAN discriminator with selectable
losses (GAN+L1 / SSIM / PSNR / SSIM+PSNR / MSE), plus the Palette conditional
diffusion model (guided_diffusion UNet backbone, DDPM training + on-device
``lax.scan`` sampling, optional learned variance, EMA).

Design is TPU-first, not a port:
  * NHWC layouts, bf16-capable compute policy, XLA convs on the MXU.
  * Functional core: pure ``train_step(state, batch, rng) -> (state, metrics)``
    under ``jit`` with ``NamedSharding`` over a device mesh (data-parallel by
    default, a model axis reserved for tensor-parallel attention).
  * Pallas kernels for the windowed SSIM reduction and blockwise attention.
  * Orbax checkpoints (best-val-SSIM + last), CSV metric logging, a native C++
    threaded PNG data loader with a pure-Python fallback.

Reference layer map: /root/reference (see SURVEY.md)."""

__version__ = "0.1.0"

_API_NAMES = ("Pix2Pix", "AttentionUnetGAN", "ResUnetGAN", "TransUnetGAN",
              "Palette", "ImageDataModule")


def __getattr__(name):
    """Lazy re-export of the class API (pai_tpu.api) so that
    ``from pai_tpu import Pix2Pix`` works without importing jax at package
    import time."""
    if name in _API_NAMES:
        from pai_tpu import api

        return getattr(api, name)
    raise AttributeError(f"module 'pai_tpu' has no attribute '{name}'")
