"""Measure the single-step cross-framework parameter noise at 256².

The 256² training-quality head-to-heads run 50 optimizer steps from a
metric-steep, far-from-converged operating point (val SSIM ~0.2-0.3), where
final metrics are dominated by trajectory chaos. The honest noise yardstick
for a cross-framework comparison is not a ONE-TIME 1e-6 weight perturbation
(tools/train_parity.py's original control — a convex MSE descent damps it
to ~1e-4-level final-metric spread) but a CONTINUOUS injection: every step,
both frameworks compute the same math with different f32 reduction orders
(XLA vs ATen conv/matmul kernels), so their parameter trajectories are
re-separated every step at float-noise scale.

This probe measures that injection directly, with no tunable knob: build
the torch reference (tools/train_parity.py `_build_wrapper`) and the
pai_tpu side from IDENTICAL deterministic weights, run exactly ONE
production training step on the IDENTICAL batch in each framework
(reference step: models/wrapper.py:117-162), port the torch post-step
state_dict through the same layout maps (tests/parity_port.py), and report
the per-tensor rms-relative deviation std(p_jax - p_torch)/rms(p_torch).
The median across tensors is the per-step injection amplitude used by the
`perstep` control mode in tools/train_parity.py.

Usage: PARITY_SCALE=256 python tools/step_noise_probe.py <gan|res18|attention|trans>
Prints one JSON line: {"config": ..., "per_tensor": {...},
                       "median_rel": ..., "max_rel": ...}
"""

import json
import os
import sys

os.environ.setdefault("PARITY_SCALE", "256")
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, os.pardir))
sys.path.insert(0, os.path.join(_HERE, os.pardir, "tests"))
sys.path.insert(0, _HERE)

import numpy as np


MODELS = {"gan": "pix2pix", "res18": "res18_unet",
          "attention": "attention_unet", "trans": "trans_unet"}
LOSSES = {"gan": "gan", "res18": "mse",
          "attention": "ssim+psnr", "trans": "mse"}


def _torch_one_step(config):
    import torch
    from make_parity_fixture import _install_stubs
    from train_parity import (
        BATCH,
        _build_wrapper,
        _lightning_manual_stub,
        _torchmetrics_real,
        make_data,
    )

    _install_stubs()
    _torchmetrics_real()
    _lightning_manual_stub()

    model_name, loss_type = MODELS[config], LOSSES[config]
    wrapper, manifest = _build_wrapper(model_name, loss_type)
    opts = wrapper.configure_optimizers()
    wrapper._opts = list(opts) if isinstance(opts, (list, tuple)) else [opts]
    (tx, ty), _ = make_data()
    wrapper.train()
    wrapper.training_step((torch.from_numpy(tx[:BATCH]),
                           torch.from_numpy(ty[:BATCH])), 0)

    w1 = {f"unet.{k}": v.detach().numpy().astype(np.float32)
          for k, v in wrapper.unet.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    if wrapper.discriminator is not None:
        w1.update({f"disc.{k}": v.detach().numpy().astype(np.float32)
                   for k, v in wrapper.discriminator.state_dict().items()
                   if not k.endswith("num_batches_tracked")})
    return manifest, w1, tx[:BATCH], ty[:BATCH]


def _torch_grad_ref(config):
    """Fresh wrapper at the deterministic init: one unet forward + MSE
    backward; returns a state_dict-shaped dict with grads in the param
    slots (zeros for running stats, so the layout ports apply)."""
    import torch
    from train_parity import BATCH, _build_wrapper, make_data

    wrapper, _ = _build_wrapper(MODELS[config], LOSSES[config])
    (tx, ty), _ = make_data()
    x = torch.from_numpy(tx[:BATCH])
    y = torch.from_numpy(ty[:BATCH])
    wrapper.train()
    pred = wrapper.unet(x)
    loss = torch.mean((pred - y) ** 2)
    loss.backward()
    grads = {k: p.grad.detach().numpy().astype(np.float32)
             for k, p in wrapper.unet.named_parameters()
             if p.grad is not None}
    out = {}
    for k, v in wrapper.unet.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = grads.get(k, np.zeros(tuple(v.shape), np.float32))
    return out, None


def main(config):
    manifest, w1, bx, by = _torch_one_step(config)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict
    from make_parity_fixture import deterministic_weights
    from parity_port import (
        port_attention,
        port_discriminator,
        port_pix2pix,
        port_res18,
    )

    from pai_tpu.models import Discriminator, build_generator
    from pai_tpu.train import steps as steps_lib
    from pai_tpu.train.state import GanTrainState, gan_optimizer

    w0 = deterministic_weights(manifest)
    loss_type = LOSSES[config]
    disc = dparams = None

    def _port(w):
        if config == "gan":
            return port_pix2pix(w)
        if config == "res18":
            return port_res18(w, prefix="unet")
        if config == "attention":
            return port_attention(w, prefix="unet")
        # trans: the general checkpoint-importer name maps, as in
        # tools/pai_train_parity.py (2-layer ViT fixture config)
        from train_parity import IMG

        from pai_tpu.interop.torch_import import _materialize, _trans_key

        abstract = jax.eval_shape(lambda: gen.init(
            jax.random.key(0), jnp.zeros((1, IMG, IMG, 1)), train=False))
        key_fn = lambda p: _trans_key(p, 2)  # noqa: E731
        return (_materialize(abstract["params"], w, key_fn),
                _materialize(abstract["batch_stats"], w, key_fn))

    if config == "gan":
        gen = build_generator("pix2pix", channel_mults=(1, 2))
        disc = Discriminator()
    elif config == "res18":
        gen = build_generator("res18_unet", channel_mults=(1, 2))
    elif config == "attention":
        gen = build_generator("attention_unet", channel_mults=(1, 2))
    else:
        from train_parity import IMG

        from pai_tpu.models.trans_unet import TransUnet

        gen = TransUnet(out_channels=1, image_size=IMG,
                        channel_mults=(1, 1), patch_size=4, vit_layers=2)
    gp, gs = _port(w0)
    if disc is not None:
        dparams = port_discriminator(w0)

    state = GanTrainState(
        step=jnp.zeros((), jnp.int32), g_params=gp, g_stats=gs,
        g_opt=gan_optimizer().init(gp), d_params=dparams,
        d_opt=gan_optimizer().init(dparams) if dparams is not None else None,
        ema=None)
    step_fn = jax.jit(steps_lib.make_gan_train_step(
        gen, disc, loss_type, compute_metrics=False))
    x = jnp.asarray(np.transpose(bx, (0, 2, 3, 1)))
    y = jnp.asarray(np.transpose(by, (0, 2, 3, 1)))
    state, _ = step_fn(state, x, y, jax.random.key(0))

    gp1, gs1 = _port(w1)
    trees = [(state.g_params, gp1)]
    if disc is not None:
        trees.append((state.d_params, port_discriminator(w1)))
    # BN running stats are compared separately: the reference's GAN step
    # updates them TWICE per step (double generator forward) — the
    # composed-update replication in train/steps.py must land them at
    # float level of torch's.
    stats_rel = None
    if gs1:
        from flax.traverse_util import flatten_dict as _fd

        sj, st = _fd(state.g_stats), _fd(gs1)
        sq_d = sum(float(np.sum((np.asarray(sj[k], np.float64) -
                                 np.asarray(st[k], np.float64)) ** 2))
                   for k in st)
        sq_t = sum(float(np.sum(np.asarray(st[k], np.float64) ** 2))
                   for k in st)
        stats_rel = float(np.sqrt(sq_d / (sq_t + 1e-30)))

    per_tensor = {}
    sq_diff = sq_p = 0.0
    for jax_tree, torch_tree in trees:
        ja = flatten_dict(jax_tree)
        ta = flatten_dict(torch_tree)
        for key in sorted(ta):
            a = np.asarray(ja[key], np.float64)
            b = np.asarray(ta[key], np.float64)
            rel = float(np.std(a - b) / (np.sqrt(np.mean(b * b)) + 1e-30))
            per_tensor["/".join(map(str, key))] = rel
            sq_diff += float(np.sum((a - b) ** 2))
            sq_p += float(np.sum(b * b))
    # Gradient-level deviation: same forward+MSE-loss+backward in both
    # frameworks from the ORIGINAL weights — the relative noise of the
    # backward pass itself, which the `grad` control mode of
    # tools/train_parity.py injects (noise entering through the gradients
    # propagates into exactly the functionally-relevant parameter
    # subspace, unlike random parameter-space directions).
    import torch

    tw, _ = _torch_grad_ref(config)
    tg = {f"unet.{k}": v for k, v in tw.items()}

    def mse_loss(g_params):
        variables = {"params": g_params}
        if gs:
            variables["batch_stats"] = gs
        out = gen.apply(variables, x, train=True,
                        rngs={"dropout": jax.random.key(1)},
                        mutable=["batch_stats"] if gs else [])
        pred = out[0] if gs else out
        return jnp.mean((pred - y) ** 2)

    jg = jax.grad(mse_loss)(gp)
    jgf = flatten_dict(jg)
    # port torch grads through the same layout maps (grads transform like
    # their weights)
    tgp, _ = _port(tg)
    tgf = flatten_dict(tgp)
    gsq_d = gsq = 0.0
    for k in tgf:
        a = np.asarray(jgf[k], np.float64)
        b = np.asarray(tgf[k], np.float64)
        gsq_d += float(np.sum((a - b) ** 2))
        gsq += float(np.sum(b * b))
    grad_rel = float(np.sqrt(gsq_d / (gsq + 1e-30)))

    rels = np.asarray(list(per_tensor.values()))
    print(json.dumps({
        "grad_rel": grad_rel,
        "config": config,
        # ||p_jax - p_torch|| / ||p_torch|| over the concatenated parameter
        # vector — the scalar that governs trajectory re-separation, and
        # the amplitude train_parity.py's perstep control injects (noise of
        # std eps*rms(p) per tensor reproduces exactly this global norm).
        "global_rel": float(np.sqrt(sq_diff / sq_p)),
        "stats_rel": stats_rel,
        "median_rel": float(np.median(rels)),
        "max_rel": float(rels.max()),
        "per_tensor": {k: float(f"{v:.3e}") for k, v in per_tensor.items()},
    }))


if __name__ == "__main__":
    main(sys.argv[1])
