"""SPMD correctness (SURVEY §4 distributed tests): gradients computed on an
8-device data-parallel mesh must equal single-device gradients on the same
global batch — XLA's inserted psum is exact up to reduction order, and
BatchNorm statistics are global either way. (Comparing post-Adam parameters
is ill-posed: the first Adam step is ~sign(g)*lr, so reduction-order noise
on near-zero gradients flips whole update quanta.) Also exercises the
dp x tp (tensor-parallel channel-sharded) mesh of the driver dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pai_tpu.models import build_generator, Discriminator
from pai_tpu.train import losses, steps as steps_lib
from pai_tpu.utils.images import denormalize
from pai_tpu.utils import metrics as M

MULTS = (1, 2)
IMG = 32  # PatchGAN needs >= 32px: at 16px its final conv output is empty
BATCH = 8


def _grad_fn(gen, loss_type):
    def compute(params, stats, x, y):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": stats}
            pred, _ = gen.apply(variables, x, train=True,
                                rngs={"dropout": jax.random.key(0)},
                                mutable=["batch_stats"])
            return losses.generator_loss(loss_type, pred, y) \
                if loss_type != "gan" else jnp.mean(pred ** 2)
        return jax.value_and_grad(loss_fn)(params)
    return compute


def _setup():
    gen = build_generator("pix2pix", channel_mults=MULTS)
    state = steps_lib.init_gan_state(
        gen, None, jax.random.key(0), (BATCH, IMG, IMG, 1), "mse", False)
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (BATCH, IMG, IMG, 1), jnp.float32)
    y = jax.random.normal(ky, (BATCH, IMG, IMG, 1), jnp.float32)
    return gen, state, x, y


def _run(devices, fn, params, stats, x, y):
    mesh = Mesh(np.asarray(devices).reshape(-1), ("dp",))
    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    loss, grads = jax.jit(fn)(
        jax.device_put(params, repl), jax.device_put(stats, repl),
        jax.device_put(x, batch_sh), jax.device_put(y, batch_sh))
    return float(loss), jax.device_get(grads)


@pytest.mark.parametrize("loss_type", ["mse", "ssim"])
def test_grad_psum_equivalence(eight_devices, loss_type):
    gen, state, x, y = _setup()
    fn = _grad_fn(gen, loss_type)
    l1, g1 = _run(eight_devices[:1], fn, state.g_params, state.g_stats, x, y)
    l8, g8 = _run(eight_devices, fn, state.g_params, state.g_stats, x, y)
    assert l1 == pytest.approx(l8, rel=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_gan_step_grad_psum_equivalence(eight_devices):
    """The full D-then-G two-optimizer step (the hardest SPMD surface: two
    grad reductions plus the batch-concat D pass) must produce identical
    generator AND discriminator gradients on 1 vs 8 data-parallel devices."""
    gen = build_generator("pix2pix", channel_mults=MULTS)
    disc = Discriminator()
    state = steps_lib.init_gan_state(
        gen, disc, jax.random.key(0), (BATCH, IMG, IMG, 1), "gan", False)
    step = jax.jit(steps_lib.make_gan_train_step(
        gen, disc, "gan", compute_metrics=False, with_grads=True))
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (BATCH, IMG, IMG, 1), jnp.float32)
    y = jax.random.normal(ky, (BATCH, IMG, IMG, 1), jnp.float32)

    grads = []
    for devs in (eight_devices[:1], eight_devices):
        mesh = Mesh(np.asarray(devs).reshape(-1), ("dp",))
        batch_sh = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        _, m = step(jax.device_put(state, repl),
                    jax.device_put(x, batch_sh),
                    jax.device_put(y, batch_sh), jax.random.key(2))
        grads.append(jax.device_get({"g": m["g_grads"], "d": m["d_grads"]}))
    # Reduction-order tolerance: leaves whose per-sample contributions
    # nearly cancel (|g| ~ 1e-6 at init) see f32 ordering noise of the same
    # magnitude; a genuine dp bug (e.g. missing psum scaling) would be off
    # by ~8x on the large leaves, far beyond these bounds.
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5)


def test_full_train_step_metrics_match(eight_devices):
    """Step-level: loss and quality metrics identical across mesh layouts."""
    gen = build_generator("pix2pix", channel_mults=MULTS)
    disc = Discriminator()
    state = steps_lib.init_gan_state(
        gen, disc, jax.random.key(0), (BATCH, IMG, IMG, 1), "gan", False)
    step = jax.jit(steps_lib.make_gan_train_step(gen, disc, "gan"))
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (BATCH, IMG, IMG, 1), jnp.float32)
    y = jax.random.normal(ky, (BATCH, IMG, IMG, 1), jnp.float32)

    outs = []
    for devs in (eight_devices[:1], eight_devices):
        mesh = Mesh(np.asarray(devs).reshape(-1), ("dp",))
        batch_sh = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        _, m = step(jax.device_put(state, repl),
                    jax.device_put(x, batch_sh),
                    jax.device_put(y, batch_sh), jax.random.key(2))
        outs.append({k: float(v) for k, v in m.items()})
    for k in outs[0]:
        assert outs[0][k] == pytest.approx(outs[1][k], rel=1e-4), k


def test_fsdp_step_matches_replicated(eight_devices):
    """--fsdp (ZeRO-3 param/opt sharding over 'dp'): the full GAN train
    step from fsdp-sharded state must produce the same loss and gradients
    as the replicated-state step — GSPMD's just-in-time all-gathers and
    reduce-scatters are semantically invisible.  (Gradients, not post-Adam
    params: see the module header on reduction-order quanta flips.)"""
    from pai_tpu.parallel.mesh import make_mesh
    from pai_tpu.parallel.partitioning import fsdp_spec_for_leaf, shard_state

    gen = build_generator("pix2pix", channel_mults=MULTS)
    disc = Discriminator()
    state = steps_lib.init_gan_state(
        gen, disc, jax.random.key(0), (BATCH, IMG, IMG, 1), "gan", False)
    step = jax.jit(steps_lib.make_gan_train_step(
        gen, disc, "gan", compute_metrics=False, with_grads=True))
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (BATCH, IMG, IMG, 1), jnp.float32)
    y = jax.random.normal(ky, (BATCH, IMG, IMG, 1), jnp.float32)

    mesh = make_mesh(eight_devices, tp=1)  # dp=8
    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    # at least one large conv kernel must actually be dp-sharded
    specs = jax.tree.leaves(jax.tree.map(
        lambda l: fsdp_spec_for_leaf(l, 8), state.g_params))
    assert any("dp" in (s or ()) for s in specs), specs

    outs = []
    for place in (lambda t: jax.device_put(t, repl),
                  lambda t: shard_state(t, mesh, tp=1, fsdp=True)):
        _, m = step(place(state), jax.device_put(x, batch_sh),
                    jax.device_put(y, batch_sh), jax.random.key(2))
        outs.append((float(m["loss"]),
                     jax.device_get({"g": m["g_grads"], "d": m["d_grads"]})))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-5)
    for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5)


def test_fsdp_composes_with_tp(eight_devices):
    """dp=4 x tp=2 with fsdp: conv kernels carry both a 'tp' output-channel
    shard and a 'dp' shard on their largest remaining axis; the step runs."""
    from pai_tpu.parallel.mesh import make_mesh
    from pai_tpu.parallel.partitioning import shard_state

    gen = build_generator("pix2pix", channel_mults=MULTS)
    state = steps_lib.init_gan_state(
        gen, None, jax.random.key(0), (BATCH, IMG, IMG, 1), "mse", False)
    step = jax.jit(steps_lib.make_gan_train_step(
        gen, None, "mse", compute_metrics=False))
    mesh = make_mesh(eight_devices, tp=2)
    batch_sh = NamedSharding(mesh, P("dp"))
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (BATCH, IMG, IMG, 1), jnp.float32)
    y = jax.random.normal(ky, (BATCH, IMG, IMG, 1), jnp.float32)
    s = shard_state(state, mesh, tp=2, fsdp=True)
    s, m = step(s, jax.device_put(x, batch_sh), jax.device_put(y, batch_sh),
                jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.heavy
def test_fsdp_trans_unet_step(eight_devices):
    """FSDP on the model it targets: TransUNet's params are dominated by
    the ViT Dense kernels — fsdp must shard them over 'dp' and run the
    train step (tiny config; the 1B CLI config is exercised on real HW by
    bench.py)."""
    from pai_tpu.models.trans_unet import TransUnet
    from pai_tpu.parallel.mesh import make_mesh
    from pai_tpu.parallel.partitioning import shard_state

    gen = TransUnet(out_channels=1, image_size=32, channel_mults=(1, 1),
                    patch_size=4, vit_layers=2)
    state = steps_lib.init_gan_state(
        gen, None, jax.random.key(0), (BATCH, 32, 32, 1), "mse", False)
    mesh = make_mesh(eight_devices, tp=1)
    s = shard_state(state, mesh, tp=1, fsdp=True)
    # ViT Dense kernels (1024x3072 etc.) must actually be dp-sharded
    vit_shardings = [
        leaf.sharding.spec for leaf in jax.tree.leaves(s.g_params["vit"])
        if hasattr(leaf, "ndim") and leaf.ndim == 2]
    assert any("dp" in (spec or ()) for spec in vit_shardings), vit_shardings
    step = jax.jit(steps_lib.make_gan_train_step(
        gen, None, "mse", compute_metrics=False))
    batch_sh = NamedSharding(mesh, P("dp"))
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (BATCH, 32, 32, 1), jnp.float32)
    y = jax.random.normal(ky, (BATCH, 32, 32, 1), jnp.float32)
    s, m = step(s, jax.device_put(x, batch_sh), jax.device_put(y, batch_sh),
                jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_trainer_fsdp_flag(eight_devices, tmp_path):
    """--fsdp: end-to-end training with ZeRO-3 state sharding."""
    from pai_tpu.train.loop import fit
    from pai_tpu.utils.images import write_png

    rng = np.random.default_rng(3)
    entries = []
    for i in range(8):
        img = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        write_png(img, str(tmp_path / f"in_{i}.png"))
        write_png(255 - img, str(tmp_path / f"gt_{i}.png"))
        entries.append(f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n")
    (tmp_path / "d.yaml").write_text("".join(entries))

    h = {
        "name": "fsdprun", "data": str(tmp_path / "d.yaml"),
        "val_data": str(tmp_path / "d.yaml"), "epochs": 1, "steps": -1,
        "batch_size": 4, "val_epochs": 1, "precision": "32", "ema": False,
        "channel_mults": "1,2", "attention_res": "2", "dropout": 0.0,
        "loss_type": "mse", "schedule_type": "linear",
        "learn_variance": False, "model": "pix2pix", "seed": 0,
        "resume": False, "image_size": 32, "fsdp": True,
        "log_dir": str(tmp_path / "logs"), "ckpt_dir": str(tmp_path / "ck"),
    }
    summary = fit(h)
    assert np.isfinite(summary["val_ssim"])


@pytest.mark.heavy
def test_dp_tp_mesh_runs(eight_devices):
    """The dryrun path: conv output channels Megatron-sharded over 'tp'."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_ring_attention_matches_full(eight_devices):
    """Sequence-parallel ring attention over 8 devices == single-device
    full attention (exact, non-causal)."""
    from pai_tpu.ops.attention import _full_attention
    from pai_tpu.parallel.ring_attention import sequence_sharded_attention

    mesh = Mesh(np.asarray(eight_devices).reshape(-1), ("sp",))
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    b, h, t, d = 2, 2, 512, 32
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)

    expected = _full_attention(q, k, v)
    got = sequence_sharded_attention(mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_multihead_attention_sp_dispatch(eight_devices):
    """Under the sequence_parallel context, multihead_attention dispatches
    to ring attention over the 'sp' mesh axis and stays exact."""
    from pai_tpu.ops import attention as A
    from pai_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(eight_devices, tp=1, sp=4)  # dp=2 x sp=4
    kq, kk, kv = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(kq, (2, 2, 256, 16), jnp.float32)
    k = jax.random.normal(kk, q.shape, jnp.float32)
    v = jax.random.normal(kv, q.shape, jnp.float32)

    expected = A._full_attention(q, k, v)
    with A.sequence_parallel(mesh):
        got = jax.jit(A.multihead_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.heavy
def test_trainer_sp_flag(eight_devices, tmp_path):
    """--sp 2: end-to-end palette training with sequence-parallel ring
    attention in the diffusion UNet (dp=4 x sp=2 over 8 devices)."""
    from pai_tpu.ops import attention as A
    from pai_tpu.train.loop import fit
    from pai_tpu.utils.images import write_png

    rng = np.random.default_rng(1)
    entries = []
    for i in range(4):
        img = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        write_png(img, str(tmp_path / f"in_{i}.png"))
        write_png(255 - img, str(tmp_path / f"gt_{i}.png"))
        entries.append(f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n")
    (tmp_path / "d.yaml").write_text("".join(entries))

    h = {
        "name": "sprun", "data": str(tmp_path / "d.yaml"),
        "val_data": None, "epochs": 1, "steps": -1,
        "batch_size": 4, "val_epochs": 10, "precision": "32", "ema": False,
        "channel_mults": "1,2", "attention_res": "2", "dropout": 0.0,
        "loss_type": "mse", "schedule_type": "linear",
        "learn_variance": False, "model": "palette", "seed": 0,
        "resume": False, "image_size": 32, "tp": 1, "sp": 2,
        "log_dir": str(tmp_path / "logs"), "ckpt_dir": str(tmp_path / "ck"),
    }
    try:
        summary = fit(h)
    finally:
        A.set_sequence_mesh(None)
    assert summary["steps"] >= 1


@pytest.mark.heavy
def test_trainer_tp_flag(eight_devices, tmp_path):
    """--tp 2: end-to-end training with tensor-parallel param sharding."""
    from pai_tpu.train.loop import fit
    from pai_tpu.utils.images import write_png

    rng = np.random.default_rng(0)
    entries = []
    for i in range(8):
        img = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        write_png(img, str(tmp_path / f"in_{i}.png"))
        write_png(255 - img, str(tmp_path / f"gt_{i}.png"))
        entries.append(f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n")
    (tmp_path / "d.yaml").write_text("".join(entries))

    h = {
        "name": "tprun", "data": str(tmp_path / "d.yaml"),
        "val_data": str(tmp_path / "d.yaml"), "epochs": 1, "steps": -1,
        "batch_size": 4, "val_epochs": 1, "precision": "32", "ema": False,
        "channel_mults": "1,2", "attention_res": "2", "dropout": 0.0,
        "loss_type": "mse", "schedule_type": "linear",
        "learn_variance": False, "model": "pix2pix", "seed": 0,
        "resume": False, "image_size": 32, "tp": 2,
        "log_dir": str(tmp_path / "logs"), "ckpt_dir": str(tmp_path / "ck"),
    }
    summary = fit(h)
    assert np.isfinite(summary["val_ssim"])


def test_ring_attention_flash_hop_matches_full(eight_devices):
    """Flash-hop ring (VERDICT r3 item 4): with kernels available and the
    shard above threshold, each ring hop runs the Pallas flash kernel
    (pallas_call in the jaxpr) instead of a materialised einsum; forward
    AND gradients stay exact vs single-device full attention — the
    backward is its own ring that circulates (dK, dV) accumulators home."""
    from pai_tpu import kernels
    from pai_tpu.ops.attention import _full_attention
    from pai_tpu.parallel import ring_attention as R

    mesh = Mesh(np.asarray(eight_devices).reshape(-1), ("sp",))
    kq, kk, kv = jax.random.split(jax.random.key(3), 3)
    b, h, t, d = 1, 2, 1024, 16
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)

    prev = R._FLASH_RING_THRESHOLD
    kernels.set_interpret(True)
    R._FLASH_RING_THRESHOLD = 128  # t_local = 1024/8 = 128
    try:
        fn = lambda q, k, v: R.sequence_sharded_attention(mesh, q, k, v)
        assert "pallas_call" in str(jax.make_jaxpr(fn)(q, k, v))

        got = fn(q, k, v)
        expected = _full_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-5, atol=2e-5)

        # gradients through the flash-hop ring == full-attention gradients
        def loss_ring(q, k, v):
            out = fn(q, k, v)
            return jnp.sum(jnp.sin(out))

        def loss_full(q, k, v):
            return jnp.sum(jnp.sin(_full_attention(q, k, v)))

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for gr, gf, name in zip(g_ring, g_full, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gr), np.asarray(gf), rtol=5e-4, atol=5e-5,
                err_msg=f"d{name} mismatch")
    finally:
        R._FLASH_RING_THRESHOLD = prev
        kernels.set_interpret(False)
