"""Benchmark harness — headline: Pix2Pix 256x256 GAN training images/sec/chip.

The reference publishes no numbers (BASELINE.md), so the baseline is the
driver's north star: >= 2x A100 images/sec/chip on Pix2Pix 256² training.

A100 estimate used for vs_baseline (documented): per-image training cost of
the reference step is ~63 GFLOPs (two generator forwards at 12.2 GFLOPs each
— wrapper.py:126,147 — one generator backward at ~2x forward, PatchGAN D
forwards/backward ~8 GFLOPs). At TF32 with
torch.set_float32_matmul_precision("medium") an A100 sustains ~55-65 TFLOP/s
on conv stacks at high utilisation, i.e. ~900-1000 img/s compute-bound, less
eager-mode and dataloader overhead -> ~550 img/s is a strong A100 number for
the reference. Baseline for vs_baseline is therefore 2 x 550 = 1100
img/s/chip: vs_baseline >= 1.0 means the north star is met.

Measured exactly as the production loop runs: bfloat16 compute policy
(--precision bf16), measured-best batch per config (headline 256, with
OOM backoff for smaller devices), 9 lean steps + 1 metrics step per 10
(log_every_n_steps=10). Sync is a host readback of the final step's loss —
on the remote-tunnel TPU backend block_until_ready returns before device
completion, so a data-dependent readback is the only honest barrier.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_IMG_S = 550.0
NORTH_STAR_TARGET = 2.0 * A100_REFERENCE_IMG_S

IMAGE = 256
TIMED_STEPS = 20
HEADLINE_REPEATS = 3

# The ~550 img/s A100 estimate is a utilisation guess, not a measurement
# (no A100 in this environment). Band: 55-65 TFLOP/s sustained conv TF32
# spans ~870-1030 img/s compute-bound; eager-mode/dataloader overhead
# plausibly costs 20-50% -> 450-700 img/s reference range.
A100_ESTIMATE_BAND = (450.0, 700.0)


def bench_pix2pix_train(batch, dtype):
    """Production loop configuration ``--scan-steps 10``: each 10-step
    logging block is one 9-step lax.scan dispatch plus one metrics step
    (identical math to single-stepping, tested in
    tests/test_train_smoke.py::test_scan_steps_matches_single_steps)."""
    from pai_tpu.models import build_generator, Discriminator
    from pai_tpu.train import steps as steps_lib

    gen = build_generator("pix2pix", dtype=dtype)
    disc = Discriminator(dtype=dtype)
    rng = jax.random.key(0)
    state = steps_lib.init_gan_state(
        gen, disc, rng, (batch, IMAGE, IMAGE, 1), "gan", use_ema=False)

    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (batch, IMAGE, IMAGE, 1), jnp.float32)
    y = jax.random.normal(ky, (batch, IMAGE, IMAGE, 1), jnp.float32)
    xs = jnp.stack([x] * 9)
    ys = jnp.stack([y] * 9)

    scan9 = jax.jit(steps_lib.make_gan_train_scan(gen, disc, "gan"),
                    donate_argnums=(0,))
    full = jax.jit(steps_lib.make_gan_train_step(
        gen, disc, "gan", compute_metrics=True), donate_argnums=(0,))

    state, metrics = scan9(state, xs, ys, rng)
    state, metrics = full(state, x, y, rng)
    float(metrics["loss"])  # host readback: forces real device completion

    # Repeated timed passes over the same compiled executables: the spread
    # bounds run-to-run noise on the shared remote-tunnel TPU (VERDICT r2
    # weak #6 — a single shot can't distinguish a 7% round-over-round gain
    # from scheduler jitter).
    vals = []
    for _ in range(HEADLINE_REPEATS):
        t0 = time.perf_counter()
        for _ in range(TIMED_STEPS // 10):
            state, _ = scan9(state, xs, ys, rng)
            state, metrics = full(state, x, y, rng)
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        vals.append(batch * TIMED_STEPS / dt)
    return vals


def bench_pix2pix_sample(batch, dtype):
    """Inference (plain forward) images/sec, iterations chained so they
    cannot overlap."""
    from pai_tpu.models import build_generator
    from pai_tpu.train import steps as steps_lib

    gen = build_generator("pix2pix", dtype=dtype)
    state = steps_lib.init_gan_state(
        gen, None, jax.random.key(0), (batch, IMAGE, IMAGE, 1), "mse", False)
    x = jax.random.normal(jax.random.key(1), (batch, IMAGE, IMAGE, 1))

    @jax.jit
    def fwd(params, stats, xb):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        return gen.apply(variables, xb, train=False)

    out = fwd(state.g_params, state.g_stats, x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(TIMED_STEPS):
        out = fwd(state.g_params, state.g_stats, out)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    return batch * TIMED_STEPS / dt


def _bench_generic_train(model_name, loss_type, batch, dtype,
                         mults=(1, 2, 4, 8, 8, 8, 8, 8), steps=10):
    from pai_tpu.models import build_generator, Discriminator
    from pai_tpu.train import steps as steps_lib

    gen = build_generator(model_name, channel_mults=mults, dtype=dtype,
                          image_size=IMAGE)
    disc = Discriminator(dtype=dtype) if loss_type == "gan" else None
    state = steps_lib.init_gan_state(
        gen, disc, jax.random.key(0), (batch, IMAGE, IMAGE, 1), loss_type,
        False)
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (batch, IMAGE, IMAGE, 1), jnp.float32)
    y = jax.random.normal(ky, (batch, IMAGE, IMAGE, 1), jnp.float32)
    step = jax.jit(steps_lib.make_gan_train_step(
        gen, disc, loss_type, compute_metrics=False), donate_argnums=(0,))
    for _ in range(2):
        state, m = step(state, x, y, jax.random.key(2))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, jax.random.key(2))
    float(m["loss"])
    return batch * steps / (time.perf_counter() - t0)


def _palette_sample100_ips(gen, state, x, y, batch):
    """Time ONE full 100-step reverse chain after one warmup/compile pass;
    completion is forced by the data-dependent metric readback (the only
    honest barrier on the remote-tunnel backend — see module docstring)."""
    from pai_tpu.train import steps as steps_lib
    from pai_tpu.diffusion import make_schedule

    sched_inf = make_schedule("cosine", 100)
    sample = jax.jit(steps_lib.make_palette_sample_step(gen, sched_inf, False))
    _, pm = sample(state.params, state.stats, x, y, jax.random.key(3))
    float(pm["ssim"][0])
    t0 = time.perf_counter()
    _, pm = sample(state.params, state.stats, x, y, jax.random.key(4))
    float(pm["ssim"][0])
    return batch / (time.perf_counter() - t0)


def _palette_setup(batch, dtype, mults, attn):
    from pai_tpu.models import build_generator
    from pai_tpu.train import steps as steps_lib

    gen = build_generator("palette", channel_mults=mults, attention_res=attn,
                          dtype=dtype)
    state = steps_lib.init_palette_state(
        gen, jax.random.key(0), (batch, IMAGE, IMAGE, 1), False)
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (batch, IMAGE, IMAGE, 1), jnp.float32)
    y = jax.random.normal(ky, (batch, IMAGE, IMAGE, 1), jnp.float32)
    return gen, state, x, y


def _bench_palette(batch, dtype, mults=(1, 1, 2, 2, 4, 4),
                   attn=(16, 8), steps=8):
    """Palette train + full 100-step sampling throughput (the palette
    module's own default width — the CLI-default 8-level config is a ~974M
    parameter model whose f32 Adam state alone exceeds one v5e's HBM)."""
    from pai_tpu.train import steps as steps_lib
    from pai_tpu.diffusion import make_schedule

    gen, state, x, y = _palette_setup(batch, dtype, mults, attn)
    sched = make_schedule("linear", 2000, 1e-6, 0.01)
    step = jax.jit(steps_lib.make_palette_train_step(gen, sched, False),
                   donate_argnums=(0,))
    for _ in range(2):
        state, m = step(state, x, y, jax.random.key(2))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, jax.random.key(2))
    float(m["loss"])
    train_ips = batch * steps / (time.perf_counter() - t0)
    return train_ips, _palette_sample100_ips(gen, state, x, y, batch)


def _bench_palette_default_attn(batch, dtype, mults=(1, 1, 2, 2, 4, 4),
                                attn=(8, 4, 2)):
    """Palette 100-step sampling at the CLI-DEFAULT attention resolutions
    (main.py `--attention-res 8,4,2`, matching /root/reference/main.py:
    188-195): attention at 32²/64²/128² = 1k/4k/16k tokens, the 16k stage
    dispatching the no-lse Pallas flash forward inside the sampler scan.
    The flagship diffusion config's sampling cost, as a captured number
    rather than PERF.md prose (measured basis: docs/PERF.md 'Palette
    sampler at the CLI-default attention resolutions')."""
    gen, state, x, y = _palette_setup(batch, dtype, mults, attn)
    return _palette_sample100_ips(gen, state, x, y, batch)


def _bench_trans_unet(dtype, steps=6):
    """TransUNet (BASELINE config 4) at its canonical mults (1,2,2,4,4) —
    the 1.03B-parameter model whose param-count golden the tests pin. Its
    f32 Adam state alone is ~12 GB; batch 96 is the measured-best fit in
    the remaining v5e HBM (the 1B params sit in the 4-token ViT, so conv
    activations — not ViT state — bound the batch), with OOM backoff."""
    return _with_batch_backoff(
        lambda b: _bench_generic_train("trans_unet", "mse", b, dtype,
                                       mults=(1, 2, 2, 4, 4), steps=steps),
        (96, 64, 32, 16, 8, 4))


def _with_batch_backoff(fn, batches):
    """Run ``fn(batch)`` at the largest batch that fits; per-chip throughput
    rises with batch until HBM runs out, so each config benches at its
    measured-best size with smaller fallbacks for tighter devices."""
    last_err = None
    for batch in batches:
        try:
            return fn(batch), batch
        except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED etc.
            msg = str(e).lower()
            if ("resource_exhausted" not in msg and "memory" not in msg
                    and "remote_compile" not in msg):
                raise
            last_err = e
    raise last_err


def bench_input_pipeline(batch=128, n_pairs=512, image_size=256):
    """MEASURED end-to-end input pipeline (VERDICT r3 weak #3): a ramdisk
    PNG dataset through the production ``BatchLoader`` — threaded C++
    decode -> uint8 H2D -> on-device normalize — (a) standalone and
    (b) overlapped with the real pix2pix train step. Replaces the PERF.md
    "~N cores sustain X decodes/s" arithmetic with a steady-state number.

    Honesty notes carried in the output keys: the measurement is bound by
    THIS host's core count (os.cpu_count; the C++ decoder scales with
    threads but not past the cores that exist) and, on the remote-tunnel
    dev TPU, by the ~44 MB/s H2D link — both are environment ceilings, not
    framework ones (decode and H2D ride a production pod's local CPUs/PCIe).
    """
    import os
    import shutil
    import tempfile

    import numpy as np
    import yaml

    from pai_tpu.data import BatchLoader, ImageDataset
    from pai_tpu.models import build_generator, Discriminator
    from pai_tpu.train import steps as steps_lib
    from pai_tpu.utils.images import write_png

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="pai_bench_png_", dir=shm)
    try:
        # Realistic-entropy 256² grayscale pairs (smooth field + noise) at
        # default zlib level, so decode does real inflate+unfilter work.
        rng = np.random.default_rng(0)
        entries = []
        base = np.cumsum(np.cumsum(
            rng.normal(0, 1, (image_size, image_size)), 0), 1)
        base = (base - base.min()) / (base.max() - base.min())
        for i in range(n_pairs):
            noise = rng.integers(0, 40, (image_size, image_size),
                                 dtype=np.uint8)
            img = (base * 215).astype(np.uint8) + noise
            img = np.roll(img, 7 * i, axis=0)  # distinct per-pair content
            for tag in ("x", "y"):
                write_png(img[..., None] if tag == "x" else
                          255 - img[..., None],
                          os.path.join(root, f"{tag}_{i}.png"),
                          compress_level=6)
            entries.append({"input": f"x_{i}.png",
                            "ground_truth": f"y_{i}.png"})
        manifest = os.path.join(root, "train.yaml")
        with open(manifest, "w") as f:
            yaml.safe_dump(entries, f)

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
        sharding = NamedSharding(mesh, P("dp"))
        ds = ImageDataset(manifest, image_size=image_size, normalize=True)
        loader = BatchLoader(ds, batch, shuffle=True, pad_mode="cycle",
                             num_workers=max(os.cpu_count() or 1, 1),
                             sharding=sharding)

        # The standalone consumer mirrors the train step's dispatch shape:
        # ONE pre-compiled executable call per batch (negligible compute)
        # whose execution forces that batch's H2D + normalize to complete,
        # and one data-dependent readback of the chained accumulator at
        # the very end. The r04 version instead built an EAGER op chain
        # per batch — each eager dispatch round-trips the remote dev
        # tunnel and serializes against the producer thread's own
        # dispatches, under-reporting the loader ~3x (BENCH_r04: 104
        # img/s standalone vs 306 img/s for the SAME loader overlapped
        # with training — impossible, hence an artifact). A zero-op
        # consumer is no better: without per-batch executions the remote
        # client defers transfer completion and the final barrier pays a
        # round trip per deferred array (measured minutes-long stalls).
        consume = jax.jit(lambda acc, xb, yb: acc + xb[0, 0, 0, 0]
                          + yb[0, 0, 0, 0])

        def drain_epoch(acc):
            n = 0
            for b in loader:
                acc = consume(acc, b.x, b.y)
                n += b.x.shape[0]
            return n, acc

        # warmup: compile normalize + consume, warm the page cache
        _, acc = drain_epoch(jnp.zeros((), jnp.float32))
        float(acc)
        t0 = time.perf_counter()
        n = 0
        acc = jnp.zeros((), jnp.float32)
        for _ in range(3):
            got, acc = drain_epoch(acc)
            n += got
        float(acc)  # single end-of-run readback: honest completion barrier
        standalone = n / (time.perf_counter() - t0)

        # Overlapped with the production train step: decode of batch k+1
        # runs (GIL released) while the device executes step k.
        gen = build_generator("pix2pix", dtype=jnp.bfloat16)
        disc = Discriminator(dtype=jnp.bfloat16)
        state = steps_lib.init_gan_state(
            gen, disc, jax.random.key(0),
            (batch, image_size, image_size, 1), "gan", use_ema=False)
        step = jax.jit(steps_lib.make_gan_train_step(
            gen, disc, "gan", compute_metrics=False), donate_argnums=(0,))
        rng_step = jax.random.key(1)
        for b in loader:  # warmup epoch: compile + stabilise
            state, m = step(state, b.x, b.y, rng_step)
        float(m["loss"])
        t0 = time.perf_counter()
        n = 0
        for _ in range(2):
            for b in loader:
                state, m = step(state, b.x, b.y, rng_step)
                n += batch
        float(m["loss"])
        e2e = n / (time.perf_counter() - t0)
        return standalone, e2e
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _release_config_memory():
    """Drop every compiled executable and device buffer between configs.
    The remote-compile client retains large host-side artifacts per compiled
    program; across the five-config matrix those accumulate to ~100 GB of
    host RSS (observed OOM-kill on a 125 GB host). Each config is timed
    independently, so clearing the jit caches between them is free."""
    import gc

    gc.collect()
    jax.clear_caches()
    gc.collect()


def main():
    import os

    # Measured-best batches on one v5e chip (16 GB HBM); the backoff keeps
    # the harness correct on smaller devices.
    train_vals, train_batch = _with_batch_backoff(
        lambda b: bench_pix2pix_train(b, jnp.bfloat16), (256, 128, 64))
    train_bf16 = sorted(train_vals)[len(train_vals) // 2]  # median
    _release_config_memory()
    sample_ips = bench_pix2pix_sample(128, jnp.bfloat16)
    _release_config_memory()
    lo_t, hi_t = (2.0 * A100_ESTIMATE_BAND[0], 2.0 * A100_ESTIMATE_BAND[1])
    result = {
        "metric": "pix2pix_256_gan_train_images_per_sec_per_chip",
        "value": round(train_bf16, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(train_bf16 / NORTH_STAR_TARGET, 3),
        "value_repeats": HEADLINE_REPEATS,
        "value_spread": [round(min(train_vals), 2), round(max(train_vals), 2)],
        "sample_images_per_sec": round(sample_ips, 2),
        "batch": train_batch,
        "precision": "bf16",
        "baseline_note": "vs_baseline = value / (2 x ~550 img/s A100 est)",
        "baseline_uncertainty": {
            "a100_estimate_img_s": [A100_ESTIMATE_BAND[0],
                                    A100_ESTIMATE_BAND[1]],
            "vs_baseline_range": [round(train_bf16 / hi_t, 3),
                                  round(train_bf16 / lo_t, 3)],
        },
        "backend": jax.default_backend(),
    }
    if not os.environ.get("BENCH_FAST"):
        # All five BASELINE.json configs in the one captured line
        # (each adds a long compile; BENCH_FAST=1 skips to the headline).
        ips, _ = _with_batch_backoff(
            lambda b: _bench_generic_train("res18_unet", "mse", b,
                                           jnp.bfloat16), (128, 64))
        result["res18_mse_train_images_per_sec"] = round(ips, 2)
        _release_config_memory()
        ips, _ = _with_batch_backoff(
            lambda b: _bench_generic_train("attention_unet", "ssim+psnr", b,
                                           jnp.bfloat16), (256, 128, 64))
        result["attention_ssim_psnr_train_images_per_sec"] = round(ips, 2)
        _release_config_memory()
        trans_ips, trans_batch = _bench_trans_unet(jnp.bfloat16)
        result["trans_unet_1b_mse_train_images_per_sec"] = round(trans_ips, 2)
        result["trans_unet_batch"] = trans_batch
        _release_config_memory()
        (pal_train, pal_sample), pal_batch = _with_batch_backoff(
            lambda b: _bench_palette(b, jnp.bfloat16), (32, 16, 8))
        result["palette_train_images_per_sec"] = round(pal_train, 2)
        result["palette_sample100_images_per_sec"] = round(pal_sample, 3)
        result["palette_batch"] = pal_batch
        _release_config_memory()
        ips, b = _with_batch_backoff(
            lambda b: _bench_palette_default_attn(b, jnp.bfloat16), (16, 8))
        result["palette_default_attn_sample100_images_per_sec"] = \
            round(ips, 3)
        result["palette_default_attn_batch"] = b
        result["palette_default_attn_note"] = (
            "--attention-res 8,4,2 (CLI default: 1k/4k/16k-token stages, "
            "Pallas flash at 16k) at palette width, mults (1,1,2,2,4,4); "
            "batch 32 exceeds HBM (docs/PERF.md)")
        _release_config_memory()
        standalone, e2e = bench_input_pipeline()
        result["input_images_per_sec_measured"] = round(standalone, 2)
        result["input_images_per_sec_overlapped"] = round(e2e, 2)
        result["input_pipeline_host_cores"] = os.cpu_count()
        result["input_pipeline_note"] = (
            "ramdisk PNG -> threaded C++ decode -> uint8 H2D -> device "
            "normalize; standalone = loader alone, overlapped = same "
            "loader feeding the pix2pix train step (r04's standalone "
            "104 < overlapped 306 img/s was a consumer-side dispatch "
            "artifact, fixed by a single end-of-epoch readback barrier); "
            "bounded by host cores + dev-tunnel H2D, not by the TPU")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
