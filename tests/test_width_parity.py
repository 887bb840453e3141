"""Production-width palette pin: inner_channel=128 at 256².

``tools/width_parity.py`` drove the REFERENCE guided_diffusion UNet at
the width ``Palette`` hard-codes (/root/reference/models/palette.py:50-61
— inner_channel=128, channel_mults (1,1,2,2,4,4), attn_res (16,8)) from
``deterministic_weights`` and committed goldens only (the 133M-param
weights regenerate here from the committed manifest — never stored).
This test imports the identical weights through the production interop
name maps and pins, at the reference's LITERAL width and resolution:

* the training-step forward loss in train mode (BN batch statistics);
* the full backward: per-tensor gradient rms everywhere plus four
  representative tensors elementwise (first conv, first ResBlock conv,
  a qkv projection under an attention BatchNorm1d, the head);
* the post-forward BN running-stat (mean, rms) summaries;
* the first 10 of 100 reverse-sampler steps, elementwise per step.

Any width-dependent semantic break (BatchNorm1d statistics inside
128-ch attention — guided_diffusion/nn.py:51-58 — or f32 accumulation
across the 4x-wider convs) would surface as >float-level deviation.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.parity  # ~10 min CPU: 128-wide 256² fwd+bwd+chain

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "width_pin")
TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
IMG = 256
INNER = 128
MULTS = (1, 1, 2, 2, 4, 4)
ATTN = (16, 8)
TIMESTEPS = 100
PREFIX_STEPS = 10


def _nhwc(a):
    return np.moveaxis(a, -3, -1)


def test_palette_production_width_pin():
    man_path = os.path.join(FIXDIR, "manifest.json")
    if not os.path.exists(man_path):
        pytest.skip("width_pin fixture missing (tools/width_parity.py)")
    sys.path.insert(0, TOOLS)
    from make_parity_fixture import deterministic_weights

    with open(man_path) as f:
        manifest = json.load(f)
    sd = deterministic_weights(manifest)
    z = np.load(os.path.join(FIXDIR, "io.npz"))

    from flax.traverse_util import flatten_dict

    from pai_tpu.diffusion import make_schedule
    from pai_tpu.diffusion.gaussian import p_mean_variance
    from pai_tpu.interop.torch_import import (
        _gd_index_map,
        _materialize,
        _palette_key,
    )
    from pai_tpu.models.diffusion_unet import DiffusionUNet

    gen = DiffusionUNet(in_channels=2, out_channels=1, inner_channel=INNER,
                        res_blocks=2, channel_mults=MULTS, attn_res=ATTN,
                        num_heads=4, dropout=0.0)
    x = jnp.asarray(_nhwc(z["x"]))
    y_t = jnp.asarray(_nhwc(z["y_t"]))
    noise = jnp.asarray(_nhwc(z["noise"]))
    gamma = jnp.asarray(z["gamma"]).reshape(-1)

    abstract = jax.eval_shape(lambda: gen.init(
        jax.random.key(0), x, y_t, gamma, train=False))
    index_map = _gd_index_map(MULTS, ATTN)
    key_fn = lambda p: _palette_key(p, index_map)  # noqa: E731
    params = _materialize(abstract["params"], sd, key_fn)
    stats = _materialize(abstract["batch_stats"], sd, key_fn)

    # --- training-step forward + backward (train mode: BN batch stats,
    # running-stat update; reference math at palette.py:110-140) ---
    def loss_fn(p):
        out, mut = gen.apply(
            {"params": p, "batch_stats": stats}, x, y_t, gamma,
            train=True, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"])
        return jnp.mean((out - noise) ** 2), mut["batch_stats"]

    (loss, new_stats), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    loss = float(loss)
    ref_loss = float(z["loss"])
    print(f"width pin loss: jax {loss:.8f} torch {ref_loss:.8f}")
    assert abs(loss - ref_loss) <= 2e-5 * max(1.0, abs(ref_loss)), \
        (loss, ref_loss)

    # --- gradient pins ---
    grad_rms_ref = dict(zip([str(k) for k in z["grad_rms_keys"]],
                            np.asarray(z["grad_rms_vals"], np.float64)))
    # torch '_' inside real names (input_blocks, skip_connection, ...) was
    # flattened into the npz key; rebuild by matching the actual key set
    elem = {}
    for k in z.files:
        if not k.startswith("grad_elem__"):
            continue
        flat = k[len("grad_elem__"):]
        match = [tk for tk in grad_rms_ref
                 if tk.replace(".", "_") == flat]
        assert len(match) == 1, (flat, match)
        elem[match[0]] = np.asarray(z[k], np.float32)

    gflat = flatten_dict(grads)
    gsq = 0.0
    checked = 0
    worst = (0.0, None)
    violations = []
    for path, g in gflat.items():
        torch_key, _kind = key_fn(path)
        g64 = np.asarray(g, np.float64)
        gsq += float(np.sum(g64 * g64))
        ref = grad_rms_ref.get(torch_key)
        if ref is None:
            continue
        got = float(np.sqrt(np.mean(g64 * g64)))
        rel = abs(got - ref) / (abs(ref) + 1e-12)
        checked += 1
        # rms is transpose-invariant, so no layout transform is needed;
        # budget covers f32 reduction-order drift through a 133M-param
        # backward at 256². The noise floor covers the structurally-zero
        # gradients (a conv bias immediately followed by BatchNorm has
        # exact-zero true grad — BN subtracts the mean — so its ~1e-12..
        # 1e-7 measured rms is pure cancellation noise in BOTH
        # frameworks, and a relative comparison is meaningless; the
        # tensor-rms scale here runs 3.7e-5 median / 0.38 max).
        if max(got, abs(ref)) <= 2e-6:
            continue
        if rel > worst[0]:
            worst = (rel, torch_key)
        if rel > 5e-3:
            violations.append((torch_key, got, ref, rel))
    assert checked == len(grad_rms_ref), (checked, len(grad_rms_ref))
    assert not violations, violations
    print(f"grad rms pinned on {checked} tensors; worst rel "
          f"{worst[0]:.2e} at {worst[1]}")
    ref_norm = float(z["grad_global_norm"])
    got_norm = float(np.sqrt(gsq))
    assert abs(got_norm - ref_norm) <= 2e-4 * ref_norm, (got_norm, ref_norm)

    # elementwise: substitute the committed torch gradients into the sd
    # and reuse the weight-layout port (gradients transform like their
    # weights), then compare the mapped flax slots
    sd_g = dict(sd)
    sd_g.update(elem)
    gref_tree = flatten_dict(_materialize(abstract["params"], sd_g, key_fn))
    n_elem = 0
    for path, g in gflat.items():
        torch_key, _kind = key_fn(path)
        if torch_key not in elem:
            continue
        a = np.asarray(g, np.float64)
        b = np.asarray(gref_tree[path], np.float64)
        scale = float(np.sqrt(np.mean(b * b))) + 1e-12
        err = float(np.abs(a - b).max()) / scale
        n_elem += 1
        print(f"grad elem {torch_key}: max rel-to-rms {err:.2e}")
        assert err <= 5e-3, (torch_key, err)
    assert n_elem == len(elem), (n_elem, len(elem))

    # --- BN running stats after the one train forward ---
    bn_ref = dict(zip([str(k) for k in z["bn_keys"]],
                      np.asarray(z["bn_vals"], np.float64)))
    n_bn = 0
    for path, v in flatten_dict(new_stats).items():
        torch_key, _kind = key_fn(path)
        if torch_key not in bn_ref:
            continue
        a = np.asarray(v, np.float64)
        m_ref, r_ref = bn_ref[torch_key]
        # running_var carries the DOCUMENTED biased-vs-unbiased running
        # update deviation (pai_tpu/ops/layers.py:165-166): after one
        # momentum-0.1 update the difference is 0.1*var_batch/(n-1) —
        # at the deepest 8² stage (n=64) with batch var up to ~2.5x the
        # running value that is ~4e-3 relative. running_mean has no such
        # correction and pins at float level (incl. the attention norms,
        # whose 0.81 composed momentum replicates the reference's
        # checkpoint double update — models/diffusion_unet.py:116-122).
        # attention norms compose TWO updates (0.19 net batch weight),
        # and the bottleneck one runs at n=64 with batch var up to ~2.5x
        # the running value: 0.19*var/(n-1) reaches ~9e-3 there.
        var_coeff = (1e-2 if ".norm.running_var" in torch_key else 4e-3)
        tol = 1e-5 + (var_coeff if torch_key.endswith("running_var")
                      else 1e-4) * abs(m_ref)
        assert abs(float(a.mean()) - m_ref) <= tol, \
            (torch_key, float(a.mean()), m_ref)
        r_got = float(np.sqrt(np.mean(a * a)))
        tol_r = 1e-5 + (var_coeff if torch_key.endswith("running_var")
                        else 1e-4) * abs(r_ref)
        assert abs(r_got - r_ref) <= tol_r, (torch_key, r_got, r_ref)
        n_bn += 1
    assert n_bn == len(bn_ref), (n_bn, len(bn_ref))

    # --- truncated reverse chain: first 10 of 100 steps, eval mode ---
    sched = make_schedule("cosine", TIMESTEPS)
    variables = {"params": params, "batch_stats": stats}

    @jax.jit
    def one_step(y_cur, t_scalar, noise_j):
        t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
        g = sched.gammas[t]
        model_output = gen.apply(variables, x, y_cur, g, train=False)
        mean, log_variance = p_mean_variance(
            sched, model_output, y_cur, t, False)
        n_j = noise_j * (t > 1).reshape(-1, 1, 1, 1)
        return mean + jnp.exp(0.5 * log_variance) * n_j

    step_noise = jnp.asarray(_nhwc(np.asarray(z["step_noise"])))
    chain_ref = np.asarray(z["chain"])
    y_cur = jnp.asarray(_nhwc(np.asarray(z["y_T"])))
    worst_chain = 0.0
    for j, i in enumerate(range(TIMESTEPS - 1,
                                TIMESTEPS - 1 - PREFIX_STEPS, -1)):
        y_cur = one_step(y_cur, i, step_noise[j])
        got = np.moveaxis(np.asarray(y_cur), -1, 1)
        err = float(np.abs(got - chain_ref[j]).max())
        worst_chain = max(worst_chain, err)
        assert err <= 1e-4, (j, i, err)
    print(f"chain prefix pinned: worst per-step max|delta| "
          f"{worst_chain:.2e}")  # recorded in docs/PARITY.md
