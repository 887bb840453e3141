"""Torch-reference -> pai_tpu weight-layout porting (shared by the
forward-parity and training-parity tests).

Layout rules: torch conv OIHW -> flax HWIO; torch ConvTranspose
(in,out,kh,kw) -> HWIO (the flax op flips spatially at apply time); BN
weight/bias -> scale/bias params, running_mean/var -> batch_stats. The
torch tensor names follow the reference modules (models/pix2pix.py,
models/wrapper.py:176-238, models/res_unet.py, models/attention_unet.py)
at the tiny mults=(1,2) 32x32 configs the fixtures pin.
"""

import numpy as np

import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

# Single source of truth for the tensor-layout rules: the production
# checkpoint importer. These fixtures witness the same transforms.
from pai_tpu.interop.torch_import import _transform


def conv_w(w):   # torch OIHW -> HWIO
    return jnp.asarray(_transform(w, "conv"))


def convt_w(w):  # torch (in,out,kh,kw) -> HWIO
    return jnp.asarray(_transform(w, "convt"))


def _bn(w, my_prefix, torch_mod, params, stats):
    params[my_prefix + ("scale",)] = jnp.asarray(w[f"{torch_mod}.weight"])
    params[my_prefix + ("bias",)] = jnp.asarray(w[f"{torch_mod}.bias"])
    stats[my_prefix + ("mean",)] = jnp.asarray(w[f"{torch_mod}.running_mean"])
    stats[my_prefix + ("var",)] = jnp.asarray(w[f"{torch_mod}.running_var"])


def _cv(w, my_prefix, torch_mod, params):
    params[my_prefix + ("kernel",)] = conv_w(w[f"{torch_mod}.weight"])
    params[my_prefix + ("bias",)] = jnp.asarray(w[f"{torch_mod}.bias"])


def port_pix2pix(w, prefix="unet"):
    """Pix2Pix UNet mults (1,2): stem, enc_1, dec_0 (ConvT+BN), head."""
    params = {
        ("stem", "kernel"): conv_w(w[f"{prefix}.encoders.0.weight"]),
        ("stem", "bias"): jnp.asarray(w[f"{prefix}.encoders.0.bias"]),
        ("enc_1", "Conv_0", "kernel"): conv_w(
            w[f"{prefix}.encoders.1.encode.1.weight"]),
        ("enc_1", "Conv_0", "bias"): jnp.asarray(
            w[f"{prefix}.encoders.1.encode.1.bias"]),
        ("dec_0", "ConvTranspose_0", "kernel"): convt_w(
            w[f"{prefix}.decoders.0.decode.1.weight"]),
        ("dec_0", "ConvTranspose_0", "bias"): jnp.asarray(
            w[f"{prefix}.decoders.0.decode.1.bias"]),
        ("dec_0", "BatchNorm_0", "BatchNorm_0", "scale"): jnp.asarray(
            w[f"{prefix}.decoders.0.decode.2.weight"]),
        ("dec_0", "BatchNorm_0", "BatchNorm_0", "bias"): jnp.asarray(
            w[f"{prefix}.decoders.0.decode.2.bias"]),
        ("head", "kernel"): convt_w(w[f"{prefix}.decoders.1.weight"]),
        ("head", "bias"): jnp.asarray(w[f"{prefix}.decoders.1.bias"]),
    }
    stats = {
        ("dec_0", "BatchNorm_0", "BatchNorm_0", "mean"): jnp.asarray(
            w[f"{prefix}.decoders.0.decode.2.running_mean"]),
        ("dec_0", "BatchNorm_0", "BatchNorm_0", "var"): jnp.asarray(
            w[f"{prefix}.decoders.0.decode.2.running_var"]),
    }
    return unflatten_dict(params), unflatten_dict(stats)


def port_discriminator(w, prefix="disc"):
    """PatchGAN discriminator (wrapper.py:176-238): 4 stride-2 blocks +
    bias-free patch head."""
    flat = {}
    for i in range(4):
        flat[(f"DiscriminatorBlock_{i}", "Conv_0", "kernel")] = conv_w(
            w[f"{prefix}.discriminator.{i}.block.0.weight"])
        flat[(f"DiscriminatorBlock_{i}", "Conv_0", "bias")] = jnp.asarray(
            w[f"{prefix}.discriminator.{i}.block.0.bias"])
    flat[("Conv_0", "kernel")] = conv_w(
        w[f"{prefix}.discriminator.4.weight"])
    return unflatten_dict(flat)


def port_res18(w, prefix="res"):
    """ResUNet-18 mults (1,2): stem, residual enc/dec with projection
    skips, head."""
    params, stats = {}, {}
    _cv(w, ("stem",), f"{prefix}.in_conv", params)
    blocks = [
        (("enc_0",), f"{prefix}.encoders.0.encode.0", False),
        (("enc_1",), f"{prefix}.encoders.1.encode.0", True),
        (("dec_0",), f"{prefix}.decoders.0.decode.0", True),
        (("dec_final",), f"{prefix}.decoders.1.decode.0", True),
    ]
    for my, tm, has_skip in blocks:
        _cv(w, my + ("Conv_0",), f"{tm}.conv_block.0", params)
        _bn(w, my + ("BatchNorm_0", "BatchNorm_0"), f"{tm}.conv_block.1",
            params, stats)
        _cv(w, my + ("Conv_1",), f"{tm}.conv_block.3", params)
        _bn(w, my + ("BatchNorm_1", "BatchNorm_0"), f"{tm}.conv_block.4",
            params, stats)
        if has_skip:
            _cv(w, my + ("Conv_2",), f"{tm}.conv_skip.0", params)
            _bn(w, my + ("BatchNorm_2", "BatchNorm_0"), f"{tm}.conv_skip.1",
                params, stats)
    _cv(w, ("head",), f"{prefix}.out.0", params)
    return unflatten_dict(params), unflatten_dict(stats)


def port_attention(w, prefix="att"):
    """Attention U-Net mults (1,2): stem, enc_1, additive attention gate,
    ConvT decoder, head."""
    params, stats = {}, {}
    _cv(w, ("stem",), f"{prefix}.encoders.0", params)
    _cv(w, ("enc_1", "Conv_0"), f"{prefix}.encoders.1.encode.1", params)
    params[("dec_0", "ConvTranspose_0", "kernel")] = convt_w(
        w[f"{prefix}.decoders.0.decode.1.weight"])
    params[("dec_0", "ConvTranspose_0", "bias")] = jnp.asarray(
        w[f"{prefix}.decoders.0.decode.1.bias"])
    _bn(w, ("dec_0", "BatchNorm_0", "BatchNorm_0"),
        f"{prefix}.decoders.0.decode.2", params, stats)
    g = f"{prefix}.attention_blocks.0"
    _cv(w, ("gate_0", "input_gate"), f"{g}.input_gate.0", params)
    _bn(w, ("gate_0", "BatchNorm_0", "BatchNorm_0"), f"{g}.input_gate.1",
        params, stats)
    _cv(w, ("gate_0", "signal_gate"), f"{g}.signal_gate.0", params)
    _bn(w, ("gate_0", "BatchNorm_1", "BatchNorm_0"), f"{g}.signal_gate.1",
        params, stats)
    _cv(w, ("gate_0", "attention"), f"{g}.attention.0", params)
    _bn(w, ("gate_0", "BatchNorm_2", "BatchNorm_0"), f"{g}.attention.1",
        params, stats)
    params[("head", "kernel")] = convt_w(w[f"{prefix}.decoders.1.weight"])
    params[("head", "bias")] = jnp.asarray(w[f"{prefix}.decoders.1.bias"])
    return unflatten_dict(params), unflatten_dict(stats)


# -- guided_diffusion UNet (structure per unet.py:418-548) -------------
def gd_block_map(mults=(1, 2), res_blocks=2, attn_res=(2,)):
    """flax module name -> torch sequential path, generated by replaying
    the reference constructor's block-list numbering (unet.py:418-542) for
    an arbitrary (channel_mults, res_blocks, attn_res) topology."""
    attn = set(attn_res)
    m = {
        "in_conv": "input_blocks.0.0",
        "mid_res_0": "middle_block.0",
        "mid_attn": "middle_block.1",
        "mid_res_1": "middle_block.2",
        "out_norm": "out.0",
        "out_conv": "out.2",
        "cond_embed_0": "cond_embed.0",
        "cond_embed_1": "cond_embed.2",
    }
    idx, blk, ds = 1, 0, 1
    for level in range(len(mults)):
        for _ in range(res_blocks):
            m[f"in_res_{blk}"] = f"input_blocks.{idx}.0"
            if ds in attn:
                m[f"in_attn_{blk}"] = f"input_blocks.{idx}.1"
            idx += 1
            blk += 1
        if level != len(mults) - 1:
            m[f"down_{level}"] = f"input_blocks.{idx}.0"
            idx += 1
            ds *= 2
    idx, blk = 0, 0
    for level in reversed(range(len(mults))):
        for i in range(res_blocks + 1):
            m[f"out_res_{blk}"] = f"output_blocks.{idx}.0"
            layer = 1
            if ds in attn:
                m[f"out_attn_{blk}"] = f"output_blocks.{idx}.{layer}"
                layer += 1
            if level and i == res_blocks:
                m[f"up_{level}"] = f"output_blocks.{idx}.{layer}"
                ds //= 2
            idx += 1
            blk += 1
    return m


GD_BLOCKS = gd_block_map()
GD_RES_SUB = {
    "norm_in": "in_layers.0",
    "conv_in": "in_layers.2",
    "emb_proj": "emb_layers.1",
    "norm_out": "out_layers.0",
    "conv_out": "out_layers.3",
    "skip": "skip_connection",
}
GD_ATTN_SUB = {"norm": "norm", "qkv": "qkv", "proj": "proj_out"}


def gd_torch_name(path, prefix="gd", blocks=None):
    """flax flat path tuple -> (torch tensor name, transform kind)."""
    block = (blocks or GD_BLOCKS)[path[0]]
    leaf = path[-1]
    if path[0].startswith(("cond_embed",)):
        torch_mod = block
    elif path[0] in ("in_conv", "out_conv", "out_norm"):
        torch_mod = block
    elif "attn" in path[0]:
        torch_mod = f"{block}.{GD_ATTN_SUB[path[1]]}"
    else:  # ResBlock
        torch_mod = f"{block}.{GD_RES_SUB[path[1]]}"

    if leaf == "scale":
        return f"{prefix}.{torch_mod}.weight", "1d"
    if leaf == "bias":
        return f"{prefix}.{torch_mod}.bias", "1d"
    if leaf == "mean":
        return f"{prefix}.{torch_mod}.running_mean", "1d"
    if leaf == "var":
        return f"{prefix}.{torch_mod}.running_var", "1d"
    return f"{prefix}.{torch_mod}.weight", "kernel"


def port_diffusion_unet(model, w, example_args, prefix="gd"):
    """Port a torch guided_diffusion UNet state into the flax
    DiffusionUNet; the name map is generated from the model's own
    (channel_mults, res_blocks, attn_res) topology. ``example_args`` =
    (x, y, gammas) shape tuples used only to build the abstract tree."""
    import jax
    from flax.traverse_util import flatten_dict

    blocks = gd_block_map(tuple(model.channel_mults), model.res_blocks,
                          tuple(model.attn_res))
    abstract = jax.eval_shape(lambda: model.init(
        jax.random.key(0), jnp.zeros(example_args[0]),
        jnp.zeros(example_args[1]), jnp.ones(example_args[2]), train=False))

    def port(collection):
        flat = {}
        for path, leaf in flatten_dict(abstract[collection]).items():
            name, kind = gd_torch_name(path, prefix, blocks)
            val = w[name]
            if kind == "kernel":
                if val.ndim == 4:      # conv OIHW -> HWIO
                    val = np.transpose(val, (2, 3, 1, 0))
                elif val.ndim == 3:    # conv1d (out,in,1) -> (in,out)
                    val = np.transpose(val[:, :, 0], (1, 0))
                elif val.ndim == 2:    # linear (out,in) -> (in,out)
                    val = np.transpose(val, (1, 0))
            assert val.shape == leaf.shape, (path, val.shape, leaf.shape)
            flat[path] = jnp.asarray(val)
        return unflatten_dict(flat)

    return port("params"), port("batch_stats")
