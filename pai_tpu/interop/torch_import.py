"""Import reference PyTorch Lightning checkpoints into pai_tpu.

The reference saves Lightning ``.ckpt`` files (``main.py:113-119``) whose
``state_dict`` holds the generator under ``unet.`` (``wrapper.py:29``,
``palette.py:50``) and the PatchGAN under ``discriminator.``
(``wrapper.py:32-34``).  This module maps every tensor into the pai_tpu
flax parameter tree so a user of the reference can evaluate or keep
training an existing run here without retraining:

* torch conv ``OIHW`` -> flax ``HWIO``; ConvTranspose ``(in,out,kh,kw)``
  -> ``HWIO``; Linear ``(out,in)`` -> ``(in,out)``; qkv conv1d
  ``(out,in,1)`` -> ``(in,out)``; BatchNorm weight/bias ->
  scale/bias params, running stats -> ``batch_stats``.
* The name maps are *structural*: they re-run the reference's module
  construction arithmetic (e.g. guided_diffusion ``input_blocks``
  numbering, ``unet.py:418-473``) for arbitrary ``channel_mults`` /
  ``attention_res`` / ``res_blocks`` — not fixture-specific tables.

Only model weights and running statistics are imported; Adam moments are
not (the reference's eval path never needs them, and resumed training
re-warms them within a few steps — documented in the CLI help).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict


# --------------------------------------------------------------------------
# tensor-layout transforms
# --------------------------------------------------------------------------
def _transform(value, kind: str):
    v = np.asarray(value)
    if kind == "conv":        # OIHW -> HWIO
        return np.transpose(v, (2, 3, 1, 0))
    if kind == "convt":       # (in,out,kh,kw) -> HWIO
        return np.transpose(v, (2, 3, 0, 1))
    if kind == "linear":      # (out,in) -> (in,out)
        return np.transpose(v, (1, 0))
    if kind == "qkv1d":       # conv1d (out,in,1) -> (in,out)
        return np.transpose(v[:, :, 0], (1, 0))
    return v                   # "1d" / "raw"


def _conv(mod: str, leaf: str, kind: str = "conv") -> Tuple[str, str]:
    if leaf == "kernel":
        return f"{mod}.weight", kind
    return f"{mod}.bias", "1d"


_BN_LEAF = {"scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}


def _bn(mod: str, leaf: str) -> Tuple[str, str]:
    return f"{mod}.{_BN_LEAF[leaf]}", "1d"


def _dense(mod: str, leaf: str) -> Tuple[str, str]:
    if leaf == "kernel":
        return f"{mod}.weight", "linear"
    return f"{mod}.bias", "1d"


def _ln(mod: str, leaf: str) -> Tuple[str, str]:
    return f"{mod}.{'weight' if leaf == 'scale' else 'bias'}", "1d"


# --------------------------------------------------------------------------
# per-family flax-path -> torch-name maps
# --------------------------------------------------------------------------
def _pix2pix_key(path, n_levels: int, prefix="unet"):
    """models/pix2pix.py:140-194: encoders.0 stem conv; encoders.L =
    EncoderBlock(encode = [LeakyReLU, Conv, BN]); decoders.i = DecoderBlock
    (decode = [ReLU, ConvT, BN, Dropout]); decoders.{last} plain ConvT."""
    top, leaf = path[0], path[-1]
    if top == "stem":
        return _conv(f"{prefix}.encoders.0", leaf)
    if top == "head":
        return _conv(f"{prefix}.decoders.{n_levels - 1}", leaf, "convt")
    kind, level = top.rsplit("_", 1)
    if kind == "enc":
        base = f"{prefix}.encoders.{level}.encode"
        if path[1] == "Conv_0":
            return _conv(f"{base}.1", leaf)
        return _bn(f"{base}.2", leaf)
    # dec_{i}
    base = f"{prefix}.decoders.{level}.decode"
    if path[1] == "ConvTranspose_0":
        return _conv(f"{base}.1", leaf, "convt")
    return _bn(f"{base}.2", leaf)


def _attention_key(path, n_levels: int, prefix="unet"):
    """models/attention_unet.py:116-186: pix2pix topology + additive
    attention gates (attention_blocks.i: input_gate/signal_gate/attention
    each = [Conv1x1, BN])."""
    top, leaf = path[0], path[-1]
    if top.startswith("gate_"):
        i = top.split("_")[1]
        base = f"{prefix}.attention_blocks.{i}"
        sub = path[1]
        if sub in ("input_gate", "signal_gate", "attention"):
            return _conv(f"{base}.{sub}.0", leaf)
        gate_of = {"BatchNorm_0": "input_gate", "BatchNorm_1": "signal_gate",
                   "BatchNorm_2": "attention"}[sub]
        return _bn(f"{base}.{gate_of}.1", leaf)
    return _pix2pix_key(path, n_levels, prefix)


# Residual-block member -> torch Sequential sub-index, per block type
# (models/res_unet.py:52-171; flax modules invoke in the same order).
_RES_SUBMAPS = {
    "18": {"Conv_0": "conv_block.0", "BatchNorm_0": "conv_block.1",
           "Conv_1": "conv_block.3", "BatchNorm_1": "conv_block.4",
           "Conv_2": "conv_skip.0", "BatchNorm_2": "conv_skip.1"},
    "50": {"Conv_0": "conv_block.0", "BatchNorm_0": "conv_block.1",
           "Conv_1": "conv_block.3", "BatchNorm_1": "conv_block.4",
           "Conv_2": "conv_block.6", "BatchNorm_2": "conv_block.7",
           "Conv_3": "conv_skip.0", "BatchNorm_3": "conv_skip.1"},
    "v2": {"BatchNorm_0": "conv_block.0", "Conv_0": "conv_block.2",
           "BatchNorm_1": "conv_block.3", "Conv_1": "conv_block.5",
           "BatchNorm_2": "conv_skip.0", "Conv_2": "conv_skip.2"},
}
_RES_SUBMAPS["next"] = _RES_SUBMAPS["50"]


def _res_key(path, n_levels: int, res_type: str, prefix="unet"):
    """models/res_unet.py:238-315: in_conv stem; encoders.L.encode.0 /
    decoders.i.decode.0 residual blocks; out.0 head conv."""
    top, leaf = path[0], path[-1]
    if top == "stem":
        return _conv(f"{prefix}.in_conv", leaf)
    if top == "head":
        return _conv(f"{prefix}.out.0", leaf)
    if top == "dec_final":
        block = f"{prefix}.decoders.{n_levels - 1}.decode.0"
    else:
        kind, idx = top.rsplit("_", 1)
        block = (f"{prefix}.encoders.{idx}.encode.0" if kind == "enc"
                 else f"{prefix}.decoders.{idx}.decode.0")
    sub = _RES_SUBMAPS[res_type][path[1]]
    if path[1].startswith("Conv"):
        return _conv(f"{block}.{sub}", leaf)
    return _bn(f"{block}.{sub}", leaf)


def _trans_key(path, n_levels: int, prefix="unet"):
    """models/trans_unet.py:62-98: in_conv; encoders.L (decode = bias-free
    bottleneck convs at 0,3,6 + BNs at 1,4,7; skip = conv 0 + BN 1);
    vit_bottleneck (to_patch_embedding.1/2/3, pos_embedding,
    transformer.layers.i); decoders.i.decode (convs 0,3 + BNs 1,4);
    out.0 head."""
    top, leaf = path[0], path[-1]
    if top == "stem":
        return _conv(f"{prefix}.in_conv", leaf)
    if top == "head":
        return _conv(f"{prefix}.out.0", leaf)
    if top == "vit":
        vb = f"{prefix}.vit_bottleneck"
        sub = path[1]
        if sub == "pos_embedding":
            return f"{vb}.pos_embedding", "raw"
        if sub == "LayerNorm_0":
            return _ln(f"{vb}.to_patch_embedding.1", leaf)
        if sub == "Dense_0":
            return _dense(f"{vb}.to_patch_embedding.2", leaf)
        if sub == "LayerNorm_1":
            return _ln(f"{vb}.to_patch_embedding.3", leaf)
        # layer_{i} (TransformerLayer == torch nn.TransformerEncoderLayer)
        i = sub.split("_")[1]
        layer = f"{vb}.transformer.layers.{i}"
        member = path[2]
        if member == "in_proj":
            return (f"{layer}.self_attn.in_proj_weight", "linear") \
                if leaf == "kernel" else \
                (f"{layer}.self_attn.in_proj_bias", "1d")
        if member == "out_proj":
            return _dense(f"{layer}.self_attn.out_proj", leaf)
        if member == "ffn1":
            return _dense(f"{layer}.linear1", leaf)
        if member == "ffn2":
            return _dense(f"{layer}.linear2", leaf)
        if member == "LayerNorm_0":
            return _ln(f"{layer}.norm1", leaf)
        return _ln(f"{layer}.norm2", leaf)

    # conv encoder / decoder blocks
    submap_enc = {"Conv_0": "decode.0", "BatchNorm_0": "decode.1",
                  "Conv_1": "decode.3", "BatchNorm_1": "decode.4",
                  "Conv_2": "decode.6", "BatchNorm_2": "decode.7",
                  "Conv_3": "skip.0", "BatchNorm_3": "skip.1"}
    submap_dec = {"Conv_0": "decode.0", "BatchNorm_0": "decode.1",
                  "Conv_1": "decode.3", "BatchNorm_1": "decode.4"}
    if top == "dec_final":
        block, submap = f"{prefix}.decoders.{n_levels - 1}", submap_dec
    else:
        kind, idx = top.rsplit("_", 1)
        if kind == "enc":
            block, submap = f"{prefix}.encoders.{idx}", submap_enc
        else:
            block, submap = f"{prefix}.decoders.{idx}", submap_dec
    sub = submap[path[1]]
    if path[1].startswith("Conv"):
        return _conv(f"{block}.{sub}", leaf)
    return _bn(f"{block}.{sub}", leaf)


def _discriminator_key(path, prefix="discriminator"):
    """models/wrapper.py:176-238: 4 DiscriminatorBlocks (block.0 conv) +
    bias-free patch-head conv at discriminator.4."""
    top, leaf = path[0], path[-1]
    if top.startswith("DiscriminatorBlock_"):
        i = top.split("_")[-1]
        return _conv(f"{prefix}.discriminator.{i}.block.0", leaf)
    return _conv(f"{prefix}.discriminator.4", leaf)


def _gd_index_map(channel_mults: Sequence[int], attention_res: Sequence[int],
                  res_blocks: int = 2) -> Dict[str, str]:
    """flax module name -> torch block root for the guided_diffusion UNet,
    by re-running the reference's construction arithmetic
    (guided_diffusion/unet.py:418-548, resblock_updown=True)."""
    attn = set(attention_res)
    mapping = {
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
    for level in range(len(channel_mults)):
        for _ in range(res_blocks):
            mapping[f"in_res_{blk}"] = f"input_blocks.{idx}.0"
            if ds in attn:
                mapping[f"in_attn_{blk}"] = f"input_blocks.{idx}.1"
            blk += 1
            idx += 1
        if level != len(channel_mults) - 1:
            mapping[f"down_{level}"] = f"input_blocks.{idx}.0"
            idx += 1
            ds *= 2
    idx, blk = 0, 0
    for level in reversed(range(len(channel_mults))):
        for i in range(res_blocks + 1):
            mapping[f"out_res_{blk}"] = f"output_blocks.{idx}.0"
            sub = 1
            if ds in attn:
                mapping[f"out_attn_{blk}"] = f"output_blocks.{idx}.1"
                sub = 2
            if level and i == res_blocks:
                mapping[f"up_{level}"] = f"output_blocks.{idx}.{sub}"
                ds //= 2
            blk += 1
            idx += 1
    return mapping


_GD_RES_SUB = {"norm_in": ("in_layers.0", "bn"),
               "conv_in": ("in_layers.2", "conv"),
               "emb_proj": ("emb_layers.1", "linear"),
               "norm_out": ("out_layers.0", "bn"),
               "conv_out": ("out_layers.3", "conv"),
               "skip": ("skip_connection", "conv")}
_GD_ATTN_SUB = {"norm": ("norm", "bn"), "qkv": ("qkv", "qkv1d"),
                "proj": ("proj_out", "qkv1d")}


def _palette_key(path, index_map: Dict[str, str], prefix="unet"):
    """guided_diffusion UNet member tensors (unet.py:120-335)."""
    top, leaf = path[0], path[-1]
    block = f"{prefix}.{index_map[top]}"
    if top.startswith("cond_embed"):
        return _dense(block, leaf)
    if top in ("in_conv", "out_conv"):
        return _conv(block, leaf)
    if top == "out_norm":
        return _bn(block, leaf)
    sub = path[1]
    if "attn" in top:
        mod, kind = _GD_ATTN_SUB[sub]
        mod = f"{block}.{mod}"
        if kind == "bn":
            return _bn(mod, leaf)
        if leaf == "kernel":
            return f"{mod}.weight", "qkv1d"
        return f"{mod}.bias", "1d"
    mod, kind = _GD_RES_SUB[sub]
    mod = f"{block}.{mod}"
    if kind == "bn":
        return _bn(mod, leaf)
    if kind == "linear":
        return _dense(mod, leaf)
    return _conv(mod, leaf)


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------
def _key_fn_for(model_name: str, hparams: Dict):
    from pai_tpu.config import parse_int_list
    from pai_tpu.models.registry import _RES_TYPES

    mults = parse_int_list(hparams["channel_mults"])
    n = len(mults)
    if model_name == "pix2pix":
        return lambda p: _pix2pix_key(p, n)
    if model_name == "attention_unet":
        return lambda p: _attention_key(p, n)
    if model_name in _RES_TYPES:
        return lambda p: _res_key(p, n, _RES_TYPES[model_name])
    if model_name == "trans_unet":
        return lambda p: _trans_key(p, n)
    if model_name == "palette":
        index_map = _gd_index_map(
            mults, parse_int_list(hparams["attention_res"]))
        return lambda p: _palette_key(p, index_map)
    raise ValueError(f"Cannot import model {model_name!r}")


def _materialize(abstract_tree, sd: Dict[str, np.ndarray], key_fn):
    out = {}
    for path, leaf in flatten_dict(abstract_tree).items():
        torch_key, kind = key_fn(path)
        if torch_key not in sd:
            raise KeyError(
                f"flax param {'/'.join(path)} maps to missing torch tensor "
                f"{torch_key}")
        val = _transform(sd[torch_key], kind)
        if val.shape != leaf.shape:
            raise ValueError(
                f"{'/'.join(path)} <- {torch_key}: shape {val.shape} "
                f"!= expected {leaf.shape}")
        out[path] = jnp.asarray(val, leaf.dtype)
    return unflatten_dict(out)


def _is_buffer(name: str) -> bool:
    return (name.endswith(("running_mean", "running_var",
                           "num_batches_tracked"))
            or name.startswith(("diffusion.", "diffusion_inf.")))


def _shadow_state_dict(sd: Dict, ema_state: Dict) -> Dict:
    """torch_ema stores ``shadow_params`` as a list in
    ``model.parameters()`` order == state-dict insertion order minus
    buffers (callbacks/ema.py:19-22). Rebuild a name->tensor view of the
    EMA weights so the same key maps apply."""
    param_names = [k for k in sd if not _is_buffer(k)]
    shadow = ema_state["shadow_params"]
    if len(param_names) != len(shadow):
        raise ValueError(
            f"EMA shadow_params length {len(shadow)} != model parameter "
            f"count {len(param_names)}")
    shadow_sd = dict(sd)
    shadow_sd.update(zip(param_names, [np.asarray(t) for t in shadow]))
    return shadow_sd


def import_lightning_state_dict(model_name: str, sd: Dict, hparams: Dict,
                                ema_state: Dict = None):
    """Map a reference Lightning ``state_dict`` (numpy-convertible tensors)
    into pai_tpu trees.

    Returns ``(g_params, g_stats, d_params_or_None, ema_params_or_None)``
    for the GAN families / ``(params, stats, None, ema)`` for palette.
    """
    from pai_tpu.restore import build_generator_from_hparams

    image_size = int(hparams.get("image_size", 256) or 256)
    generator = build_generator_from_hparams(hparams, image_size)
    in_ch = int(hparams.get("in_channels", 1))
    key_fn = _key_fn_for(model_name, hparams)

    if model_name == "palette":
        abstract = jax.eval_shape(lambda: generator.init(
            jax.random.key(0),
            jnp.zeros((1, image_size, image_size, in_ch)),
            jnp.zeros((1, image_size, image_size, in_ch)),
            jnp.ones((1,)), train=False))
    else:
        abstract = jax.eval_shape(lambda: generator.init(
            jax.random.key(0),
            jnp.zeros((1, image_size, image_size, in_ch)), train=False))

    params = _materialize(abstract["params"], sd, key_fn)
    stats = _materialize(abstract.get("batch_stats", {}), sd, key_fn)

    d_params = None
    d_abstract = None
    if any(k.startswith("discriminator.") for k in sd):
        from pai_tpu.models import Discriminator

        disc = Discriminator()
        d_abstract = jax.eval_shape(lambda: disc.init(
            jax.random.key(0),
            jnp.zeros((1, image_size, image_size, in_ch)),
            jnp.zeros((1, image_size, image_size, in_ch))))
        d_params = _materialize(d_abstract["params"], sd,
                                _discriminator_key)

    # EMA shadow weights (reference ema.py spans ALL module params) in the
    # EmaState layout the train loop uses ({"generator","discriminator"} /
    # {"unet"} — train/ema.py, steps.gan_eval_params).
    ema_params = None
    if ema_state is not None:
        shadow_sd = _shadow_state_dict(sd, ema_state)
        ema_gen = _materialize(abstract["params"], shadow_sd, key_fn)
        if model_name == "palette":
            ema_params = {"unet": ema_gen}
        else:
            ema_disc = {} if d_abstract is None else _materialize(
                d_abstract["params"], shadow_sd, _discriminator_key)
            ema_params = {"generator": ema_gen, "discriminator": ema_disc}
    return params, stats, d_params, ema_params


# --------------------------------------------------------------------------
# export (pai_tpu -> reference Lightning checkpoint)
# --------------------------------------------------------------------------
def _inverse_transform(value, kind: str):
    v = np.asarray(value, np.float32)
    if kind == "conv":        # HWIO -> OIHW
        return np.transpose(v, (3, 2, 0, 1))
    if kind == "convt":       # HWIO -> (in,out,kh,kw)
        return np.transpose(v, (2, 3, 0, 1))
    if kind == "linear":      # (in,out) -> (out,in)
        return np.transpose(v, (1, 0))
    if kind == "qkv1d":       # (in,out) -> (out,in,1)
        return np.transpose(v, (1, 0))[:, :, None]
    return v


def export_lightning_state_dict(model_name: str, params, stats,
                                hparams: Dict) -> Dict[str, np.ndarray]:
    """Map pai_tpu trees to a reference-layout ``state_dict`` (inverse of
    :func:`import_lightning_state_dict`): every torch tensor name the
    reference module owns, including BatchNorm ``num_batches_tracked``
    (zeros) and — for palette — the registered diffusion schedule buffers
    (palette.py:202-212), so ``load_state_dict(strict=True)`` succeeds."""
    key_fn = _key_fn_for(model_name, hparams)
    sd: Dict[str, np.ndarray] = {}
    for tree in (params, stats):
        for path, leaf in flatten_dict(tree).items():
            torch_key, kind = key_fn(path)
            sd[torch_key] = _inverse_transform(leaf, kind)
    for key in list(sd):
        if key.endswith("running_mean"):
            sd[key[: -len("running_mean")] + "num_batches_tracked"] = \
                np.zeros((), np.int64)
    if model_name == "palette":
        from pai_tpu.diffusion import make_schedule

        sched_train = make_schedule(
            hparams.get("schedule_type", "linear"), 2000, 1e-6, 0.01)
        sched_inf = make_schedule("cosine", 100)
        for prefix, sched in (("diffusion", sched_train),
                              ("diffusion_inf", sched_inf)):
            for name in ("alphas", "gammas", "gammas_prev"):
                sd[f"{prefix}.{name}"] = np.asarray(
                    getattr(sched, name), np.float32)
    return sd


def export_lightning_checkpoint(path: str, model_name: str, params, stats,
                                hparams: Dict, d_params=None,
                                epoch: int = 0, step: int = 0) -> None:
    """torch.save a Lightning-format ``.ckpt`` the reference's
    ``load_from_checkpoint`` / ``load_state_dict`` can consume
    (report.py:26-43)."""
    import torch

    from pai_tpu.config import parse_int_list

    sd = export_lightning_state_dict(model_name, params, stats, hparams)
    if d_params is not None:
        for path_t, leaf in flatten_dict(d_params).items():
            torch_key, kind = _discriminator_key(path_t)
            sd[torch_key] = _inverse_transform(leaf, kind)

    hp = {"in_channels": int(hparams.get("in_channels", 1)),
          "out_channels": int(hparams.get("out_channels", 1)),
          "channel_mults": tuple(parse_int_list(hparams["channel_mults"])),
          "dropout": float(hparams.get("dropout", 0.0))}
    if model_name == "palette":
        hp.update(attention_res=tuple(
            parse_int_list(hparams["attention_res"])),
            schedule_type=hparams.get("schedule_type", "linear"),
            learn_var=bool(hparams.get("learn_variance", False)))
    else:
        hp["loss_type"] = hparams.get("loss_type", "mse")
        if model_name in ("res18_unet", "res50_unet", "resv2_unet",
                          "resnext_unet"):
            hp["res_type"] = {"res18_unet": "18", "res50_unet": "50",
                              "resv2_unet": "v2",
                              "resnext_unet": "next"}[model_name]
        if model_name == "trans_unet":
            hp["patch_size"] = 4
    torch.save({
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "hyper_parameters": hp,
        "epoch": int(epoch), "global_step": int(step),
    }, path)


def find_ema_state(ckpt: Dict):
    """Locate a torch_ema state dict (``shadow_params`` key) anywhere in
    the checkpoint's callback payloads (callbacks/ema.py:54-62; Lightning
    versions differ in where they put it)."""
    def walk(node):
        if isinstance(node, dict):
            if "shadow_params" in node:
                return node
            for v in node.values():
                found = walk(v)
                if found is not None:
                    return found
        return None

    return walk(ckpt.get("callbacks", {}))


def import_lightning_checkpoint(path: str, model_name: str,
                                hparams_override: Dict = None):
    """Load a reference ``.ckpt`` file (torch.load) and map it.

    Returns ``(trees, hparams)`` where ``trees`` is the
    ``import_lightning_state_dict`` tuple and ``hparams`` is a pai_tpu
    hparams dict assembled from the checkpoint's ``hyper_parameters``
    (``save_hyperparameters()``, e.g. pix2pix.py:43).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hp = dict(ckpt.get("hyper_parameters", {}))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in ckpt["state_dict"].items()}

    mults = hp.get("channel_mults", (1, 2, 4, 8, 8, 8, 8, 8))
    hparams = {
        "model": model_name,
        "in_channels": int(hp.get("in_channels", 1)),
        "out_channels": int(hp.get("out_channels", 1)),
        "channel_mults": ",".join(str(m) for m in mults),
        "attention_res": ",".join(
            str(a) for a in hp.get("attention_res", (8, 4, 2))),
        "dropout": float(hp.get("dropout", 0.0)),
        "loss_type": hp.get("loss_type", "mse"),
        "schedule_type": hp.get("schedule_type", "linear"),
        "learn_variance": bool(hp.get("learn_var", False)),
        "precision": "32",
    }
    if hparams_override:
        hparams.update(hparams_override)

    ema_state = find_ema_state(ckpt)
    hparams["ema"] = ema_state is not None
    trees = import_lightning_state_dict(
        model_name, sd, hparams, ema_state=ema_state)
    meta = {"step": int(ckpt.get("global_step", 0) or 0),
            "epoch": int(ckpt.get("epoch", 0) or 0)}
    if ema_state is not None:
        # torch_ema's decay ramp min(decay, (1+n)/(10+n)) depends on n;
        # resumed training must continue from the checkpoint's n, not 0
        # (else the first resumed updates overwrite the accumulated EMA).
        meta["ema_num_updates"] = int(ema_state.get("num_updates") or 0)
    return trees, hparams, meta
