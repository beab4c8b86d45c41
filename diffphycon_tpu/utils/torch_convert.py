"""Convert reference (PyTorch) checkpoints into diffphycon_tpu Flax params.

Enables loading checkpoints trained with the reference repo
(/root/reference/diffusion/diffusion_1d_burgers.py:935-972 save format) into
the TPU-native models for apples-to-apples control-objective parity.

Conventions:
  torch Conv2d weight (out, in, kh, kw) -> flax kernel (kh, kw, in, out)
  torch Linear weight (out, in)         -> flax kernel (in, out)
  torch GroupNorm weight/bias           -> flax scale/bias
  reference LayerNorm g (1, C, 1, 1)    -> flax g (C,)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(sd: Mapping[str, np.ndarray], name: str, bias: bool = True) -> Dict:
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))}
    if bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _linear(sd, name):
    return {"kernel": np.transpose(sd[f"{name}.weight"]), "bias": sd[f"{name}.bias"]}


def _groupnorm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _gain(sd, name):
    return {"g": np.reshape(sd[f"{name}.g"], (-1,))}


def _resnet_block(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    out = {
        "mlp": _linear(sd, f"{prefix}.mlp.1"),
        "block1": {
            "proj": _conv(sd, f"{prefix}.block1.proj"),
            "norm": _groupnorm(sd, f"{prefix}.block1.norm"),
        },
        "block2": {
            "proj": _conv(sd, f"{prefix}.block2.proj"),
            "norm": _groupnorm(sd, f"{prefix}.block2.norm"),
        },
    }
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = _conv(sd, f"{prefix}.res_conv")
    return out


def _linear_attention(sd, prefix: str) -> Dict:
    """Residual(PreNorm(LinearAttention)) at ``prefix`` (e.g. downs.0.2.fn).

    The inner module of our PreNormResidual is auto-named by its class
    (``LinearAttention_0``).
    """
    return {
        "norm": _gain(sd, f"{prefix}.norm"),
        "attn": {
            "to_qkv": _conv(sd, f"{prefix}.fn.to_qkv", bias=False),
            "to_out": _conv(sd, f"{prefix}.fn.to_out.0"),
            "out_norm": _gain(sd, f"{prefix}.fn.to_out.1"),
        },
    }


def _full_attention(sd, prefix: str) -> Dict:
    return {
        "norm": _gain(sd, f"{prefix}.norm"),
        "attn": {
            "to_qkv": _conv(sd, f"{prefix}.fn.to_qkv", bias=False),
            "to_out": _conv(sd, f"{prefix}.fn.to_out"),
        },
    }


def convert_unet2d(state_dict: Mapping[str, np.ndarray], num_levels: int = 4) -> Dict:
    """Map a reference ``Unet2D`` state_dict (model/burgers_1d/unet.py:268-431)
    to the diffphycon_tpu ``UNet2D`` param tree.

    Accepts tensors or numpy arrays; returns a nested dict of numpy arrays
    suitable for ``{'params': ...}``.
    """
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params: Dict = {
        "init_conv": _conv(sd, "init_conv"),
        "time_mlp": {
            "fc1": _linear(sd, "time_mlp.1"),
            "fc2": _linear(sd, "time_mlp.3"),
        },
        "mid_block1": _resnet_block(sd, "mid_block1"),
        "mid_attn": _full_attention(sd, "mid_attn.fn"),
        "mid_block2": _resnet_block(sd, "mid_block2"),
        "final_res_block": _resnet_block(sd, "final_res_block"),
        "final_conv": _conv(sd, "final_conv"),
    }
    for i in range(num_levels):
        is_last = i == num_levels - 1
        params[f"down_{i}_block1"] = _resnet_block(sd, f"downs.{i}.0")
        params[f"down_{i}_block2"] = _resnet_block(sd, f"downs.{i}.1")
        params[f"down_{i}_attn"] = _linear_attention(sd, f"downs.{i}.2.fn")
        if is_last:
            params[f"down_{i}_downsample"] = _conv(sd, f"downs.{i}.3")
        else:
            params[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"downs.{i}.3.1")
            }
        params[f"up_{i}_block1"] = _resnet_block(sd, f"ups.{i}.0")
        params[f"up_{i}_block2"] = _resnet_block(sd, f"ups.{i}.1")
        params[f"up_{i}_attn"] = _linear_attention(sd, f"ups.{i}.2.fn")
        if is_last:
            params[f"up_{i}_upsample"] = _conv(sd, f"ups.{i}.3")
        else:
            params[f"up_{i}_upsample"] = {"conv": _conv(sd, f"ups.{i}.3.1")}
    return params


# ---------------------------------------------------------------------------
# UNet3D (video_diffusion_pytorch_conv3d.Unet3D_with_Conv3D)
# ---------------------------------------------------------------------------


def _conv3d(sd, name, bias=True):
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 4, 1, 0))}
    if bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv2d_as_3d(sd, name, bias=True):
    """Conv2d weight (out,in,kh,kw) -> Conv3d-on-frames kernel (1,kh,kw,in,out)."""
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))[None]
    out = {"kernel": w}
    if bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _gamma(sd, name):
    return {"gamma": np.reshape(sd[f"{name}.gamma"], (-1,))}


def _resnet_block3d(sd, prefix):
    out = {
        "block1": {
            "proj": _conv3d(sd, f"{prefix}.block1.proj"),
            "norm": _groupnorm(sd, f"{prefix}.block1.norm"),
        },
        "block2": {
            "proj": _conv3d(sd, f"{prefix}.block2.proj"),
            "norm": _groupnorm(sd, f"{prefix}.block2.norm"),
        },
    }
    if f"{prefix}.mlp.1.weight" in sd:
        out["mlp"] = _linear(sd, f"{prefix}.mlp.1")
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = _conv3d(sd, f"{prefix}.res_conv")
    return out


def _temporal_attn(sd, prefix):
    """Residual(PreNorm(EinopsToAndFrom(Attention))) at ``prefix``
    -> (norm gamma, attention linears)."""
    return (
        _gamma(sd, f"{prefix}.fn.norm"),
        {
            "to_qkv": {"kernel": np.transpose(sd[f"{prefix}.fn.fn.fn.to_qkv.weight"])},
            "to_out": {"kernel": np.transpose(sd[f"{prefix}.fn.fn.fn.to_out.weight"])},
        },
    )


def _spatial_linear_attn3d(sd, prefix):
    return (
        _gamma(sd, f"{prefix}.fn.norm"),
        {
            "to_qkv": _conv2d_as_3d(sd, f"{prefix}.fn.fn.to_qkv", bias=False),
            "to_out": _conv2d_as_3d(sd, f"{prefix}.fn.fn.to_out"),
        },
    )


def convert_unet3d(state_dict, num_levels=3):
    """Map a reference ``Unet3D_with_Conv3D`` state_dict
    (model/video_diffusion_pytorch/video_diffusion_pytorch_conv3d.py:356-552)
    to the diffphycon_tpu ``UNet3D`` param tree."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    norm, attn = _temporal_attn(sd, "init_temporal_attn")
    params = {
        "time_rel_pos_bias": sd["time_rel_pos_bias.relative_attention_bias.weight"],
        "init_conv": _conv3d(sd, "init_conv"),
        "init_attn_norm": norm,
        "init_temporal_attn": attn,
        "time_mlp": {
            "fc1": _linear(sd, "time_mlp.1"),
            "fc2": _linear(sd, "time_mlp.3"),
        },
        "mid_block1": _resnet_block3d(sd, "mid_block1"),
        "mid_block2": _resnet_block3d(sd, "mid_block2"),
        "final_block": _resnet_block3d(sd, "final_conv.0"),
        "final_conv": _conv3d(sd, "final_conv.1"),
    }
    params["mid_sattn_norm"] = _gamma(sd, "mid_spatial_attn.fn.norm")
    params["mid_sattn"] = {
        "to_qkv": {"kernel": np.transpose(sd["mid_spatial_attn.fn.fn.fn.to_qkv.weight"])},
        "to_out": {"kernel": np.transpose(sd["mid_spatial_attn.fn.fn.fn.to_out.weight"])},
    }
    norm, attn = _temporal_attn(sd, "mid_temporal_attn")
    params["mid_tattn_norm"] = norm
    params["mid_tattn"] = attn

    for i in range(num_levels):
        is_last = i == num_levels - 1
        params[f"down_{i}_block1"] = _resnet_block3d(sd, f"downs.{i}.0")
        params[f"down_{i}_block2"] = _resnet_block3d(sd, f"downs.{i}.1")
        if f"downs.{i}.2.fn.fn.to_qkv.weight" in sd:
            n, a = _spatial_linear_attn3d(sd, f"downs.{i}.2")
            params[f"down_{i}_sattn_norm"] = n
            params[f"down_{i}_sattn"] = a
        n, a = _temporal_attn(sd, f"downs.{i}.3")
        params[f"down_{i}_tattn_norm"] = n
        params[f"down_{i}_tattn"] = a
        if not is_last:
            params[f"down_{i}_downsample"] = {"conv": _conv3d(sd, f"downs.{i}.4")}

        params[f"up_{i}_block1"] = _resnet_block3d(sd, f"ups.{i}.0")
        params[f"up_{i}_block2"] = _resnet_block3d(sd, f"ups.{i}.1")
        if f"ups.{i}.2.fn.fn.to_qkv.weight" in sd:
            n, a = _spatial_linear_attn3d(sd, f"ups.{i}.2")
            params[f"up_{i}_sattn_norm"] = n
            params[f"up_{i}_sattn"] = a
        n, a = _temporal_attn(sd, f"ups.{i}.3")
        params[f"up_{i}_tattn_norm"] = n
        params[f"up_{i}_tattn"] = a
        if not is_last:
            # ConvTranspose3d weight (in, out, kd, kh, kw) -> (kd,kh,kw,out,in)
            params[f"up_{i}_upsample"] = {
                "kernel": np.transpose(sd[f"ups.{i}.4.weight"], (2, 3, 4, 1, 0)),
                "bias": sd[f"ups.{i}.4.bias"],
            }
    return params


# ---------------------------------------------------------------------------
# UNet2Dv2 / ForceUNet (the WS-conv image U-Nets embedded in
# diffusion_2d_jellyfish.py:276-481, same classes in diffusion_2d_smoke.py)
# ---------------------------------------------------------------------------


def _ws_resnet_block(sd, prefix, with_time=True):
    out = {
        "block1": {
            "proj": _conv(sd, f"{prefix}.block1.proj"),
            "norm": _groupnorm(sd, f"{prefix}.block1.norm"),
        },
        "block2": {
            "proj": _conv(sd, f"{prefix}.block2.proj"),
            "norm": _groupnorm(sd, f"{prefix}.block2.norm"),
        },
    }
    if with_time and f"{prefix}.mlp.1.weight" in sd:
        out["mlp"] = _linear(sd, f"{prefix}.mlp.1")
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = _conv(sd, f"{prefix}.res_conv")
    return out


def _lin_attn_v2(sd, prefix):
    return (
        _gamma_g(sd, f"{prefix}.norm"),
        {
            "to_qkv": _conv(sd, f"{prefix}.fn.to_qkv", bias=False),
            "to_out": _conv(sd, f"{prefix}.fn.to_out.0"),
            "out_norm": _gamma_g(sd, f"{prefix}.fn.to_out.1"),
        },
    )


def _gamma_g(sd, name):
    return {"g": np.reshape(sd[f"{name}.g"], (-1,))}


def convert_unet2dv2(state_dict, num_levels=4):
    """Map the reference 2D ``Unet`` (diffusion_2d_jellyfish.py:276-403) to
    ``UNet2Dv2``."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params = {
        "init_conv": _conv(sd, "init_conv"),
        "time_mlp": {
            "fc1": _linear(sd, "time_mlp.1"),
            "fc2": _linear(sd, "time_mlp.3"),
        },
        "mid_block1": _ws_resnet_block(sd, "mid_block1"),
        "mid_attn_norm": _gamma_g(sd, "mid_attn.fn.norm"),
        "mid_attn": {
            "to_qkv": _conv(sd, "mid_attn.fn.fn.to_qkv", bias=False),
            "to_out": _conv(sd, "mid_attn.fn.fn.to_out"),
        },
        "mid_block2": _ws_resnet_block(sd, "mid_block2"),
        "final_res_block": _ws_resnet_block(sd, "final_res_block"),
        "final_conv": _conv(sd, "final_conv"),
    }
    for i in range(num_levels):
        is_last = i == num_levels - 1
        params[f"down_{i}_block1"] = _ws_resnet_block(sd, f"downs.{i}.0")
        params[f"down_{i}_block2"] = _ws_resnet_block(sd, f"downs.{i}.1")
        n, a = _lin_attn_v2(sd, f"downs.{i}.2.fn")
        params[f"down_{i}_attn_norm"] = n
        params[f"down_{i}_attn"] = a
        params[f"down_{i}_downsample"] = (
            _conv(sd, f"downs.{i}.3") if is_last
            else {"conv": _conv(sd, f"downs.{i}.3.1")})
        params[f"up_{i}_block1"] = _ws_resnet_block(sd, f"ups.{i}.0")
        params[f"up_{i}_block2"] = _ws_resnet_block(sd, f"ups.{i}.1")
        n, a = _lin_attn_v2(sd, f"ups.{i}.2.fn")
        params[f"up_{i}_attn_norm"] = n
        params[f"up_{i}_attn"] = a
        params[f"up_{i}_upsample"] = (
            _conv(sd, f"ups.{i}.3") if is_last
            else {"conv": _conv(sd, f"ups.{i}.3.1")})
    return params


def convert_force_unet(state_dict, num_levels=4):
    """Map the reference ``ForceUnet`` (diffusion_2d_jellyfish.py:406-481) to
    ``ForceUNet``."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params = {
        "init_conv": _conv(sd, "init_conv"),
        "mid_block1": _ws_resnet_block(sd, "mid_block1", with_time=False),
        "mid_attn_norm": _gamma_g(sd, "mid_attn.fn.norm"),
        "mid_attn": {
            "to_qkv": _conv(sd, "mid_attn.fn.fn.to_qkv", bias=False),
            "to_out": _conv(sd, "mid_attn.fn.fn.to_out"),
        },
        "mid_block2": _ws_resnet_block(sd, "mid_block2", with_time=False),
        "final": _linear(sd, "final"),
    }
    for i in range(num_levels):
        is_last = i == num_levels - 1
        params[f"down_{i}_block1"] = _ws_resnet_block(sd, f"downs.{i}.0",
                                                      with_time=False)
        params[f"down_{i}_block2"] = _ws_resnet_block(sd, f"downs.{i}.1",
                                                      with_time=False)
        n, a = _lin_attn_v2(sd, f"downs.{i}.2.fn")
        params[f"down_{i}_attn_norm"] = n
        params[f"down_{i}_attn"] = a
        params[f"down_{i}_downsample"] = (
            _conv(sd, f"downs.{i}.3") if is_last
            else {"conv": _conv(sd, f"downs.{i}.3.1")})
    return params


# ---------------------------------------------------------------------------
# Reference checkpoint-FILE ingestion (diffusion_1d_burgers.py:935-949 dict:
# {step, model, opt, ema, scaler, loss}; 'model' is the GaussianDiffusion
# state_dict with the UNet under the 'model.' prefix; 'ema' is the
# ema_pytorch.EMA state_dict with the averaged copy under 'ema_model.model.').
# ---------------------------------------------------------------------------


def _strip_prefix(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = np.asarray(
                v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def extract_unet_state_dict(ckpt: Mapping, use_ema: bool = True) -> Dict:
    """Pull the (EMA or online) UNet state_dict out of a loaded reference
    Trainer checkpoint dict, dropping the diffusion schedule buffers."""
    if use_ema and ckpt.get("ema"):
        sub = _strip_prefix(ckpt["ema"], "ema_model.model.")
        if sub:
            return sub
    return _strip_prefix(ckpt["model"], "model.")


def load_reference_checkpoint_unet2d(path: str, num_levels: int = 4,
                                     use_ema: bool = True) -> Dict:
    """Reference ``cos10000-model-{k}.pt`` file -> flax UNet2D params.

    End-to-end ingestion of a real reference artifact: torch.load the
    Trainer save dict, select EMA or online weights, convert. The returned
    dict plugs straight into ``UNet2D.apply`` / the diffusion core.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = extract_unet_state_dict(ckpt, use_ema=use_ema)
    return {"params": convert_unet2d(sd, num_levels=num_levels)}


def load_reference_checkpoint_unet3d(path: str, num_levels: int = 3,
                                     use_ema: bool = True) -> Dict:
    """Reference smoke/jellyfish Trainer .pt file -> flax UNet3D params
    (same Trainer dict layout as the Burgers one; smoke Trainer.save at
    diffusion_2d_smoke.py:942-985)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = extract_unet_state_dict(ckpt, use_ema=use_ema)
    return {"params": convert_unet3d(sd, num_levels=num_levels)}
