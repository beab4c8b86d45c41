"""Fused Pallas forward for UNet2D — the guided-sampling hot path.

The XLA-compiled UNet2D forward executes ~2,200 device ops per denoise-loop
iteration (mostly small fusions and layout copies around 27 convolutions);
on this runtime each op carries ~30 us fixed cost, so sampling is op-count
bound (see PERF.md). This module re-expresses the *inference* forward as one
Pallas kernel per ResNet/attention/resample block (~40 kernels total, each
doing its convs as MXU matmuls and keeping all intermediates in VMEM), with
every FiLM time projection batched into a single matmul outside the kernels.

Forward-only by design: DDPM/DDIM sampling never differentiates through the
model (guidance gradients are taken w.r.t. x_start, not params), and training
keeps the plain Flax path. Numerics match `UNet2D.apply` (float32) to ~1e-5.

Usage:
    packed = pack_unet2d_params(flax_params, dim=64, dim_mults=(1,2,4,8))
    out = unet2d_pallas_apply(packed, x, t)        # == net.apply(params, x, t)

Architecture being fused (reference /root/reference/model/burgers_1d/
unet.py:268-431; Flax twin in diffphycon_tpu/nets/unet2d.py): init 7x7 conv,
per level [ResBlock, ResBlock, linear-attention, downsample], bottleneck
[ResBlock, full attention, ResBlock], symmetric up path with skip concats,
final ResBlock + 1x1 conv.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# interpret=True lets the kernels run (slowly) on CPU for tests.
_INTERPRET = False


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(flag)


# ---------------------------------------------------------------------------
# in-kernel building blocks (operate on loaded VMEM values, float32 math)
# ---------------------------------------------------------------------------


def _conv2d(x, w, b, pad_h: int, pad_w: int):
    """Same-padded KxK conv as K^2 accumulated MXU matmuls.

    x: (bs, H, W, Ci) float32; w: (kh, kw, Ci, Co) float32 or bfloat16 —
    matmul operands run in w's dtype (bf16 hits the MXU native path) with
    float32 accumulation."""
    bs, H, W, Ci = x.shape
    kh, kw, _, Co = w.shape
    xp = jnp.pad(x.astype(w.dtype), ((0, 0), (pad_h, pad_h), (pad_w, pad_w),
                                     (0, 0)))
    acc = jnp.zeros((bs * H * W, Co), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            xs = jax.lax.slice(xp, (0, dy, dx, 0), (bs, dy + H, dx + W, Ci))
            acc = acc + jnp.dot(xs.reshape(bs * H * W, Ci), w[dy, dx],
                                preferred_element_type=jnp.float32)
    out = acc.reshape(bs, H, W, Co)
    if b is not None:
        out = out + b
    return out


def _group_norm(x, scale, bias, groups: int, eps: float = 1e-5):
    """flax.linen.GroupNorm semantics: normalize over (H, W, C/groups) per
    (sample, group)."""
    bs, H, W, C = x.shape
    g = x.reshape(bs, H * W, groups, C // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = ((g - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(bs, H, W, C) * scale + bias


def _chan_layer_norm(x, gain, eps: float = 1e-5):
    """ChanLayerNorm (nets/blocks.py:51-64): biased variance over channels,
    learned gain, no bias."""
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gain


def _silu(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _resblock_kernel(x_ref, ss_ref, w1_ref, b1_ref, gs1_ref, gb1_ref,
                     w2_ref, b2_ref, gs2_ref, gb2_ref, wr_ref, br_ref,
                     o_ref, *, groups: int, has_res: bool):
    x = x_ref[...].astype(jnp.float32)
    ss = ss_ref[...].astype(jnp.float32)          # (bs, 2*Co)
    co = w1_ref.shape[-1]
    h = _conv2d(x, w1_ref[...],
                b1_ref[...].astype(jnp.float32), 1, 1)
    h = _group_norm(h, gs1_ref[...].astype(jnp.float32),
                    gb1_ref[...].astype(jnp.float32), groups)
    scale = ss[:, None, None, :co]
    shift = ss[:, None, None, co:]
    h = h * (scale + 1.0) + shift
    h = _silu(h)
    h = _conv2d(h, w2_ref[...],
                b2_ref[...].astype(jnp.float32), 1, 1)
    h = _group_norm(h, gs2_ref[...].astype(jnp.float32),
                    gb2_ref[...].astype(jnp.float32), groups)
    h = _silu(h)
    if has_res:
        bs, H, W, Ci = x.shape
        wr = wr_ref[...][0, 0]
        res = jnp.dot(x.reshape(bs * H * W, Ci).astype(wr.dtype), wr,
                      preferred_element_type=jnp.float32)
        res = res.reshape(bs, H, W, co) + br_ref[...].astype(jnp.float32)
    else:
        res = x
    o_ref[...] = (h + res).astype(o_ref.dtype)


def _linear_attention_kernel(x_ref, ng_ref, wqkv_ref, wo_ref, bo_ref,
                             og_ref, o_ref, *, heads: int, dim_head: int):
    """x + to_out(linear-attention(ChanLN(x))) with channel-softmax q and
    token-softmax k (nets/blocks.py:110-185)."""
    x = x_ref[...].astype(jnp.float32)
    bs, H, W, C = x.shape
    n = H * W
    hidden = heads * dim_head
    hn = _chan_layer_norm(x, ng_ref[...].astype(jnp.float32))
    wqkv = wqkv_ref[...][0, 0]
    qkv = jnp.dot(hn.reshape(bs * n, C).astype(wqkv.dtype), wqkv,
                  preferred_element_type=jnp.float32)
    qkv = qkv.reshape(bs, n, 3, heads, dim_head)
    # (bs, heads, dim_head, n)
    q = jnp.transpose(qkv[:, :, 0], (0, 2, 3, 1))
    k = jnp.transpose(qkv[:, :, 1], (0, 2, 3, 1))
    v = jnp.transpose(qkv[:, :, 2], (0, 2, 3, 1))
    q = jax.nn.softmax(q, axis=-2) * (dim_head ** -0.5)
    k = jax.nn.softmax(k, axis=-1)
    context = jnp.einsum("bhdn,bhen->bhde", k, v,
                         preferred_element_type=jnp.float32)
    out = jnp.einsum("bhde,bhdn->bhen", context, q,
                     preferred_element_type=jnp.float32)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(bs * n, hidden)
    wo = wo_ref[...][0, 0]
    out = jnp.dot(out.astype(wo.dtype), wo,
                  preferred_element_type=jnp.float32)
    out = out.reshape(bs, H, W, C) + bo_ref[...].astype(jnp.float32)
    out = _chan_layer_norm(out, og_ref[...].astype(jnp.float32))
    o_ref[...] = (x + out).astype(o_ref.dtype)


def _attention_kernel(x_ref, ng_ref, wqkv_ref, wo_ref, bo_ref, o_ref, *,
                      heads: int, dim_head: int):
    """x + to_out(softmax(q k^T) v) over all spatial tokens
    (nets/blocks.py:143-202)."""
    x = x_ref[...].astype(jnp.float32)
    bs, H, W, C = x.shape
    n = H * W
    hidden = heads * dim_head
    hn = _chan_layer_norm(x, ng_ref[...].astype(jnp.float32))
    wqkv = wqkv_ref[...][0, 0]
    qkv = jnp.dot(hn.reshape(bs * n, C).astype(wqkv.dtype), wqkv,
                  preferred_element_type=jnp.float32)
    qkv = qkv.reshape(bs, n, 3, heads, dim_head)
    q = qkv[:, :, 0] * (dim_head ** -0.5)
    k = qkv[:, :, 1]
    v = qkv[:, :, 2]
    sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                     preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v,
                     preferred_element_type=jnp.float32)
    wo = wo_ref[...][0, 0]
    out = jnp.dot(out.reshape(bs * n, hidden).astype(wo.dtype), wo,
                  preferred_element_type=jnp.float32)
    out = out.reshape(bs, H, W, C) + bo_ref[...].astype(jnp.float32)
    o_ref[...] = (x + out).astype(o_ref.dtype)


def _downsample_kernel(x_ref, w_ref, b_ref, o_ref):
    """space-to-depth (torch channel order) + 1x1 conv
    (nets/blocks.py:205-225)."""
    x = x_ref[...].astype(jnp.float32)
    bs, H, W, C = x.shape
    x = x.reshape(bs, H // 2, 2, W // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    x = x.reshape(bs * (H // 2) * (W // 2), C * 4)
    w = w_ref[...][0, 0]
    out = jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)
    co = w_ref.shape[-1]
    o_ref[...] = (out.reshape(bs, H // 2, W // 2, co)
                  + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _upsample_kernel(x_ref, w_ref, b_ref, o_ref):
    """nearest 2x + conv3x3 (nets/blocks.py:228-239)."""
    x = x_ref[...].astype(jnp.float32)
    bs, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    out = _conv2d(x, w_ref[...], b_ref[...].astype(jnp.float32), 1, 1)
    o_ref[...] = out.astype(o_ref.dtype)


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, pad_h: int, pad_w: int):
    out = _conv2d(x_ref[...].astype(jnp.float32), w_ref[...],
                  b_ref[...].astype(jnp.float32), pad_h, pad_w)
    o_ref[...] = out.astype(o_ref.dtype)


def _concat_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.concatenate(
        [a_ref[...], b_ref[...]], axis=-1).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers with a batch grid
# ---------------------------------------------------------------------------

# VMEM is ~16 MB/core: pick the per-step batch tile so weights + the biggest
# live activations (input + output + padded conv buffer, float32) fit.
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes per kernel step (weights + acts)


def _batch_tile(per_sample_bytes: int, batch: int,
                weight_bytes: int = 0) -> int:
    avail = max(_VMEM_BUDGET - weight_bytes, per_sample_bytes)
    bs = max(1, avail // max(per_sample_bytes, 1))
    bs = min(bs, batch)
    while batch % bs:
        bs -= 1
    return bs


def _x_spec(bs, shape):
    return pl.BlockSpec((bs,) + shape[1:], lambda i: (i,) + (0,) * (len(shape) - 1))


def _w_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


def _run(kernel, x, extras, out_shape, per_sample_bytes):
    """Launch `kernel` over a batch grid; extras are (array, is_batched)."""
    b = x.shape[0]
    weight_bytes = sum(int(a.size) * a.dtype.itemsize
                       for a, batched in extras if not batched)
    bs = _batch_tile(per_sample_bytes, b, weight_bytes)
    in_specs = [_x_spec(bs, x.shape)]
    args = [x]
    for arr, batched in extras:
        args.append(arr)
        in_specs.append(_x_spec(bs, arr.shape) if batched else _w_spec(arr.shape))
    return pl.pallas_call(
        kernel,
        grid=(b // bs,),
        in_specs=in_specs,
        out_specs=_x_spec(bs, out_shape),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=_INTERPRET,
    )(*args)


def resblock(x, ss, p, groups: int = 1):
    """p: dict with w1,b1,gs1,gb1,w2,b2,gs2,gb2[,wr,br]; ss: (B, 2*Co)."""
    co = p["w1"].shape[-1]
    has_res = "wr" in p
    out_shape = x.shape[:-1] + (co,)
    per_sample = 4 * x.shape[1] * x.shape[2] * (3 * max(x.shape[3], co) + co)
    wr = p.get("wr", jnp.zeros((1, 1, 1, 1), x.dtype))
    br = p.get("br", jnp.zeros((1,), x.dtype))
    extras = [(ss, True), (p["w1"], False), (p["b1"], False),
              (p["gs1"], False), (p["gb1"], False), (p["w2"], False),
              (p["b2"], False), (p["gs2"], False), (p["gb2"], False),
              (wr, False), (br, False)]
    kern = functools.partial(_resblock_kernel, groups=groups, has_res=has_res)
    return _run(kern, x, extras, out_shape, per_sample)


def linear_attention_block(x, p, heads: int = 4, dim_head: int = 32):
    """p: norm_g, wqkv (1,1,C,3*hidden), wo, bo, out_g."""
    hidden = heads * dim_head
    n = x.shape[1] * x.shape[2]
    per_sample = 4 * n * (2 * x.shape[3] + 6 * hidden)
    extras = [(p["norm_g"], False), (p["wqkv"], False), (p["wo"], False),
              (p["bo"], False), (p["out_g"], False)]
    kern = functools.partial(_linear_attention_kernel, heads=heads,
                             dim_head=dim_head)
    return _run(kern, x, extras, x.shape, per_sample)


def attention_block(x, p, heads: int = 4, dim_head: int = 32):
    hidden = heads * dim_head
    n = x.shape[1] * x.shape[2]
    per_sample = 4 * (n * (2 * x.shape[3] + 4 * hidden) + heads * n * n)
    extras = [(p["norm_g"], False), (p["wqkv"], False), (p["wo"], False),
              (p["bo"], False)]
    kern = functools.partial(_attention_kernel, heads=heads, dim_head=dim_head)
    return _run(kern, x, extras, x.shape, per_sample)


def downsample(x, p):
    co = p["w"].shape[-1]
    out_shape = (x.shape[0], x.shape[1] // 2, x.shape[2] // 2, co)
    per_sample = 4 * x.shape[1] * x.shape[2] * (x.shape[3] + co // 2)
    return _run(_downsample_kernel, x, [(p["w"], False), (p["b"], False)],
                out_shape, per_sample)


def upsample(x, p):
    co = p["w"].shape[-1]
    out_shape = (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, co)
    per_sample = 4 * 4 * x.shape[1] * x.shape[2] * (2 * x.shape[3] + co)
    return _run(_upsample_kernel, x, [(p["w"], False), (p["b"], False)],
                out_shape, per_sample)


def conv(x, p, pad_h=1, pad_w=1):
    co = p["w"].shape[-1]
    out_shape = x.shape[:-1] + (co,)
    per_sample = 4 * x.shape[1] * x.shape[2] * (2 * x.shape[3] + 2 * co)
    kern = functools.partial(_conv_kernel, pad_h=pad_h, pad_w=pad_w)
    return _run(kern, x, [(p["w"], False), (p["b"], False)], out_shape,
                per_sample)


def concat_channels(a, b):
    out_shape = a.shape[:-1] + (a.shape[-1] + b.shape[-1],)
    per_sample = 4 * a.shape[1] * a.shape[2] * 2 * out_shape[-1]
    return _run(_concat_kernel, a, [(b, True)], out_shape, per_sample)


# ---------------------------------------------------------------------------
# parameter packing from the Flax pytree
# ---------------------------------------------------------------------------


def _conv_p(c):
    return {"w": jnp.asarray(c["kernel"]), "b": jnp.asarray(c["bias"])}


def _res_p(r):
    out = {
        "w1": jnp.asarray(r["block1"]["proj"]["kernel"]),
        "b1": jnp.asarray(r["block1"]["proj"]["bias"]),
        "gs1": jnp.asarray(r["block1"]["norm"]["scale"]),
        "gb1": jnp.asarray(r["block1"]["norm"]["bias"]),
        "w2": jnp.asarray(r["block2"]["proj"]["kernel"]),
        "b2": jnp.asarray(r["block2"]["proj"]["bias"]),
        "gs2": jnp.asarray(r["block2"]["norm"]["scale"]),
        "gb2": jnp.asarray(r["block2"]["norm"]["bias"]),
        "film_w": jnp.asarray(r["mlp"]["kernel"]),
        "film_b": jnp.asarray(r["mlp"]["bias"]),
    }
    if "res_conv" in r:
        out["wr"] = jnp.asarray(r["res_conv"]["kernel"])
        out["br"] = jnp.asarray(r["res_conv"]["bias"])
    return out


def _attn_p(a):
    out = {
        "norm_g": jnp.asarray(a["norm"]["g"]),
        "wqkv": jnp.asarray(a["attn"]["to_qkv"]["kernel"]),
        "wo": jnp.asarray(a["attn"]["to_out"]["kernel"]),
        "bo": jnp.asarray(a["attn"]["to_out"]["bias"]),
    }
    if "out_norm" in a["attn"]:
        out["out_g"] = jnp.asarray(a["attn"]["out_norm"]["g"])
    return out


def pack_unet2d_params(params, dim: int = 64,
                       dim_mults: Sequence[int] = (1, 2, 4, 8),
                       groups: int = 1,
                       weight_dtype=None) -> Dict[str, Any]:
    """Flatten a UNet2D Flax params tree into the kernel-ready layout.

    weight_dtype=jnp.bfloat16 casts the matmul weights (convs, attention
    projections) so the kernels hit the MXU's native bf16 path; norms,
    biases, and FiLM projections stay float32."""
    p = params["params"] if "params" in params else params
    n = len(dim_mults)
    packed: Dict[str, Any] = {
        "dim": dim,
        "n_levels": n,
        "groups": groups,
        "time_fc1_w": jnp.asarray(p["time_mlp"]["fc1"]["kernel"]),
        "time_fc1_b": jnp.asarray(p["time_mlp"]["fc1"]["bias"]),
        "time_fc2_w": jnp.asarray(p["time_mlp"]["fc2"]["kernel"]),
        "time_fc2_b": jnp.asarray(p["time_mlp"]["fc2"]["bias"]),
        "init_conv": _conv_p(p["init_conv"]),
        "final_conv": _conv_p(p["final_conv"]),
        "final_res": _res_p(p["final_res_block"]),
        "mid_block1": _res_p(p["mid_block1"]),
        "mid_attn": _attn_p(p["mid_attn"]),
        "mid_block2": _res_p(p["mid_block2"]),
    }
    for i in range(n):
        packed[f"down_{i}_block1"] = _res_p(p[f"down_{i}_block1"])
        packed[f"down_{i}_block2"] = _res_p(p[f"down_{i}_block2"])
        packed[f"down_{i}_attn"] = _attn_p(p[f"down_{i}_attn"])
        d = p[f"down_{i}_downsample"]
        packed[f"down_{i}_downsample"] = (
            _conv_p(d["conv"]) if "conv" in d else _conv_p(d))
        packed[f"up_{i}_block1"] = _res_p(p[f"up_{i}_block1"])
        packed[f"up_{i}_block2"] = _res_p(p[f"up_{i}_block2"])
        packed[f"up_{i}_attn"] = _attn_p(p[f"up_{i}_attn"])
        u = p[f"up_{i}_upsample"]
        packed[f"up_{i}_upsample"] = (
            _conv_p(u["conv"]) if "conv" in u else _conv_p(u))
    if weight_dtype is not None:
        matmul_keys = {"w", "w1", "w2", "wr", "wqkv", "wo"}
        for k, v in packed.items():
            if isinstance(v, dict):
                packed[k] = {kk: (vv.astype(weight_dtype)
                                  if kk in matmul_keys else vv)
                             for kk, vv in v.items()}
    return packed


_RES_NAMES = None


def _res_names(n):
    names = []
    for i in range(n):
        names += [f"down_{i}_block1", f"down_{i}_block2"]
    names += ["mid_block1", "mid_block2"]
    for i in range(n):
        names += [f"up_{i}_block1", f"up_{i}_block2"]
    names += ["final_res"]
    return names


def _time_embedding(packed, t, theta: float = 10000.0):
    dim = packed["dim"]
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-math.log(theta) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    emb = emb @ packed["time_fc1_w"] + packed["time_fc1_b"]
    emb = jax.nn.gelu(emb, approximate=False)
    return emb @ packed["time_fc2_w"] + packed["time_fc2_b"]


def _film_all(packed, temb):
    """All ResBlock FiLM projections as ONE matmul: silu(temb) @ [W_0 | W_1
    | ...], split per block."""
    h = jax.nn.silu(temb)
    names = _res_names(packed["n_levels"])
    ws = jnp.concatenate([packed[nm]["film_w"] for nm in names], axis=1)
    bs = jnp.concatenate([packed[nm]["film_b"] for nm in names], axis=0)
    ss = h @ ws + bs
    out, ofs = {}, 0
    for nm in names:
        width = packed[nm]["film_b"].shape[0]
        out[nm] = ss[:, ofs : ofs + width]
        ofs += width
    return out


def unet2d_pallas_apply(packed, x, t):
    """Forward pass matching UNet2D.apply (float32). x: (B, T, X, C)."""
    n = packed["n_levels"]
    g = packed.get("groups", 1)
    temb = _time_embedding(packed, t)
    film = _film_all(packed, temb)

    x = conv(x, packed["init_conv"], pad_h=3, pad_w=3)
    r = x
    h = []
    for i in range(n):
        x = resblock(x, film[f"down_{i}_block1"], packed[f"down_{i}_block1"], g)
        h.append(x)
        x = resblock(x, film[f"down_{i}_block2"], packed[f"down_{i}_block2"], g)
        x = linear_attention_block(x, packed[f"down_{i}_attn"])
        h.append(x)
        if i < n - 1:
            x = downsample(x, packed[f"down_{i}_downsample"])
        else:
            x = conv(x, packed[f"down_{i}_downsample"], pad_h=1, pad_w=1)

    x = resblock(x, film["mid_block1"], packed["mid_block1"], g)
    x = attention_block(x, packed["mid_attn"])
    x = resblock(x, film["mid_block2"], packed["mid_block2"], g)

    for i in range(n):
        x = concat_channels(x, h.pop())
        x = resblock(x, film[f"up_{i}_block1"], packed[f"up_{i}_block1"], g)
        x = concat_channels(x, h.pop())
        x = resblock(x, film[f"up_{i}_block2"], packed[f"up_{i}_block2"], g)
        x = linear_attention_block(x, packed[f"up_{i}_attn"])
        if i < n - 1:
            x = upsample(x, packed[f"up_{i}_upsample"])
        else:
            x = conv(x, packed[f"up_{i}_upsample"], pad_h=1, pad_w=1)

    x = concat_channels(x, r)
    x = resblock(x, film["final_res"], packed["final_res"], g)
    return conv(x, packed["final_conv"], pad_h=0, pad_w=0)
