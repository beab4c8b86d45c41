"""Whole-forward Pallas mega-kernel for UNet2D inference.

ops/pallas_unet2d.py fuses per block (~40 pallas_calls per forward); PERF.md
measured a ~0.4 ms FIXED cost per pallas_call on this runtime, so per-block
fusion loses to XLA. This module puts the ENTIRE UNet2D forward (minus the
2-channel init/final convs, which stay XLA — tiny lane dims pad 64x) into
ONE pallas_call so the dispatch cost is paid once, with:

  - all weights resident in VMEM (bf16 ~71MB; v5e has ~120MB usable),
  - a batch grid whose weight blocks have constant index maps (fetched once),
  - convs as one wide MXU matmul (Ci -> 9*Co, all taps at once) followed by
    9 masked roll-accumulates in the flattened (B*H*W, Co) space — no padded
    scratch, edge handling via iota masks,
  - attention in-kernel with per-head selection matmuls (E-matrices) because
    Mosaic cannot reshape-split the lane dim into (heads, dim_head),
  - every FiLM projection precomputed outside as one matmul and passed as a
    single (B, 1, F) operand sliced at 128-aligned offsets.

Parity: matches nets/unet2d.py UNet2D.apply (float32 weights) to ~1e-5;
reference architecture /root/reference/model/burgers_1d/unet.py:268-431.

Usage:
    packed = pack_unet2d_mega(flax_params, dim=64, dim_mults=(1,2,4,8),
                              weight_dtype=jnp.bfloat16)
    out = unet2d_mega_apply(packed, x, t)      # == net.apply(params, x, t)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffphycon_tpu.research.pallas_unet2d import (
    _chan_layer_norm,
    _film_all,
    _group_norm,
    _n_levels,
    _res_names,
    _silu,
    _time_embedding,
    pack_unet2d_params,
)

_INTERPRET = False


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(flag)


# ---------------------------------------------------------------------------
# packing: conv weights (9, Ci, Co) -> (Ci, 9*Co) tap-major columns
# ---------------------------------------------------------------------------


def _widen(w):
    if w.ndim == 3 and w.shape[0] == 9:  # 3x3 conv (taps, Ci, Co)
        t, ci, co = w.shape
        return jnp.transpose(w, (1, 0, 2)).reshape(ci, t * co)
    return w  # 1x1 (2D), downsample (4,C,Co), init 7x7 (49,...) untouched


def pack_unet2d_mega(params, dim: int = 64,
                     dim_mults: Sequence[int] = (1, 2, 4, 8),
                     groups: int = 1,
                     weight_dtype=jnp.bfloat16) -> Dict[str, Any]:
    packed = pack_unet2d_params(params, dim, dim_mults, groups,
                                weight_dtype=weight_dtype)
    for k, v in packed.items():
        if isinstance(v, dict):
            packed[k] = {kk: (_widen(vv) if kk in ("w1", "w2", "w") else vv)
                         for kk, vv in v.items()}
    return packed


# ---------------------------------------------------------------------------
# in-kernel building blocks (values; weights read from refs)
# ---------------------------------------------------------------------------


def _conv3x3_wide(x, w_ref, b_ref, H: int, W: int):
    """3x3 same-pad conv: one (M, Ci) @ (Ci, 9*Co) dot, then 9 masked
    roll-accumulates in flattened row space. x: (bs, H, W, Ci) f32."""
    bs, _, _, ci = x.shape
    m = bs * H * W
    co = w_ref.shape[-1] // 9
    a = x.reshape(m, ci).astype(w_ref.dtype)
    part = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)

    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    wcol = iota % W
    hrow = (iota // W) % H
    out = jnp.zeros((m, co), jnp.float32)
    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        pk = jax.lax.slice(part, (0, t * co), (m, (t + 1) * co))
        s = dy * W + dx                      # out[r] += part[r + s]
        pk = pltpu.roll(pk, (m - s) % m, 0)
        mask = ((wcol + dx >= 0) & (wcol + dx < W)
                & (hrow + dy >= 0) & (hrow + dy < H)).astype(jnp.float32)
        out = out + pk * mask
    out = out + b_ref[...].astype(jnp.float32)
    return out.reshape(bs, H, W, co)


def _mm(x2d, w_ref):
    w = w_ref[...]
    return jnp.dot(x2d.astype(w.dtype), w, preferred_element_type=jnp.float32)


def _resblock(x, ss, r, H, W, groups):
    """r: dict name->ref with w1,b1,gs1,gb1,w2,b2,gs2,gb2[,wr,br];
    ss: (bs, 2*Co) f32 value."""
    bs = x.shape[0]
    co = r["w1"].shape[-1] // 9
    h = _conv3x3_wide(x, r["w1"], r["b1"], H, W)
    h = _group_norm(h, r["gs1"][...].astype(jnp.float32),
                    r["gb1"][...].astype(jnp.float32), groups)
    scale = jax.lax.slice(ss, (0, 0), (bs, co)).reshape(bs, 1, 1, co)
    shift = jax.lax.slice(ss, (0, co), (bs, 2 * co)).reshape(bs, 1, 1, co)
    h = _silu(h * (scale + 1.0) + shift)
    h = _conv3x3_wide(h, r["w2"], r["b2"], H, W)
    h = _group_norm(h, r["gs2"][...].astype(jnp.float32),
                    r["gb2"][...].astype(jnp.float32), groups)
    h = _silu(h)
    if "wr" in r:
        ci = x.shape[-1]
        res = _mm(x.reshape(bs * H * W, ci), r["wr"]).reshape(bs, H, W, co)
        res = res + r["br"][...].astype(jnp.float32)
    else:
        res = x
    return h + res


def _head_split(t2d, h, heads, dim_head, bs, n):
    """(bs*n, hidden) -> (bs, n, dim_head) for head h via a selection matmul
    (Mosaic cannot lane-split reshapes)."""
    hidden = heads * dim_head
    rows = jax.lax.broadcasted_iota(jnp.int32, (hidden, dim_head), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hidden, dim_head), 1)
    e = (rows == h * dim_head + cols).astype(t2d.dtype)
    return jnp.dot(t2d, e, preferred_element_type=jnp.float32).reshape(
        bs, n, dim_head)


def _head_join(out2d, x_h, h, heads, dim_head):
    """accumulate (bs*n, dim_head) back into (bs*n, hidden) columns."""
    hidden = heads * dim_head
    rows = jax.lax.broadcasted_iota(jnp.int32, (dim_head, hidden), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (dim_head, hidden), 1)
    e = (cols == h * dim_head + rows).astype(x_h.dtype)
    return out2d + jnp.dot(x_h, e, preferred_element_type=jnp.float32)


def _linear_attention(x, r, H, W, heads=4, dim_head=32):
    bs, _, _, c = x.shape
    n = H * W
    hidden = heads * dim_head
    hn = _chan_layer_norm(x, r["norm_g"][...].astype(jnp.float32))
    qkv = _mm(hn.reshape(bs * n, c), r["wqkv"])          # (bs*n, 3*hidden)
    q2 = jax.lax.slice(qkv, (0, 0), (bs * n, hidden))
    k2 = jax.lax.slice(qkv, (0, hidden), (bs * n, 2 * hidden))
    v2 = jax.lax.slice(qkv, (0, 2 * hidden), (bs * n, 3 * hidden))
    out2 = jnp.zeros((bs * n, hidden), jnp.float32)
    for h in range(heads):
        qh = _head_split(q2, h, heads, dim_head, bs, n)  # (bs, n, d)
        kh = _head_split(k2, h, heads, dim_head, bs, n)
        vh = _head_split(v2, h, heads, dim_head, bs, n)
        qh = jax.nn.softmax(qh, axis=-1) * (dim_head ** -0.5)  # over d
        kh = jax.nn.softmax(kh, axis=1)                        # over tokens
        ctx = jnp.einsum("bnd,bne->bde", kh, vh,
                         preferred_element_type=jnp.float32)
        oh = jnp.einsum("bde,bnd->bne", ctx, qh,
                        preferred_element_type=jnp.float32)
        out2 = _head_join(out2, oh.reshape(bs * n, dim_head), h, heads,
                          dim_head)
    out = _mm(out2, r["wo"]).reshape(bs, H, W, c)
    out = out + r["bo"][...].astype(jnp.float32)
    out = _chan_layer_norm(out, r["out_g"][...].astype(jnp.float32))
    return x + out


def _attention(x, r, H, W, heads=4, dim_head=32):
    bs, _, _, c = x.shape
    n = H * W
    hidden = heads * dim_head
    hn = _chan_layer_norm(x, r["norm_g"][...].astype(jnp.float32))
    qkv = _mm(hn.reshape(bs * n, c), r["wqkv"])
    q2 = jax.lax.slice(qkv, (0, 0), (bs * n, hidden))
    k2 = jax.lax.slice(qkv, (0, hidden), (bs * n, 2 * hidden))
    v2 = jax.lax.slice(qkv, (0, 2 * hidden), (bs * n, 3 * hidden))
    out2 = jnp.zeros((bs * n, hidden), jnp.float32)
    for h in range(heads):
        qh = _head_split(q2, h, heads, dim_head, bs, n) * (dim_head ** -0.5)
        kh = _head_split(k2, h, heads, dim_head, bs, n)
        vh = _head_split(v2, h, heads, dim_head, bs, n)
        sim = jnp.einsum("bid,bjd->bij", qh, kh,
                         preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1)
        oh = jnp.einsum("bij,bjd->bid", attn, vh,
                        preferred_element_type=jnp.float32)
        out2 = _head_join(out2, oh.reshape(bs * n, dim_head), h, heads,
                          dim_head)
    out = _mm(out2, r["wo"]).reshape(bs, H, W, c)
    return x + out + r["bo"][...].astype(jnp.float32)


def _downsample(x, r, H, W):
    """space-to-depth + 1x1 conv as 4 per-phase matmuls (weights packed
    (4, C, Co) phase-major by _down_p)."""
    bs, _, _, c = x.shape
    co = r["w"].shape[-1]
    x6 = x.reshape(bs, H // 2, 2, W // 2, 2, c)
    m = bs * (H // 2) * (W // 2)
    out = jnp.zeros((m, co), jnp.float32)
    w = r["w"]
    for k, (i, j) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xs = x6[:, :, i, :, j, :].reshape(m, c).astype(w.dtype)
        out = out + jnp.dot(xs, w[k], preferred_element_type=jnp.float32)
    out = out + r["b"][...].astype(jnp.float32)
    return out.reshape(bs, H // 2, W // 2, co)


def _upsample(x, r, H, W):
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _conv3x3_wide(x, r["w"], r["b"], 2 * H, 2 * W)


# ---------------------------------------------------------------------------
# kernel assembly
# ---------------------------------------------------------------------------

_RES_KEYS = ("w1", "b1", "gs1", "gb1", "w2", "b2", "gs2", "gb2", "wr", "br")
_LATTN_KEYS = ("norm_g", "wqkv", "wo", "bo", "out_g")
_ATTN_KEYS = ("norm_g", "wqkv", "wo", "bo")
_CONV_KEYS = ("w", "b")


def _block_plan(packed):
    """Ordered (name, keys) pairs covering every in-kernel weight."""
    n = _n_levels(packed)
    plan = []
    for i in range(n):
        for blk in (f"down_{i}_block1", f"down_{i}_block2"):
            plan.append((blk, [k for k in _RES_KEYS if k in packed[blk]]))
        plan.append((f"down_{i}_attn", list(_LATTN_KEYS)))
        plan.append((f"down_{i}_downsample", list(_CONV_KEYS)))
    plan.append(("mid_block1", [k for k in _RES_KEYS
                                if k in packed["mid_block1"]]))
    plan.append(("mid_attn", list(_ATTN_KEYS)))
    plan.append(("mid_block2", [k for k in _RES_KEYS
                                if k in packed["mid_block2"]]))
    for i in range(n):
        for blk in (f"up_{i}_block1", f"up_{i}_block2"):
            plan.append((blk, [k for k in _RES_KEYS if k in packed[blk]]))
        plan.append((f"up_{i}_attn", list(_LATTN_KEYS)))
        plan.append((f"up_{i}_upsample", list(_CONV_KEYS)))
    plan.append(("final_res", [k for k in _RES_KEYS
                               if k in packed["final_res"]]))
    return plan


def _conv_xla(x, p, kh: int, kw: int):
    w = p["w"]
    if w.ndim == 2 and kh == kw == 1:
        k4 = w.reshape(1, 1, *w.shape)
    else:
        ci = w.shape[1]
        k4 = w.reshape(kh, kw, ci, w.shape[-1])
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k4.astype(jnp.float32), (1, 1),
        [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"].astype(jnp.float32)


def unet2d_mega_apply(packed, x, t, groups: int = 1,
                      batch_tile: int = 0):
    """Forward matching UNet2D.apply. x: (B, H, W, C). batch_tile=0 picks
    the largest divisor of B with (acts + weights) under the VMEM budget."""
    n = _n_levels(packed)
    b, H0, W0, _ = x.shape
    temb = _time_embedding(packed, t)
    film = _film_all(packed, temb)
    names = _res_names(n)
    film_cat = jnp.concatenate([film[nm] for nm in names], axis=1)[:, None, :]
    film_ofs = {}
    ofs = 0
    for nm in names:
        width = packed[nm]["film_b"].shape[0]
        film_ofs[nm] = (ofs, width)
        ofs += width

    x0 = _conv_xla(x, packed["init_conv"], 7, 7)

    plan = _block_plan(packed)
    w_args, w_index = [], {}
    for nm, keys in plan:
        for k in keys:
            w_index[(nm, k)] = len(w_args)
            w_args.append(packed[nm][k])

    dims = [packed[f"down_{i}_block1"]["w1"].shape[0] for i in range(n)]
    sizes = [(H0 // 2**i, W0 // 2**i) for i in range(n)]

    if batch_tile:
        bs = batch_tile
    else:
        w_bytes = sum(int(a.size) * a.dtype.itemsize for a in w_args)
        act = 24 * H0 * W0 * dims[0] * 4  # live activations + temps, rough
        budget = 100 * 1024 * 1024
        bs = max(1, (budget - w_bytes) // act)
        bs = min(bs, b)
        while b % bs:
            bs -= 1

    def kernel(*refs):
        x_ref, film_ref = refs[0], refs[1]
        w_refs = refs[2 : 2 + len(w_args)]
        o_ref = refs[2 + len(w_args)]

        def blk(nm):
            _, keys = next(p for p in plan if p[0] == nm)
            return {k: w_refs[w_index[(nm, k)]] for k in keys}

        xv = x_ref[...].astype(jnp.float32)
        fv = film_ref[...].astype(jnp.float32)[:, 0, :]
        bs_ = xv.shape[0]

        def ss(nm):
            o, wdt = film_ofs[nm]
            return jax.lax.slice(fv, (0, o), (bs_, o + wdt))

        r = xv
        hstack = []
        xc = xv
        for i in range(n):
            Hi, Wi = sizes[i]
            xc = _resblock(xc, ss(f"down_{i}_block1"),
                           blk(f"down_{i}_block1"), Hi, Wi, groups)
            hstack.append(xc)
            xc = _resblock(xc, ss(f"down_{i}_block2"),
                           blk(f"down_{i}_block2"), Hi, Wi, groups)
            xc = _linear_attention(xc, blk(f"down_{i}_attn"), Hi, Wi)
            hstack.append(xc)
            if i < n - 1:
                xc = _downsample(xc, blk(f"down_{i}_downsample"), Hi, Wi)
            else:
                d = blk(f"down_{i}_downsample")
                xc = _conv3x3_wide(xc, d["w"], d["b"], Hi, Wi)

        Hm, Wm = sizes[-1]
        xc = _resblock(xc, ss("mid_block1"), blk("mid_block1"), Hm, Wm,
                       groups)
        xc = _attention(xc, blk("mid_attn"), Hm, Wm)
        xc = _resblock(xc, ss("mid_block2"), blk("mid_block2"), Hm, Wm,
                       groups)

        for i in range(n):
            Hi, Wi = sizes[n - 1 - i]
            xc = jnp.concatenate([xc, hstack.pop()], axis=-1)
            xc = _resblock(xc, ss(f"up_{i}_block1"), blk(f"up_{i}_block1"),
                           Hi, Wi, groups)
            xc = jnp.concatenate([xc, hstack.pop()], axis=-1)
            xc = _resblock(xc, ss(f"up_{i}_block2"), blk(f"up_{i}_block2"),
                           Hi, Wi, groups)
            xc = _linear_attention(xc, blk(f"up_{i}_attn"), Hi, Wi)
            if i < n - 1:
                xc = _upsample(xc, blk(f"up_{i}_upsample"), Hi, Wi)
            else:
                u = blk(f"up_{i}_upsample")
                xc = _conv3x3_wide(xc, u["w"], u["b"], Hi, Wi)

        xc = jnp.concatenate([xc, r], axis=-1)
        xc = _resblock(xc, ss("final_res"), blk("final_res"), H0, W0, groups)
        o_ref[...] = xc.astype(o_ref.dtype)

    def bspec(shape):
        return pl.BlockSpec((bs,) + shape[1:],
                            lambda i: (i,) + (0,) * (len(shape) - 1))

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    out_shape = (b, H0, W0, dims[0])
    h = pl.pallas_call(
        kernel,
        grid=(b // bs,),
        in_specs=[bspec(x0.shape), bspec(film_cat.shape)]
        + [wspec(a.shape) for a in w_args],
        out_specs=bspec(out_shape),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x0, film_cat, *w_args)
    return _conv_xla(h, packed["final_conv"], 1, 1)
