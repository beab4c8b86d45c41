#!/usr/bin/env python
"""Mid-grain Pallas experiment (VERDICT r2 #7): fused ResBlock-pair kernel
vs two per-block pallas_calls vs XLA, on the UNet2D down-path shapes at the
headline batch 50. Timed by forced host transfer (PERF.md measurement
traps). Run on the TPU when the chip is free:

    PYTHONPATH=/root/repo python scripts/bench_midgrain_pallas.py
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from diffphycon_tpu.research import pallas_unet2d as P

rng = np.random.default_rng(0)

def mk_res(ci, co):
    z = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.05
    return {"w1": z(9, ci, co), "b1": z(co), "gs1": jnp.ones((co,)),
            "gb1": jnp.zeros((co,)), "w2": z(9, co, co), "b2": z(co),
            "gs2": jnp.ones((co,)), "gb2": jnp.zeros((co,))}

def timed(fn, *args, reps=20):
    out = fn(*args); np.asarray(out)  # compile + settle
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps * 1e3  # ms

results = {}
for name, (H, W, C) in {"level0": (16, 128, 64), "level2": (4, 32, 256)}.items():
    B = 50
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ssa = jnp.asarray(rng.normal(size=(B, 2 * C)).astype(np.float32))
    ssb = jnp.asarray(rng.normal(size=(B, 2 * C)).astype(np.float32))
    pa, pb = mk_res(C, C), mk_res(C, C)

    f_xla = jax.jit(lambda x, sa, sb: P.resblock_xla(
        P.resblock_xla(x, sa, pa), sb, pb))
    f_blk = jax.jit(lambda x, sa, sb: P.resblock(
        P.resblock(x, sa, pa), sb, pb))
    f_pair = jax.jit(lambda x, sa, sb: P.resblock_pair(x, sa, sb, pa, pb))

    # parity first
    r_xla = np.asarray(f_xla(x, ssa, ssb))
    t0c = time.time(); r_pair = np.asarray(f_pair(x, ssa, ssb))
    compile_pair_s = time.time() - t0c
    err = np.abs(r_xla - r_pair).max()
    row = {"pair_vs_xla_maxdiff": float(err),
           "pair_compile_s_incl_first_run": round(compile_pair_s, 1)}
    for label, fn in [("xla_ms", f_xla), ("per_block_ms", f_blk),
                      ("fused_pair_ms", f_pair)]:
        try:
            row[label] = round(timed(fn, x, ssa, ssb), 3)
        except Exception as e:  # mosaic compile failure is a result too
            row[label] = f"FAILED: {type(e).__name__}"
    results[name] = row
    print(name, json.dumps(row), flush=True)
print("FINAL", json.dumps(results))
