#!/usr/bin/env python
"""Benchmark: guided-sampling throughput on the Burgers headline workload.

Measures the reference's default guided-inference compute profile
(/root/reference/inference/inference_1d_burgers.py:342 batch 50; BASELINE.md):
1000 DDPM denoise steps, each = joint UNet2D forward + prior UNet2D forward +
guidance gradient of the control objective, batch 50 x (16, 128, 2) — all as
one jitted lax.scan on a single chip.

Prints ONE JSON line:
  {"metric": "guided_denoise_steps_per_sec_per_chip", "value": N,
   "unit": "steps/s", "vs_baseline": R}

vs_baseline: the reference publishes no numbers (BASELINE.md); R is computed
against a nominal 30 steps/s ESTIMATE for the reference PyTorch loop on a
single A100 (2 x 35M-param UNet2D forwards + autograd guidance at batch 50,
~35 ms/step estimated from standard GPU U-Net throughput), the comparison
axis named in BASELINE.json ("denoise steps/sec/chip"). Sanity floor
measured on this host (PERF.md r2): the reference's torch eager loop runs at
0.02 steps/s on CPU; no GPU exists here, so the A100 figure remains an
estimate and is labeled as such wherever quoted.
"""

import argparse
import json
import time

REFERENCE_STEPS_PER_SEC_ESTIMATE = 30.0


def main(impl: str = "auto"):
    import jax

    # unsafe_rbg: XLA RngBitGenerator for in-scan noise draws. threefry
    # lowers each hash to a 5-iteration while loop (~0.8 ms per instance per
    # step on this runtime); rbg is one streamed op. Sampling statistics are
    # unchanged (counter-based generator), only the stream differs.
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.benchmarks import burgers as bench

    cfg = bench.BurgersConfig(
        is_condition_u0=True, is_condition_uT=True, timesteps=1000,
        bf16=True,  # TPU-native deployment dtype (params stay fp32)
    )
    net = bench.build_unet(cfg)
    params = bench.init_params(cfg, seed=0)
    params_w = bench.init_params(cfg, seed=1)

    if impl == "auto":
        # XLA is the measured-best path on this runtime. The Pallas options
        # are retained for reference as MEASURED DEAD ENDS (PERF.md r2):
        # per-block fusion = 29.7 ms/fwd in-scan (2.6x worse than XLA);
        # the whole-net mega-kernel does not finish Mosaic compilation.
        impl = "xla"
    if impl == "pallas":
        # fused Pallas forward (ops/pallas_unet2d.py): ~40 kernels per model
        # eval — kept for kernel-lowering regression coverage, NOT for speed
        from diffphycon_tpu.research.pallas_unet2d import (
            pack_unet2d_params,
            unet2d_pallas_apply,
        )

        wd = jnp.bfloat16 if cfg.bf16 else None
        params = pack_unet2d_params(params, cfg.dim, tuple(cfg.dim_muls),
                                    weight_dtype=wd)
        params_w = pack_unet2d_params(params_w, cfg.dim, tuple(cfg.dim_muls),
                                      weight_dtype=wd)
        apply_fn = lambda p, x, t: unet2d_pallas_apply(p, x, t)
    else:
        apply_fn = net.apply
    gd = bench.build_diffusion(cfg, apply_fn, model_w_apply=apply_fn)

    batch = 50
    rng = np.random.default_rng(0)
    u_target = rng.normal(size=(batch, 11, 128)).astype(np.float32)
    guidance = bench.build_guidance(cfg, u_target, wu=1000.0, wf=0.0)
    cond_vals = {
        "u0": jnp.asarray(u_target[:, 0, :] / bench.RESCALER),
        "uT": jnp.asarray(u_target[:, 10, :] / bench.RESCALER),
    }

    # params must be jit ARGUMENTS (closing over them would embed 70M floats
    # as HLO constants and blow up the compile payload)
    sample = jax.jit(
        lambda p, key: gd.sample(p, key, batch_size=batch,
                                 cond_vals=cond_vals, guidance=guidance)
    )
    all_params = (params, params_w)
    # compile
    x = sample(all_params, jax.random.PRNGKey(0))
    x.block_until_ready()
    # timed runs
    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        x = sample(all_params, jax.random.PRNGKey(i + 1))
    x.block_until_ready()
    dt = (time.time() - t0) / n_rep
    steps_per_sec = cfg.timesteps / dt

    print(json.dumps({
        "metric": "guided_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="auto", choices=["auto", "xla", "pallas"])
    main(ap.parse_args().impl)
