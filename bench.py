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
against a nominal 30 steps/s for the reference PyTorch loop on a single A100
(2 x 35M-param UNet2D forwards + autograd guidance at batch 50, ~35 ms/step
estimated from standard GPU U-Net throughput), the comparison axis named in
BASELINE.json ("denoise steps/sec/chip").
"""

import json
import time

REFERENCE_STEPS_PER_SEC_ESTIMATE = 30.0


def main():
    import jax
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
    gd = bench.build_diffusion(cfg, net.apply, model_w_apply=net.apply)

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
    main()
