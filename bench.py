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
        params = pack_unet2d_params(params, cfg.dim, tuple(cfg.dim_mults),
                                    weight_dtype=wd)
        params_w = pack_unet2d_params(params_w, cfg.dim, tuple(cfg.dim_mults),
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
    np.asarray(x)
    # Timed runs. The axon runtime has ~10% per-execution variance (PERF.md
    # r3 forensics: the r1->r2 "regression" 68.96 -> 64.49 was variance, not
    # program growth — HEAD compiles to a SMALLER program). Primary value is
    # therefore peak steady-state throughput over n_rep independently timed
    # runs (each synced by a forced host transfer, the honest timer on this
    # runtime); mean is reported alongside for continuity with r1/r2.
    n_rep = 5
    rep_dts = []
    for i in range(n_rep):
        t0 = time.time()
        x = sample(all_params, jax.random.PRNGKey(i + 1))
        np.asarray(x)
        rep_dts.append(time.time() - t0)
    steps_per_sec = cfg.timesteps / min(rep_dts)
    mean_steps_per_sec = cfg.timesteps * n_rep / sum(rep_dts)

    mfu = _mfu_fields(jax, jnp, net, params, batch, cfg, steps_per_sec)

    out = {
        "metric": "guided_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        # primary ratio is peak-based (peak is the primary value);
        # vs_baseline_mean is reported alongside so round-over-round and
        # reference comparisons stay apples-to-apples (ADVICE r3)
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC_ESTIMATE, 2),
        "vs_baseline_mean": round(
            mean_steps_per_sec / REFERENCE_STEPS_PER_SEC_ESTIMATE, 2),
        "value_mean": round(mean_steps_per_sec, 2),
        "n_rep": n_rep,
        **mfu,
    }
    return out


def _mfu_fields(jax, jnp, net, params, batch, cfg, steps_per_sec):
    """Analytic MFU of the guided denoise loop (VERDICT r3 #6).

    One guided step = 2 UNet2D forwards (joint + prior); the Burgers guidance
    gradient differentiates only the cheap control objective, not a network
    (reference utils.py:1289-1328), so its FLOPs are negligible. Forward
    FLOPs come from XLA's cost analysis of one model apply at the bench batch,
    lowered for CPU (the count is platform-independent). Peak is looked up
    from device_kind; unknown kinds fall back to TPU v4 bf16 peak and say so.
    The wall-clock counterpart (conv-only duty-cycle ablation, ~13%) is in
    PERF.md r2/r3.
    """
    peak_by_kind = {
        # bf16 peak FLOP/s per chip (public spec sheets)
        "TPU v4": 275e12,
        "TPU v5e": 197e12,
        "TPU v5 lite": 197e12,
        "TPU v5p": 459e12,
        "TPU v6e": 918e12,
        "TPU v6 lite": 918e12,
    }
    try:
        x = jnp.zeros((batch, cfg.pad_t, cfg.nx, 2))
        t = jnp.zeros((batch,))
        lowered = jax.jit(net.apply).trace(params, x, t).lower()
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fwd_flops = float(ca.get("flops", 0.0))
    except Exception:
        try:  # fall back to a CPU lowering if the device compile path balks
            cpu = jax.devices("cpu")[0]
            lowered = (
                jax.jit(net.apply, device=cpu).trace(params, x, t).lower()
            )
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fwd_flops = float(ca.get("flops", 0.0))
        except Exception:
            return {"mfu_pct": None, "mfu_note": "cost_analysis unavailable"}
    step_flops = 2.0 * fwd_flops
    import os

    kind = "unknown"
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        pass
    peak = next((v for k, v in peak_by_kind.items() if k.lower() in
                 str(kind).lower()), None)
    note = f"device_kind={kind}"
    if peak is None:
        # the axon runtime exposes the chip generation via env, not kind
        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
        peak = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12,
                "v6e": 918e12}.get(gen)
        if peak is not None:
            note += f"; PALLAS_AXON_TPU_GEN={gen}"
        else:
            peak = 275e12
            note += "; unknown kind -> assuming TPU v4 bf16 peak 275 TFLOP/s"
    mfu = steps_per_sec * step_flops / peak
    return {
        "mfu_pct": round(100.0 * mfu, 2),
        "flops_per_step": step_flops,
        "assumed_peak_flops": peak,
        "mfu_note": note,
    }


def bench_smoke(np, jax, jnp, batch=4, ddim_steps=100):
    """Smoke two-model guided DDIM steady state (the reference inference
    profile, inference_2d_smoke.py:516: 100 DDIM steps x 2 UNet3D forwards +
    guidance grad), timed over one full sample with a forced host sync."""
    from diffphycon_tpu.benchmarks import smoke as bench

    import dataclasses

    cfg = bench.SmokeConfig(bf16=True, ddim_sampling_steps=ddim_steps)
    cfg_w = dataclasses.replace(cfg, is_w_model=True)
    net = bench.build_unet(cfg)
    net_w = bench.build_unet(cfg_w)
    h, f = cfg.image_size, cfg.frames
    init = jax.jit(lambda: (
        net.init(jax.random.PRNGKey(0), jnp.zeros((1, f, h, h, 6)),
                 jnp.zeros((1,))),
        net_w.init(jax.random.PRNGKey(1), jnp.zeros((1, f, h, h, 2)),
                   jnp.zeros((1,)))), backend="cpu")
    params, params_w = jax.device_put(init())
    gd = bench.build_diffusion(cfg, net.apply, model_w_apply=net_w.apply)
    guidance = bench.build_guidance(cfg)
    rng = np.random.default_rng(0)
    init_d = jnp.asarray(rng.normal(size=(batch, h, h)).astype(np.float32))
    sample = jax.jit(lambda p, key: gd.sample(
        p, key, batch_size=batch, cond_vals={"init": init_d},
        guidance=guidance))
    x = sample((params, params_w), jax.random.PRNGKey(0))
    np.asarray(x)  # compile + settle
    t0 = time.time()
    x = sample((params, params_w), jax.random.PRNGKey(1))
    np.asarray(x)
    return round(ddim_steps / (time.time() - t0), 2)


def bench_jellyfish(np, jax, jnp, batch=1, chunk_steps=100):
    """Jellyfish guided DDPM steady-state step rate (reference profile,
    inference_2d_jellyfish.py:905: 1000 steps x (EBM joint + thetas UNet3D +
    bd-updater + ForceUNet guidance)); measured on a 100-step sample_chunk
    with forced host sync."""
    from diffphycon_tpu.benchmarks import jellyfish as bench

    cfg = bench.JellyfishConfig(bf16=True)
    nj = bench.build_joint_unet(cfg)
    nt = bench.build_thetas_unet(cfg)
    nb = bench.build_bd_updater(cfg)
    nf = bench.build_force_unet(cfg)
    h = cfg.image_size
    init = jax.jit(lambda: (
        nj.init(jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.frames, h, h, cfg.joint_channels)),
                jnp.zeros((1,), jnp.int32)),
        nt.init(jax.random.PRNGKey(1),
                jnp.zeros((1, cfg.frames, h, h, cfg.joint_channels)),
                jnp.zeros((1,), jnp.int32)),
        nb.init(jax.random.PRNGKey(2), jnp.zeros((1, h, h, 3)),
                jnp.zeros((1,))),
        nf.init(jax.random.PRNGKey(3), jnp.zeros((1, h, h, 4)))),
        backend="cpu")
    pj, pt, pb, pf = jax.device_put(init())
    gd = bench.JellyfishDiffusion(cfg, nj.apply, thetas_apply=nt.apply,
                                  bd_updater_apply=nb.apply)
    design_fn = bench.make_force_design_fn(cfg, nf.apply, pf, nb.apply, pb,
                                           -1.0, 1.0)
    rng = np.random.default_rng(0)
    s0 = jnp.asarray(rng.normal(size=(batch, h, h, 3)).astype(np.float32))
    b0 = jnp.asarray(rng.normal(size=(batch, h, h, 3)).astype(np.float32))
    th0 = jnp.asarray(rng.normal(size=(batch,)).astype(np.float32))
    key = jax.random.PRNGKey(5)
    params = (pj, pt, pb)
    k0, _ = jax.random.split(key)
    x = gd.sample_init(k0, s0, b0, th0)
    ts = gd.sample_ts()
    chunk = jax.jit(lambda p, x, ts: gd.sample_chunk(
        p, key, s0, b0, th0, x, ts, design_fn=design_fn))
    x = chunk(params, x, ts[:chunk_steps])
    np.asarray(x)  # compile + settle
    t0 = time.time()
    x = chunk(params, x, ts[chunk_steps : 2 * chunk_steps])
    np.asarray(x)
    return round(chunk_steps / (time.time() - t0), 2)


def _chip_preflight(timeout_s: float = 240.0):
    """Probe the TPU backend in a child process with a hard timeout.

    The axon tunnel's outage mode (r4, PERF.md) BLOCKS jax.devices()
    indefinitely rather than raising, so an unguarded bench would hang the
    driver forever. Returns None when the chip answers, else a short error
    string. The child is SIGTERMed first (a kill -9 mid-TPU-call wedges the
    tunnel, PERF.md r3; a blocked backend-init connect is safe to TERM)."""
    import subprocess
    import sys

    proc = subprocess.Popen(
        [sys.executable, "-c", "import jax; jax.devices()"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        rc = proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
        return f"jax.devices() blocked > {timeout_s:.0f}s (tunnel wedged)"
    if rc != 0:
        return f"jax.devices() failed (rc={rc})"
    return None


def _unreachable_json(reason: str) -> dict:
    return {
        "metric": "guided_denoise_steps_per_sec_per_chip",
        "value": 0.0,
        "unit": "steps/s",
        "vs_baseline": 0.0,
        "chip_unreachable": True,
        "error": reason[:400],
        "note": ("no measurement possible: the axon TPU tunnel is down "
                 "(outage documented in PERF.md round 4); last validated "
                 "on-chip value was 64.14 steps/s (r3, PERF.md)"),
    }


def _error_json(exc: BaseException) -> dict:
    """A non-chip failure (a genuine code bug) must NOT masquerade as a
    tunnel outage (ADVICE r4): keep rc=0 + one JSON line, but flag it
    bench_error and carry the traceback tail so the regression is visible."""
    import traceback

    tb = "".join(traceback.format_exception(exc)).strip().splitlines()
    return {
        "metric": "guided_denoise_steps_per_sec_per_chip",
        "value": 0.0,
        "unit": "steps/s",
        "vs_baseline": 0.0,
        "bench_error": True,
        "error": f"{type(exc).__name__}: {exc}"[:400],
        "traceback_tail": tb[-6:],
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--full", action="store_true",
                    help="also bench the jellyfish guided-DDPM loop as an "
                         "extra secondary metric (the smoke UNet3D DDIM "
                         "secondary runs by default)")
    ap.add_argument("--no_secondary", action="store_true",
                    help="primary Burgers metric only")
    ap.add_argument("--no_preflight", action="store_true")
    args = ap.parse_args()
    if not args.no_preflight:
        err = _chip_preflight()
        if err is not None:
            print(json.dumps(_unreachable_json(err)))
            raise SystemExit(0)
    # watchdog: even a post-preflight wedge must still yield ONE JSON line
    import signal

    def _expired(sig, frm):
        raise TimeoutError("bench watchdog expired (25 min)")

    signal.signal(signal.SIGALRM, _expired)
    signal.alarm(1500)
    t_start = time.time()
    try:
        out = main(args.impl)
    except TimeoutError as e:  # watchdog = wedged chip, not a code bug
        print(json.dumps(_unreachable_json(f"{type(e).__name__}: {e}")))
        raise SystemExit(0)
    except Exception as e:  # noqa: BLE001 — the artifact must exist
        print(json.dumps(_error_json(e)))
        raise SystemExit(0)
    # Secondary: the UNet3D video-model sampler class (VERDICT r4 #7 — the
    # (B,32,6,64,64) profile of inference_2d_smoke.py:511-517). A secondary
    # failure or time-out must never cost the banked primary number.
    if not args.no_secondary:
        import jax
        import jax.numpy as jnp
        import numpy as np

        out["secondary"] = {}
        budget_left = 1500 - (time.time() - t_start)
        if budget_left > 600:  # smoke DDIM-100 bf16 ~= 2x(100-240s) + compile
            try:
                out["secondary"]["smoke_ddim_guided_steps_per_sec"] = (
                    bench_smoke(np, jax, jnp))
            except Exception as e:  # noqa: BLE001
                out["secondary"]["smoke_error"] = f"{type(e).__name__}: {e}"[:200]
        else:
            out["secondary"]["smoke_skipped"] = "insufficient watchdog budget"
        if args.full:
            try:
                out["secondary"]["jellyfish_ddpm_guided_steps_per_sec"] = (
                    bench_jellyfish(np, jax, jnp))
            except Exception as e:  # noqa: BLE001
                out["secondary"]["jellyfish_error"] = (
                    f"{type(e).__name__}: {e}"[:200])
    signal.alarm(0)
    print(json.dumps(out))
