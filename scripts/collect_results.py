#!/usr/bin/env python
"""Aggregate all benchmark result files into one markdown summary (stdout).

Reads burgers_results/*.json, smoke_results/results.json + baselines.json,
jellyfish_results/results.json + baselines.json as written by the apps.
"""

import glob
import json
import os
import sys


def burgers():
    rows = []
    # top-level = full-observation rows; subdirectories hold the reference
    # experiment grid (partial_obs_full_ctr / full_obs_partial_ctr /
    # partial_obs_partial_ctr), labeled by their directory.
    for f in sorted(glob.glob("burgers_results/*.json")
                    + glob.glob("burgers_results/*/*.json")):
        try:
            d = json.load(open(f))
        except Exception:
            continue
        rel = os.path.relpath(f, "burgers_results")
        for k, v in d.items():
            if isinstance(v, dict) and "J_actual_mse" in v:
                rows.append((rel, k, v))
    if rows:
        print("## Burgers (J_actual = final-state MSE after FD re-simulation)")
        print("| run | config | J_actual | energy | ddpm_mse |")
        print("|---|---|---|---|---|")
        for f, k, v in rows:
            print(f"| {f} | {k} | {v['J_actual_mse']:.6f} "
                  f"| {v['control_energy']:.1f} | {v['ddpm_mse']:.6f} |")
        print()
    b = jsonl("burgers_results/baselines.json")
    if b:
        print("### Burgers baselines (closed loop through the true FD solver,"
              " shared held-out split)")
        print("| method | observed | controlled | n | J_actual | energy |")
        print("|---|---|---|---|---|---|")
        for r in b:
            po = r.get("partially_observed") or "full"
            pc = r.get("partial_control") or "full"
            print(f"| {r.get('method', '?')} | {po} | {pc} "
                  f"| {r.get('n_test', '?')} "
                  f"| {r.get('J_actual_mse', float('nan')):.6f} "
                  f"| {r.get('control_energy', float('nan')):.1f} |")
        print()


def jsonl(path):
    if not os.path.isfile(path):
        return []
    out = []
    for line in open(path):
        line = line.strip()
        if line:
            try:
                out.append(json.loads(line))
            except Exception:
                pass
    return out


def smoke():
    rows = jsonl("smoke_results/results.json")
    if rows:
        print("## Smoke (DDIM two-model sampling + 128^2 re-simulation)")
        print("| n | J_total | J_target | J_zero_ctrl | J_dataset_ctrl "
              "| mse | n_l2 | steps/s |")
        print("|---|---|---|---|---|---|---|---|")
        for r in rows:
            m = r.get("metrics", r)
            print(f"| {m.get('n', '?')} "
                  f"| {m.get('J_total', float('nan')):.4f} "
                  f"| {m.get('J_target', float('nan')):.4f} "
                  f"| {m.get('J_target_zero_control', float('nan')):.4f} "
                  f"| {m.get('J_target_dataset_control', float('nan')):.4f} "
                  f"| {m.get('mse', float('nan')):.4f} "
                  f"| {m.get('n_l2', float('nan')):.4f} "
                  f"| {m.get('sampling_steps_per_s', float('nan'))} |")
        print()
    b = jsonl("smoke_results/baselines.json")
    if b:
        print("### Smoke RL baselines")
        print("| method | PO | J_target | smoke_out | J_energy |")
        print("|---|---|---|---|---|")
        for r in b:
            # N/A-annotated rows (e.g. SAC at an honest budget) carry None
            def fmt(key, spec):
                v = r.get(key)
                return format(v, spec) if isinstance(v, (int, float)) else "-"
            print(f"| {r['method']} | {r.get('partially_observed')} "
                  f"| {fmt('J_target', '.4f')} "
                  f"| {fmt('smoke_out', '.4f')} "
                  f"| {fmt('J_energy', '.1f')} |")
        print()


def jellyfish():
    rows = jsonl("jellyfish_results/results.json")
    if rows:
        print("## Jellyfish (guided DDPM / MPC through the surrogate pipeline)")
        print("| method | objective | closed-loop J | n | walltime_s |")
        print("|---|---|---|---|---|")
        for r in rows:
            m = r.get("metrics", r)
            cl = m.get("objective_closed_loop")
            print(f"| {m.get('method', 'DDPM')} "
                  f"| {m.get('objective', float('nan')):.4f} "
                  f"| {'%.4f' % cl if cl is not None else '-'} "
                  f"| {m.get('n', '?')} "
                  f"| {m.get('walltime_s', float('nan'))} |")
        print()
    b = jsonl("jellyfish_results/baselines.json")
    if b:
        print("### Jellyfish RL baselines (same surrogate env + objective)")
        print("| method | PO | J | avg_force | theta_reg | convention |")
        print("|---|---|---|---|---|---|")
        for r in b:
            # rows written before r4 don't record their scoring convention;
            # tag them instead of silently mixing objectives (ADVICE r3)
            conv = r.get("objective_convention", "unrecorded (pre-r4)")
            print(f"| {r['method']} | {r.get('partially_observed')} "
                  f"| {r.get('J_jellyfish', float('nan')):.4f} "
                  f"| {r.get('avg_force', float('nan')):.4f} "
                  f"| {r.get('theta_reg', float('nan')):.5f} "
                  f"| {conv} |")
        print()


if __name__ == "__main__":
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    burgers()
    smoke()
    jellyfish()
