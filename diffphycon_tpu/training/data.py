"""Data pipelines.

Reads the exact on-disk formats of the reference datasets and serves
channels-last batches:

  - Burgers: h5 file ``<root>/burgers_{train,test}.h5`` with group
    'train'/'test' and datasets 'pde_11-128' (N, 11, 128) and 'pde_11-128_f'
    (N, 10, 128) (/root/reference/dataset/apps/burgers_h5py.py:56-76,
    generate_burgers.py:536-556). Stacked to (N, 16, 128, 2) exactly like
    Burgers1D.get (dataset/data_1d.py:62-69): u padded 11->16 rows, f 10->16,
    rescaled by /10.

A synthetic generator is provided so the full pipeline runs without the
reference datasets (same distribution as make_data_varying_f + solver).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator, Optional

import numpy as np


def stack_burgers_uf(u: np.ndarray, f: np.ndarray, rescaler: float = 10.0,
                     partially_observed_fill_zero: Optional[str] = None
                     ) -> np.ndarray:
    """(N, 11, 128) u and (N, 10, 128) f -> (N, 16, 128, 2) stacked/padded,
    rescaled (reference dataset/data_1d.py:54-77)."""
    n, nt_u, nx = u.shape
    out = np.zeros((n, 16, nx, 2), np.float32)
    if partially_observed_fill_zero == "front_rear_quarter":
        u = u.copy()
        u[:, :, nx // 4 : (3 * nx) // 4] = 0.0
    elif partially_observed_fill_zero is not None:
        raise ValueError(partially_observed_fill_zero)
    out[:, :nt_u, :, 0] = u
    out[:, : f.shape[1], :, 1] = f
    return out / rescaler


def load_burgers_h5(path: str | Path, split: str = "train",
                    nt: int = 11, nx: int = 128):
    """Load the reference h5 layout; returns (u, f) float32 arrays."""
    import h5py

    key = f"pde_{nt}-{nx}"
    with h5py.File(str(path), "r") as h5:
        grp = h5[split]
        u = np.asarray(grp[key], np.float32)
        f = np.asarray(grp[key + "_f"], np.float32)
    return u, f


def synthetic_burgers(n: int, seed: int = 0, partial_control=None,
                      dt: float = 1e-4):
    """Generate (u, f) pairs with the JAX solver — same distribution as the
    reference data generator (generate_burgers.py:338-418 + solver)."""
    from diffphycon_tpu.physics.burgers import burgers_solve, make_burgers_data

    u0, f = make_burgers_data(n, s=128, t=10, seed=seed,
                              partial_control=partial_control)
    u = np.asarray(burgers_solve(u0, f, visc=0.01, T=1.0, dt=dt, num_t=10))
    return u.astype(np.float32), f


@dataclasses.dataclass
class ArrayDataset:
    """In-memory dataset with an infinite shuffled batch iterator
    (replaces torch DataLoader+cycle, diffusion_1d_burgers.py:894-899)."""

    data: np.ndarray  # (N, ...)

    def __len__(self):
        return self.data.shape[0]

    def batches(self, batch_size: int, seed: int = 0,
                drop_last: bool = True) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(seed)
        n = len(self)
        assert batch_size <= n, "batch larger than dataset"
        while True:
            perm = rng.permutation(n)
            end = n - (n % batch_size) if drop_last else n
            for i in range(0, end, batch_size):
                yield self.data[perm[i : i + batch_size]]
