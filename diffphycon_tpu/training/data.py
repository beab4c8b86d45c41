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
                      dt: float = 1e-4, chunk: int = 4096,
                      cache_dir=None):
    """Generate (u, f) pairs with the JAX solver — same distribution as the
    reference data generator (generate_burgers.py:338-418 + solver).

    Large n runs in device-sized chunks; cache_dir (e.g. 'data/synthetic')
    memoizes the result on disk so repeated training runs skip the
    10^4-step solves."""
    import os

    from diffphycon_tpu.physics.burgers import burgers_solve, make_burgers_data

    tag = f"burgers_n{n}_s{seed}_pc{partial_control or 'full'}_dt{dt}"
    if cache_dir:
        path = os.path.join(cache_dir, tag + ".npz")
        if os.path.isfile(path):
            z = np.load(path)
            return z["u"], z["f"]
    u0, f = make_burgers_data(n, s=128, t=10, seed=seed,
                              partial_control=partial_control)
    parts = []
    for i in range(0, n, chunk):
        parts.append(np.asarray(burgers_solve(
            u0[i : i + chunk], f[i : i + chunk], visc=0.01, T=1.0, dt=dt,
            num_t=10)))
    u = np.concatenate(parts, axis=0).astype(np.float32)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(path, u=u, f=f)
    return u, f


def burgers_graph_edges(n_nodes: int = 128):
    """1D chain graph over spatial nodes: bidirectional neighbor edges plus
    the snapped edge attributes (reference Burgers.get_edge_index +
    update_edge_attr_1d, dataset/apps/burgers_h5py.py:134-152, 193-201).

    Returns (edge_index (2, E) int64, edge_attr (E, 1) float32 with values
    +-1/129 — the reference snaps the position differences to exactly
    1/(n_nodes+1))."""
    i = np.arange(n_nodes - 1)
    fwd = np.stack([i, i + 1])
    bwd = np.stack([i + 1, i])
    # the reference interleaves [i,i+1],[i+1,i] per i
    edge_index = np.empty((2, 2 * (n_nodes - 1)), np.int64)
    edge_index[:, 0::2] = fwd
    edge_index[:, 1::2] = bwd
    step = 1.0 / (n_nodes + 1)
    edge_attr = np.where(edge_index[0] < edge_index[1], -step, step)
    return edge_index, edge_attr[:, None].astype(np.float32)


@dataclasses.dataclass
class BurgersGraphDataset:
    """Graph view over Burgers trajectories for operator-style training —
    the counterpart of the reference's torch-geometric ``Burgers`` dataset
    (dataset/apps/burgers_h5py.py:18-281 ``get()`` -> Data(x, y, f,
    edge_index, x_pos, x_bdd, edge_attr)), returning plain numpy arrays
    instead of torch_geometric.data.Data.

    One item per (sim, effective time stamp): x is the ``input_steps``-long
    history window per node, y the ``output_steps``-long future, f the
    static force."""

    u: np.ndarray            # (N, T, nx)
    f: np.ndarray            # (N, nx) or (N, T-1, nx) static force per sim
    input_steps: int = 1
    output_steps: int = 10
    time_interval: int = 1

    def __post_init__(self):
        t = self.u.shape[1]
        ci = max(self.input_steps * self.time_interval, 1)
        co = max(self.output_steps * self.time_interval, 1)
        self._cushion_in, self._cushion_out = ci, co
        self.time_stamps_effective = (t - ci - co
                                      + self.time_interval) // self.time_interval
        nx = self.u.shape[-1]
        self.edge_index, self.edge_attr = burgers_graph_edges(nx)
        self.x_pos = np.linspace(1, nx, nx, dtype=np.float32)[:, None] / (
            nx + 1)
        self.x_bdd = np.ones((nx, 1), np.float32)
        self.x_bdd[0] = self.x_bdd[-1] = 0.0

    def __len__(self):
        return self.time_stamps_effective * self.u.shape[0]

    def get(self, idx: int) -> dict:
        sim_id, time_id = divmod(idx, self.time_stamps_effective)
        ti, ci = self.time_interval, self._cushion_in
        traj = self.u[sim_id]
        xs = np.stack([traj[time_id * ti + ci + j]
                       for j in range(-self.input_steps * ti, 0, ti)], -1)
        ys = np.stack([traj[time_id * ti + ci + j]
                       for j in range(0, self.output_steps * ti, ti)], -1)
        force = self.f[sim_id]
        if force.ndim > 1:  # per-step force: take the window start's frame
            force = force[min(time_id, force.shape[0] - 1)]
        return {
            "x": xs[..., None].astype(np.float32),   # (nx, input_steps, 1)
            "y": ys[..., None].astype(np.float32),   # (nx, output_steps, 1)
            "f": force[:, None].astype(np.float32),  # (nx, 1)
            "x_pos": self.x_pos,
            "x_bdd": self.x_bdd,
            "edge_index": self.edge_index,
            "edge_attr": self.edge_attr,
        }


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


# ---------------------------------------------------------------------------
# Smoke dataset (reference dataset/data_2d.py:142-209)
# ---------------------------------------------------------------------------


def load_smoke_sim(sim_dir, size=64):
    """Load one sim directory with Density/Velocity/Control/Smoke.npy
    (files are (H, W, C, T) as written by the reference generator,
    a_gen_dataset_128.py:962-994). Returns (T, H, W, 6) unscaled float32."""
    import os

    d = np.load(os.path.join(sim_dir, "Density.npy"))      # (H, W, 1, T)
    v = np.load(os.path.join(sim_dir, "Velocity.npy"))     # (H, W, 2, T)
    c = np.load(os.path.join(sim_dir, "Control.npy"))      # (H, W, 2, T)
    s = np.load(os.path.join(sim_dir, "Smoke.npy"))        # (T, 8)
    t = d.shape[-1]
    h = d.shape[0]
    rate = s[:, 1] / s.sum(-1)                             # target fraction
    sp = np.broadcast_to(rate[:, None, None], (t, h, h))
    state = np.concatenate(
        [
            np.transpose(d, (3, 0, 1, 2)),
            np.transpose(v, (3, 0, 1, 2)),
            np.transpose(c, (3, 0, 1, 2)),
            sp[..., None],
        ],
        axis=-1,
    ).astype(np.float32)
    return state  # (T, H, W, 6)


def load_smoke_dataset(root, split="train", n=None, frames=32, size=64,
                       rescale=True):
    """Load the reference on-disk smoke layout: <root>/<split>/sim_%06d/
    (train) or <root>/test/control/sim_%06d/ (test)
    (reference Smoke dataset, data_2d.py:142-209). Returns (N, T, H, W, 6).

    Uses the native threaded loader (native/io/npy_loader.cc) when built —
    the replacement for the reference's 16-32 DataLoader worker processes."""
    import os

    from diffphycon_tpu.utils.native_io import (
        load_npy_batch,
        native_available,
        npy_info,
    )

    base = os.path.join(root, split) if split == "train" else os.path.join(
        root, "test", "control")
    sims = sorted(
        d for d in os.listdir(base) if d.startswith("sim_")
        # a generator cut by a wall-clock timeout can leave its last sim dir
        # missing some of the four arrays; skip incomplete dirs
        and all(os.path.exists(os.path.join(base, d, f + ".npy"))
                for f in ("Density", "Velocity", "Control", "Smoke"))
    )
    if n is not None:
        sims = sims[:n]

    if native_available() and sims:
        dirs = [os.path.join(base, s) for s in sims]
        shp_d, _ = npy_info(os.path.join(dirs[0], "Density.npy"))
        shp_v, _ = npy_info(os.path.join(dirs[0], "Velocity.npy"))
        shp_s, _ = npy_info(os.path.join(dirs[0], "Smoke.npy"))
        d = load_npy_batch([os.path.join(p, "Density.npy") for p in dirs],
                           shp_d)
        v = load_npy_batch([os.path.join(p, "Velocity.npy") for p in dirs],
                           shp_v)
        c = load_npy_batch([os.path.join(p, "Control.npy") for p in dirs],
                           shp_v)
        s = load_npy_batch([os.path.join(p, "Smoke.npy") for p in dirs],
                           shp_s)
        t, h = shp_d[-1], shp_d[0]
        rate = s[:, :, 1] / s.sum(-1)
        sp = np.broadcast_to(rate[:, :, None, None], (len(dirs), t, h, h))
        states = np.concatenate(
            [
                np.transpose(d, (0, 4, 1, 2, 3)),
                np.transpose(v, (0, 4, 1, 2, 3)),
                np.transpose(c, (0, 4, 1, 2, 3)),
                sp[..., None],
            ],
            axis=-1,
        ).astype(np.float32)
    else:
        states = np.stack([
            load_smoke_sim(os.path.join(base, sname), size=size)
            for sname in sims
        ])

    if split == "train":
        states = states[:, :frames]
        if rescale:
            from diffphycon_tpu.benchmarks.smoke import RESCALER

            states = states / RESCALER
    return states


# ---------------------------------------------------------------------------
# Jellyfish dataset (reference dataset/data_2d.py:11-140)
# ---------------------------------------------------------------------------


def _minmax_norm(a, lo, hi):
    return (np.clip((a - lo) / (hi - lo), 0, 1) - 0.5) * 2


def load_jellyfish_dataset(root, split="train", n=None, frames=20,
                           only_vis_pressure=False, offset=0):
    """Load the reference on-disk jellyfish layout:
    <root>/{train_data,test_data}/{states,bdry_merged_mask_offsets,
    bdry_head_thetas}/sim_%06d.npz + normalization_max_min.pkl.

    Returns dict with:
      states:  (N, 40, 64, 64, n_state) min-max normalized to [-1, 1]
      bd:      (N, 40, 64, 64, 3) zero-padded 62->64 (reference
               diffusion_2d_jellyfish.py:1264-1265)
      thetas:  (N, 40)
      norm:    the normalization dict
    """
    import os
    import pickle

    dirname = "train_data" if split == "train" else "test_data"
    base = os.path.join(root, dirname)
    with open(os.path.join(base, "normalization_max_min.pkl"), "rb") as fh:
        norm = pickle.load(fh)

    sims = sorted(
        f for f in os.listdir(os.path.join(base, "states"))
        if f.startswith("sim_")
    )
    sims = sims[offset:]
    if n is not None:
        sims = sims[:n]
    states, bds, thetas, p_nans = [], [], [], []
    for f in sims:
        st = np.load(os.path.join(base, "states", f))["a"]  # (40, 3, 64, 64)
        p = _minmax_norm(st[:, 2], norm["p_min"], norm["p_max"])[..., None]
        if only_vis_pressure:
            s = p
        else:
            vx = _minmax_norm(st[:, 0], norm["vx_min"], norm["vx_max"])[..., None]
            vy = _minmax_norm(st[:, 1], norm["vy_min"], norm["vy_max"])[..., None]
            s = np.concatenate([vx, vy, p], -1)
        s = np.nan_to_num(s).astype(np.float32)
        p_nan = np.isnan(st[:, 2])  # raw-NaN pressure cells (solid); the
        # force surrogate needs these as raw 0, not the denormalized midpoint

        bd62 = np.load(
            os.path.join(base, "bdry_merged_mask_offsets", f))["a"]
        bd = np.zeros((bd62.shape[0], 64, 64, 3), np.float32)
        bd[:, 1:-1, 1:-1, :] = np.nan_to_num(bd62)

        th = np.load(os.path.join(base, "bdry_head_thetas", f))["thetas"]
        states.append(s)
        bds.append(bd)
        thetas.append(th.astype(np.float32))
        p_nans.append(p_nan)
    return {
        "states": np.stack(states),
        "bd": np.stack(bds),
        "thetas": np.stack(thetas),
        "p_nan": np.stack(p_nans),
        "norm": norm,
    }


def synthetic_jellyfish(n, out_dir, frames_total=40, seed=0):
    """Write a synthetic jellyfish dataset in the reference layout: two
    ellipse wings hinged at the head flapping sinusoidally; states are smooth
    random fields correlated with the flap phase. A structural stand-in for
    the externally generated CFD data (the reference downloads its dataset;
    no generator is shipped)."""
    import os
    import pickle

    rng = np.random.default_rng(seed)
    base = out_dir
    for sub in ["states", "bdry_merged_mask_offsets", "bdry_head_thetas"]:
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    with open(os.path.join(base, "normalization_max_min.pkl"), "wb") as fh:
        pickle.dump({"vx_max": 1.0, "vx_min": -1.0, "vy_max": 1.0,
                     "vy_min": -1.0, "p_max": 1.0, "p_min": -1.0}, fh)

    yy, xx = np.mgrid[0:62, 0:62]
    head = np.array([20.0, 31.0])
    for i in range(n):
        amp = rng.uniform(0.2, 0.6)
        phase = rng.uniform(0, 2 * np.pi)
        thetas = (0.8 + amp * np.sin(
            np.linspace(0, 2 * np.pi, frames_total) + phase)).astype(np.float32)
        bd = np.zeros((frames_total, 62, 62, 3), np.float32)
        states = np.zeros((frames_total, 3, 64, 64), np.float32)
        for t in range(frames_total):
            th = thetas[t]
            for sgn in (+1, -1):
                # wing center offset from head along angle sgn*theta
                cx = head[1] + 12 * np.cos(sgn * th)
                cy = head[0] + 12 * np.sin(sgn * th)
                d = (((xx - cx) / 12.0) ** 2 + ((yy - cy) / 3.0) ** 2)
                ring = np.abs(d - 1.0) < 0.25
                bd[t, :, :, 0][ring] = 1.0
                bd[t, :, :, 1][ring] = (xx[ring] - cx) / 62.0
                bd[t, :, :, 2][ring] = (yy[ring] - cy) / 62.0
            base_field = rng.normal(size=(3, 8, 8)).astype(np.float32)
            up = np.kron(base_field, np.ones((8, 8), np.float32))
            states[t] = np.tanh(up * 0.5) * (0.5 + 0.5 * np.sin(th))
        np.savez_compressed(
            os.path.join(base, "states", f"sim_{i:06d}.npz"), a=states)
        np.savez_compressed(
            os.path.join(base, "bdry_merged_mask_offsets", f"sim_{i:06d}.npz"),
            a=bd)
        np.savez_compressed(
            os.path.join(base, "bdry_head_thetas", f"sim_{i:06d}.npz"),
            thetas=thetas)
