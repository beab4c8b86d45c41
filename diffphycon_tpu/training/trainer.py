"""Training harness: jitted, mesh-sharded train loop with EMA and orbax
checkpoints.

Replaces the reference Trainer classes
(/root/reference/diffusion/diffusion_1d_burgers.py:844-1034 and the smoke /
jellyfish variants): Accelerate/NCCL data parallelism becomes a
``jax.sharding.Mesh`` with the batch sharded over the ``data`` axis; the whole
optimizer step (loss, backward, clip, Adam, EMA) is one jitted function whose
gradient all-reduce XLA lowers to ``psum`` over ICI.
"""

from __future__ import annotations

import dataclasses
import json
import signal
import time
from pathlib import Path
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from diffphycon_tpu.diffusion.core import GaussianDiffusion
from diffphycon_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from diffphycon_tpu.training.train_state import (
    EMAConfig,
    TrainState,
    make_optimizer,
    torch_cosine_annealing,
)


@dataclasses.dataclass
class TrainerConfig:
    train_batch_size: int = 16
    train_lr: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    max_grad_norm: float = 1.0
    train_num_steps: int = 100_000
    gradient_accumulate_every: int = 1
    save_and_sample_every: int = 10_000
    results_folder: str = "./results"
    lr_schedule: str = "cosine10000"  # 'cosine10000' | 'multistep' | 'constant'
    lr_milestones: tuple = (50_000, 150_000, 300_000)
    lr_gamma: float = 0.1
    ema: EMAConfig = dataclasses.field(default_factory=EMAConfig)
    seed: int = 0
    log_every: int = 100
    # keep-last-20 pruning additionally preserves every checkpoint whose step
    # is a multiple of this period, so LR-cycle minima (cosine10000 restarts
    # at 10k multiples) survive long runs; None disables.
    ckpt_keep_period: Optional[int] = 10_000


class Trainer:
    """Train a GaussianDiffusion model.

    Args:
      diffusion: the GaussianDiffusion (holds model_apply + CondSpec).
      params: initial model params.
      batch_iter: iterator of numpy batches (B, *spatial, C).
      derive_cond: fn(batch) -> cond_vals dict for p_losses.
      config: TrainerConfig.
      mesh: optional jax mesh; defaults to all devices on a 'data' axis.
    """

    def __init__(
        self,
        diffusion: GaussianDiffusion,
        params,
        batch_iter: Iterator[np.ndarray],
        derive_cond: Callable,
        config: TrainerConfig = TrainerConfig(),
        mesh=None,
    ):
        self.gd = diffusion
        self.cfg = config
        self.batch_iter = batch_iter
        self.derive_cond = derive_cond
        self.mesh = mesh if mesh is not None else make_mesh()

        if config.lr_schedule == "cosine10000":
            sched = torch_cosine_annealing(config.train_lr, 10_000)
        elif config.lr_schedule == "multistep":
            from diffphycon_tpu.training.train_state import multistep_lr

            sched = multistep_lr(config.train_lr, config.lr_milestones,
                                 config.lr_gamma)
        elif config.lr_schedule == "constant":
            sched = lambda _: config.train_lr
        else:
            raise ValueError(config.lr_schedule)

        tx = make_optimizer(sched, config.adam_b1, config.adam_b2,
                            config.max_grad_norm)
        state = TrainState.create(params, tx, config.ema)
        self.state = replicate(self.mesh, state)

        self.results_folder = Path(config.results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)

        accum = config.gradient_accumulate_every
        gd = self.gd
        derive = self.derive_cond

        batch_sharding = NamedSharding(self.mesh, P("data"))
        state_sharding = NamedSharding(self.mesh, P())

        def loss_fn(params, key, batch):
            return gd.loss(params, key, batch, derive(batch))

        def train_step(state: TrainState, key, batch):
            if accum == 1:
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, key, batch
                )
            else:
                # micro-batches along a leading accum axis
                def micro(c, kb):
                    k, b = kb
                    l, g = jax.value_and_grad(loss_fn)(state.params, k, b)
                    return c, (l, g)

                keys = jax.random.split(key, accum)
                micro_batches = jax.tree.map(
                    lambda a: a.reshape(accum, a.shape[0] // accum, *a.shape[1:]),
                    batch,
                )
                _, (losses, grads) = jax.lax.scan(
                    micro, 0, (keys, micro_batches)
                )
                loss = losses.mean()
                grads = jax.tree.map(lambda g: g.mean(0), grads)
            new_state = state.apply_gradients(grads)
            return new_state, loss

        self._train_step = jax.jit(
            train_step,
            in_shardings=(state_sharding, None, batch_sharding),
            out_shardings=(state_sharding, None),
            donate_argnums=(0,),
        )
        self._rng = jax.random.PRNGKey(config.seed)

    # -- checkpointing ------------------------------------------------------

    def _ckpt_mgr(self):
        import orbax.checkpoint as ocp

        return ocp.CheckpointManager(
            (self.results_folder / "ckpt").resolve(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=20,
                # protect LR-cycle-minimum checkpoints from pruning (the r5
                # burgers-w 10k minimum was lost to plain keep-20)
                keep_period=self.cfg.ckpt_keep_period,
            ),
        )

    def save(self, milestone: Optional[int] = None):
        """Save {step, params, ema, opt} (reference Trainer.save, :935-949).

        The checkpoint id is ALWAYS the raw optimizer step: orbax's
        CheckpointManager tracks ids monotonically and silently skips saves
        with a smaller id, so mixing small milestone indices with raw-step
        final saves loses checkpoints (r2 campaign bug). ``milestone`` is
        kept for call-site compatibility but ignored for the id."""
        import orbax.checkpoint as ocp

        del milestone
        mgr = self._ckpt_mgr()
        step = int(jax.device_get(self.state.step))
        payload = {
            "step": step,
            "params": jax.device_get(self.state.params),
            "ema_params": jax.device_get(self.state.ema_params),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()
        mgr.close()

    def load(self, milestone: int):
        import orbax.checkpoint as ocp

        mgr = self._ckpt_mgr()
        steps = sorted(mgr.all_steps())
        if milestone not in steps and 1 <= milestone <= len(steps):
            milestone = steps[milestone - 1]
        target = {
            "step": int(jax.device_get(self.state.step)),
            "params": jax.device_get(self.state.params),
            "ema_params": jax.device_get(self.state.ema_params),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        payload = mgr.restore(milestone, args=ocp.args.StandardRestore(target))
        mgr.close()
        self.state = replicate(
            self.mesh,
            self.state.replace(
                step=jnp.asarray(payload["step"], jnp.int32),
                params=payload["params"],
                ema_params=payload["ema_params"],
                opt_state=payload["opt_state"],
            ),
        )

    def resume(self, milestone: Optional[int] = None) -> bool:
        """Restore the latest (or given) milestone: step, params, EMA and
        optimizer state, so a killed run continues where it left off
        (reference --resume_training,
        /root/reference/train/train_surrogate_models_jellyfish.py:64-68,129-148;
        Trainer.load milestone ctor args, diffusion_1d_burgers.py:950-972).

        Returns True when a checkpoint was restored, False when none exists
        (fresh run). The RNG stream is re-seeded deterministically from
        (seed, restored step) so resumed batches don't replay step 0's keys.
        """
        if milestone is None:
            milestone = self.latest_milestone(str(self.results_folder))
        if milestone is None:
            return False
        self.load(milestone)
        step = int(jax.device_get(self.state.step))
        self._rng = jax.random.fold_in(
            jax.random.PRNGKey(self.cfg.seed), step)
        return True

    @staticmethod
    def latest_milestone(results_folder: str) -> Optional[int]:
        """Largest saved milestone id in <results_folder>/ckpt, or None."""
        import orbax.checkpoint as ocp

        path = (Path(results_folder) / "ckpt").resolve()
        if not path.is_dir():
            return None
        mgr = ocp.CheckpointManager(path)
        latest = mgr.latest_step()
        mgr.close()
        return latest

    @staticmethod
    def load_params(results_folder: str, milestone: int, use_ema: bool = True):
        """Restore just the (EMA) params for inference.

        ``milestone`` may be a raw step id or (legacy) a small milestone
        index; an index that doesn't match a saved step resolves to the
        index-th saved checkpoint in step order."""
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager((Path(results_folder) / "ckpt").resolve())
        steps = sorted(mgr.all_steps())
        step = milestone
        if step not in steps and 1 <= milestone <= len(steps):
            step = steps[milestone - 1]
        payload = mgr.restore(step)
        mgr.close()
        return payload["ema_params" if use_ema else "params"]

    # -- loop ---------------------------------------------------------------

    def train(self, progress: bool = True):
        cfg = self.cfg
        log_path = self.results_folder / "train_log.jsonl"
        t0 = time.time()
        losses = []
        step = int(jax.device_get(self.state.step))
        # Graceful SIGTERM: campaign controllers bound stages with
        # `timeout`, whose SIGTERM lands mid train-step. Killing a process
        # while it executes on the device wedges the axon tunnel for
        # ~10 min AND loses everything since the last periodic save
        # (PERF.md r3). Instead: finish the in-flight step, save a
        # checkpoint at the current raw step, and exit cleanly.
        stop = {"requested": False}
        prev_handler = None
        handler_installed = False

        def _on_sigterm(signum, frame):
            stop["requested"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
            handler_installed = True
        except ValueError:
            pass  # not in the main thread; run unguarded
        with open(log_path, "a") as logf:
            while step < cfg.train_num_steps and not stop["requested"]:
                batch = next(self.batch_iter)
                batch = shard_batch(self.mesh,
                                    jax.tree.map(jnp.asarray, batch))
                self._rng, key = jax.random.split(self._rng)
                self.state, loss = self._train_step(self.state, key, batch)
                step += 1
                losses.append(loss)
                if step % cfg.log_every == 0 or step == cfg.train_num_steps:
                    lval = float(np.mean(jax.device_get(jnp.stack(losses))))
                    losses.clear()
                    rec = {
                        "step": step,
                        "loss": lval,
                        "wall_s": round(time.time() - t0, 2),
                    }
                    logf.write(json.dumps(rec) + "\n")
                    logf.flush()
                    if progress:
                        print(f"step {step}: loss {lval:.5f}", flush=True)
                if step % cfg.save_and_sample_every == 0:
                    self.save(step // cfg.save_and_sample_every)
        if stop["requested"]:
            jax.block_until_ready(self.state.params)
            if step % cfg.save_and_sample_every != 0:
                self.save()
            print(f"SIGTERM: saved checkpoint at step {step}, exiting",
                  flush=True)
        if handler_installed:
            # restore unconditionally: a None previous handler means it was
            # installed outside Python, and leaving _on_sigterm active would
            # make later SIGTERMs only flip a dead flag (ADVICE r3)
            signal.signal(signal.SIGTERM,
                          prev_handler if prev_handler is not None
                          else signal.SIG_DFL)
        return self.state
