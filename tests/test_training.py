"""Training harness: mesh data-parallel train step, EMA, LR schedules,
checkpoint save/load — on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.diffusion import GaussianDiffusion, burgers_cond_spec, burgers_derive_cond
from diffphycon_tpu.nets import UNet2D
from diffphycon_tpu.parallel import make_mesh
from diffphycon_tpu.training import (
    EMAConfig,
    Trainer,
    TrainerConfig,
    TrainState,
    make_optimizer,
    multistep_lr,
    torch_cosine_annealing,
)
from diffphycon_tpu.training.data import ArrayDataset, stack_burgers_uf


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_torch_cosine_annealing_matches_torch(reference_path):
    import torch

    lr0 = 1e-4
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=100, eta_min=0)
    ours = torch_cosine_annealing(lr0, t_max=100)
    torch_lrs, our_lrs = [], []
    for t in range(250):
        torch_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(float(ours(t)))
        opt.step()
        sch.step()
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-4, atol=1e-9)


def test_multistep_lr():
    s = multistep_lr(1.0, [10, 20], 0.1)
    assert float(s(5)) == pytest.approx(1.0)
    assert float(s(15)) == pytest.approx(0.1)
    assert float(s(25)) == pytest.approx(0.01)


def test_ema_warmup_then_lerp():
    """Warmup decay follows ema_pytorch's closed form in RAW optimizer steps:
    epoch = max(step - update_after_step - 1, 0),
    decay = clip(1 - (1 + epoch/inv_gamma)^-power, 0, beta)."""
    tx = make_optimizer(lambda _: 0.1)
    params = {"w": jnp.ones((4,))}
    cfg = EMAConfig(beta=0.9, update_every=1, update_after_step=0)
    state = TrainState.create(params, tx, cfg)
    grads = {"w": jnp.ones((4,))}
    s1 = state.apply_gradients(grads)
    # step 1: epoch 0 -> decay 0 -> EMA copies the online weights
    np.testing.assert_allclose(np.asarray(s1.ema_params["w"]),
                               np.asarray(s1.params["w"]))
    s2 = s1.apply_gradients(grads)
    # step 2: epoch 1 -> decay = 1 - 2^-0.75 ~ 0.4054
    d = 1.0 - 2.0 ** -0.75
    expect = d * np.asarray(s1.ema_params["w"]) + (1 - d) * np.asarray(
        s2.params["w"])
    np.testing.assert_allclose(np.asarray(s2.ema_params["w"]), expect,
                               rtol=1e-6)
    # step 1000 at raw-step counting: decay ~0.994 (vs ~0.966 if the epoch
    # were wrongly counted in units of update_every)
    e999 = 1.0 - (1.0 + 999.0) ** -0.75
    assert e999 > 0.99


def _tiny_setup(tmp_path, n=32, batch=8):
    rng = np.random.default_rng(0)
    u = rng.normal(size=(n, 11, 128)).astype(np.float32)
    f = rng.normal(size=(n, 10, 128)).astype(np.float32)
    data = stack_burgers_uf(u, f)
    net = UNet2D(dim=8, out_dim=2, dim_mults=(1, 2), channels=2,
                 resnet_block_groups=1)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 128, 2)), jnp.zeros((1,)))
    gd = GaussianDiffusion(
        model_apply=net.apply, sample_shape=(16, 128, 2), timesteps=20,
        cond=burgers_cond_spec(is_condition_u0=True),
    )
    cfg = TrainerConfig(
        train_batch_size=batch, train_num_steps=6, save_and_sample_every=100,
        results_folder=str(tmp_path / "run"), log_every=2,
    )
    ds = ArrayDataset(data)
    trainer = Trainer(gd, params, ds.batches(batch), burgers_derive_cond, cfg)
    return trainer


def test_train_loop_runs_on_mesh(tmp_path):
    trainer = _tiny_setup(tmp_path)
    state = trainer.train(progress=False)
    assert int(jax.device_get(state.step)) == 6
    log = (tmp_path / "run" / "train_log.jsonl").read_text().strip().splitlines()
    assert len(log) >= 3
    import json

    losses = [json.loads(l)["loss"] for l in log]
    assert all(np.isfinite(losses))


def test_gradient_accumulation(tmp_path):
    trainer = _tiny_setup(tmp_path)
    trainer.cfg.gradient_accumulate_every = 1  # base config already built
    # build a second trainer with accumulation
    rng = np.random.default_rng(0)
    u = rng.normal(size=(32, 11, 128)).astype(np.float32)
    f = rng.normal(size=(32, 10, 128)).astype(np.float32)
    from diffphycon_tpu.training.data import stack_burgers_uf, ArrayDataset
    data = stack_burgers_uf(u, f)
    net = UNet2D(dim=8, out_dim=2, dim_mults=(1, 2), channels=2,
                 resnet_block_groups=1)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 128, 2)), jnp.zeros((1,)))
    gd = GaussianDiffusion(model_apply=net.apply, sample_shape=(16, 128, 2),
                           timesteps=20)
    cfg = TrainerConfig(train_batch_size=8, train_num_steps=2,
                        gradient_accumulate_every=2,
                        results_folder=str(tmp_path / "run2"), log_every=1)
    tr = Trainer(gd, params, ArrayDataset(data).batches(8),
                 burgers_derive_cond, cfg)
    state = tr.train(progress=False)
    assert int(jax.device_get(state.step)) == 2


def test_checkpoint_roundtrip(tmp_path):
    trainer = _tiny_setup(tmp_path)
    trainer.train(progress=False)
    trainer.save(milestone=1)
    w_before = jax.device_get(trainer.state.params)

    trainer2 = _tiny_setup(tmp_path)
    trainer2.load(1)
    w_after = jax.device_get(trainer2.state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        w_before, w_after,
    )
    assert int(jax.device_get(trainer2.state.step)) == 6
    ema = Trainer.load_params(str(tmp_path / "run"), 1, use_ema=True)
    assert ema is not None


def test_keep_period_protects_lr_minima(tmp_path):
    """keep-20 pruning must preserve checkpoints at ckpt_keep_period
    multiples (LR-cycle minima): the r5 burgers-w run lost its 10k-minimum
    checkpoint to plain max_to_keep=20 pruning."""
    trainer = _tiny_setup(tmp_path)
    trainer.cfg.ckpt_keep_period = 5
    for s in range(1, 26):
        trainer.state = trainer.state.replace(
            step=jnp.asarray(s, jnp.int32))
        trainer.save()
    mgr = trainer._ckpt_mgr()
    steps = set(mgr.all_steps())
    mgr.close()
    assert 5 in steps, "LR-minimum checkpoint was pruned"
    assert 25 in steps
    assert 4 not in steps  # plain pruning still applies off-period


def test_kill_and_resume_continues(tmp_path):
    """A restarted trainer with resume() picks up step/params/EMA/opt from
    the newest milestone and keeps training to completion (VERDICT #7)."""
    trainer = _tiny_setup(tmp_path)
    trainer.cfg.save_and_sample_every = 3
    trainer.cfg.train_num_steps = 3
    trainer.train(progress=False)  # saves milestone 1 at step 3 then "dies"
    p_at_kill = jax.device_get(trainer.state.params)

    trainer2 = _tiny_setup(tmp_path)
    trainer2.cfg.train_num_steps = 6
    assert trainer2.resume() is True
    assert int(jax.device_get(trainer2.state.step)) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_at_kill, jax.device_get(trainer2.state.params))
    state = trainer2.train(progress=False)
    assert int(jax.device_get(state.step)) == 6
    # loss stays finite across the restart boundary
    import json as _json

    log = (tmp_path / "run" / "train_log.jsonl").read_text().strip().splitlines()
    assert all(np.isfinite(_json.loads(l)["loss"]) for l in log)


def test_resume_without_checkpoint_is_fresh(tmp_path):
    trainer = _tiny_setup(tmp_path)
    assert trainer.resume() is False
    assert int(jax.device_get(trainer.state.step)) == 0


def test_surrogate_resume(tmp_path):
    from diffphycon_tpu.training.surrogates import (
        SurrogateTrainConfig,
        train_surrogate,
    )
    import flax.linen as nn

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(x)

    net = Lin()
    x = np.random.default_rng(0).normal(size=(64, 4)).astype(np.float32)
    y = (x.sum(-1, keepdims=True)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), x[:1])
    cfg = SurrogateTrainConfig(
        num_steps=4, batch_size=8, save_every=4, log_every=2,
        results_folder=str(tmp_path / "sur"), lr_milestones=(100,))
    state, _ = train_surrogate(net.apply, params, (x,), y, cfg)
    # resume run continues to 8
    cfg2 = SurrogateTrainConfig(
        num_steps=8, batch_size=8, save_every=4, log_every=2,
        results_folder=str(tmp_path / "sur"), lr_milestones=(100,))
    state2, last = train_surrogate(net.apply, params, (x,), y, cfg2,
                                   resume=True)
    assert int(jax.device_get(state2.step)) == 8
    assert last is None or np.isfinite(last)


def test_sigterm_saves_checkpoint_and_exits_cleanly(tmp_path):
    """Campaign controllers clock-cut training stages with `timeout`
    (SIGTERM). The trainer must finish the in-flight step, save a
    checkpoint at the current raw step, and return — instead of dying
    mid-device-call (which loses progress and wedges the axon tunnel,
    PERF.md r3)."""
    import signal
    import threading

    trainer = _tiny_setup(tmp_path)
    trainer.cfg.train_num_steps = 10_000  # far more than fits before SIGTERM
    timer = threading.Timer(1.5, lambda: signal.raise_signal(signal.SIGTERM))
    timer.start()
    state = trainer.train(progress=False)
    timer.cancel()
    step = int(jax.device_get(state.step))
    assert 0 < step < 10_000
    ckpts = sorted(
        int(d.name) for d in (tmp_path / "run" / "ckpt").iterdir()
        if d.name.isdigit()
    )
    assert step in ckpts
    # the handler must be restored so later SIGTERMs terminate normally
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
