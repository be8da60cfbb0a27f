"""ScaledAdam + Eden parity vs the reference icefall implementation
(steps/optim.py), driven with identical gradient sequences."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


def _ref_optim():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_optim", os.path.join(REF, "steps", "optim.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaled_adam_step_parity():
    import torch
    import jax, jax.numpy as jnp
    from voicecraft_tpu.training.optim import scaled_adam

    ref_optim = _ref_optim()
    rng = np.random.default_rng(0)
    shapes = [(6, 4), (8,), ()]           # matrix, vector, scalar param
    init_vals = [np.asarray(rng.normal(size=s), np.float32) * 0.5
                 for s in shapes]
    n_steps = 25
    grad_seq = [[np.asarray(rng.normal(size=s), np.float32) * 0.1
                 for s in shapes] for _ in range(n_steps)]

    # ---- reference (scalar param carried as shape-(1,), the torch idiom) ----
    tparams = [torch.nn.Parameter(torch.from_numpy(v.copy().reshape(v.shape or (1,))))
               for v in init_vals]
    opt = ref_optim.ScaledAdam(
        tparams, lr=0.05, betas=(0.9, 0.95), clipping_scale=2.0,
        clipping_update_period=10,
        parameters_names=[[f"p{i}" for i in range(len(tparams))]],
        show_dominant_parameters=False)
    ref_traj = []
    for step in range(n_steps):
        for p, g in zip(tparams, grad_seq[step]):
            p.grad = torch.from_numpy(g.copy().reshape(p.shape))
        opt.step()
        opt.zero_grad()
        ref_traj.append([p.detach().numpy().copy().reshape(shapes[i])
                         for i, p in enumerate(tparams)])

    # ---- ours ----
    params = {f"p{i}": jnp.asarray(v) for i, v in enumerate(init_vals)}
    tx = scaled_adam(lr=0.05, betas=(0.9, 0.95), clipping_scale=2.0,
                     clipping_update_period=10)
    state = tx.init(params)
    step_fn = jax.jit(tx.update)
    my_traj = []
    for step in range(n_steps):
        grads = {f"p{i}": jnp.asarray(g)
                 for i, g in enumerate(grad_seq[step])}
        updates, state = step_fn(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        my_traj.append([np.asarray(params[f"p{i}"])
                        for i in range(len(shapes))])

    for step in range(n_steps):
        for i in range(len(shapes)):
            np.testing.assert_allclose(
                my_traj[step][i], ref_traj[step][i], rtol=2e-4, atol=2e-6,
                err_msg=f"step {step} param {i}")


def test_scaled_adam_clip_active_parity():
    """Force clip < 1 (huge grads after the first clipping period) and check
    trajectory parity — in the reference the clipped grad feeds ONLY the
    scale-grads recording (optim.py:497-510); exp_avg_sq and the main/scalar
    step re-read the raw p.grad (optim.py:612,646)."""
    import torch
    import jax, jax.numpy as jnp
    from voicecraft_tpu.training.optim import scaled_adam

    ref_optim = _ref_optim()
    rng = np.random.default_rng(7)
    shapes = [(6, 4), (8,), ()]
    init_vals = [np.asarray(rng.normal(size=s), np.float32) * 0.5
                 for s in shapes]
    n_steps, cup = 20, 8
    grad_seq = []
    for step in range(n_steps):
        scale = 0.1
        if step >= cup and step % 3 == 0:
            scale = 50.0          # >> 2x median of the recorded norms
        grad_seq.append([np.asarray(rng.normal(size=s), np.float32) * scale
                         for s in shapes])

    tparams = [torch.nn.Parameter(torch.from_numpy(v.copy().reshape(v.shape or (1,))))
               for v in init_vals]
    opt = ref_optim.ScaledAdam(
        tparams, lr=0.05, betas=(0.9, 0.95), clipping_scale=2.0,
        clipping_update_period=cup,
        parameters_names=[[f"p{i}" for i in range(len(tparams))]],
        show_dominant_parameters=False)
    # control: identical run with clipping disabled — used to prove clip < 1
    # actually fired (trajectories must diverge)
    tparams_nc = [torch.nn.Parameter(torch.from_numpy(v.copy().reshape(v.shape or (1,))))
                  for v in init_vals]
    opt_nc = ref_optim.ScaledAdam(
        tparams_nc, lr=0.05, betas=(0.9, 0.95), clipping_scale=None,
        parameters_names=[[f"p{i}" for i in range(len(tparams_nc))]],
        show_dominant_parameters=False)
    ref_traj = []
    for step in range(n_steps):
        for p, g in zip(tparams, grad_seq[step]):
            p.grad = torch.from_numpy(g.copy().reshape(p.shape))
        for p, g in zip(tparams_nc, grad_seq[step]):
            p.grad = torch.from_numpy(g.copy().reshape(p.shape))
        opt.step()
        opt.zero_grad()
        opt_nc.step()
        opt_nc.zero_grad()
        ref_traj.append([p.detach().numpy().copy().reshape(shapes[i])
                         for i, p in enumerate(tparams)])
    # the huge grads must actually have triggered clipping in the reference
    assert any(
        not np.allclose(p.detach().numpy(), q.detach().numpy(), rtol=1e-6)
        for p, q in zip(tparams, tparams_nc))

    params = {f"p{i}": jnp.asarray(v) for i, v in enumerate(init_vals)}
    tx = scaled_adam(lr=0.05, betas=(0.9, 0.95), clipping_scale=2.0,
                     clipping_update_period=cup)
    state = tx.init(params)
    step_fn = jax.jit(tx.update)
    for step in range(n_steps):
        grads = {f"p{i}": jnp.asarray(g)
                 for i, g in enumerate(grad_seq[step])}
        updates, state = step_fn(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        for i in range(len(shapes)):
            np.testing.assert_allclose(
                np.asarray(params[f"p{i}"]), ref_traj[step][i],
                rtol=3e-4, atol=3e-6, err_msg=f"step {step} param {i}")


def test_eden_schedule_parity():
    import torch
    from voicecraft_tpu.training.optim import eden_schedule

    ref_optim = _ref_optim()
    base_lr, lr_batches, lr_epochs, warmup = 0.05, 3000, 4, 500
    pseudo_epoch = 3000

    p = torch.nn.Parameter(torch.zeros(3))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = ref_optim.Eden(opt, lr_batches, lr_epochs, warmup_batches=warmup)

    mine = eden_schedule(base_lr, lr_batches, lr_epochs, warmup,
                         pseudo_epoch)
    for step in [0, 1, 10, 100, 499, 500, 501, 2999, 3000, 7500, 50000]:
        # the reference trainer drives Eden as:
        #   step_epoch(step // pseudo_epoch_size + 1); step_batch(step)
        sched.step_epoch(step // pseudo_epoch + 1)
        sched.step_batch(step)
        want = sched.get_last_lr()[0]
        got = float(mine(step))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=str(step))
