"""RAdam parity: optax.radam must reproduce the reference's
``utils/radam.py`` update math (rectification with threshold 5, degenerate
non-adaptive branch, bias corrections) — SURVEY.md §2.9 asks to verify."""

import numpy as np
import jax
import jax.numpy as jnp
import optax


def reference_radam_updates(grads, lr=5e-4, b1=0.0, b2=0.999, eps=1e-5,
                            steps=None):
    """Reference utils/radam.py:6-110 math in numpy, one scalar param."""
    m = 0.0
    v = 0.0
    x = 0.0
    xs = []
    n_sma_max = 2.0 / (1.0 - b2) - 1.0
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        beta2_t = b2 ** t
        n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
        if n_sma >= 5:
            step_size = np.sqrt(
                (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2)
            ) / (1 - b1 ** t)
            x = x - lr * step_size * m / (np.sqrt(v) + eps)
        else:
            step_size = 1.0 / (1 - b1 ** t)
            x = x - lr * step_size * m
        xs.append(x)
    return np.array(xs)


def optax_radam_trajectory(grads, lr=5e-4, b1=0.0, b2=0.999, eps=1e-5):
    opt = optax.radam(lr, b1=b1, b2=b2, eps=eps)
    params = jnp.zeros(())
    state = opt.init(params)
    xs = []
    for g in grads:
        updates, state = opt.update(jnp.float32(g), state, params)
        params = optax.apply_updates(params, updates)
        xs.append(float(params))
    return np.array(xs)


def test_radam_parity_flagship_hyperparams():
    rng = np.random.RandomState(0)
    grads = rng.randn(50).astype(np.float64)
    ref = reference_radam_updates(grads)
    got = optax_radam_trajectory(grads)
    # both the early degenerate steps and the rectified regime must match
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_radam_parity_nonzero_beta1():
    rng = np.random.RandomState(1)
    grads = rng.randn(30).astype(np.float64)
    ref = reference_radam_updates(grads, lr=1e-3, b1=0.9)
    got = optax_radam_trajectory(grads, lr=1e-3, b1=0.9)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_optax_radam_matches_actual_reference_radam():
    """Trajectory parity against the ACTUAL reference optimizer
    (/root/reference/utils/radam.py, the LiyuanLucasLiu RAdam the reference
    monkeypatches into torch.optim — discriminators/no_landmarks.py:5-6):
    10 steps with the flagship fine-tune hyperparameters (lr 5e-4,
    betas (0, 0.999), eps 1e-5), spanning the rectification warmup
    (N_sma <= 4 -> plain-SGD branch) and the rectified regime."""
    import sys
    pytest = __import__("pytest")
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    try:
        from utils.radam import RAdam as RefRAdam
    except ImportError:
        pytest.skip("reference checkout not available")
    # Provenance guard: `utils` is a generic top-level name — if any other
    # test left a different `utils` package in sys.modules, this import
    # would silently grab the wrong code.  Fail loudly instead (the round-4
    # flake of this test motivated making every hidden-state channel
    # explicit; see tests/conftest.py on the compilation cache).
    import utils.radam as _radam_mod
    assert _radam_mod.__file__.startswith("/root/reference/"), (
        f"shadowed reference import: utils.radam resolved to "
        f"{_radam_mod.__file__!r} (sys.modules['utils'] = "
        f"{sys.modules.get('utils')!r})")

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32)
             for _ in range(10)]

    with torch.enable_grad():  # immune to a polluted global grad mode
        p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = RefRAdam([p], lr=5e-4, betas=(0.0, 0.999), eps=1e-5)
        torch_traj = []
        for g in grads:
            opt.zero_grad()
            p.grad = torch.from_numpy(g)
            opt.step()
            torch_traj.append(p.detach().numpy().copy())

    tx = optax.radam(5e-4, b1=0.0, b2=0.999, eps=1e-5)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for step, (g, expected) in enumerate(zip(grads, torch_traj), start=1):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params), expected, rtol=1e-5, atol=1e-6,
            err_msg=(
                # full diagnostic context for any recurrence of the
                # round-4 flake: which step diverged and under what state
                f"step {step}: torch {torch.__version__} "
                f"default_dtype={torch.get_default_dtype()} "
                f"grad_enabled={torch.is_grad_enabled()} "
                f"jax_x64={jax.config.jax_enable_x64} "
                f"backend={jax.default_backend()} "
                f"radam_file={_radam_mod.__file__}"))
