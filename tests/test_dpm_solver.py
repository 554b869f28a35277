"""DPM-Solver++ tests: grid parity, analytic convergence, independent
re-implementation cross-check, and grad-mode semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.sampling import dpm_solver as dpm


def test_timestep_grid_matches_diffusers_formula():
    cfg = dpm.DPMSolverConfig()
    ts = dpm.timestep_grid(cfg, 20)
    ref = np.linspace(0, 999, 21).round()[::-1][:-1].astype(np.int64)
    np.testing.assert_array_equal(ts, ref)
    assert ts[0] == 999 and len(ts) == 20


def test_exact_epsilon_recovers_x0():
    """With the analytically-exact epsilon for a deterministic x0, the
    solver trajectory must land on alpha_0 * x0 (alpha at t=0 ~ 0.9996)."""
    cfg = dpm.DPMSolverConfig()
    sched = dpm.make_schedule(cfg)
    bundle = dpm.make_step_bundle(cfg, sched, 25)
    x0_true = jnp.full((2, 4, 4, 1), 0.7)

    alpha = jnp.asarray(sched.alpha_t)
    sigma = jnp.asarray(sched.sigma_t)

    def eps_fn(lat2, t):
        lat = lat2[: lat2.shape[0] // 2]
        eps = (lat - alpha[t] * x0_true) / sigma[t]
        return jnp.concatenate([eps, eps], axis=0)

    noise = jax.random.normal(jax.random.key(0), x0_true.shape)
    final = dpm.denoise(eps_fn, noise, bundle, guidance_scale=7.5)
    # exact-eps trajectory: x_t = alpha_t x0 + sigma_t z' with z' fixed by
    # the initial noise, so the endpoint is alpha_0 x0 + sigma_0 z'
    t0 = int(dpm.timestep_grid(cfg, 25)[0])
    z_eff = (np.asarray(noise) - sched.alpha_t[t0] * np.asarray(x0_true)) / sched.sigma_t[t0]
    expect = sched.alpha_t[0] * np.asarray(x0_true) + sched.sigma_t[0] * z_eff
    np.testing.assert_allclose(np.asarray(final), expect, atol=1e-4)


def _reference_dpm_2m(eps_fn_np, x, cfg, sched, n_steps, guidance):
    """Independent straight-line numpy re-implementation (diffusers 0.19.3
    multistep logic) used to cross-check the scan."""
    ts = dpm.timestep_grid(cfg, n_steps)
    lam, al, sg = sched.lambda_t, sched.alpha_t, sched.sigma_t
    model_outputs = []
    for i, t in enumerate(ts):
        eps_u, eps_c = eps_fn_np(np.concatenate([x, x]), int(t))
        eps = eps_u + guidance * (eps_c - eps_u)
        x0 = (x - sg[t] * eps) / al[t]
        prev_t = ts[i + 1] if i < len(ts) - 1 else 0
        h = lam[prev_t] - lam[t]
        if i == 0 or (cfg.lower_order_final and n_steps < 15 and i == len(ts) - 1):
            x = (sg[prev_t] / sg[t]) * x - al[prev_t] * (np.exp(-h) - 1) * x0
        else:
            s1 = ts[i - 1]
            h0 = lam[t] - lam[s1]
            r0 = h0 / h
            d1 = (x0 - model_outputs[-1]) / r0
            x = (
                (sg[prev_t] / sg[t]) * x
                - al[prev_t] * (np.exp(-h) - 1) * x0
                - 0.5 * al[prev_t] * (np.exp(-h) - 1) * d1
            )
        model_outputs.append(x0)
    return x


def test_scan_matches_independent_numpy_implementation():
    cfg = dpm.DPMSolverConfig()
    sched = dpm.make_schedule(cfg)
    rng = np.random.default_rng(0)
    w_u = rng.normal(size=(8, 8)).astype(np.float32) * 0.1
    w_c = rng.normal(size=(8, 8)).astype(np.float32) * 0.1

    def eps_np(lat2, t):
        half = lat2.shape[0] // 2
        lat = lat2[:half]
        f = np.tanh(lat.reshape(half, -1))
        return (f @ w_u).reshape(lat.shape), (f @ w_c).reshape(lat.shape)

    def eps_fn(lat2, t):
        half = lat2.shape[0] // 2
        lat = lat2[:half]
        f = jnp.tanh(lat.reshape(half, -1))
        eu = (f @ w_u).reshape(lat.shape)
        ec = (f @ w_c).reshape(lat.shape)
        return jnp.concatenate([eu, ec], axis=0)

    for n_steps in (3, 11, 21):  # exercises lower_order_final both ways
        x = rng.normal(size=(2, 2, 2, 2)).astype(np.float32)
        bundle = dpm.make_step_bundle(cfg, sched, n_steps)
        got = dpm.denoise(eps_fn, jnp.asarray(x), bundle, guidance_scale=7.5)
        ref = _reference_dpm_2m(eps_np, x.copy(), cfg, sched, n_steps, 7.5)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def test_grad_coefs_match_reference_formula():
    cfg = dpm.DPMSolverConfig()
    sched = dpm.make_schedule(cfg)
    bundle = dpm.make_step_bundle(cfg, sched, 19)
    coefs = np.asarray(bundle.grad_coef)
    # geometric mean normalised to 1 (exp-1:1109)
    np.testing.assert_allclose(np.exp(np.mean(np.log(coefs))), 1.0, rtol=1e-5)
    ts = dpm.timestep_grid(cfg, 19)
    raw = (
        np.sqrt(sched.alphas_cumprod[ts])
        * np.sqrt(1 - sched.alphas_cumprod[ts])
        / (1 - sched.alphas[ts])
    )
    np.testing.assert_allclose(coefs / raw, (coefs / raw)[0], rtol=1e-4)


def test_scale_grad_vjp():
    g = jax.grad(lambda x: dpm.scale_grad(x, jnp.float32(0.25)).sum())(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), 0.25)


def test_grad_mode_param_gradients():
    """grad_mode: params of eps_fn receive gradients from all steps; the
    initial latents gradient flows only through the linear solver chain."""
    cfg = dpm.DPMSolverConfig()
    sched = dpm.make_schedule(cfg)
    bundle = dpm.make_step_bundle(cfg, sched, 5)

    def make_loss(grad_mode):
        def loss(theta, lat):
            def eps_fn(l2, t):
                return jnp.tanh(l2) * theta

            out = dpm.denoise(
                eps_fn, lat, bundle, guidance_scale=2.0, grad_mode=grad_mode
            )
            return (out**2).sum()

        return loss

    lat = jax.random.normal(jax.random.key(0), (1, 2, 2, 1))
    g_theta, g_lat = jax.grad(make_loss(True), argnums=(0, 1))(jnp.float32(0.5), lat)
    assert bool(jnp.isfinite(g_theta)) and float(jnp.abs(g_theta)) > 0
    assert bool(jnp.all(jnp.isfinite(g_lat)))
    # without grad_mode the latent gradient differs (UNet path not detached)
    g_lat2 = jax.grad(make_loss(False), argnums=1)(jnp.float32(0.5), lat)
    assert not np.allclose(np.asarray(g_lat), np.asarray(g_lat2))


def test_scan_remat_dots_policy_matches_full(monkeypatch):
    """FAIRDIFF_SCAN_REMAT=dots (matmul-saveable checkpoint policy) must be
    a pure perf knob: identical gradients to the default full-remat scan."""
    cfg = dpm.DPMSolverConfig()
    sched = dpm.make_schedule(cfg)
    bundle = dpm.make_step_bundle(cfg, sched, 5)
    w = jax.random.normal(jax.random.key(1), (4, 4))

    def loss(theta, lat):
        def eps_fn(l2, t):
            return jnp.tanh(l2 @ theta)

        out = dpm.denoise(
            eps_fn, lat, bundle, guidance_scale=2.0, grad_mode=True
        )
        return (out**2).sum()

    lat = jax.random.normal(jax.random.key(0), (1, 2, 2, 4))
    monkeypatch.delenv("FAIRDIFF_SCAN_REMAT", raising=False)
    g_full = jax.jit(jax.grad(loss))(w, lat)
    monkeypatch.setenv("FAIRDIFF_SCAN_REMAT", "dots")
    g_dots = jax.jit(jax.grad(loss))(w, lat)
    np.testing.assert_allclose(
        np.asarray(g_full), np.asarray(g_dots), rtol=1e-6, atol=1e-6
    )
