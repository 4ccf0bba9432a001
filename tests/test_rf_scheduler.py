import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.schedulers import rf


def test_uniform_initial_timesteps():
    ts = rf.initial_timesteps(4, "Uniform")
    np.testing.assert_allclose(np.asarray(ts), [1.0, 0.75, 0.5, 0.25], atol=1e-6)


def test_linear_quadratic_schedule_formula():
    # Re-derive by hand (rf.py:25-46): 8 steps, threshold 0.025, linear 4
    n, thr, lin = 8, 0.025, 4
    linear = [i * thr / lin for i in range(lin)]
    diff = lin - thr * n
    qsteps = n - lin
    a = diff / (lin * qsteps**2)
    b = thr / lin - 2 * diff / qsteps**2
    c = a * lin**2
    quad = [a * i**2 + b * i + c for i in range(lin, n)]
    expected = [1.0 - x for x in linear + quad]
    ts = rf.linear_quadratic_schedule(n)
    np.testing.assert_allclose(np.asarray(ts), expected, atol=1e-6)
    # schedule is descending from 1.0
    assert np.asarray(ts)[0] == 1.0
    assert np.all(np.diff(np.asarray(ts)) < 0)


def test_constant_shift_schedule():
    ts = rf.initial_timesteps(4, "Constant", shift=2.0)
    base = np.linspace(1, 0.25, 4)
    expected = np.exp(2.0) / (np.exp(2.0) + (1 / base - 1))
    np.testing.assert_allclose(np.asarray(ts), expected, rtol=1e-5)


def test_sd3_shift_monotone_in_resolution():
    ts = jnp.linspace(0.9, 0.1, 5)
    lo = rf.sd3_resolution_dependent_shift(1024, ts)
    hi = rf.sd3_resolution_dependent_shift(4096, ts)
    # larger resolution -> stronger shift toward noise (larger timesteps)
    assert np.all(np.asarray(hi) >= np.asarray(lo) - 1e-6)


def test_step_scalar_euler():
    sched = rf.make_schedule(timesteps=jnp.array([1.0, 0.75, 0.5, 0.25]))
    x = jnp.ones((1, 4, 2))
    v = jnp.full((1, 4, 2), 2.0)
    out = rf.step(sched, v, jnp.asarray(0.75), x)
    # lower of 0.75 is 0.5 -> dt 0.25 -> x - 0.25*2 = 0.5
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)
    # below the last timestep -> lower = 0
    out = rf.step(sched, v, jnp.asarray(0.25), x)
    np.testing.assert_allclose(np.asarray(out), 1 - 0.25 * 2, atol=1e-6)


def test_step_per_token_timesteps():
    sched = rf.make_schedule(timesteps=jnp.array([1.0, 0.6, 0.2]))
    x = jnp.ones((1, 3, 2))
    v = jnp.ones((1, 3, 2))
    t = jnp.array([[1.0, 0.6, 0.0]])  # per-token: third token already done
    out = rf.step(sched, v, t, x)
    # dts: 1.0->0.6 = 0.4; 0.6->0.2 = 0.4; 0.0 -> lower 0 -> dt 0
    np.testing.assert_allclose(
        np.asarray(out)[0, :, 0], [0.6, 0.6, 1.0], atol=1e-6
    )


def test_step_is_jittable_and_scannable():
    sched = rf.make_schedule(num_steps=8, sampler="Uniform")
    x0 = jax.random.normal(jax.random.key(0), (1, 16, 4))

    @jax.jit
    def denoise(x):
        def body(x, t):
            v = x * 0.1  # fake model
            return rf.step(sched, v, t, x), None
        x, _ = jax.lax.scan(body, x, sched.timesteps)
        return x

    out = denoise(x0)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()


def test_add_noise_endpoints():
    x = jnp.ones((2, 3, 4))
    n = jnp.zeros_like(x)
    np.testing.assert_allclose(np.asarray(rf.add_noise(x, n, jnp.asarray(0.0))), 1.0)
    np.testing.assert_allclose(np.asarray(rf.add_noise(x, n, jnp.asarray(1.0))), 0.0)


def test_stochastic_step_matches_resample_identity():
    sched = rf.make_schedule(timesteps=jnp.array([1.0, 0.5]))
    x = jax.random.normal(jax.random.key(1), (1, 8, 2))
    v = jax.random.normal(jax.random.key(2), (1, 8, 2))
    t = jnp.full((1, 8), 0.5)
    out = rf.step(sched, v, t, x, stochastic_sampling=True, key=jax.random.key(3))
    # next_t = 0 -> output must equal x0 = x - 0.5*v exactly (no noise term)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x - 0.5 * v), atol=1e-6
    )
