"""S^3 direction sampler tests (SURVEY §4: C6d checklist)."""
import numpy as np
import jax.numpy as jnp
from scipy import stats

from fourd_ray_tracing_tpu.ops import sampler


def test_volume_by_w_is_a_cdf():
    w = jnp.linspace(-1.0, 1.0, 1001)
    v = np.asarray(sampler.volume_by_w(w))
    assert abs(v[0]) < 1e-5 and abs(v[-1] - 1.0) < 1e-5
    assert (np.diff(v) >= -1e-6).all()


def test_volume_by_w_matches_closed_form():
    # CDF of density (2/pi)*sqrt(1-w^2): integral from -1 to w.
    w = np.linspace(-0.999, 0.999, 201)
    want = (w * np.sqrt(1 - w**2) - np.arccos(w)) / np.pi + 1
    got = np.asarray(sampler.volume_by_w(jnp.asarray(w, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_newton_inverts_cdf():
    v = jnp.asarray(np.linspace(0.001, 0.999, 997), jnp.float32)
    w = sampler.w_by_volume_newton(v)
    v_back = np.asarray(sampler.volume_by_w(w))
    # Newton stops at |dw| < 2^-12; CDF slope <= 2/pi, so |dv| <~ 2e-4.
    np.testing.assert_allclose(v_back, np.asarray(v), atol=5e-4)


def test_kepler_matches_newton():
    v = jnp.asarray(np.linspace(0.0, 0.999999, 4001), jnp.float32)
    w_newton = np.asarray(sampler.w_by_volume_newton(v))
    w_kepler = np.asarray(sampler.w_by_volume_kepler(v))
    assert np.abs(w_kepler - w_newton).max() < 5e-4


def test_kepler_inverts_cdf_tightly():
    v = jnp.asarray(np.linspace(1e-6, 1 - 1e-6, 9973), jnp.float32)
    w = sampler.w_by_volume_kepler(v)
    v_back = np.asarray(sampler.volume_by_w(w))
    np.testing.assert_allclose(v_back, np.asarray(v), atol=2e-5)


def test_w_marginal_distribution(rng_np):
    # KS test of the w marginal against density (2/pi)sqrt(1-w^2).
    u = rng_np.random(20000).astype(np.float32)
    w = np.asarray(sampler.w_by_volume_kepler(jnp.asarray(u)))
    cdf = lambda x: (x * np.sqrt(1 - x**2) - np.arccos(x)) / np.pi + 1
    d, p = stats.kstest(w, cdf)
    assert p > 0.01, (d, p)


def test_directions_are_unit_and_isotropic(rng_np):
    n = 40000
    u = rng_np.random((3, n)).astype(np.float32)
    d = sampler.direction_from_uniforms(
        jnp.asarray(u[0]), jnp.asarray(u[1]), jnp.asarray(u[2])
    )
    vecs = np.stack([np.asarray(c) for c in d], axis=-1)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0, atol=1e-5)
    # isotropy: mean ~ 0, covariance ~ I/4
    assert np.abs(vecs.mean(0)).max() < 0.02
    cov = vecs.T @ vecs / n
    np.testing.assert_allclose(cov, np.eye(4) / 4, atol=0.02)


def test_newton_and_kepler_agree_in_render_tolerance(rng_np):
    u = rng_np.random((3, 1000)).astype(np.float32)
    d_n = sampler.direction_from_uniforms(
        jnp.asarray(u[0]), jnp.asarray(u[1]), jnp.asarray(u[2]), method="newton"
    )
    d_k = sampler.direction_from_uniforms(
        jnp.asarray(u[0]), jnp.asarray(u[1]), jnp.asarray(u[2]), method="kepler"
    )
    for a, b in zip(d_n, d_k):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-3


def test_poly_matches_newton():
    v = jnp.asarray(np.linspace(0.0, 0.999999, 4001), jnp.float32)
    w_newton = np.asarray(sampler.w_by_volume_newton(v))
    w_poly = np.asarray(sampler.w_by_volume_poly(v))
    assert np.abs(w_poly - w_newton).max() < 5e-4


def test_poly_inverts_cdf_tightest():
    # The polynomial mode is tighter than kepler-2: <5e-6 in w-space,
    # so <4e-6 in v-space (CDF slope <= 2/pi).
    v = jnp.asarray(np.linspace(1e-6, 1 - 1e-6, 9973), jnp.float32)
    w = sampler.w_by_volume_poly(v)
    v_back = np.asarray(sampler.volume_by_w(w))
    np.testing.assert_allclose(v_back, np.asarray(v), atol=5e-6)


def test_poly_w_marginal_distribution(rng_np):
    u = rng_np.random(20000).astype(np.float32)
    w = np.asarray(sampler.w_by_volume_poly(jnp.asarray(u)))
    cdf = lambda x: (x * np.sqrt(1 - x**2) - np.arccos(x)) / np.pi + 1
    d, p = stats.kstest(w, cdf)
    assert p > 0.01, (d, p)


def test_poly_directions_unit(rng_np):
    u = rng_np.random((3, 10000)).astype(np.float32)
    d = sampler.direction_from_uniforms(
        jnp.asarray(u[0]), jnp.asarray(u[1]), jnp.asarray(u[2]), method="poly"
    )
    vecs = np.stack([np.asarray(c) for c in d], axis=-1)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0, atol=1e-5)
