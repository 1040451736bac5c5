"""BSDF sampler consistency: pdf integrates to ~1, sample()/pdf() agree, and
the sampled estimator matches brute-force quadrature of the same BSDF
(SURVEY.md section 4: "BSDF white-furnace + pdf<->sample consistency")."""

import jax.numpy as jnp
import numpy as np

from vulkanraytracing_tpu.core import math3d, rng
from vulkanraytracing_tpu.pt import bsdf as B


def _surface(base=(0.8, 0.6, 0.4), rough=0.5, metal=0.0):
    n = 1
    return B.make_surface(
        jnp.broadcast_to(jnp.asarray(base, jnp.float32), (n, 3)),
        jnp.full((n,), rough, jnp.float32),
        jnp.full((n,), metal, jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
    )


def _hemisphere_grid(n_theta=64, n_phi=128):
    """Quadrature nodes + weights over the +Z hemisphere."""
    theta = (np.arange(n_theta) + 0.5) / n_theta * (np.pi / 2)
    phi = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    t, p = np.meshgrid(theta, phi, indexing="ij")
    dirs = np.stack(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], axis=-1
    ).reshape(-1, 3)
    w = (np.sin(t) * (np.pi / 2 / n_theta) * (2 * np.pi / n_phi)).reshape(-1)
    return jnp.asarray(dirs.astype(np.float32)), jnp.asarray(w.astype(np.float32))


def test_pdf_integrates_to_one():
    """PdfBSDF is a mixture of two normalized pdfs over the hemisphere
    (solid-angle measure), so it must integrate to ~1 for wi in the upper
    hemisphere... up to the GGX half-vector-measure tail for the specular
    lobe, which leaks below the horizon at high roughness.  Use a modest
    roughness where the leak is small."""
    surf = _surface(rough=0.3)
    wo = jnp.asarray(np.array([[0.3, 0.1, 0.95]], np.float32))
    wo = math3d.normalize(wo)
    dirs, w = _hemisphere_grid()
    k = dirs.shape[0]
    s = B.Surface(*[jnp.broadcast_to(f, (k,) + f.shape[1:]) for f in surf])
    wh = math3d.normalize(jnp.broadcast_to(wo, (k, 3)) + dirs)
    pdf = B.pdf_bsdf(s, jnp.broadcast_to(wo, (k, 3)), dirs, wh)
    total = float(jnp.sum(pdf * w))
    assert 0.93 < total < 1.03, total


def test_sampled_estimator_matches_quadrature():
    """E[f(wo,wi)*cos / pdf] over sampler draws == integral f*cos dwi."""
    for rough, metal in [(0.8, 0.0), (0.4, 1.0), (1.0, 0.0)]:
        surf = _surface(rough=rough, metal=metal)
        wo = math3d.normalize(jnp.asarray(np.array([[0.2, -0.3, 0.9]], np.float32)))

        # quadrature of f*cos over hemisphere
        dirs, w = _hemisphere_grid()
        k = dirs.shape[0]
        s_k = B.Surface(*[jnp.broadcast_to(f, (k,) + f.shape[1:]) for f in surf])
        wo_k = jnp.broadcast_to(wo, (k, 3))
        wh = math3d.normalize(wo_k + dirs)
        f = B.evaluate_bsdf(s_k, wo_k, dirs, wh)
        ref = np.asarray(
            jnp.sum(f * (math3d.cos_theta_tangent(dirs) * w)[:, None], axis=0)
        )

        # Monte Carlo through the actual sampler
        n = 200_000
        s0 = rng.wang_hash(jnp.arange(n, dtype=jnp.uint32))
        s1 = rng.wang_hash(jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(777))
        s_n = B.Surface(*[jnp.broadcast_to(f0, (n,) + f0.shape[1:]) for f0 in surf])
        wo_n = jnp.broadcast_to(wo, (n, 3))
        fval, wi, pdf, _, _ = B.sample_bsdf(s_n, wo_n, s0, s1)
        contrib = fval * math3d.cos_theta_tangent(wi)[:, None] / jnp.maximum(
            pdf, 1e-12
        )[:, None]
        # zero-pdf / below-horizon samples contribute nothing (estimator
        # convention matches the integrator's break on pdf < EPSILON)
        good = (pdf > 1e-9)[:, None]
        mc = np.asarray(jnp.mean(jnp.where(good, contrib, 0.0), axis=0))

        np.testing.assert_allclose(mc, ref, rtol=0.05, atol=0.01), (rough, metal)


def test_specular_weight_limits():
    # pure metal: all specular
    s = _surface(base=(1.0, 0.8, 0.5), rough=0.5, metal=1.0)
    assert float(s.sw[0]) == 1.0
    # dielectric: mostly diffuse
    s = _surface(base=(0.9, 0.9, 0.9), rough=0.5, metal=0.0)
    assert float(s.sw[0]) < 0.1


def test_evaluate_bsdf_nonnegative_and_reciprocal_shape():
    surf = _surface()
    rng_np = np.random.default_rng(0)
    wo = math3d.normalize(jnp.asarray(
        np.abs(rng_np.normal(size=(100, 3))).astype(np.float32) * np.array([1, 1, 1], np.float32)
    ))
    wi = math3d.normalize(jnp.asarray(
        np.abs(rng_np.normal(size=(100, 3))).astype(np.float32)
    ))
    s = B.Surface(*[jnp.broadcast_to(f, (100,) + f.shape[1:]) for f in surf])
    wh = math3d.normalize(wo + wi)
    f = B.evaluate_bsdf(s, wo, wi, wh)
    assert np.all(np.asarray(f) >= 0.0)
