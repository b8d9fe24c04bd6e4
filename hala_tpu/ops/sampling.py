"""Sampling utilities shared by the BSDF / light / env code.

Role parity: helper library of the reference's external shaders. All
functions are branch-free jnp over (N, ...) batches.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = jnp.float32(2.0 * jnp.pi)
INV_PI = jnp.float32(1.0 / jnp.pi)


def normalize(v, eps=1e-12):
    # manual L2: jnp.linalg.norm is internally jitted, and that inner
    # closed_call trips jax's vma check under shard_map (its internal
    # constants are replicated while v is varying).
    return v / jnp.maximum(
        jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)), eps
    )


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def build_basis(n: jnp.ndarray):
    """Orthonormal basis (t, b, n) from unit normals (N,3).

    Branchless Duff et al. 2017 construction.
    """
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    bt = jnp.stack(
        [b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1
    )
    return t, bt


def to_world(local: jnp.ndarray, t, b, n):
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * n
    )


def to_local(world: jnp.ndarray, t, b, n):
    return jnp.stack([dot(world, t), dot(world, b), dot(world, n)], axis=-1)


def cosine_sample_hemisphere(u1, u2):
    """Local-frame cosine-weighted direction; pdf = cos/pi."""
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return jnp.stack([x, y, z], axis=-1)


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_cone(u1, u2, cos_theta_max):
    """Direction in local frame (+z axis), pdf = 1/(2pi(1-cos_max))."""
    cos_theta = 1.0 - u1 * (1.0 - cos_theta_max)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = TWO_PI * u2
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )


def sample_ggx_vndf(wo_local, ax, ay, u1, u2):
    """Visible-normal GGX sampling (Heitz 2018). wo_local: (N,3) in the
    shading frame, z up. Returns half-vector h (N,3)."""
    v = normalize(
        jnp.stack(
            [wo_local[..., 0] * ax, wo_local[..., 1] * ay, wo_local[..., 2]],
            axis=-1,
        )
    )
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(lensq)], axis=-1)
        * inv_len[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), v.shape),
    )
    t2 = jnp.cross(v, t1)
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    h = normalize(
        jnp.stack(
            [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(1e-6, nh[..., 2])],
            axis=-1,
        )
    )
    return h


def ggx_d(h_local, ax, ay):
    """Anisotropic GGX NDF."""
    hx, hy, hz = h_local[..., 0], h_local[..., 1], h_local[..., 2]
    k = hx * hx / (ax * ax) + hy * hy / (ay * ay) + hz * hz
    return 1.0 / jnp.maximum(jnp.pi * ax * ay * k * k, 1e-12)


def ggx_lambda(w_local, ax, ay):
    wx, wy, wz = w_local[..., 0], w_local[..., 1], w_local[..., 2]
    wz = jnp.where(jnp.abs(wz) < 1e-6, 1e-6, wz)
    a2 = (wx * ax) ** 2 + (wy * ay) ** 2
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + a2 / (wz * wz)))


def ggx_g1(w_local, ax, ay):
    return 1.0 / (1.0 + ggx_lambda(w_local, ax, ay))


def ggx_g2(wo_local, wi_local, ax, ay):
    """Height-correlated Smith G2."""
    return 1.0 / (
        1.0 + ggx_lambda(wo_local, ax, ay) + ggx_lambda(wi_local, ax, ay)
    )


def gtr1_d(hz, a):
    """Clearcoat GTR1 NDF (Burley 2012)."""
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * hz * hz
    return (a2 - 1.0) / jnp.maximum(jnp.pi * jnp.log(a2) * t, 1e-12)


def sample_gtr1(a, u1, u2):
    a2 = a * a
    cos2 = (1.0 - jnp.power(a2, 1.0 - u1)) / (1.0 - a2)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos2))
    phi = TWO_PI * u2
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )


def sample_henyey_greenstein(d: jnp.ndarray, g: jnp.ndarray, u1, u2):
    """Sample a scattering direction around `d` from the HG phase
    function with anisotropy g (g=0 -> isotropic). Returns (wi, pdf)."""
    g = jnp.clip(g, -0.999, 0.999)
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - safe_g * safe_g) / (1.0 - safe_g + 2.0 * safe_g * u1)
    cos_hg = (1.0 + safe_g * safe_g - sq * sq) / (2.0 * safe_g)
    cos_t = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u1, cos_hg)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = TWO_PI * u2
    t, b = build_basis(d)
    wi = (
        (sin_t * jnp.cos(phi))[..., None] * t
        + (sin_t * jnp.sin(phi))[..., None] * b
        + cos_t[..., None] * d
    )
    return normalize(wi), hg_pdf(cos_t, g)


def hg_pdf(cos_t, g):
    """Henyey-Greenstein phase pdf over solid angle."""
    g = jnp.clip(g, -0.999, 0.999)
    denom = jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-6)
    return (1.0 - g * g) / (4.0 * jnp.pi * denom * jnp.sqrt(denom))


def fresnel_schlick(f0, cos_theta):
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * (m ** 2) ** 2 * m


def fresnel_dielectric(cos_i, eta):
    """Exact dielectric Fresnel; eta = ior_transmitted / ior_incident."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / jnp.maximum(eta * eta, 1e-12)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    fr = 0.5 * (rs * rs + rp * rp)
    return jnp.where(sin2_t >= 1.0, 1.0, fr)  # TIR


def power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-12)
