"""Envmap distribution-table tests: vectorized build must match a direct
scalar re-implementation of envmap.rs:239-388 semantics."""

import numpy as np
import pytest

from hala_tpu.envmap import EnvMap, build_distribution_maps


def _reference_build(rgb):
    """Direct scalar transcription of the envmap.rs algorithm semantics
    (per-row CDF + inverted lookup via lower_bound)."""
    h, w = rgb.shape[:2]
    lum = lambda p: 0.212671 * p[0] + 0.715160 * p[1] + 0.072169 * p[2]

    def lower_bound(arr, value):
        lo, hi = 0, len(arr)
        while lo < hi:
            mid = (lo + hi) // 2
            if arr[mid] < value:
                lo = mid + 1
            else:
                hi = mid
        return lo

    pdf2 = np.zeros((h, w), np.float32)
    cdf2 = np.zeros((h, w), np.float32)
    pdf1 = np.zeros(h, np.float32)
    total = np.float32(0.0)
    for v in range(h):
        acc = np.float32(0.0)
        for u in range(w):
            wgt = np.float32(lum(rgb[v, u]))
            pdf2[v, u] = wgt
            acc += wgt
            cdf2[v, u] = acc
            total += wgt
        pdf2[v] /= acc
        cdf2[v] /= acc
        pdf1[v] = acc
    cdf1 = np.cumsum(pdf1).astype(np.float32)
    colsum = cdf1[-1]
    cdf1 /= colsum

    marginal = np.zeros(h, np.float32)
    for v in range(h):
        marginal[v] = lower_bound(cdf1, (v + 1) / h) / h
    conditional = np.zeros((h, w), np.float32)
    for v in range(h):
        for u in range(w):
            conditional[v, u] = lower_bound(cdf2[v], (u + 1) / w) / w
    return float(total), marginal, conditional


class TestDistributionBuild:
    def test_matches_scalar_reference(self, rs):
        rgb = rs.uniform(0.01, 5.0, (8, 16, 3)).astype(np.float32)
        total, marg, cond = build_distribution_maps(rgb)
        rtotal, rmarg, rcond = _reference_build(rgb)
        assert total == pytest.approx(rtotal, rel=1e-4)
        np.testing.assert_allclose(marg, rmarg, atol=1e-6)
        np.testing.assert_allclose(cond, rcond, atol=1e-6)

    def test_bright_row_attracts_samples(self):
        rgb = np.full((16, 16, 3), 0.01, np.float32)
        rgb[4] = 10.0  # one bright row
        _, marg, _ = build_distribution_maps(rgb)
        # most marginal entries should map into row 4's v coordinate
        frac = np.mean(np.abs(marg - 4 / 16) < 1.5 / 16)
        assert frac > 0.8

    def test_sampling_consistency(self, rs):
        """env_sample pdf integrates to ~1 over the sphere."""
        import jax.numpy as jnp

        from hala_tpu.ops.env import env_pdf

        rgb = rs.uniform(0.1, 2.0, (32, 64, 3)).astype(np.float32)
        env = EnvMap.from_array(rgb)
        # Monte Carlo over uniform sphere directions
        n = 20000
        z = rs.uniform(-1, 1, n)
        phi = rs.uniform(0, 2 * np.pi, n)
        r = np.sqrt(1 - z * z)
        d = np.stack([r * np.cos(phi), z, r * np.sin(phi)], -1).astype(
            np.float32
        )
        pdf = np.asarray(env_pdf(env, jnp.asarray(d), jnp.float32(0.0)))
        integral = pdf.mean() * 4 * np.pi
        assert integral == pytest.approx(1.0, rel=0.05)


class TestCacheRoundtrip:
    def test_dist_cache_layout(self, tmp_path, rs):
        """Raw f32 LE stream [total, marginal, conditional]
        (envmap.rs:90-142 layout)."""
        rgb = rs.uniform(0.1, 1.0, (4, 8, 3)).astype(np.float32)
        total, marg, cond = build_distribution_maps(rgb)
        stream = np.concatenate(
            [[np.float32(total)], marg.ravel(), cond.ravel()]
        ).astype("<f4")
        p = tmp_path / "x.dist_cache"
        stream.tofile(p)
        raw = np.fromfile(p, "<f4")
        assert raw[0] == pytest.approx(total, rel=1e-6)
        assert raw.size == 1 + 4 + 32


class TestPackedFetchTables:
    """The derived quad/stab row-packed tables must reproduce the plain
    take()-based fetch paths bit-for-bit (quad) / to float-composition
    tolerance (stab's precomputed trig)."""

    def test_quad_matches_plain_bilinear(self, rs):
        import dataclasses

        import jax.numpy as jnp

        from hala_tpu.ops.env import env_eval, env_radiance

        rgb = rs.uniform(0.05, 3.0, (16, 32, 3)).astype(np.float32)
        env = EnvMap.from_array(rgb)
        assert env.quad is not None and env.quad.shape == (16, 32, 16)
        plain = dataclasses.replace(env, quad=None, stab=None)
        n = 4096
        z = rs.uniform(-1, 1, n)
        phi = rs.uniform(0, 2 * np.pi, n)
        r = np.sqrt(1 - z * z)
        d = jnp.asarray(
            np.stack([r * np.cos(phi), z, r * np.sin(phi)], -1), jnp.float32
        )
        for rot in (0.0, 0.73):
            rad_q = env_radiance(env, d, jnp.float32(rot), jnp.float32(1.5))
            rad_p = env_radiance(plain, d, jnp.float32(rot), jnp.float32(1.5))
            np.testing.assert_array_equal(np.asarray(rad_q), np.asarray(rad_p))
            eq, pq = env_eval(env, d, jnp.float32(rot), jnp.float32(1.5))
            ep, pp = env_eval(plain, d, jnp.float32(rot), jnp.float32(1.5))
            np.testing.assert_array_equal(np.asarray(eq), np.asarray(ep))
            np.testing.assert_array_equal(np.asarray(pq), np.asarray(pp))

    def test_stab_matches_plain_sample(self, rs):
        import dataclasses

        import jax.numpy as jnp

        from hala_tpu.ops.env import env_sample

        rgb = rs.uniform(0.05, 3.0, (16, 32, 3)).astype(np.float32)
        rgb[3:5, 10:14] = 40.0
        env = EnvMap.from_array(rgb)
        assert env.stab is not None and env.stab.shape == (16, 32, 8)
        plain = dataclasses.replace(env, quad=None, stab=None)
        rnd = jnp.asarray(rs.uniform(0, 1, (4096, 2)).astype(np.float32))
        for rot in (0.0, 0.73):
            wi_s, rad_s, pdf_s = env_sample(
                env, rnd, jnp.float32(rot), jnp.float32(2.0)
            )
            wi_p, rad_p, pdf_p = env_sample(
                plain, rnd, jnp.float32(rot), jnp.float32(2.0)
            )
            assert np.all(np.linalg.norm(np.asarray(wi_s), axis=-1) < 1.001)
            np.testing.assert_allclose(
                np.asarray(wi_s), np.asarray(wi_p), atol=1e-6
            )
            np.testing.assert_array_equal(np.asarray(rad_s), np.asarray(rad_p))
            np.testing.assert_allclose(
                np.asarray(pdf_s), np.asarray(pdf_p), rtol=1e-5
            )
