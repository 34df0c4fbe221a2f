"""BSDF evaluation + sampling tests: energy, symmetry, pdf consistency.

These go beyond the reference's test suite (it has no BSDF tests) — the
deterministic jax.random pipeline makes statistical checks reproducible.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rpt_tpu.materials import (
    Material,
    MaterialTable,
    bsdf,
    sample_f,
)


def params_for(mat: Material, n: int = 1):
    table = MaterialTable.pack([mat])
    return table.gather(jnp.zeros(n, jnp.int32))


def unit(v):
    v = np.asarray(v, np.float64)
    return jnp.asarray(v / np.linalg.norm(v), jnp.float32)


Z = jnp.asarray([0.0, 0.0, 1.0])


class TestBsdfEval:
    def test_diffuse_below_horizon_is_zero(self):
        mat = params_for(Material.diffuse((0.5, 0.5, 0.5)))
        n = Z[None]
        wo = unit([0, 0.3, 1])[None]
        wi = unit([0, 0.3, -1])[None]  # below surface
        f = bsdf(mat, n, wo, wi)
        np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-7)

    def test_diffuse_value_near_lambert(self):
        # For roughness=1, normal incidence: specular D is tiny off-peak; at
        # wi=wo=n the Fresnel F0 for ior 1.5 is 0.04, diffuse = (1-F)c/pi.
        albedo = np.array([0.2, 0.5, 0.8])
        mat = params_for(Material.diffuse(albedo))
        n = Z[None]
        wo = unit([0.3, 0.0, 1.0])[None]
        wi = unit([-0.25, 0.2, 1.0])[None]
        f = np.asarray(bsdf(mat, n, wo, wi))[0]
        lambert = albedo / np.pi
        # Diffuse term dominates; allow the specular lobe a small margin
        assert np.all(f >= lambert * 0.8)
        assert np.all(f <= lambert * 1.6 + 0.1)

    def test_helmholtz_reciprocity_specular(self):
        # Cook–Torrance with the min-geometry term is reciprocal in wi/wo up
        # to the Fresnel input (reference uses wo.h). Verify the full bsdf is
        # close to symmetric for a metallic surface.
        mat = params_for(Material.metallic_mat((0.9, 0.7, 0.3), 0.3))
        n = Z[None]
        a = unit([0.4, 0.1, 1.0])[None]
        b = unit([-0.3, 0.25, 1.0])[None]
        f_ab = np.asarray(bsdf(mat, n, a, b))
        f_ba = np.asarray(bsdf(mat, n, b, a))
        np.testing.assert_allclose(f_ab, f_ba, rtol=1e-3, atol=1e-5)

    def test_opaque_blocks_transmission(self):
        mat = params_for(Material.specular((1.0, 1.0, 1.0), 0.2))
        n = Z[None]
        wo = unit([0, 0, 1])[None]
        wi = unit([0.1, 0.1, -1])[None]
        f = np.asarray(bsdf(mat, n, wo, wi))
        np.testing.assert_allclose(f, 0.0, atol=1e-7)

    def test_transparent_transmits(self):
        mat = params_for(Material.clear(1.5, 0.1))
        n = Z[None]
        wo = unit([0.0, 0.0, 1.0])[None]
        # Straight-through transmission direction
        wi = unit([0.0, 0.0, -1.0])[None]
        f = np.asarray(bsdf(mat, n, wo, wi))
        assert np.all(np.isfinite(f))
        assert f[0, 0] > 0.0

    def test_no_nans_random_directions(self):
        key = jax.random.PRNGKey(0)
        dirs = jax.random.normal(key, (256, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        n = jnp.broadcast_to(Z, (256, 3))
        for m in [
            Material.diffuse((0.5, 0.5, 0.5)),
            Material.specular((0.5, 0.5, 0.5), 0.1),
            Material.metallic_mat((0.9, 0.8, 0.7), 0.4),
            Material.clear(1.5, 0.05),
            Material.light((1.0, 1.0, 1.0), 10.0),
        ]:
            mat = params_for(m, 256)
            f = bsdf(mat, n, jnp.roll(dirs, 1, axis=0), dirs)
            assert bool(jnp.all(jnp.isfinite(f))), m


class TestSampling:
    def _mc_integral_cos(self, material, n_samples=200_000, seed=0):
        """Estimate ∫_{upper hemisphere} cosθ dω = π using sampled wi and the
        mixture pdf: E[max(wi.n, 0) / pdf]."""
        mat = params_for(material, n_samples)
        n = jnp.broadcast_to(Z, (n_samples, 3))
        wo = jnp.broadcast_to(unit([0.2, 0.1, 1.0]), (n_samples, 3))
        wi, pdf, valid = sample_f(jax.random.PRNGKey(seed), mat, n, wo)
        cos = jnp.maximum(jnp.sum(wi * n, axis=-1), 0.0)
        ok = valid & (pdf > 1e-9)
        est = jnp.where(ok, cos / jnp.maximum(pdf, 1e-9), 0.0)
        return float(jnp.mean(est))

    def test_diffuse_pdf_consistency(self):
        est = self._mc_integral_cos(Material.diffuse((0.5, 0.5, 0.5)))
        assert abs(est - np.pi) / np.pi < 0.03, est

    def test_glossy_pdf_consistency(self):
        est = self._mc_integral_cos(Material.specular((0.8, 0.8, 0.8), 0.5))
        assert abs(est - np.pi) / np.pi < 0.05, est

    def test_specular_reflection_direction(self):
        # Near-zero roughness: the sampled wi should be the mirror direction
        mat = params_for(Material.specular((1.0, 1.0, 1.0), 1e-4), 128)
        n = jnp.broadcast_to(Z, (128, 3))
        wo = jnp.broadcast_to(unit([0.5, 0.0, 1.0]), (128, 3))
        wi, pdf, valid = sample_f(jax.random.PRNGKey(1), mat, n, wo)
        mirror = np.asarray(unit([-0.5, 0.0, 1.0]))
        # The specular lobe is chosen with prob ~0.232; the diffuse samples
        # scatter. Count how many align with the mirror direction.
        align = np.asarray(jnp.sum(wi * jnp.asarray(mirror), axis=-1)) > 0.999
        frac = align.mean()
        assert 0.1 < frac < 0.45, frac

    def test_clear_glass_refracts(self):
        mat = params_for(Material.clear(1.5, 1e-4), 4096)
        n = jnp.broadcast_to(Z, (4096, 3))
        wo = jnp.broadcast_to(unit([0.0, 0.0, 1.0]), (4096, 3))
        wi, pdf, valid = sample_f(jax.random.PRNGKey(2), mat, n, wo)
        below = np.asarray(jnp.sum(wi * n, axis=-1) < 0) & np.asarray(valid)
        # Non-specular lobe (prob ~0.768 * (1-0.232)) transmits straight through
        assert below.mean() > 0.5
        trans = np.asarray(wi)[below]
        np.testing.assert_allclose(trans[:, 2], -1.0, atol=1e-2)

    def test_tir_flagged_invalid(self):
        # From inside glass at grazing angle: eta = 1/1.5, TIR above critical
        mat = params_for(Material.clear(1.5, 1e-4), 4096)
        n = jnp.broadcast_to(Z, (4096, 3))
        # wo deep below horizon => looking from inside; sin > 1/1.5 critical
        wo = jnp.broadcast_to(unit([0.95, 0.0, -0.3]), (4096, 3))
        wi, pdf, valid = sample_f(jax.random.PRNGKey(3), mat, n, wo)
        v = np.asarray(valid)
        assert (~v).mean() > 0.3  # a meaningful share hits TIR
        assert bool(jnp.all(jnp.isfinite(wi)))

    def test_sample_eval_weight_bounded_diffuse(self):
        # w = f cos / pdf should be <= albedo-ish for a Lambertian (energy
        # conservation of the estimator in expectation)
        mat = params_for(Material.diffuse((0.6, 0.6, 0.6)), 50_000)
        n = jnp.broadcast_to(Z, (50_000, 3))
        wo = jnp.broadcast_to(unit([0.1, 0.2, 1.0]), (50_000, 3))
        wi, pdf, valid = sample_f(jax.random.PRNGKey(4), mat, n, wo)
        f = bsdf(mat, n, wo, wi)
        cos = jnp.abs(jnp.sum(wi * n, axis=-1))
        ok = valid & (pdf > 1e-9)
        w = jnp.where(ok[:, None], f * (cos / jnp.maximum(pdf, 1e-9))[:, None], 0.0)
        mean_w = np.asarray(jnp.mean(w, axis=0))
        # Mean reflected energy ≈ (1-F)·albedo ≲ albedo
        assert np.all(mean_w < 0.65), mean_w
        assert np.all(mean_w > 0.3), mean_w


def test_gather_large_table_matches_one_hot():
    """M > ONE_HOT_MAX_MATERIALS switches to the row-gather path; both paths
    must agree exactly (r3 advisor note: MTL-heavy scenes, io.rs:83-149)."""
    import numpy as np
    import jax.numpy as jnp

    from rpt_tpu.materials import Material, MaterialTable

    rng = np.random.default_rng(0)
    mats = [
        Material.specular(tuple(rng.uniform(0, 1, 3)), float(rng.uniform(0.05, 1)))
        for _ in range(40)  # > ONE_HOT_MAX_MATERIALS
    ]
    table = MaterialTable.pack(mats, jnp.float32)
    assert table.color.shape[0] > table.ONE_HOT_MAX_MATERIALS
    ids = jnp.asarray(rng.integers(0, 40, 257), jnp.int32)
    got = table.gather(ids)

    small = MaterialTable.pack(mats[:8], jnp.float32)
    ids8 = ids % 8
    ref = small.gather(ids8)  # one-hot path
    # Same material produces the same params through either path.
    np.testing.assert_allclose(
        np.asarray(got.color)[np.asarray(ids) < 8],
        np.asarray(table.color)[np.asarray(ids)][np.asarray(ids) < 8],
    )
    np.testing.assert_allclose(
        np.asarray(ref.roughness), np.asarray(small.roughness)[np.asarray(ids8)]
    )
