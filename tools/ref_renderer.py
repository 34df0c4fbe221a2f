"""Independent f64 numpy oracle implementing ekzhang/rpt's exact estimator.

Golden-image generator for tests/test_golden.py. This is a SEPARATE
implementation from rpt_tpu — written formula-for-formula from the Rust
reference (citations inline), in float64, with its own RNG — so agreement
between the two is evidence of correctness, not shared bugs. The Rust
toolchain does not exist in this container, so this oracle stands in for
running the reference itself; sampling distributions are identical, RNG
streams are not, hence comparisons are distribution-level (block means at
equal spp), per SURVEY.md §7(d).

Scope: what the sphere and cornell workloads need (BASELINE.md goldens) —
transformed spheres/cubes, planes, triangles; opaque Cook-Torrance/Beckmann
materials; ambient/point lights and emissive-object lights (sphere + mesh);
pinhole camera; solid-color environment. Vectorized over rays in numpy, but
every formula matches renderer.rs / material.rs / light.rs / shape/*.rs.
"""

from __future__ import annotations

import numpy as np

EPSILON = 1e-12  # renderer.rs:14 (f64!)
FIREFLY_CLAMP = 100.0  # renderer.rs:15
INF = np.inf


# ---------------------------------------------------------------------------
# Vector helpers (f64, shape (..., 3))
# ---------------------------------------------------------------------------


def dot(a, b):
    return np.sum(a * b, axis=-1)


def normalize(v):
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.where(n > 0, n, 1.0)


def local_to_world_apply(n, v_local):
    """Apply the orthonormal basis of material.rs:316-324 to local vectors.

    Column convention of glm::mat3(ns, nss, n): world = ns*x + nss*y + n*z.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    use_x = np.abs(nx) > 1e-300  # f64::is_normal surrogate
    ns = np.where(
        use_x[..., None],
        np.stack([ny, -nx, np.zeros_like(nx)], -1),
        np.stack([np.zeros_like(nx), -nz, ny], -1),
    )
    ns = normalize(ns)
    nss = np.cross(n, ns)
    return (
        ns * v_local[..., 0:1] + nss * v_local[..., 1:2] + n * v_local[..., 2:3]
    )


def unit_disc(rng, shape):
    """Uniform in the unit disc (rand_distr::UnitDisc)."""
    r = np.sqrt(rng.random(shape))
    th = rng.random(shape) * 2.0 * np.pi
    return r * np.cos(th), r * np.sin(th)


def unit_circle(rng, shape):
    """Uniform on the unit circle (rand_distr::UnitCircle)."""
    th = rng.random(shape) * 2.0 * np.pi
    return np.cos(th), np.sin(th)


# ---------------------------------------------------------------------------
# Shapes: intersect(o, d, t_min) -> (t, normal) with t=inf on miss
# ---------------------------------------------------------------------------


class Transformed:
    """shape.rs:110-151: local-space intersect + M^-T normals + sample pdf."""

    def __init__(self, shape, matrix):
        self.shape = shape
        self.m = np.asarray(matrix, np.float64)
        self.inv = np.linalg.inv(self.m)
        self.lin = self.m[:3, :3]
        self.scale = np.linalg.det(self.lin)
        self.nmat = np.linalg.inv(self.lin).T

    def intersect(self, o, d, t_min):
        o_l = o @ self.inv[:3, :3].T + self.inv[:3, 3]
        d_l = d @ self.inv[:3, :3].T  # NOT normalized (shape.rs:64-71)
        t, n_local = self.shape.intersect(o_l, d_l, t_min)
        n = normalize(n_local @ self.nmat.T)
        return t, n

    def sample(self, target, rng):
        tgt = target @ self.inv[:3, :3].T + self.inv[:3, 3]
        v, n_local, p = self.shape.sample(tgt, rng)
        new_n = normalize(n_local @ self.nmat.T)
        ph = dot(n_local @ self.lin.T, new_n)
        base = self.scale / ph
        return v @ self.lin.T + self.m[:3, 3], new_n, p / base


class Sphere:
    """shape/sphere.rs:13-64: unit sphere at origin."""

    def intersect(self, o, d, t_min):
        a = dot(d, d)
        b = dot(o, d)  # half-b
        c = dot(o, o) - 1.0
        disc = b * b - a * c
        ok = disc >= 0
        sq = np.sqrt(np.maximum(disc, 0.0))
        t_minus = (-b - sq) / a
        t_plus = (-b + sq) / a
        t = np.where(t_minus >= t_min, t_minus, t_plus)
        t = np.where(ok & (t >= t_min), t, INF)
        p = o + t[..., None] * d
        return t, p  # normal of unit sphere = position

    def sample(self, target, rng):
        # Cosine-weighted hemisphere facing the target (sphere.rs:52-64)
        x, y = unit_disc(rng, target.shape[:-1])
        z = np.sqrt(np.maximum(1.0 - x * x - y * y, 0.0))
        n = normalize(target)
        nx = n[..., 0]
        use_x = np.abs(nx) > 1e-300
        n1 = np.where(
            use_x[..., None],
            np.stack([n[..., 1], -n[..., 0], np.zeros_like(nx)], -1),
            np.stack([np.zeros_like(nx), -n[..., 2], n[..., 1]], -1),
        )
        n1 = normalize(n1)
        n2 = np.cross(n1, n)
        p = x[..., None] * n1 + y[..., None] * n2 + z[..., None] * n
        return p, p, z / np.pi


class Plane:
    """shape/plane.rs:17-32: x . normal = value."""

    def __init__(self, normal, value):
        self.n = np.asarray(normal, np.float64)
        self.v = float(value)

    def intersect(self, o, d, t_min):
        cos = d @ self.n
        cos_safe = np.where(np.abs(cos) > 1e-300, cos, 1e-300)
        t = (self.v - o @ self.n) / cos_safe
        ok = (np.abs(cos) > 0) & (t >= t_min)
        t = np.where(ok, t, INF)
        # Normal flipped against the ray (plane.rs:27)
        n = np.where((cos < 0)[..., None], self.n, -self.n)
        return t, np.broadcast_to(n, o.shape).copy()


class Cube:
    """shape/cube.rs:20-72: unit cube slab method, entry/exit normals."""

    def intersect(self, o, d, t_min):
        d_safe = np.where(np.abs(d) > 1e-300, d, np.where(d < 0, -1e-300, 1e-300))
        t1 = (-0.5 - o) / d_safe
        t2 = (0.5 - o) / d_safe
        lo = np.minimum(t1, t2)
        hi = np.maximum(t1, t2)
        start = lo.max(-1)
        end = hi.min(-1)
        start_axis = lo.argmax(-1)
        end_axis = hi.argmin(-1)
        miss = (start > end) | (end < t_min)
        use_end = start < t_min
        t = np.where(use_end, end, start)
        t = np.where(miss | (t < t_min), INF, t)
        axis = np.where(use_end, end_axis, start_axis)
        d_axis = np.take_along_axis(d, axis[..., None], -1)[..., 0]
        sign = np.where(use_end, np.sign(d_axis), -np.sign(d_axis))
        n = np.zeros_like(o)
        np.put_along_axis(n, axis[..., None], sign[..., None], -1)
        return t, n


class Triangles:
    """shape/mesh.rs:49-98: world-space triangle soup, closest hit."""

    def __init__(self, verts, norms=None):
        self.v = np.asarray(verts, np.float64)  # (T,3,3)
        if norms is None:
            e1 = self.v[:, 1] - self.v[:, 0]
            e2 = self.v[:, 2] - self.v[:, 0]
            n = normalize(np.cross(e1, e2))
            norms = np.repeat(n[:, None, :], 3, 1)
        self.n = np.asarray(norms, np.float64)

    def intersect(self, o, d, t_min):
        v0, v1, v2 = self.v[:, 0], self.v[:, 1], self.v[:, 2]
        e1 = v1 - v0
        e2 = v2 - v0
        pn = normalize(np.cross(e1, e2))  # (T,3)
        cos = d @ pn.T  # (N,T)
        cos_safe = np.where(np.abs(cos) > 1e-300, cos, 1e-300)
        t = ((pn * v0).sum(-1)[None, :] - o @ pn.T) / cos_safe
        p = o[:, None, :] + t[..., None] * d[:, None, :]
        dd = p - v0[None]
        d00 = (e1 * e1).sum(-1)
        d01 = (e1 * e2).sum(-1)
        d11 = (e2 * e2).sum(-1)
        d20 = (dd * e1[None]).sum(-1)
        d21 = (dd * e2[None]).sum(-1)
        denom = d00 * d11 - d01 * d01
        v = (d11 * d20 - d01 * d21) / denom
        w = (d00 * d21 - d01 * d20) / denom
        u = 1.0 - v - w
        ok = (u >= 0) & (v >= 0) & (w >= 0) & (t >= t_min) & (np.abs(cos) > 0)
        t = np.where(ok, t, INF)
        best = t.argmin(1)
        rows = np.arange(o.shape[0])
        tb = t[rows, best]
        ub, vb, wb = u[rows, best], v[rows, best], w[rows, best]
        nb = self.n[best]
        n = normalize(
            ub[:, None] * nb[:, 0] + vb[:, None] * nb[:, 1] + wb[:, None] * nb[:, 2]
        )
        return tb, n

    def sample(self, target, rng):
        # Uniform triangle choice (kdtree.rs:138-143) x uniform point via
        # uv rejection == uniform barycentric fold (mesh.rs:84-98)
        T = self.v.shape[0]
        shape = target.shape[:-1]
        tri = rng.integers(0, T, shape)
        u = rng.random(shape)
        v = rng.random(shape)
        over = u + v > 1.0
        u = np.where(over, 1.0 - u, u)  # fold == rejection in distribution
        v = np.where(over, 1.0 - v, v)
        w = 1.0 - u - v
        tv = self.v[tri]
        tn = self.n[tri]
        point = u[..., None] * tv[..., 0, :] + v[..., None] * tv[..., 1, :] + w[..., None] * tv[..., 2, :]
        nrm = normalize(
            u[..., None] * tn[..., 0, :] + v[..., None] * tn[..., 1, :] + w[..., None] * tn[..., 2, :]
        )
        e1 = tv[..., 1, :] - tv[..., 0, :]
        e2 = tv[..., 2, :] - tv[..., 0, :]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        # KdTree::sample scales pdf by 1/n (kdtree.rs:138-143)
        return point, nrm, 1.0 / (area * T)


# ---------------------------------------------------------------------------
# Material (material.rs) — opaque branch only (sphere/cornell goldens)
# ---------------------------------------------------------------------------


class Material:
    def __init__(self, color, index=1.5, roughness=0.5, metallic=0.0, emittance=0.0,
                 transparent=False):
        self.color = np.asarray(color, np.float64)
        self.index = index
        self.roughness = roughness
        self.metallic = metallic
        self.emittance = emittance
        self.transparent = transparent

    @classmethod
    def diffuse(cls, color):
        return cls(color, 1.5, 1.0, 0.0, 0.0)

    @classmethod
    def specular(cls, color, roughness):
        return cls(color, 1.5, roughness, 0.0, 0.0)

    @classmethod
    def light(cls, color, emittance):
        return cls(color, 1.0, 1.0, 0.0, emittance)

    @classmethod
    def metallic(cls, color, roughness):
        return cls(color, 1.5, roughness, 1.0, 0.0)

    @classmethod
    def clear(cls, index, roughness):
        return cls(np.ones(3), index, roughness, 0.0, 0.0, True)

    @classmethod
    def transparent_colored(cls, color, index, roughness):
        return cls(color, index, roughness, 0.0, 0.0, True)

    def _f0(self):
        f0s = ((self.index - 1.0) / (self.index + 1.0)) ** 2
        return (1.0 - self.metallic) * np.full(3, f0s) + self.metallic * self.color

    def bsdf(self, n, wo, wi):
        """material.rs:125-215: same-side Cook-Torrance (+ Lambert if opaque,
        + TIR Fresnel override if transparent) and the Walter BTDF for
        cross-side transmission."""
        n_wi = dot(n, wi)
        n_wo = dot(n, wo)
        wi_out = n_wi >= 0  # is_sign_positive (measure-zero -0.0 ignored)
        wo_out = n_wo >= 0
        same = wi_out == wo_out
        m2 = self.roughness * self.roughness
        f0 = self._f0()
        with np.errstate(divide="ignore", invalid="ignore", over="ignore", under="ignore"):
            # --- same-side (reflection) branch, material.rs:135-172
            h = normalize(wi + wo)
            wo_h = dot(wo, h)
            n_h = dot(n, h)
            nh2 = n_h * n_h
            dterm = np.exp((nh2 - 1.0) / (m2 * nh2)) / (m2 * np.pi * nh2 * nh2)
            f = f0 + (1.0 - f0) * ((1.0 - wo_h) ** 5)[..., None]
            if self.transparent:
                # Total internal reflection (material.rs:146-149)
                tir = (~wi_out) & (
                    np.sqrt(np.maximum(1.0 - wo_h * wo_h, 0.0)) * self.index > 1.0
                )
                f = np.where(tir[..., None], 1.0, f)
            g = np.minimum(n_wi * n_h, n_wo * n_h)
            g = np.minimum(2.0 * g / wo_h, 1.0)
            spec = (dterm * g / (4.0 * n_wo * n_wi))[..., None] * f
            if self.transparent:
                same_val = spec
            else:
                same_val = spec + (1.0 - f) * self.color / np.pi

            if self.transparent:
                # --- cross-side (transmission) branch, material.rs:173-214
                eta_t = np.where(wo_out, self.index, 1.0 / self.index)
                ht = normalize(wi * eta_t[..., None] + wo)
                wi_ht = dot(wi, ht)
                wo_ht = dot(wo, ht)
                n_ht = dot(n, ht)
                nht2 = n_ht * n_ht
                dt = np.exp((nht2 - 1.0) / (m2 * nht2)) / (m2 * np.pi * nht2 * nht2)
                ft = f0 + (1.0 - f0) * ((1.0 - np.abs(wi_ht)) ** 5)[..., None]
                gt = np.minimum(np.abs(n_wi * n_ht), np.abs(n_wo * n_ht))
                gt = np.minimum(2.0 * gt / np.abs(wo_ht), 1.0)
                btdf = (
                    np.abs(wi_ht * wo_ht / (n_wi * n_wo))[..., None]
                    * dt[..., None]
                    * (1.0 - ft)
                    * gt[..., None]
                    / ((eta_t * wi_ht + wo_ht) ** 2)[..., None]
                ) * self.color
                out = np.where(same[..., None], same_val, btdf)
            else:
                # Opaque materials do not transmit (material.rs:130-133)
                out = np.where((wi_out & wo_out)[..., None], same_val, 0.0)
        return np.where(np.isfinite(out), out, 0.0)

    def sample_f(self, n, wo, rng):
        """material.rs:224-313: lobe mix, Beckmann PIT, Malley (opaque) or
        microfacet refraction (transparent), one-sample-MIS summed pdf.
        Returns (wi, pdf); TIR-invalid transmission samples get pdf 0 (the
        Rust returns None, terminating the path — identical effect)."""
        shape = n.shape[:-1]
        m2 = self.roughness * self.roughness
        f0 = ((self.index - 1.0) / (self.index + 1.0)) ** 2
        f = (1.0 - self.metallic) * f0 + self.metallic * self.color.mean()
        f = f * 0.8 + 0.2  # mix_scalar(f, 1, 0.2)
        eta_t = np.where(dot(wo, n) > 0.0, self.index, 1.0 / self.index)

        def beckmann():
            theta = np.arctan(np.sqrt(np.maximum(-m2 * np.log(rng.random(shape)), 0.0)))
            sin_t, cos_t = np.sin(theta), np.cos(theta)
            cx, cy = unit_circle(rng, shape)
            return local_to_world_apply(n, np.stack([cx * sin_t, cy * sin_t, cos_t], -1))

        def beckmann_pdf(h):
            cos_h = np.abs(dot(h, n))
            sin_h = np.sqrt(np.maximum(1.0 - cos_h * cos_h, 0.0))
            with np.errstate(divide="ignore", invalid="ignore", over="ignore", under="ignore"):
                p = (np.pi * m2 * cos_h**3) ** -1 * np.exp(-((sin_h / cos_h) ** 2) / m2)
            return p

        pick_spec = rng.random(shape) < f
        h = beckmann()
        wi_spec = -(wo - 2.0 * dot(wo, h)[..., None] * h)  # -reflect(wo, h)
        invalid = np.zeros(shape, bool)
        if not self.transparent:
            dx, dy = unit_disc(rng, shape)
            dz = np.sqrt(np.maximum(1.0 - dx * dx - dy * dy, 0.0))
            wi_other = local_to_world_apply(n, np.stack([dx, dy, dz], -1))
        else:
            # Microfacet refraction (material.rs:272-287)
            h2 = beckmann()
            cos_to = dot(h2, wo)
            wo_perp = wo - h2 * cos_to[..., None]
            wi_perp = -wo_perp / eta_t[..., None]
            sin2_ti = np.sum(wi_perp * wi_perp, -1)
            invalid = (~pick_spec) & (sin2_ti > 1.0)  # TIR -> None
            cos_ti = np.sqrt(np.maximum(1.0 - sin2_ti, 0.0))
            wi_other = -np.sign(cos_to)[..., None] * cos_ti[..., None] * h2 + wi_perp
        wi = np.where(pick_spec[..., None], wi_spec, wi_other)

        # Mixture pdf (material.rs:290-311)
        hsum = normalize(wi + wo)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore", under="ignore"):
            p = f * beckmann_pdf(hsum) / (4.0 * np.abs(dot(hsum, wo)))
        p = np.where(np.isfinite(p), p, 0.0)
        if not self.transparent:
            p = p + (1.0 - f) * np.maximum(dot(wi, n), 0.0) / np.pi
        else:
            crossed = (dot(wo, n) >= 0) != (dot(wi, n) >= 0)
            ht = normalize(wi * eta_t[..., None] + wo)
            with np.errstate(divide="ignore", invalid="ignore", over="ignore", under="ignore"):
                jac = np.abs(dot(ht, wo)) / (eta_t * dot(ht, wi) + dot(ht, wo)) ** 2
                pt = (1.0 - f) * beckmann_pdf(ht) * jac
            pt = np.where(np.isfinite(pt), pt, 0.0)
            p = p + np.where(crossed, pt, 0.0)
            p = np.where(invalid, 0.0, p)
        return wi, p


# ---------------------------------------------------------------------------
# Scene + estimator (renderer.rs:96-221, light.rs:23-46)
# ---------------------------------------------------------------------------


class ObjectEntry:
    def __init__(self, shape, material):
        self.shape = shape
        self.material = material


class RefScene:
    def __init__(self):
        self.objects = []  # ObjectEntry
        self.lights = []  # ("ambient", color) | ("point", color, pos) | ("object", shape, material)
        self.env = np.zeros(3)

    def closest_hit(self, o, d):
        """renderer.rs:206-221: linear scan with running min."""
        N = o.shape[0]
        t_best = np.full(N, INF)
        n_best = np.zeros((N, 3))
        m_best = np.zeros(N, np.int64)
        for mi, obj in enumerate(self.objects):
            t, n = obj.shape.intersect(o, d, EPSILON)
            take = t < t_best
            t_best = np.where(take, t, t_best)
            n_best = np.where(take[:, None], n, n_best)
            m_best = np.where(take, mi, m_best)
        return t_best, n_best, m_best

    def illuminate(self, light, pos, rng):
        """light.rs:23-46 -> (intensity, wi, dist)."""
        kind = light[0]
        if kind == "point":
            _, color, loc = light
            disp = loc - pos
            ln = np.linalg.norm(disp, axis=-1)
            return np.asarray(color) / (ln * ln)[:, None], disp / ln[:, None], ln
        if kind == "object":
            _, shape, mat = light
            v, n, p = shape.sample(pos, rng)
            disp = v - pos
            ln = np.linalg.norm(disp, axis=-1)
            cosine = np.maximum(-dot(disp, n), 0.0) / ln
            surface_area = np.maximum(cosine, 0.0) / (ln * ln)
            intensity = mat.color * mat.emittance * (surface_area / p)[:, None]
            return intensity, disp / ln[:, None], ln
        raise ValueError(kind)

    def sample_lights(self, mats, pos, n, wo, rng, found):
        """renderer.rs:177-204 (NEE with one shadow ray per light)."""
        color = np.zeros_like(pos)
        for light in self.lights:
            if light[0] == "ambient":
                for mi, obj in enumerate(self.objects):
                    sel = mats == mi
                    color[sel] += light[1] * obj.material.color
                continue
            intensity, wi, dist = self.illuminate(light, pos, rng)
            t_shadow, _, _ = self.closest_hit(pos, wi)
            visible = t_shadow > dist
            f = self.bsdf_all(mats, n, wo, wi)
            contrib = f * intensity * dot(wi, n)[:, None]
            color += np.where((visible & found)[:, None], contrib, 0.0)
        return np.where(found[:, None], color, 0.0)

    def bsdf_all(self, mats, n, wo, wi):
        out = np.zeros_like(n)
        for mi, obj in enumerate(self.objects):
            sel = mats == mi
            if sel.any():
                out[sel] = obj.material.bsdf(n[sel], wo[sel], wi[sel])
        return out

    def trace(self, o, d, depth, max_bounces, rng):
        """renderer.rs:145-174."""
        t, n, mats = self.closest_hit(o, d)
        found = np.isfinite(t)
        color = np.broadcast_to(self.env, o.shape).copy()
        if not found.any():
            return color
        pos = o + np.where(found, t, 0.0)[:, None] * d
        wo = -normalize(d)

        emitted = np.zeros_like(color)
        for mi, obj in enumerate(self.objects):
            sel = mats == mi
            emitted[sel] = obj.material.emittance * obj.material.color
        hit_color = emitted + self.sample_lights(mats, pos, n, wo, rng, found)

        if depth < max_bounces:
            wi = np.zeros_like(pos)
            pdf = np.zeros(o.shape[0])
            for mi, obj in enumerate(self.objects):
                sel = mats == mi
                if sel.any():
                    wi_m, p_m = obj.material.sample_f(n[sel], wo[sel], rng)
                    wi[sel] = wi_m
                    pdf[sel] = p_m
            ok = found & (pdf > 0) & np.isfinite(pdf)
            f = self.bsdf_all(mats, n, wo, wi)
            sub = self.trace(pos, wi, depth + 1, max_bounces, rng)
            indirect = f * sub * (np.abs(dot(wi, n)) / np.where(ok, pdf, 1.0))[:, None]
            indirect = np.minimum(indirect, FIREFLY_CLAMP)  # renderer.rs:165-167
            hit_color = hit_color + np.where(ok[:, None], indirect, 0.0)

        return np.where(found[:, None], hit_color, color)


def render(scene, eye, direction, up, fov, width, height, spp, max_bounces,
           seed=0, ev=0.0):
    """renderer.rs:117-142 + camera.rs:64-81 (no DoF), f64 throughout.
    Returns the mean linear-radiance image (H, W, 3)."""
    rng = np.random.default_rng(seed)
    eye = np.asarray(eye, np.float64)
    direction = normalize(np.asarray(direction, np.float64))
    up = np.asarray(up, np.float64)
    up = normalize(up - dot(up, direction) * direction)
    right = normalize(np.cross(direction, up))
    dscale = 1.0 / np.tan(fov / 2.0)

    dim = float(max(width, height))
    xs = (2.0 * np.arange(width) + 1.0 - width) / dim
    ys = (2.0 * (height - np.arange(height)) - 1.0 - height) / dim
    xg, yg = np.meshgrid(xs, ys)
    xg = xg.ravel()
    yg = yg.ravel()
    N = xg.shape[0]

    acc = np.zeros((N, 3))
    for s in range(spp):
        dx = rng.uniform(-1.0 / dim, 1.0 / dim, N)
        dy = rng.uniform(-1.0 / dim, 1.0 / dim, N)
        d = (
            dscale * direction
            + (xg + dx)[:, None] * right
            + (yg + dy)[:, None] * up
        )
        d = normalize(d)
        o = np.broadcast_to(eye, (N, 3)).copy()
        acc += scene.trace(o, d, 0, max_bounces, rng)
    img = acc / spp * (2.0 ** ev)
    return img.reshape(height, width, 3)
