"""Particle-system ODE integration (RK4) for physics-driven animation.

TPU-native counterpart of /root/reference/src/ode/*.rs. The reference stores
`Vec<DVec3>` with operator overloads (particle_state.rs:5-55) and integrates
with a scalar RK4 loop (particle_system.rs:10-24); here `ParticleState` is a
pytree of (N, 3) arrays, time derivatives are fully vectorized (the O(n^2)
pairwise forces are one broadcast), and the RK4 stepping runs under
`lax.scan`, so a whole trajectory jits into a single XLA program.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "ParticleState",
    "ParticleSystem",
    "SimpleCircleSystem",
    "SolidGravitySystem",
    "MarblesSystem",
    "monomial_closest_point",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleState:
    """Positions + velocities of N particles (particle_state.rs:5-10)."""

    pos: jnp.ndarray  # (N, 3)
    vel: jnp.ndarray  # (N, 3)

    @staticmethod
    def create(pos, vel=None) -> "ParticleState":
        pos = jnp.asarray(pos, jnp.float32)
        if vel is None:
            vel = jnp.zeros_like(pos)
        return ParticleState(pos, jnp.asarray(vel, jnp.float32))

    def __add__(self, other: "ParticleState") -> "ParticleState":
        return ParticleState(self.pos + other.pos, self.vel + other.vel)

    def __mul__(self, s) -> "ParticleState":
        return ParticleState(self.pos * s, self.vel * s)

    __rmul__ = __mul__

    def __truediv__(self, s) -> "ParticleState":
        return ParticleState(self.pos / s, self.vel / s)


class ParticleSystem:
    """A system of physical laws (particle_system.rs:5-25)."""

    def time_derivative(self, state: ParticleState) -> ParticleState:
        raise NotImplementedError

    def rk4_step(self, state: ParticleState, step) -> ParticleState:
        k1 = self.time_derivative(state)
        k2 = self.time_derivative(state + k1 * (step / 2.0))
        k3 = self.time_derivative(state + k2 * (step / 2.0))
        k4 = self.time_derivative(state + k3 * step)
        return state + (k1 + k2 * 2.0 + k3 * 2.0 + k4) * (step / 6.0)

    def rk4_integrate(self, state: ParticleState, time: float, step: float) -> ParticleState:
        """Integrate for `time` with fixed `step` (+ one remainder step),
        parity with particle_system.rs:12-24, under lax.scan."""
        n_steps = int(np.floor(time / step - 1e-12))

        def body(s, _):
            return self.rk4_step(s, step), None

        if n_steps > 0:
            state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return self.rk4_step(state, time - n_steps * step)


class SimpleCircleSystem(ParticleSystem):
    """dp/dt = (-y, x, 0): circular motion, used by the rk4 unit test
    (particle_system.rs:27-40)."""

    def time_derivative(self, state: ParticleState) -> ParticleState:
        x, y, z = state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]
        dpos = jnp.stack([-y, x, jnp.zeros_like(z)], axis=-1)
        return ParticleState(dpos, jnp.zeros_like(state.vel))


def _pairwise(pos):
    """diff[i, j] = pos_i - pos_j, plus distances with a safe diagonal."""
    diff = pos[:, None, :] - pos[None, :, :]  # (N,N,3)
    dist = jnp.linalg.norm(diff, axis=-1)
    n = pos.shape[0]
    eye = jnp.eye(n, dtype=bool)
    dist_safe = jnp.where(eye | (dist < 1e-12), 1.0, dist)
    dirs = diff / dist_safe[..., None]
    return diff, dist, dist_safe, dirs, eye


class SolidGravitySystem(ParticleSystem):
    """Pairwise attraction len^-2 - 1e-4 len^-5 (particle_system.rs:43-63)."""

    def time_derivative(self, state: ParticleState) -> ParticleState:
        _, dist, dist_safe, dirs, eye = _pairwise(state.pos)
        mag = dist_safe**-2 - 1e-4 * dist_safe**-5
        mag = jnp.where(eye, 0.0, mag)
        # For the pair (i, j): acc_i -= dir_ij * mag (attraction toward j)
        acc = -jnp.sum(dirs * mag[..., None], axis=1)
        return ParticleState(state.vel, acc)


def monomial_closest_point(point, height: float, resolution: int = 201):
    """Closest point on y = height*(x^2+z^2)^2 via radial grid search,
    parity with monomial_surface.rs:127-150 (the 201-point variant).
    `point`: (..., 3). Fully vectorized."""
    px = jnp.hypot(point[..., 0], point[..., 2])
    py = point[..., 1]
    xs = jnp.linspace(-1.0, 1.0, resolution)  # (R,)
    ys = height * xs**4
    d2 = (px[..., None] - xs) ** 2 + (py[..., None] - ys) ** 2  # (..., R)
    best = jnp.argmin(d2, axis=-1)
    xf = xs[best]
    xz_norm = jnp.hypot(point[..., 0], point[..., 2])
    xz_safe = jnp.where(xz_norm > 1e-12, xz_norm, 1.0)
    dir_x = point[..., 0] / xz_safe
    dir_z = point[..., 2] / xz_safe
    cx = xf * dir_x
    cz = xf * dir_z
    cy = height * (cx**2 + cz**2) ** 2
    closest = jnp.stack([cx, cy, cz], axis=-1)
    # Degenerate near-zero input: return the point itself
    # (monomial_surface.rs:129-132)
    tiny = (jnp.linalg.norm(point, axis=-1) < 1e-12)[..., None]
    return jnp.where(tiny, point, closest)


class MarblesSystem(ParticleSystem):
    """Marbles in a monomial glass on a table (particle_system.rs:66-129)."""

    def __init__(self, radius: float):
        self.radius = float(radius)

    def time_derivative(self, state: ParticleState) -> ParticleState:
        r = self.radius
        pos, vel = state.pos, state.vel
        n = pos.shape[0]
        acc = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], pos.dtype), pos.shape)

        # Sphere-sphere contact springs + per-contact damping
        _, dist, dist_safe, dirs, eye = _pairwise(pos)
        contact = (~eye) & (dist < 2.0 * r)
        spring = 5.0 * ((2.0 * r - dist) / r)
        # For pair (i, j): acc_i += dir_ij * spring (repulsion), and each
        # contact also damps that particle's velocity by 0.5 * vel
        pair_force = jnp.where(contact[..., None], dirs * spring[..., None], 0.0)
        acc = acc + jnp.sum(pair_force, axis=1)
        contact_count = jnp.sum(contact, axis=1).astype(pos.dtype)
        acc = acc - vel * 0.5 * contact_count[:, None]

        # Glass surface contact (height=2 monomial, particle_system.rs:88-104)
        closest = monomial_closest_point(pos, 2.0)
        vec = pos - closest
        vlen = jnp.linalg.norm(vec, axis=-1)
        normal = vec / jnp.maximum(vlen, 1e-12)[:, None]
        ratio = (r - vlen) / r
        nvel = jnp.sum(vel * normal, axis=-1)
        surf_acc = jnp.where(
            ((-0.1 < ratio) & (ratio < 0.0))[:, None],
            -30.0 * normal * (nvel**3)[:, None],
            0.0,
        ) + jnp.where((ratio >= 0.0)[:, None], 100.0 * normal * ratio[:, None], 0.0)
        acc = acc + surf_acc

        # Table contact (particle_system.rs:106-122), only for marbles not
        # on the glass (|pos| > 0.1)
        t_normal = jnp.asarray([0.0, 1.0, 0.0], pos.dtype)
        t_ratio = ((r - 0.06) - pos[:, 1]) / r
        t_nvel = vel[:, 1]
        off_glass = jnp.linalg.norm(pos, axis=-1) > 0.1
        t_acc = jnp.where(
            (off_glass & (-0.1 < t_ratio) & (t_ratio < 0.0))[:, None],
            -20.0 * t_normal[None, :] * t_nvel[:, None],
            0.0,
        ) + jnp.where(
            (off_glass & (t_ratio >= 0.0))[:, None],
            300000.0 * t_normal[None, :] * t_ratio[:, None],
            0.0,
        )
        acc = acc + t_acc

        # Air resistance (particle_system.rs:123-126)
        acc = acc - vel / 5.0
        return ParticleState(vel, acc)
