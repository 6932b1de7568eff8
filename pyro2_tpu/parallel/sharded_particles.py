"""Multi-chip Lagrangian tracer particles (VERDICT r03 item 4).

Particle positions are O(n_particles) global data, so they stay
REPLICATED across the device mesh; only the velocity interpolation needs
the block-partitioned grid.  Each particle's bilinear stencil (base cell
+ one neighbor per axis) lies entirely inside exactly one block's padded
frame -- the block owning the base cell, whose 1-deep halo covers
seam-straddling stencils -- so:

  * every device evaluates the reference bilinear formula
    (/root/reference/pyro/particles/particles.py:213-257; vectorized in
    particles/particles.py) for the particles it owns, on its local
    padded velocity block,
  * a `psum` over the mesh (one nonzero contribution per particle: the
    owner's; adding zeros is exact) replicates the velocities,
  * the midpoint (RK2) advance and per-edge boundary enforcement run
    identically (replicated) on every device.

Owned-gather + psum makes the sharded advance BITWISE the serial one:
the owner's gathered cells carry the same values as the serial global
window (halo cells are neighbor-interior values, domain ghosts the same
physical fills), and the arithmetic is the identical expression.
"""

import jax
import jax.numpy as jnp

__all__ = ["make_sharded_particle_advance"]


def make_sharded_particle_advance(particles, local_grid, px, py):
    """A pure advance(pos, active, u_blk, v_blk, dt) for shard_map
    bodies over mesh axes ("x", "y").

    particles: a (serial, global-grid) Particles instance supplying the
    geometry, BCs and boundary enforcement.  u_blk/v_blk: the local
    padded (bx+2ng, by+2ng) velocity blocks with halo/ghost ring filled
    (1 ring is enough; deeper padding is simply indexed past).
    """
    gg = particles.sim_data.grid
    lg = local_grid
    bx, by = lg.nx, lg.ny
    ng = lg.ng

    def _psum2(x):
        return jax.lax.psum(jax.lax.psum(x, "x"), "y")

    def interp(u_blk, v_blk, pos):
        # identical index/fraction arithmetic to Particles._interp
        xf = (pos[:, 0] - gg.xmin) / gg.dx - 0.5
        yf = (pos[:, 1] - gg.ymin) / gg.dy - 0.5
        x_frac = jnp.mod(xf, 1.0)
        y_frac = jnp.mod(yf, 1.0)
        xi = jnp.trunc(xf).astype(jnp.int32) + 1
        yi = jnp.trunc(yf).astype(jnp.int32) + 1
        # serial clip: window indices in [0, nx] / [0, ny]
        xi = jnp.clip(xi, 0, gg.nx)
        yi = jnp.clip(yi, 0, gg.ny)

        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        own = (jnp.clip(xi // bx, 0, px - 1) == ix) & \
              (jnp.clip(yi // by, 0, py - 1) == iy)
        # local padded-frame index of the window cell (clip keeps
        # non-owned gathers in bounds; their values are masked out)
        lxi = jnp.clip(xi - ix * bx, 0, bx + 1) + (ng - 1)
        lyi = jnp.clip(yi - iy * by, 0, by + 1) + (ng - 1)

        def bilin(f):
            val = ((1 - x_frac) * (1 - y_frac) * f[lxi, lyi] +
                   x_frac * (1 - y_frac) * f[lxi + 1, lyi] +
                   (1 - x_frac) * y_frac * f[lxi, lyi + 1] +
                   x_frac * y_frac * f[lxi + 1, lyi + 1])
            return _psum2(jnp.where(own, val, jnp.zeros_like(val)))

        return bilin(u_blk), bilin(v_blk)

    def advance(pos, active, u_blk, v_blk, dt):
        u0, v0 = interp(u_blk, v_blk, pos)
        mid = pos + 0.5 * dt * jnp.stack([u0, v0], axis=1)
        u1, v1 = interp(u_blk, v_blk, mid)
        new_pos = pos + dt * jnp.stack([u1, v1], axis=1)
        pos = jnp.where(active[:, None], new_pos, pos)
        return particles._enforce_pure(pos, active)

    return advance
