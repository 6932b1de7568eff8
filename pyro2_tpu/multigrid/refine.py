"""Iterative refinement for deep-tolerance f32 multigrid solves.

The TPU runs the fused MG cycle in f32, whose direct solve stalls at a
relative residual ~1e-4 at 512^2 (DESIGN.md section 8): computing
r = f - A x in f32 loses the answer to cancellation once x is accurate to
~eps_f32.  Classic iterative refinement fixes this when the RESIDUAL is
computed in higher precision.  f64 on this TPU is software-emulated
(~100x slower per op), so the residual here uses double-f32 (compensated)
arithmetic instead: the solution is carried as an unevaluated f32 pair
x = hi + lo (~48-bit mantissa), and r = f - alpha x + beta L x is
evaluated with error-free transformations (Knuth TwoSum; Dekker TwoProd,
no FMA required), giving a residual accurate to ~1e-14 relative while
every operation stays native-f32 speed.  The correction solve
A e = round_f32(r) reuses the (fused) V-cycle unchanged -- e only needs a
few digits.  2-3 refinement passes reach rtol 1e-10 where the direct f32
solve stalls 6 orders higher.

Reference tolerance context: the serial reference solves to rtol 1e-11+
in f64 (/root/reference/pyro/pyro_sim.py:353 uses rtol=1e-12 for
regression); this module is what lets the f32 TPU path honor those
tolerances.  Homogeneous standard BCs, constant-coefficient operator
(the fused kernel's eligibility surface).
"""

import jax
import jax.numpy as jnp

from pyro2_tpu.mesh.indexer import ai, fill_ghost

__all__ = ["two_sum", "two_prod", "solve_ir", "solve_ir_sharded"]

_SPLIT = 4097.0  # 2^12 + 1 (Dekker split constant for f32's 24-bit mantissa)


def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (all f32)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    c = jnp.asarray(_SPLIT, a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (no FMA needed)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _c_pair(value, dtype):
    """A python-f64 coefficient as a (hi, lo) working-precision pair
    (computed host-side with numpy so it is concrete under jit)."""
    import numpy as np
    npdt = np.dtype(jnp.dtype(dtype).name)
    hi = npdt.type(value)
    lo = npdt.type(value - float(hi))
    return jnp.asarray(hi), jnp.asarray(lo)


def _residual_df32(g, f, xh, xl, coeffs):
    """r = f - alpha x + beta L x with x = xh + xl, evaluated with
    compensated (double-f32) accumulation on the interior.

    coeffs: (c_diag, c_x, c_y) python floats -- the operator's diagonal
    (-alpha - 2 beta/dx^2 - 2 beta/dy^2) and neighbor (beta/dx^2,
    beta/dy^2) weights, so r = f + c_diag*xc + c_x*(xW+xE) + c_y*(xS+xN).
    Returns the f32-folded residual (zero ghosts).
    """
    dt = f.dtype
    fh = ai(f, g)
    vh = ai(xh, g)
    vl = ai(xl, g)

    terms = []
    c_diag, c_x, c_y = coeffs
    for c, wins in ((c_diag, [(vh.v(), vl.v())]),
                    (c_x, [(vh.ip(-1), vl.ip(-1)), (vh.ip(1), vl.ip(1))]),
                    (c_y, [(vh.jp(-1), vl.jp(-1)), (vh.jp(1), vl.jp(1))])):
        ch, cl = _c_pair(c, dt)
        for wh, wl in wins:
            terms.append((ch, cl, wh, wl))

    # compensated sum (Ogita-Rump-Oishi Dot2): s carries the leading
    # part, e the accumulated roundoff
    s = fh.v()
    e = jnp.zeros_like(s)
    for ch, cl, wh, wl in terms:
        p, pe = two_prod(ch, wh)
        s, se = two_sum(s, p)
        e = e + se + pe + ch * wl + cl * wh
    r_v = s + e
    r = jnp.zeros_like(f)
    return r.at[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].set(r_v)


def solve_ir(mg, rtol=1.e-10, max_iter=20, inner_rtol=1.e-5):
    """Deep-tolerance solve on a CellCenterMG2d via iterative refinement.

    Drives mg's own (fused, f32) cycle for each correction solve and
    accumulates the solution in double-f32.  Overwrites mg.v[-1] with the
    hi part (ghosts filled); returns (residual_error, num_refinements).
    The low-order part is left on mg.v_lo for callers needing the full
    ~48-bit solution.
    """
    if not mg.initialized_rhs:
        raise ValueError("RHS not initialized")
    if type(mg).__name__ not in ("CellCenterMG2d",):
        raise ValueError("iterative refinement supports the constant-"
                         "coefficient CellCenterMG2d")
    for bc_l in mg.bc_v:
        for edge in ("xlb", "xrb", "ylb", "yrb"):
            if getattr(bc_l, edge) not in ("outflow", "neumann",
                                           "dirichlet", "reflect-odd",
                                           "reflect-even", "periodic"):
                raise ValueError("refinement requires standard BCs")
        if any(v is not None for v in (bc_l.xl_value, bc_l.xr_value,
                                       bc_l.yl_value, bc_l.yr_value)):
            raise ValueError("refinement requires homogeneous BCs")

    g = mg.soln_grid
    f = mg.f[-1]
    dt = f.dtype
    alpha, beta = float(mg.alpha), float(mg.beta)
    c_x = beta / g.dx ** 2
    c_y = beta / g.dy ** 2
    coeffs = (-alpha - 2.0 * c_x - 2.0 * c_y, c_x, c_y)
    bc = mg.bc_v[-1]

    @jax.jit
    def refine_residual(xh, xl):
        # homogeneous standard ghost fills are linear: filling hi and lo
        # separately is exact
        xh = fill_ghost(xh, g, bc)
        xl = fill_ghost(xl, g, bc)
        r = _residual_df32(g, f, xh, xl, coeffs)
        rnorm = jnp.sqrt(g.dx * g.dy * jnp.sum(
            r[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1] ** 2))
        return r, rnorm

    @jax.jit
    def accumulate(xh, xl, e):
        # x <- x + e in double-f32 (TwoSum renormalization)
        s, err = two_sum(xh, e)
        lo = xl + err
        return two_sum(s, lo)

    orig_source_norm = mg.source_norm
    fnorm = mg.source_norm if mg.source_norm != 0.0 else 1.0
    xh = jnp.zeros_like(f)
    xl = jnp.zeros_like(f)

    res = None
    n_ref = 0
    prev = float("inf")
    for n_ref in range(1, max_iter + 1):
        r, rnorm = refine_residual(xh, xl)
        res = float(rnorm) / fnorm
        if res < rtol or res > 0.7 * prev:
            # converged, or at the double-f32 floor
            break
        prev = res
        mg.init_zeros()
        mg.init_RHS(r)
        mg.solve(rtol=inner_rtol)
        xh, xl = accumulate(xh, xl, mg.v[-1])

    mg.f = mg.f[:-1] + [f]
    mg.source_norm = orig_source_norm
    mg.v[-1] = mg._fill_v(mg.nlevels - 1, xh)
    mg.v_lo = xl
    mg.residual_error = res
    mg.num_cycles = n_ref
    return res, n_ref


def solve_ir_sharded(smg, rtol=1.e-10, max_iter=20, inner_rtol=1.e-5):
    """Deep-tolerance solve on a ShardedMG via iterative refinement.

    The multi-chip twin of solve_ir: the double-f32 solution pair lives
    block-sharded; the compensated residual runs per block behind a halo
    exchange (ghost fills are linear for the homogeneous standard BCs,
    so filling hi and lo separately is exact -- seam ghosts are plain
    copies), with psum'd norms; each correction solve reuses the sharded
    (optionally fused-Pallas) V-cycle unchanged.  Overwrites smg.v_int;
    returns (residual_error, num_refinements).
    """
    import jax

    from jax.sharding import PartitionSpec as P
    from pyro2_tpu.parallel.mesh_comm import halo_exchange

    if not smg.initialized_rhs:
        raise ValueError("RHS not initialized")
    if type(smg).__name__ != "ShardedMG":
        raise ValueError("sharded refinement supports the constant-"
                         "coefficient ShardedMG")

    g = smg.soln_grid
    lg = smg.local_grids[smg.nlevels - 1]
    f_int = smg.f_int
    dt = f_int.dtype
    alpha, beta = float(smg.serial.alpha), float(smg.serial.beta)
    c_x = beta / g.dx ** 2
    c_y = beta / g.dy ** 2
    coeffs = (-alpha - 2.0 * c_x - 2.0 * c_y, c_x, c_y)
    bc = smg.bc
    px, py = smg.px, smg.py

    def res_body(f_i, xh_i, xl_i):
        xh = halo_exchange(jnp.pad(xh_i, 1), lg, bc, px, py)
        xl = halo_exchange(jnp.pad(xl_i, 1), lg, bc, px, py)
        f = jnp.pad(f_i, 1)
        r = _residual_df32(lg, f, xh, xl, coeffs)
        r_i = r[1:-1, 1:-1]
        ss = jax.lax.psum(jax.lax.psum(jnp.sum(r_i ** 2), "x"), "y")
        return r_i, jnp.sqrt(g.dx * g.dy * ss)

    spec = P("x", "y")
    refine_residual = jax.jit(jax.shard_map(
        res_body, mesh=smg.mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P()), check_vma=not smg.use_pallas))

    @jax.jit
    def accumulate(xh, xl, e):
        s, err = two_sum(xh, e)
        lo = xl + err
        return two_sum(s, lo)

    orig_source_norm = smg.source_norm
    fnorm = smg.source_norm if smg.source_norm != 0.0 else 1.0
    xh = jnp.zeros_like(f_int)
    xl = jnp.zeros_like(f_int)

    res = None
    n_ref = 0
    prev = float("inf")
    for n_ref in range(1, max_iter + 1):
        r, rnorm = refine_residual(f_int, xh, xl)
        res = float(rnorm) / fnorm
        if res < rtol or res > 0.7 * prev:
            break
        prev = res
        smg.init_zeros()
        smg.init_RHS(r)
        smg.solve(rtol=inner_rtol)
        xh, xl = accumulate(xh, xl, smg.v_int)

    smg.f_int = f_int
    smg.source_norm = orig_source_norm
    smg.v_int = xh
    smg.v_lo = xl
    smg.residual_error = res
    smg.num_cycles = n_ref
    return res, n_ref
