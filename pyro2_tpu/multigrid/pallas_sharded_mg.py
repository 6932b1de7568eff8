"""Fused Pallas TPU kernels for the SHARDED (deep-halo) multigrid.

The sharded V-cycle (parallel/sharded_mg.py) already cuts the collective
count ~20x with deep-halo smoothing; this module moves the arithmetic of
each level visit into Pallas kernels so a multi-chip V-cycle also keeps
the single-chip fused-kernel win (multigrid/pallas_mg.py: 5.8x over the
jnp cycle at 512^2).  Per sharded level and per smoothing round, ONE
kernel runs all the round's red-black sweeps on the local deep frame in
VMEM -- with the same shrinking-validity masks and per-half-sweep
physical ghost refresh as the jnp deep smoother, so the result matches it
to f32 roundoff (and the serial schedule arithmetically, see
sharded_mg.py).  The final pre-smoothing round fuses the residual and the
factor-2 restriction (as iota-built matmuls on the MXU, the pallas_mg
trick); the replicated sub-crossover recursion reuses pallas_mg's fused
CORE kernel verbatim on the gathered global coarse problem.

Kernel count per V-cycle: 2-3 per sharded level + 1 core kernel -- on a
1x1 mesh (no seams) the structure collapses to exactly the serial fused
cycle's DOWN/UP/CORE shape.

Static per kernel: level geometry (frame extents, halo depth d, sweep
count), BC kinds, dx, dtype.  Dynamic (SMEM): alpha/beta and the 8 seam/
edge-ownership flags derived from the block's mesh coordinates -- so one
compiled kernel serves every device position SPMD-style.

Operator coverage: constant-coefficient (scalar alpha/beta via SMEM),
variable-coefficient, and general form (per-level coefficient-plane
stacks as VMEM inputs, laid out on the deep frame by the ShardedMG
subclasses' _coeff_layout) -- all with homogeneous standard BCs (the
eligibility surface of pallas_mg/pallas_gen_mg); anything else stays on
the jnp deep path.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyro2_tpu.multigrid import pallas_mg

__all__ = ["build_deep_smooth_kernel", "build_core_kernel",
           "build_core_kernel_general", "SUPPORTED_BCS"]

SUPPORTED_BCS = pallas_mg._SUPPORTED_BCS

_COMPILER_PARAMS = pallas_mg._COMPILER_PARAMS
_HI = pallas_mg._HI


def _frame_iotas(Fx, Fy):
    xi = jax.lax.broadcasted_iota(jnp.int32, (Fx, Fy), 0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (Fx, Fy), 1)
    return xi, yi


def _make_masks(bx, by, dpx, dpy):
    """Excess-distance grids (cells beyond the owned interior, per side)
    and the global red parity on the (bx+2*dpx, by+2*dpy) frame."""
    Fx, Fy = bx + 2 * dpx, by + 2 * dpy
    xi, yi = _frame_iotas(Fx, Fy)
    exl = jnp.maximum(dpx - xi, 0)
    exr = jnp.maximum(xi - (dpx + bx - 1), 0)
    eyl = jnp.maximum(dpy - yi, 0)
    eyr = jnp.maximum(yi - (dpy + by - 1), 0)
    red = ((xi - dpx) + (yi - dpy)) % 2 == 0
    return exl, exr, eyl, eyr, red


def _edge_plan(bc, px, py):
    """Static refresh plan: list of (axis, side, kind, flag_index, b_attr)
    for the edges that need a per-half-sweep ghost refresh.  Split
    periodic axes need none (the seam exchange IS the periodic fill)."""
    plan = []
    for axis, p, (lb, rb) in ((0, px, (bc.xlb, bc.xrb)),
                              (1, py, (bc.ylb, bc.yrb))):
        if lb == "periodic":
            if p == 1:
                plan.append((axis, 0, "periodic", None))
                plan.append((axis, 1, "periodic", None))
        else:
            # ownership flag slots 4..7: xl, xr, yl, yr
            plan.append((axis, 0, lb, 4 + 2 * axis))
            plan.append((axis, 1, rb, 4 + 2 * axis + 1))
    return plan


def build_deep_smooth_kernel(*, bx, by, dpx, dpy, d, n_sweeps, dx, dy,
                             bc, px, py, emit="v", smoother="rbgs",
                             ncoef=0, dtype=jnp.float32, interpret=False):
    """One smoothing round on the deep frame.

    smoother: "rbgs" (n_sweeps red-black sweeps, the reference-parity
    mode), "jacobi" (damped omega=0.8), or "chebyshev" (degree-n_sweeps
    polynomial acceleration) -- the in-kernel twins of the jnp deep
    smoothers (parallel/sharded_mg.py _deep_smooth).

    emit: "v" -> frame; "v_fc" -> (frame, restricted-residual ng=1 coarse
    frame); "v_r" -> (frame, full-frame residual, zero outside interior).

    ncoef selects the operator: 0 -> constant-coefficient (alpha - beta L,
    scalars via the ab SMEM input), 2 -> variable-coefficient (plane
    stack [eta_x, eta_y], edge-averaged, 1/dx^2-prescaled), 5 -> general
    (plane stack [alpha, beta_x, beta_y, gamma_x, gamma_y], gammas
    0.5/dx-prescaled).  Plane stacks arrive as an (ncoef, Fx, Fy) VMEM
    input laid out on the same deep frame as v/f; formulas mirror the
    jnp _deep_gs_update of the matching ShardedMG class term-for-term.

    Returns fn(flags_i32[8], ab[2], vd, fd) for ncoef=0, else
    fn(flags_i32[8], vd, fd, C).  flags: [seam_xl, seam_xr, seam_yl,
    seam_yr, own_xl, own_xr, own_yl, own_yr] as int32.
    """
    Fx, Fy = bx + 2 * dpx, by + 2 * dpy
    plan = _edge_plan(bc, px, py)

    def kernel(flags_ref, *refs):
        if ncoef == 0:
            ab_ref, v_ref, f_ref = refs[0], refs[1], refs[2]
            out_refs = refs[3:]
        else:
            v_ref, f_ref, c_ref = refs[0], refs[1], refs[2]
            out_refs = refs[3:]
        # masks are pure iota arithmetic -- built in-kernel so nothing is
        # captured from the enclosing trace
        exl, exr, eyl, eyr, red = _make_masks(bx, by, dpx, dpy)
        xi, yi = _frame_iotas(Fx, Fy)
        interior = (exl == 0) & (exr == 0) & (eyl == 0) & (eyr == 0)
        if ncoef == 0:
            alpha, beta = ab_ref[0], ab_ref[1]
            xc = beta / dx ** 2
            yc = beta / dy ** 2
            denom = alpha + 2.0 * xc + 2.0 * yc
        else:
            # loop-invariant operator planes hoisted OUT of the sweep
            # loops (Mosaic does not hoist rolls/sums out of fori_loop)
            C = c_ref[...]
            if ncoef == 2:
                cbx, cby = C[0], C[1]
                cbxp = jnp.roll(cbx, -1, 0)
                cbyp = jnp.roll(cby, -1, 1)
                wip, wim, wjp, wjm = cbxp, cbx, cbyp, cby
                cdenom = cbxp + cbx + cbyp + cby
            else:
                cal, cbx, cby, cgx, cgy = C[0], C[1], C[2], C[3], C[4]
                cbxp = jnp.roll(cbx, -1, 0)
                cbyp = jnp.roll(cby, -1, 1)
                wip, wim = cbxp + cgx, cbx - cgx
                wjp, wjm = cbyp + cgy, cby - cgy
                cdenom = cal - cbxp - cbx - cbyp - cby
        sxl, sxr, syl, syr = (flags_ref[0], flags_ref[1], flags_ref[2],
                              flags_ref[3])
        f = f_ref[...]

        def elig(lim):
            zero = jnp.asarray(0, jnp.int32)
            m = exl <= jnp.where(sxl != 0, lim, zero)
            m &= exr <= jnp.where(sxr != 0, lim, zero)
            m &= eyl <= jnp.where(syl != 0, lim, zero)
            m &= eyr <= jnp.where(syr != 0, lim, zero)
            return m

        def refresh(a):
            for axis, side, kind, fi in plan:
                b = bx if axis == 0 else by
                dp = dpx if axis == 0 else dpy
                ii = xi if axis == 0 else yi
                gidx = dp - 1 if side == 0 else dp + b
                m = ii == gidx
                if fi is not None:
                    m &= flags_ref[fi] != 0
                if kind == "periodic":
                    src = jnp.roll(a, -b if side == 0 else b, axis)
                elif kind in ("outflow", "neumann", "reflect-even"):
                    src = jnp.roll(a, -1 if side == 0 else 1, axis)
                else:  # dirichlet / reflect-odd, homogeneous
                    src = -jnp.roll(a, -1 if side == 0 else 1, axis)
                a = jnp.where(m, src, a)
            return a

        def half(v, m):
            vip = jnp.roll(v, -1, 0)
            vim = jnp.roll(v, 1, 0)
            vjp = jnp.roll(v, -1, 1)
            vjm = jnp.roll(v, 1, 1)
            if ncoef == 0:
                upd = (f + xc * (vip + vim) + yc * (vjp + vjm)) / denom
            elif ncoef == 2:
                upd = (-f + wip * vip + wim * vim +
                       wjp * vjp + wjm * vjm) / cdenom
            else:
                upd = (f - wip * vip - wim * vim -
                       wjp * vjp - wjm * vjm) / cdenom
            return upd if m is None else jnp.where(m, upd, v)

        # entry refresh: the caller exchanges seam halos only (phys=False);
        # physical ghosts are filled here, where they are cheap
        v0 = refresh(v_ref[...])
        if smoother == "rbgs":
            def sweep(s, v):
                lim = jnp.asarray(d, jnp.int32) - (2 * s + 1)
                v = refresh(half(v, elig(lim) & red))
                v = refresh(half(v, elig(lim - 1) & ~red))
                return v

            v = jax.lax.fori_loop(0, n_sweeps, sweep, v0)
        elif smoother == "jacobi":
            omega = jnp.asarray(0.8, dtype)

            def jstep(s, v):
                lim = jnp.asarray(d, jnp.int32) - (s + 1)
                upd = half(v, elig(lim))
                # half() already selected; express as damped move
                return refresh(jnp.where(elig(lim),
                                         v + omega * (upd - v), v))

            v = jax.lax.fori_loop(0, n_sweeps, jstep, v0)
        else:  # chebyshev (same constants as the jnp deep smoother)
            lmax, lmin = 2.0, 0.5
            theta = jnp.asarray((lmax + lmin) / 2.0, dtype)
            delta = jnp.asarray((lmax - lmin) / 2.0, dtype)
            sigma = theta / delta
            rho = 1.0 / sigma
            v = v0
            upd = half(v, None)
            lim0 = jnp.asarray(d - 1, jnp.int32)
            z = jnp.where(elig(lim0), upd - v, jnp.asarray(0.0, dtype))
            dk = z / theta
            v = refresh(jnp.where(elig(lim0), v + dk, v))
            for s in range(1, n_sweeps):
                rho_new = 1.0 / (2.0 * sigma - rho)
                lim = jnp.asarray(d - (s + 1), jnp.int32)
                upd = half(v, None)
                z = jnp.where(elig(lim), upd - v,
                              jnp.asarray(0.0, dtype))
                dk = rho_new * rho * dk + (2.0 * rho_new / delta) * z
                v = refresh(jnp.where(elig(lim), v + dk, v))
                rho = rho_new
        out_refs[0][...] = v

        if emit != "v":
            vip = jnp.roll(v, -1, 0)
            vim = jnp.roll(v, 1, 0)
            vjp = jnp.roll(v, -1, 1)
            vjm = jnp.roll(v, 1, 1)
            if ncoef == 0:
                lap = (vip + vim + vjp + vjm - 4.0 * v) / dx ** 2
                r_full = f - alpha * v + beta * lap
            else:
                L = (cbxp * (vip - v) - cbx * (v - vim) +
                     cbyp * (vjp - v) - cby * (v - vjm))
                if ncoef == 5:
                    L = (cal * v + L +
                         cgx * (vip - vim) + cgy * (vjp - vjm))
                r_full = f - L
            r = jnp.where(interior, r_full, jnp.asarray(0.0, dtype))
            if emit == "v_r":
                out_refs[1][...] = r
            else:
                # factor-2 conservative restrict onto the ng=1 coarse
                # frame via offset-aware iota matmuls (runs on the MXU)
                qcx, qcy = bx // 2 + 2, by // 2 + 2

                def rmat(qc, F, dp, b):
                    ri = jax.lax.broadcasted_iota(jnp.int32, (qc, F), 0)
                    ci = jax.lax.broadcasted_iota(jnp.int32, (qc, F), 1)
                    ok = (ri >= 1) & (ri <= qc - 2)
                    hit = ((ci == dp + 2 * (ri - 1)) |
                           (ci == dp + 2 * (ri - 1) + 1)) & ok
                    return jnp.where(hit, 0.5, 0.0).astype(dtype)

                Rx = rmat(qcx, Fx, dpx, bx)
                Ry = rmat(qcy, Fy, dpy, by)
                out_refs[1][...] = jnp.matmul(
                    Rx, jnp.matmul(r, Ry.T, precision=_HI), precision=_HI)

    # kernels run inside shard_map over ("x", "y"): outputs are
    # device-varying, which check_vma requires declared explicitly
    vma = frozenset({"x", "y"})
    if emit == "v":
        out_shape = [jax.ShapeDtypeStruct((Fx, Fy), dtype, vma=vma)]
    elif emit == "v_r":
        out_shape = [jax.ShapeDtypeStruct((Fx, Fy), dtype, vma=vma)] * 2
    else:
        out_shape = [jax.ShapeDtypeStruct((Fx, Fy), dtype, vma=vma),
                     jax.ShapeDtypeStruct((bx // 2 + 2, by // 2 + 2),
                                          dtype, vma=vma)]

    if ncoef == 0:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in out_shape],
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)


def build_correct_kernel(*, bx, by, dtype, interpret=False):
    """v + prolong(vc) on the interior: the coarse-grid correction as
    iota-built MXU matmuls (pallas_mg's _prolong_mm on local ng=1
    frames).  The jnp prolong_array's strided interleave lowers to
    ~1.3 ms of scatter traffic at 512^2 on TPU -- this kernel replaces
    it at matmul speed.  fn(v_std, vc_std) -> corrected v_std."""
    qx_, qy_ = bx + 2, by + 2
    qcx, qcy = bx // 2 + 2, by // 2 + 2

    def kernel(v_ref, vc_ref, out_ref):
        vc = vc_ref[...]

        def emat(qf, qc):
            ri = jax.lax.broadcasted_iota(jnp.int32, (qf, qc), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (qf, qc), 1)
            ok = (ci >= 1) & (ci <= qc - 2)
            lo = (ri == 2 * ci - 1) & ok
            hi = (ri == 2 * ci) & ok
            E = jnp.where(lo | hi, 1.0, 0.0).astype(dtype)
            S = jnp.where(lo, -0.25,
                          jnp.where(hi, 0.25, 0.0)).astype(dtype)
            return E, S

        Ex, Sx = emat(qx_, qcx)
        Ey, Sy = emat(qy_, qcy)
        mx = 0.5 * (jnp.roll(vc, -1, 0) - jnp.roll(vc, 1, 0))
        my = 0.5 * (jnp.roll(vc, -1, 1) - jnp.roll(vc, 1, 1))
        e = (jnp.matmul(Ex, jnp.matmul(vc, Ey.T, precision=_HI),
                        precision=_HI) +
             jnp.matmul(Sx, jnp.matmul(mx, Ey.T, precision=_HI),
                        precision=_HI) +
             jnp.matmul(Ex, jnp.matmul(my, Sy.T, precision=_HI),
                        precision=_HI))
        xi, yi = _frame_iotas(qx_, qy_)
        interior = ((xi >= 1) & (xi <= qx_ - 2) &
                    (yi >= 1) & (yi <= qy_ - 2))
        v = v_ref[...]
        out_ref[...] = jnp.where(interior, v + e, v)

    vma = frozenset({"x", "y"})
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((qx_, qy_), dtype, vma=vma)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)


def build_core_kernel(serial_mg, top_level, dtype, interpret=False):
    """pallas_mg's fused-core kernel for the replicated sub-crossover
    recursion: the complete serial V-cycle for levels 0..top_level in one
    VMEM-resident kernel.  fn(ab[2], v, f) -> v."""
    bc = serial_mg.bc
    bcs = (bc.xlb, bc.xrb, bc.ylb, bc.yrb)
    nlevels = serial_mg.nlevels
    dx_fine = serial_mg.soln_grid.dx

    def dx_of(level):
        return dx_fine * (2 ** (nlevels - 1 - level))

    call = pallas_mg._make_core_kernel(
        top_level, dx_of, serial_mg.nsmooth, serial_mg.nsmooth_bottom,
        bcs, want_r=False, dtype=dtype, interpret=interpret,
        vma=frozenset({"x", "y"}))

    def core(ab, v, f):
        return call(ab, v, f)[0]

    return core


def build_core_kernel_general(serial_mg, top_level, ncoef, dtype,
                              interpret=False):
    """The coefficient-operator fused core (pallas_gen_mg) for the
    replicated sub-crossover recursion.  fn(v, f, Cs) -> v where Cs is
    the tuple of per-level (ncoef, q_k, q_k) coefficient stacks for
    levels 0..top_level (replicated)."""
    from pyro2_tpu.multigrid import pallas_gen_mg

    bc = serial_mg.bc
    bcs = (bc.xlb, bc.xrb, bc.ylb, bc.yrb)

    call = pallas_gen_mg._make_core_kernel_g(
        top_level, serial_mg.nsmooth, serial_mg.nsmooth_bottom, bcs,
        want_r=False, ncoef=ncoef, dtype=dtype, interpret=interpret,
        vma=frozenset({"x", "y"}))

    def core(v, f, Cs):
        return call(v, f, *Cs)[0]

    return core
