"""Fused Pallas TPU V-cycle for the variable-coefficient / general MG.

The constant-coefficient fused cycle (pallas_mg.py) is 25x faster than the
jnp cycle at 512^2 because the whole level hierarchy stays in VMEM.  This
module extends the same DOWN/UP/CORE kernel structure to the two
coefficient operators the reference defines:

* VarCoeffCCMG2d    div( eta grad(phi) ) = f
  (/root/reference/pyro/multigrid/variable_coeff_MG.py:103-213)
* GeneralMG2d       alpha phi + div(beta grad phi) + gamma.grad(phi) = f
  (/root/reference/pyro/multigrid/general_MG.py:107-242)

The per-level coefficient planes (cell-centered alpha/gamma, edge-averaged
eta/beta pre-scaled by 1/dx^2 -- the EdgeCoeffs hierarchy built once at MG
construction) enter each kernel as full-frame VMEM inputs alongside v and
f: one (ncoef, q, q) stack per level, where ncoef = 2 for the vc operator
(eta_x, eta_y) and 5 for the general one (alpha, beta_x, beta_y and the
0.5/dx-prescaled gamma_x, gamma_y).  The red-black smoother and residual
are the full-frame (roll + interior-mask) twins of the windowed jnp
operators, term-ordered identically so selected cells agree to roundoff;
restrict/prolong are operator-independent and reuse pallas_mg's iota-built
MXU matmuls.

Coefficient planes flow through the traced `params` pytree (exactly the
MG classes' `_params()` contract), so one compiled cycle serves every
instance of the same static configuration -- the production case: lm_atm
constructs a fresh VarCoeffCCMG2d for each of its 3 projections per step.

Levels above pallas_mg.WHOLE_MAX (512) run as ROW-BANDED kernels that
DMA the coefficient-plane stack per band alongside v/f, extending
coverage to 1024-2048^2 (12x the jnp cycle measured at 1024^2).

Eligibility (else `Ineligible` -> transparent jnp fallback): exact
VarCoeffCCMG2d / GeneralMG2d type, square power-of-2 grid with ng=1,
nx <= pallas_mg.NX_MAX, homogeneous standard BCs on every edge
(row-periodic BCs cannot band, as in the constant-coefficient tier).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyro2_tpu.multigrid import pallas_mg
from pyro2_tpu.multigrid.pallas_mg import (
    Ineligible, _bc_kinds, _fill_ghost_band, _fill_ghost_ff, _interior,
    _pad2, _prolong_band, _prolong_mm, _restrict_band, _restrict_mm,
    _round8, _round128, _band_geometry, _vmem_specs, _COMPILER_PARAMS)

__all__ = ["build_fused_cycle_general"]


# ---------------------------------------------------------------------------
# in-kernel operator blocks (full-frame (q, q) arrays incl. 1 ghost)
# ---------------------------------------------------------------------------

def _edge_shifts(C, flavor):
    """The +1-face views of the edge-coefficient planes.

    Full-frame twin of the windowed exv.ip(1)/eyv.jp(1): bxp[i,j] is the
    coefficient on cell (i,j)'s high-x face, bx[i,j] the low-x face."""
    if flavor == "vc":
        bx, by = C[0], C[1]
    else:
        bx, by = C[1], C[2]
    return bx, jnp.roll(bx, -1, 0), by, jnp.roll(by, -1, 1)


def _coef_views(C, flavor):
    """Loop-invariant operator planes: shifted edge coefficients, the
    per-cell GS denominator, and the 4 neighbor weights.

    Computed ONCE per kernel region and closed over by the sweep loop
    bodies -- Mosaic does not hoist loop-invariant rolls/sums out of
    fori_loop, and recomputing them per half-sweep made the banded vc
    cycle slower than the jnp one (measured 64 vs 26 ms at 1024^2)."""
    bx, bxp, by, byp = _edge_shifts(C, flavor)
    if flavor == "vc":
        denom = bxp + bx + byp + by
        return (bxp, bx, byp, by, denom)
    al, gx, gy = C[0], C[3], C[4]
    denom = al - bxp - bx - byp - by
    return (bxp + gx, bx - gx, byp + gy, by - gy, denom)


def _gs_update_pv(v, f, pv, flavor):
    """The Gauss-Seidel update from precomputed plane views.

    Literal term order of the jnp smoothers (variable_coeff_MG.py
    _smooth_once / general_MG.py _smooth_once) so masked-selected cells
    are bitwise identical.  Ghost-cell lanes divide by garbage (possibly
    0 -> inf/nan) and are always masked out by the callers' selects."""
    wip, wim, wjp, wjm, denom = pv
    vip = jnp.roll(v, -1, 0)
    vim = jnp.roll(v, 1, 0)
    vjp = jnp.roll(v, -1, 1)
    vjm = jnp.roll(v, 1, 1)
    if flavor == "vc":
        return (-f + wip * vip + wim * vim + wjp * vjp + wjm * vjm) / denom
    return (f - wip * vip - wim * vim - wjp * vjp - wjm * vjm) / denom


def _gs_update_g(v, f, C, flavor):
    return _gs_update_pv(v, f, _coef_views(C, flavor), flavor)


def _smooth_n_g(v, f, C, n, q, bcs, flavor):
    """n red-black Gauss-Seidel sweeps with ghost refills between colors
    (the full-frame twin of the jnp _smooth_once loop)."""
    xi, yi = pallas_mg._iotas(q)
    inter = _interior(q)
    red = inter & (((xi + yi) % 2) == 0)
    black = inter & (((xi + yi) % 2) == 1)
    pv = _coef_views(C, flavor)   # loop-invariant, hoisted

    def half(v, m):
        return jnp.where(m, _gs_update_pv(v, f, pv, flavor), v)

    def body(_, v):
        v = _fill_ghost_ff(half(v, red), bcs, q)
        v = _fill_ghost_ff(half(v, black), bcs, q)
        return v

    v = _fill_ghost_ff(v, bcs, q)
    return jax.lax.fori_loop(0, n, body, v)


def _residual_g(v, f, C, q, flavor):
    """r = f - L v on the interior, zero ghosts; literal term order of
    the jnp residuals."""
    bx, bxp, by, byp = _edge_shifts(C, flavor)
    vip = jnp.roll(v, -1, 0)
    vim = jnp.roll(v, 1, 0)
    vjp = jnp.roll(v, -1, 1)
    vjm = jnp.roll(v, 1, 1)
    L = (bxp * (vip - v) - bx * (v - vim) +
         byp * (vjp - v) - by * (v - vjm))
    if flavor == "general":
        al, gx, gy = C[0], C[3], C[4]
        L = (al * v + L +
             gx * (vip - vim) + gy * (vjp - vjm))
    return jnp.where(_interior(q), f - L, jnp.asarray(0.0, v.dtype))


# ---------------------------------------------------------------------------
# kernels (mirror pallas_mg's CORE / DOWN / UP with one coefficient-plane
# stack input per level)
# ---------------------------------------------------------------------------

def _make_core_kernel_g(top_level, nsmooth, nsmooth_bottom, bcs, want_r,
                        ncoef, dtype, interpret, vma=None):
    """The complete V-cycle for levels 0..top_level in ONE kernel; takes
    the coefficient stacks of every core level (coarse -> fine order)."""
    flavor = "vc" if ncoef == 2 else "general"

    def vcycle(level, v, f, Cs):
        q = 2 ** (level + 1) + 2
        C = Cs[level]
        if level == 0:
            v = _smooth_n_g(v, f, C, nsmooth_bottom, q, bcs, flavor)
            return _fill_ghost_ff(v, bcs, q)
        v = _smooth_n_g(v, f, C, nsmooth, q, bcs, flavor)
        r = _residual_g(v, f, C, q, flavor)
        fc = _restrict_mm(r, q)
        vc = vcycle(level - 1, jnp.zeros_like(fc), fc, Cs)
        v = _fill_ghost_ff(v + _prolong_mm(vc, (q - 2) // 2 + 2), bcs, q)
        return _smooth_n_g(v, f, C, nsmooth, q, bcs, flavor)

    q = 2 ** (top_level + 1) + 2
    nlev = top_level + 1

    def kernel(v_ref, f_ref, *refs):
        Cs = [refs[k][...] for k in range(nlev)]
        out_refs = refs[nlev:]
        v = vcycle(top_level, v_ref[...], f_ref[...], Cs)
        out_refs[0][...] = v
        if want_r:
            out_refs[1][...] = _residual_g(v, f_ref[...], Cs[top_level],
                                           q, flavor)

    n_out = 2 if want_r else 1
    if vma is None:
        out_shape = [jax.ShapeDtypeStruct((q, q), dtype)] * n_out
    else:
        out_shape = [jax.ShapeDtypeStruct((q, q), dtype, vma=vma)] * n_out
    return pl.pallas_call(
        kernel,
        in_specs=_vmem_specs(2 + nlev),
        out_specs=_vmem_specs(n_out),
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)


def _make_down_kernel_g(level, nsmooth, bcs, ncoef, dtype, interpret):
    """Peeled-level descent: pre-smooth, residual, restrict."""
    q = 2 ** (level + 1) + 2
    qc = (q - 2) // 2 + 2
    flavor = "vc" if ncoef == 2 else "general"

    def kernel(v_ref, f_ref, c_ref, vo_ref, fco_ref):
        C = c_ref[...]
        v = _smooth_n_g(v_ref[...], f_ref[...], C, nsmooth, q, bcs, flavor)
        r = _residual_g(v, f_ref[...], C, q, flavor)
        vo_ref[...] = v
        fco_ref[...] = _restrict_mm(r, q)

    return pl.pallas_call(
        kernel,
        in_specs=_vmem_specs(3),
        out_specs=_vmem_specs(2),
        out_shape=[jax.ShapeDtypeStruct((q, q), dtype),
                   jax.ShapeDtypeStruct((qc, qc), dtype)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)


def _make_up_kernel_g(level, nsmooth, bcs, want_r, ncoef, dtype,
                      interpret):
    """Peeled-level ascent: prolong + correct, post-smooth [, residual]."""
    q = 2 ** (level + 1) + 2
    qc = (q - 2) // 2 + 2
    flavor = "vc" if ncoef == 2 else "general"

    def kernel(v_ref, f_ref, vc_ref, c_ref, *out_refs):
        C = c_ref[...]
        v = v_ref[...] + _prolong_mm(vc_ref[...], qc)
        v = _fill_ghost_ff(v, bcs, q)
        v = _smooth_n_g(v, f_ref[...], C, nsmooth, q, bcs, flavor)
        out_refs[0][...] = v
        if want_r:
            out_refs[1][...] = _residual_g(v, f_ref[...], C, q, flavor)

    n_out = 2 if want_r else 1
    return pl.pallas_call(
        kernel,
        in_specs=_vmem_specs(4),
        out_specs=_vmem_specs(n_out),
        out_shape=[jax.ShapeDtypeStruct((q, q), dtype)] * n_out,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)


# ---------------------------------------------------------------------------
# row-banded peeled levels (sizes > WHOLE_MAX): the pallas_mg banded
# machinery with the coefficient-plane stack DMA'd per band alongside
# v and f.  Plane bands align with the v/f band rows, so the
# whole-frame operator formulas apply unchanged; validity masks use
# global row indices exactly as in the constant-coefficient kernels.
# ---------------------------------------------------------------------------

def _smooth_band_g(v, f, Cb, n, q, row0, bcs, flavor):
    """n red-black sweeps on a band with coefficient-plane bands."""
    xi, yi = pallas_mg._iotas_g(v.shape, row0)
    inter = (xi >= 1) & (xi <= q - 2) & (yi >= 1) & (yi <= q - 2)
    red = inter & (((xi + yi) % 2) == 0)
    black = inter & (((xi + yi) % 2) == 1)
    pv = _coef_views(Cb, flavor)   # loop-invariant, hoisted

    def half(v, m):
        return jnp.where(m, _gs_update_pv(v, f, pv, flavor), v)

    def body(_, v):
        v = _fill_ghost_band(half(v, red), bcs, q, row0)
        v = _fill_ghost_band(half(v, black), bcs, q, row0)
        return v

    v = _fill_ghost_band(v, bcs, q, row0)
    return jax.lax.fori_loop(0, n, body, v)


def _residual_band_g(v, f, Cb, q, row0, flavor):
    xi, yi = pallas_mg._iotas_g(v.shape, row0)
    inter = (xi >= 1) & (xi <= q - 2) & (yi >= 1) & (yi <= q - 2)
    bx, bxp, by, byp = _edge_shifts(Cb, flavor)
    vip = jnp.roll(v, -1, 0)
    vim = jnp.roll(v, 1, 0)
    vjp = jnp.roll(v, -1, 1)
    vjm = jnp.roll(v, 1, 1)
    L = (bxp * (vip - v) - bx * (v - vim) +
         byp * (vjp - v) - by * (v - vjm))
    if flavor == "general":
        al, gx, gy = Cb[0], Cb[3], Cb[4]
        L = (al * v + L + gx * (vip - vim) + gy * (vjp - vjm))
    return jnp.where(inter, f - L, jnp.asarray(0.0, v.dtype))


def _make_down_banded_g(level, nsmooth, bcs, ncoef, dtype, interpret):
    """Banded descent with plane DMA: pre-smooth + residual + restrict."""
    q = 2 ** (level + 1) + 2
    n = q - 2
    qc = n // 2 + 2
    flavor = "vc" if ncoef == 2 else "general"
    T, H_lo, B, W, nb, q_pad = _band_geometry(n, nsmooth)
    qc_pad = _round8(qc)
    qL, qcL = _round128(q), _round128(qc)
    Wc = qc_pad if nb == 1 else T // 2 + 8

    def kernel(v_hbm, f_hbm, c_hbm, vo_hbm, fco_hbm,
               vb, fb, cb, resv, resf, s1, s2, s3, s4, s5):
        i = pl.program_id(0)
        st8 = jnp.clip((i * T - H_lo) // 8, 0, (q_pad - B) // 8)
        start = st8 * 8
        cin = pltpu.make_async_copy(v_hbm.at[pl.ds(start, B), :], vb, s1)
        cin.start()
        cif = pltpu.make_async_copy(f_hbm.at[pl.ds(start, B), :], fb, s2)
        cif.start()
        cic = pltpu.make_async_copy(
            c_hbm.at[:, pl.ds(start, B), :], cb, s3)
        cic.start()
        cin.wait()
        cif.wait()
        cic.wait()
        Cb = cb[...]
        v = _smooth_band_g(vb[...], fb[...], Cb, nsmooth, q, start, bcs,
                           flavor)
        r = _residual_band_g(v, fb[...], Cb, q, start, flavor)
        resv[...] = v
        vs8 = jnp.clip(i * (T // 8), 0, (q_pad - W) // 8)
        co = pltpu.make_async_copy(
            resv.at[pl.ds((vs8 - st8) * 8, W), :],
            vo_hbm.at[pl.ds(vs8 * 8, W), :], s4)
        co.start()
        cs8 = jnp.clip(i * (T // 16), 0, (qc_pad - Wc) // 8)
        resf[...] = _restrict_band(r, q, qc, start, cs8 * 8, Wc, qcL)
        cf = pltpu.make_async_copy(
            resf, fco_hbm.at[pl.ds(cs8 * 8, Wc), :], s5)
        cf.start()
        co.wait()
        cf.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((B, qL), dtype), pltpu.VMEM((B, qL), dtype),
            pltpu.VMEM((ncoef, B, qL), dtype),
            pltpu.VMEM((B, qL), dtype), pltpu.VMEM((Wc, qcL), dtype),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ])

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((q_pad, qL), dtype),
                   jax.ShapeDtypeStruct((qc_pad, qcL), dtype)],
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)

    def down(v, f, C):
        Cp = jnp.stack([_pad2(C[k], q_pad, qL) for k in range(ncoef)])
        vp, fc = call(_pad2(v, q_pad, qL), _pad2(f, q_pad, qL), Cp)
        return vp[:q, :q], fc[:qc, :qc]

    return down


def _make_up_banded_g(level, nsmooth, bcs, want_r, ncoef, dtype,
                      interpret):
    """Banded ascent with plane DMA: prolong+correct (full coarse frame
    in VMEM), post-smooth [, residual]."""
    q = 2 ** (level + 1) + 2
    n = q - 2
    qc = n // 2 + 2
    flavor = "vc" if ncoef == 2 else "general"
    T, H_lo, B, W, nb, q_pad = _band_geometry(n, nsmooth)
    qc_pad = _round8(qc)
    qL, qcL = _round128(q), _round128(qc)

    def kernel(v_hbm, f_hbm, c_hbm, vc_vmem, *rest):
        if want_r:
            (vo_hbm, ro_hbm, vb, fb, cb, resv, resr,
             s1, s2, s3, s4, s5) = rest
        else:
            vo_hbm, vb, fb, cb, resv, s1, s2, s3, s4 = rest
        i = pl.program_id(0)
        st8 = jnp.clip((i * T - H_lo) // 8, 0, (q_pad - B) // 8)
        start = st8 * 8
        cin = pltpu.make_async_copy(v_hbm.at[pl.ds(start, B), :], vb, s1)
        cin.start()
        cif = pltpu.make_async_copy(f_hbm.at[pl.ds(start, B), :], fb, s2)
        cif.start()
        cic = pltpu.make_async_copy(
            c_hbm.at[:, pl.ds(start, B), :], cb, s3)
        cic.start()
        cin.wait()
        cif.wait()
        cic.wait()
        Cb = cb[...]
        v = vb[...] + _prolong_band(vc_vmem[...], qc, start, B, qL)
        v = _fill_ghost_band(v, bcs, q, start)
        v = _smooth_band_g(v, fb[...], Cb, nsmooth, q, start, bcs,
                           flavor)
        resv[...] = v
        vs8 = jnp.clip(i * (T // 8), 0, (q_pad - W) // 8)
        co = pltpu.make_async_copy(
            resv.at[pl.ds((vs8 - st8) * 8, W), :],
            vo_hbm.at[pl.ds(vs8 * 8, W), :], s4)
        co.start()
        if want_r:
            resr[...] = _residual_band_g(v, fb[...], Cb, q, start,
                                         flavor)
            cr = pltpu.make_async_copy(
                resr.at[pl.ds((vs8 - st8) * 8, W), :],
                ro_hbm.at[pl.ds(vs8 * 8, W), :], s5)
            cr.start()
            cr.wait()
        co.wait()

    n_out = 2 if want_r else 1
    scratch = [pltpu.VMEM((B, qL), dtype), pltpu.VMEM((B, qL), dtype),
               pltpu.VMEM((ncoef, B, qL), dtype),
               pltpu.VMEM((B, qL), dtype)]
    if want_r:
        scratch.append(pltpu.VMEM((B, qL), dtype))
    scratch += [pltpu.SemaphoreType.DMA(())] * (4 + (1 if want_r else 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 +
        [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out,
        scratch_shapes=scratch)

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((q_pad, qL), dtype)] * n_out,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)

    def up(v, f, vc, C):
        Cp = jnp.stack([_pad2(C[k], q_pad, qL) for k in range(ncoef)])
        outs = call(_pad2(v, q_pad, qL), _pad2(f, q_pad, qL), Cp,
                    _pad2(vc, qc_pad, qcL))
        return [o[:q, :q] for o in outs]

    return up


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

def _plane_prep(mg):
    """(flavor, prep) where prep(params) -> tuple of per-level
    (ncoef, q_k, q_k) coefficient stacks, traced (so the compiled cycle
    is shared across instances with different coefficients)."""
    from pyro2_tpu.multigrid.general_MG import GeneralMG2d
    from pyro2_tpu.multigrid.variable_coeff_MG import VarCoeffCCMG2d

    nlevels = mg.nlevels
    if type(mg) is VarCoeffCCMG2d:
        def prep(params):
            return tuple(
                jnp.stack([params["eta_x"][k], params["eta_y"][k]])
                for k in range(nlevels))
        return "vc", prep
    if type(mg) is GeneralMG2d:
        dxs = [g.dx for g in mg.grids]
        dys = [g.dy for g in mg.grids]

        def prep(params):
            return tuple(
                jnp.stack([params["alpha"][k],
                           params["beta_x"][k], params["beta_y"][k],
                           0.5 * params["gamma_x"][k] / dxs[k],
                           0.5 * params["gamma_y"][k] / dys[k]])
                for k in range(nlevels))
        return "general", prep
    raise Ineligible(f"{type(mg).__name__} has no fused coefficient form")


def build_fused_cycle_general(mg, interpret=False):
    """A jitted one_cycle(v, f, params) -> (v, r, rnorm) for the
    variable-coefficient / general MG, or raise Ineligible."""
    if mg.nx != mg.ny or (mg.nx & (mg.nx - 1)) != 0:
        raise Ineligible("requires square power-of-2 grid")
    if mg.nx > pallas_mg.NX_MAX or mg.nx < 4:
        raise Ineligible(f"nx={mg.nx} outside fused range")
    if mg.ng != 1:
        raise Ineligible("fused kernels assume ng=1")
    bcs = _bc_kinds(mg)

    flavor, prep = _plane_prep(mg)
    ncoef = 2 if flavor == "vc" else 5
    dtype = mg.v[-1].dtype
    g = mg.soln_grid
    nlevels = mg.nlevels

    # split: levels 0..core_top inside the fused core; finer levels
    # peeled (whole-frame kernels up to WHOLE_MAX, row-banded above --
    # the same split as pallas_mg, with coefficient planes DMA'd per
    # band at banded levels)
    core_top = nlevels - 1
    while 2 ** (core_top + 1) > pallas_mg.CORE_MAX:
        core_top -= 1
    peeled = list(range(core_top + 1, nlevels))
    # read pallas_mg's constants dynamically (tests shrink them to force
    # banding at small sizes)
    banded = [lv for lv in peeled if 2 ** (lv + 1) > pallas_mg.WHOLE_MAX]
    if banded and (bcs[0] == "periodic" or bcs[1] == "periodic"):
        raise Ineligible(
            "periodic x BCs need wrap-around halos at banded levels")

    core = _make_core_kernel_g(core_top, mg.nsmooth, mg.nsmooth_bottom,
                               bcs, want_r=not peeled, ncoef=ncoef,
                               dtype=dtype, interpret=interpret)
    downs = {lv: (_make_down_banded_g(lv, mg.nsmooth, bcs, ncoef, dtype,
                                      interpret) if lv in banded else
                  _make_down_kernel_g(lv, mg.nsmooth, bcs, ncoef, dtype,
                                      interpret)) for lv in peeled}
    ups = {lv: (_make_up_banded_g(lv, mg.nsmooth, bcs,
                                  want_r=(lv == nlevels - 1),
                                  ncoef=ncoef, dtype=dtype,
                                  interpret=interpret)
                if lv in banded else
                _make_up_kernel_g(lv, mg.nsmooth, bcs,
                                  want_r=(lv == nlevels - 1),
                                  ncoef=ncoef, dtype=dtype,
                                  interpret=interpret))
           for lv in peeled}

    dxdy = g.dx * g.dy

    def one_cycle(v, f, params):
        Cs = tuple(C.astype(dtype) for C in prep(params))
        stack = []
        for lv in reversed(peeled):               # fine -> coarse descent
            v, fc = downs[lv](v, f, Cs[lv])
            stack.append((lv, v, f))
            f = fc
            v = jnp.zeros_like(fc)
        outs = core(v, f, *Cs[:core_top + 1])
        vc = outs[0]
        r = outs[1] if not peeled else None
        for lv, v_lv, f_lv in reversed(stack):    # coarse -> fine ascent
            outs = ups[lv](v_lv, f_lv, vc, Cs[lv])
            vc = outs[0]
            if lv == nlevels - 1:
                r = outs[1]
        v = vc
        rnorm = jnp.sqrt(dxdy * jnp.sum(r * r))
        return v, r, rnorm

    fn = jax.jit(one_cycle)
    # compile now so Mosaic failures trigger the jnp fallback at build
    # time rather than erroring mid-solve
    spec = jax.ShapeDtypeStruct((g.qx, g.qy), dtype)
    pspec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        mg._params())
    fn.lower(spec, spec, pspec).compile()
    return fn
