"""Fused Pallas TPU V-cycle for the constant-coefficient multigrid solver.

The jnp V-cycle (MG.py) is one jitted program, but at 512^2 it unrolls into
~2000 small XLA ops (each red-black half sweep is a stencil + mask + four
ghost-strip updates, x nsmooth x 2 visits x 9 levels), every one paying an
HBM round trip and per-op overhead -- ~90 ms/cycle measured on a v5e.  This
module runs the SAME cycle in (at most a few) Pallas kernels that keep the
whole level hierarchy in VMEM:

* levels up to ``CORE_MAX``^2 run inside ONE kernel (`the fused core') --
  the entire sub-V-cycle, smoothing loops included, is a single VMEM-resident
  program;
* each finer `peeled' level adds two kernels per cycle: DOWN (pre-smooth +
  residual + restrict) and UP (prolong + correct + post-smooth [+ residual]),
  so a 512^2 solve is 3 kernel dispatches per V-cycle instead of ~2000 ops;
* Mosaic cannot lower the strided/pad/scatter ops the windowed formulation
  uses, so inside kernels everything is full-frame (see mesh/indexer.py
  full_frame note): stencils are static rolls, edge ghost fills are
  roll+iota-mask selects, and the factor-2 restrict / slope-limited prolong
  become tiny constant matmuls built from iota comparisons
  (c = R a R^T,  e = E c E^T + Sx mx E^T + E my Sy^T) that run on the MXU
  with bf16x3 (Precision.HIGH ~= f32) accuracy.

Numerics match the jnp path (MG.py:273-330, mirroring the reference
4-color Gauss-Seidel, /root/reference/pyro/multigrid/MG.py:544-599) to f32
roundoff; tests compare the two in Pallas interpret mode at f64 where they
agree to ~1e-14.

Eligibility (checked by `build_fused_cycle`, which raises `Ineligible`):
plain CellCenterMG2d (subclasses override the smoother), square power-of-2
grid with ng=1, nx <= 512 (VMEM), and homogeneous standard BCs on every
edge.  Ineligible solves (variable coefficients, inhomogeneous BC
functions, user-defined BCs) fall back to the jnp cycle transparently.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["Ineligible", "build_fused_cycle", "CORE_MAX"]

# finest level size handled inside the single fused-core kernel; levels
# above are peeled into DOWN/UP kernels.  512^2 fully fused needs ~19 MB
# of VMEM scratch (over the 16 MB budget); 256^2 fits comfortably.
CORE_MAX = 256

# largest level run as WHOLE-FRAME peeled kernels; larger levels hold
# too many live (nx+2)^2 frames for VMEM and are run as ROW-BANDED
# kernels instead (deep-halo redundant smoothing, see the banded section
# below).  Banded levels require non-periodic row (x) BCs.
WHOLE_MAX = 512

# owned rows per banded program
BAND_ROWS = 128

# largest eligible fine grid overall
NX_MAX = 2048

_HI = jax.lax.Precision.HIGHEST  # full-f32 matmul; Mosaic rejects HIGH
                                 # ("Unsupported dot precision") on v5e,
                                 # and these transfer-matrix products are
                                 # a tiny fraction of cycle cost anyway

_SUPPORTED_BCS = frozenset(
    ["outflow", "neumann", "dirichlet", "reflect-odd", "reflect-even",
     "periodic"])


class Ineligible(Exception):
    """This MG configuration is not covered by the fused kernel."""


# ---------------------------------------------------------------------------
# in-kernel building blocks (full-frame: all arrays (q, q) incl. 1 ghost)
# ---------------------------------------------------------------------------

def _iotas(q):
    xi = jax.lax.broadcasted_iota(jnp.int32, (q, q), 0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (q, q), 1)
    return xi, yi


def _fill_ghost_ff(a, bcs, q):
    """Homogeneous ng=1 ghost fill via rolls + edge masks.

    Edge order x-lo, x-hi, y-lo, y-hi matches indexer.fill_ghost (and the
    reference array_indexer.py:150-274) so corners get identical values.
    """
    xi, yi = _iotas(q)

    def edge(a, axis, side, kind):
        ii = xi if axis == 0 else yi
        m = (ii == 0) if side == 0 else (ii == q - 1)
        sh = -1 if side == 0 else 1
        if kind in ("outflow", "neumann", "reflect-even"):
            src = jnp.roll(a, sh, axis)
        elif kind in ("dirichlet", "reflect-odd"):
            src = -jnp.roll(a, sh, axis)
        else:  # periodic: ghost_lo <- a[q-2], ghost_hi <- a[1]
            src = jnp.roll(a, (q - 2) * sh, axis)
        return jnp.where(m, src, a)

    a = edge(a, 0, 0, bcs[0])
    a = edge(a, 0, 1, bcs[1])
    a = edge(a, 1, 0, bcs[2])
    a = edge(a, 1, 1, bcs[3])
    return a


def _interior(q):
    xi, yi = _iotas(q)
    return (xi >= 1) & (xi <= q - 2) & (yi >= 1) & (yi <= q - 2)


def _smooth_n(v, f, n, q, dx, alpha, beta, bcs):
    """n red-black Gauss-Seidel sweeps (ghosts refilled between colors),
    the full-frame twin of MG._smooth_once/_smooth_n."""
    xi, yi = _iotas(q)
    inter = _interior(q)
    red = inter & (((xi + yi) % 2) == 0)      # (i-ilo)+(j-jlo) even, ng=1
    black = inter & (((xi + yi) % 2) == 1)
    xc = beta / dx ** 2
    denom = alpha + 4.0 * xc

    def half(v, m):
        upd = (f + xc * (jnp.roll(v, -1, 0) + jnp.roll(v, 1, 0) +
                         jnp.roll(v, -1, 1) + jnp.roll(v, 1, 1))) / denom
        return jnp.where(m, upd, v)

    def body(_, v):
        v = _fill_ghost_ff(half(v, red), bcs, q)
        v = _fill_ghost_ff(half(v, black), bcs, q)
        return v

    v = _fill_ghost_ff(v, bcs, q)
    return jax.lax.fori_loop(0, n, body, v)


def _residual(v, f, q, dx, alpha, beta):
    """r = f - alpha v + beta L v on the interior, zero ghosts."""
    lap = (jnp.roll(v, -1, 0) + jnp.roll(v, 1, 0) +
           jnp.roll(v, -1, 1) + jnp.roll(v, 1, 1) - 4.0 * v) / dx ** 2
    return jnp.where(_interior(q), f - alpha * v + beta * lap,
                     jnp.asarray(0.0, v.dtype))


def _restrict_mm(r, qf):
    """Factor-2 conservative average as c = R r R^T (patch.restrict_array)."""
    qc = (qf - 2) // 2 + 2
    ri = jax.lax.broadcasted_iota(jnp.int32, (qc, qf), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (qc, qf), 1)
    ok = (ri >= 1) & (ri <= qc - 2)
    hit = ((ci == 2 * ri - 1) | (ci == 2 * ri)) & ok
    R = jnp.where(hit, 0.5, 0.0).astype(r.dtype)
    return jnp.matmul(R, jnp.matmul(r, R.T, precision=_HI), precision=_HI)


def _prolong_mm(vc, qc):
    """Centered-slope bilinear prolongation (patch.prolong_array) as
    e = E c E^T + Sx mx E^T + E my Sx^T with E/S from iota comparisons."""
    qf = (qc - 2) * 2 + 2
    ri = jax.lax.broadcasted_iota(jnp.int32, (qf, qc), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (qf, qc), 1)
    ok = (ci >= 1) & (ci <= qc - 2)
    lo = (ri == 2 * ci - 1) & ok              # low child of coarse cell ci
    hi = (ri == 2 * ci) & ok                  # high child
    E = jnp.where(lo | hi, 1.0, 0.0).astype(vc.dtype)
    S = jnp.where(lo, -0.25, jnp.where(hi, 0.25, 0.0)).astype(vc.dtype)
    mx = 0.5 * (jnp.roll(vc, -1, 0) - jnp.roll(vc, 1, 0))
    my = 0.5 * (jnp.roll(vc, -1, 1) - jnp.roll(vc, 1, 1))
    return (jnp.matmul(E, jnp.matmul(vc, E.T, precision=_HI), precision=_HI)
            + jnp.matmul(S, jnp.matmul(mx, E.T, precision=_HI), precision=_HI)
            + jnp.matmul(E, jnp.matmul(my, S.T, precision=_HI), precision=_HI))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


# the peeled 512-level kernels hold ~50 MB of live full-frame temporaries,
# over Mosaic's 16 MB default scoped-vmem budget; v5e physically has 128 MB
# of VMEM, so raise the cap (verified to compile+run on hardware)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _make_core_kernel(top_level, dx_of, nsmooth, nsmooth_bottom, bcs,
                      want_r, dtype, interpret, vma=None):
    """One kernel running the complete V-cycle for levels 0..top_level.

    vma: varying-mesh-axes set for the outputs when the kernel runs
    inside shard_map (the sharded MG's replicated coarse solve)."""

    def vcycle(level, v, f, alpha, beta):
        q = 2 ** (level + 1) + 2
        dx = dx_of(level)
        if level == 0:
            v = _smooth_n(v, f, nsmooth_bottom, q, dx, alpha, beta, bcs)
            return _fill_ghost_ff(v, bcs, q)
        v = _smooth_n(v, f, nsmooth, q, dx, alpha, beta, bcs)
        r = _residual(v, f, q, dx, alpha, beta)
        fc = _restrict_mm(r, q)
        vc = vcycle(level - 1, jnp.zeros_like(fc), fc, alpha, beta)
        v = _fill_ghost_ff(v + _prolong_mm(vc, (q - 2) // 2 + 2), bcs, q)
        return _smooth_n(v, f, nsmooth, q, dx, alpha, beta, bcs)

    q = 2 ** (top_level + 1) + 2

    def kernel(ab_ref, v_ref, f_ref, *out_refs):
        alpha, beta = ab_ref[0], ab_ref[1]
        v = vcycle(top_level, v_ref[...], f_ref[...], alpha, beta)
        out_refs[0][...] = v
        if want_r:
            out_refs[1][...] = _residual(v, f_ref[...], q, dx_of(top_level),
                                         alpha, beta)

    n_out = 2 if want_r else 1
    if vma is None:
        out_shape = [jax.ShapeDtypeStruct((q, q), dtype)] * n_out
    else:
        out_shape = [jax.ShapeDtypeStruct((q, q), dtype,
                                          vma=vma)] * n_out
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _vmem_specs(2),
        out_specs=_vmem_specs(n_out),
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)


def _make_down_kernel(level, dx_of, nsmooth, bcs, dtype, interpret):
    """Peeled-level descent: pre-smooth, residual, restrict."""
    q = 2 ** (level + 1) + 2
    qc = (q - 2) // 2 + 2
    dx = dx_of(level)

    def kernel(ab_ref, v_ref, f_ref, vo_ref, fco_ref):
        alpha, beta = ab_ref[0], ab_ref[1]
        v = _smooth_n(v_ref[...], f_ref[...], nsmooth, q, dx, alpha, beta,
                      bcs)
        r = _residual(v, f_ref[...], q, dx, alpha, beta)
        vo_ref[...] = v
        fco_ref[...] = _restrict_mm(r, q)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _vmem_specs(2),
        out_specs=_vmem_specs(2),
        out_shape=[jax.ShapeDtypeStruct((q, q), dtype),
                   jax.ShapeDtypeStruct((qc, qc), dtype)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)


def _make_up_kernel(level, dx_of, nsmooth, bcs, want_r, dtype, interpret):
    """Peeled-level ascent: prolong + correct, post-smooth [, residual]."""
    q = 2 ** (level + 1) + 2
    qc = (q - 2) // 2 + 2
    dx = dx_of(level)

    def kernel(ab_ref, v_ref, f_ref, vc_ref, *out_refs):
        alpha, beta = ab_ref[0], ab_ref[1]
        v = v_ref[...] + _prolong_mm(vc_ref[...], qc)
        v = _fill_ghost_ff(v, bcs, q)
        v = _smooth_n(v, f_ref[...], nsmooth, q, dx, alpha, beta, bcs)
        out_refs[0][...] = v
        if want_r:
            out_refs[1][...] = _residual(v, f_ref[...], q, dx, alpha, beta)

    n_out = 2 if want_r else 1
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _vmem_specs(3),
        out_specs=_vmem_specs(n_out),
        out_shape=[jax.ShapeDtypeStruct((q, q), dtype)] * n_out,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)


# ---------------------------------------------------------------------------
# row-banded peeled levels (sizes > WHOLE_MAX)
#
# A level of q = n+2 frame rows is split into n/BAND_ROWS bands; each
# program DMAs its owned rows plus a halo, runs the SAME smoothing /
# residual / transfer arithmetic with GLOBAL-index masks (deep-halo
# redundant compute: each red-black half-sweep shrinks the valid halo by
# one row), and writes back an owned window at a clamped offset -- the
# row overlaps between neighboring bands carry identical values, and the
# edge bands' windows cover the frame's ghost rows, so the full frame
# (ghosts included) is always written.  Row-direction periodic BCs would
# need wrap-around halos and are left to the jnp path.
#
# TPU DMA alignment (the round-2 hardware failure): Mosaic requires every
# HBM row slice -- offset AND size -- to be a multiple of the sublane
# tiling (8 rows for f32).  q = n+2 is never 8-aligned, so banded levels
# operate on ROW-PADDED frames of q_pad = roundup(q, 8) rows (padding rows
# are inert: every mask uses global row indices < q, restrict/prolong
# matrix rows for out-of-frame indices are exactly zero, and the residual
# zeroes non-interior rows before any matmul).  The geometry below keeps
# all offsets/sizes 8-aligned:
#   * band i owns write window [i*T, i*T + T + 8)   (T = BAND_ROWS, 8|T);
#   * input band rows [clip(i*T - H_lo, 0, q_pad - B), + B) with
#     H_lo = roundup(2*nsmooth + 4, 8) and H_hi = H_lo + 16 (the extra 16
#     covers the coarse write window's fine-row reach 2*(T/2 + 8));
#   * coarse write window [i*(T/2), + T/2 + 8) on a q_pad-row coarse
#     frame.
# Wrappers pad/slice at the kernel boundary so callers see (q, q) frames.
# ---------------------------------------------------------------------------

def _iotas_g(shape, row0):
    """(global-row, lane) index grids for a band starting at frame row
    row0 (row0 is traced: it depends on program_id)."""
    xi = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    yi = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return xi, yi


def _fill_ghost_band(a, bcs, q, row0):
    """_fill_ghost_ff on a row band: masks use global row indices.  The
    roll sources for the row edges are in-band because only the edge
    bands contain the frame's ghost rows."""
    xi, yi = _iotas_g(a.shape, row0)

    def edge(a, axis, side, kind):
        ii = xi if axis == 0 else yi
        m = (ii == 0) if side == 0 else (ii == q - 1)
        sh = -1 if side == 0 else 1
        if kind in ("outflow", "neumann", "reflect-even"):
            src = jnp.roll(a, sh, axis)
        elif kind in ("dirichlet", "reflect-odd"):
            src = -jnp.roll(a, sh, axis)
        else:  # periodic: lanes only (row-periodic is gated Ineligible)
            src = jnp.roll(a, (q - 2) * sh, axis)
        return jnp.where(m, src, a)

    a = edge(a, 0, 0, bcs[0])
    a = edge(a, 0, 1, bcs[1])
    a = edge(a, 1, 0, bcs[2])
    a = edge(a, 1, 1, bcs[3])
    return a


def _smooth_band(v, f, n, q, row0, dx, alpha, beta, bcs):
    """n red-black sweeps on a band; same arithmetic as _smooth_n with
    global-index red/black/interior masks."""
    xi, yi = _iotas_g(v.shape, row0)
    inter = (xi >= 1) & (xi <= q - 2) & (yi >= 1) & (yi <= q - 2)
    red = inter & (((xi + yi) % 2) == 0)
    black = inter & (((xi + yi) % 2) == 1)
    xc = beta / dx ** 2
    denom = alpha + 4.0 * xc

    def half(v, m):
        upd = (f + xc * (jnp.roll(v, -1, 0) + jnp.roll(v, 1, 0) +
                         jnp.roll(v, -1, 1) + jnp.roll(v, 1, 1))) / denom
        return jnp.where(m, upd, v)

    def body(_, v):
        v = _fill_ghost_band(half(v, red), bcs, q, row0)
        v = _fill_ghost_band(half(v, black), bcs, q, row0)
        return v

    v = _fill_ghost_band(v, bcs, q, row0)
    return jax.lax.fori_loop(0, n, body, v)


def _residual_band(v, f, q, row0, dx, alpha, beta):
    xi, yi = _iotas_g(v.shape, row0)
    inter = (xi >= 1) & (xi <= q - 2) & (yi >= 1) & (yi <= q - 2)
    lap = (jnp.roll(v, -1, 0) + jnp.roll(v, 1, 0) +
           jnp.roll(v, -1, 1) + jnp.roll(v, 1, 1) - 4.0 * v) / dx ** 2
    return jnp.where(inter, f - alpha * v + beta * lap,
                     jnp.asarray(0.0, v.dtype))


def _restrict_band(r, qf, qc, row0, cstart, wc, qcL):
    """Banded restrict: lane side by matmul with a lane matrix padded to
    (qcL, qL) (entries outside the logical frame are exactly zero), row
    side by a (wc, B) iota matrix built from global indices."""
    B, qL = r.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (qcL, qL), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (qcL, qL), 1)
    ok = (ri >= 1) & (ri <= qc - 2)
    hit = ((ci == 2 * ri - 1) | (ci == 2 * ri)) & ok
    R = jnp.where(hit, 0.5, 0.0).astype(r.dtype)
    tmp = jnp.matmul(r, R.T, precision=_HI)          # (B, qcL)
    li = jax.lax.broadcasted_iota(jnp.int32, (wc, B), 1) + row0
    cri = jax.lax.broadcasted_iota(jnp.int32, (wc, B), 0) + cstart
    okr = (cri >= 1) & (cri <= qc - 2)
    hitr = ((li == 2 * cri - 1) | (li == 2 * cri)) & okr
    Rb = jnp.where(hitr, 0.5, 0.0).astype(r.dtype)
    return jnp.matmul(Rb, tmp, precision=_HI)        # (wc, qcL)


def _prolong_band(vc, qc, row0, nrows, qL):
    """Prolongation rows [row0, row0+nrows) x qL lanes from the (padded)
    full coarse frame.  All matrices are zero outside the logical frame,
    so the zero-padding rows/lanes of `vc` are inert."""
    qcR, qcL = vc.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (qL, qcL), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (qL, qcL), 1)
    ok = (ci >= 1) & (ci <= qc - 2)
    lo = (ri == 2 * ci - 1) & ok
    hi = (ri == 2 * ci) & ok
    E = jnp.where(lo | hi, 1.0, 0.0).astype(vc.dtype)
    S = jnp.where(lo, -0.25, jnp.where(hi, 0.25, 0.0)).astype(vc.dtype)

    fi = jax.lax.broadcasted_iota(jnp.int32, (nrows, qcR), 0) + row0
    cj = jax.lax.broadcasted_iota(jnp.int32, (nrows, qcR), 1)
    okb = (cj >= 1) & (cj <= qc - 2)
    lob = (fi == 2 * cj - 1) & okb
    hib = (fi == 2 * cj) & okb
    Eb = jnp.where(lob | hib, 1.0, 0.0).astype(vc.dtype)
    Sb = jnp.where(lob, -0.25, jnp.where(hib, 0.25, 0.0)).astype(vc.dtype)

    mx = 0.5 * (jnp.roll(vc, -1, 0) - jnp.roll(vc, 1, 0))
    my = 0.5 * (jnp.roll(vc, -1, 1) - jnp.roll(vc, 1, 1))
    return (jnp.matmul(Eb, jnp.matmul(vc, E.T, precision=_HI),
                       precision=_HI)
            + jnp.matmul(Sb, jnp.matmul(mx, E.T, precision=_HI),
                         precision=_HI)
            + jnp.matmul(Eb, jnp.matmul(my, S.T, precision=_HI),
                         precision=_HI))


def _round8(x):
    return -(-x // 8) * 8


def _round128(x):
    return -(-x // 128) * 128


def _band_geometry(n, nsmooth):
    """Aligned band geometry (T, H_lo, B, W, nb, q_pad); see block comment.

    Validity margins (each red-black half-sweep shrinks band-edge
    exactness by one row; the residual and the restrict's 2x fine-row
    reach add more):  H_lo >= 2*nsmooth + 4 covers the low side;
    H_hi = H_lo + 16 covers the high side's extra  2*(T/2 + 8) - T = 16
    fine rows read by the coarse write window.  T must be a multiple of
    16 so both i*T and i*(T/2) are 8-aligned.
    """
    q_pad = _round8(n + 2)
    T = min(BAND_ROWS, n)
    H_lo = _round8(2 * nsmooth + 4)
    B = T + 2 * H_lo + 16
    if T % 16 != 0 or B >= q_pad:  # one band owning the whole frame
        return n, 0, q_pad, q_pad, 1, q_pad
    return T, H_lo, B, T + 8, n // T, q_pad


def _pad2(a, nr, nc):
    return jnp.pad(a, ((0, nr - a.shape[0]), (0, nc - a.shape[1])))


def _make_down_banded(level, dx_of, nsmooth, bcs, dtype, interpret):
    """Banded descent: pre-smooth + residual + restrict, one band/program."""
    q = 2 ** (level + 1) + 2
    n = q - 2
    qc = n // 2 + 2
    dx = dx_of(level)
    T, H_lo, B, W, nb, q_pad = _band_geometry(n, nsmooth)
    qc_pad = _round8(qc)
    qL, qcL = _round128(q), _round128(qc)
    Wc = qc_pad if nb == 1 else T // 2 + 8

    def kernel(ab_ref, v_hbm, f_hbm, vo_hbm, fco_hbm,
               vb, fb, resv, resf, s1, s2, s3, s4):
        alpha, beta = ab_ref[0], ab_ref[1]
        i = pl.program_id(0)
        # offsets computed in units of 8 then scaled: Mosaic must PROVE
        # 8-divisibility of dynamic tile indices; x*8 is provable where
        # clip(...) or a*8-b*8 of the same value is not
        st8 = jnp.clip((i * T - H_lo) // 8, 0, (q_pad - B) // 8)
        start = st8 * 8
        cin = pltpu.make_async_copy(v_hbm.at[pl.ds(start, B), :], vb, s1)
        cin.start()
        cif = pltpu.make_async_copy(f_hbm.at[pl.ds(start, B), :], fb, s2)
        cif.start()
        cin.wait()
        cif.wait()
        v = _smooth_band(vb[...], fb[...], nsmooth, q, start, dx,
                         alpha, beta, bcs)
        r = _residual_band(v, fb[...], q, start, dx, alpha, beta)
        resv[...] = v
        vs8 = jnp.clip(i * (T // 8), 0, (q_pad - W) // 8)
        co = pltpu.make_async_copy(
            resv.at[pl.ds((vs8 - st8) * 8, W), :],
            vo_hbm.at[pl.ds(vs8 * 8, W), :], s3)
        co.start()
        cs8 = jnp.clip(i * (T // 16), 0, (qc_pad - Wc) // 8)
        resf[...] = _restrict_band(r, q, qc, start, cs8 * 8, Wc, qcL)
        cf = pltpu.make_async_copy(
            resf, fco_hbm.at[pl.ds(cs8 * 8, Wc), :], s4)
        cf.start()
        co.wait()
        cf.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((B, qL), dtype), pltpu.VMEM((B, qL), dtype),
            pltpu.VMEM((B, qL), dtype), pltpu.VMEM((Wc, qcL), dtype),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
        ])

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((q_pad, qL), dtype),
                   jax.ShapeDtypeStruct((qc_pad, qcL), dtype)],
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)

    def down(ab, v, f):
        vp, fc = call(ab, _pad2(v, q_pad, qL), _pad2(f, q_pad, qL))
        return vp[:q, :q], fc[:qc, :qc]

    return down


def _make_up_banded(level, dx_of, nsmooth, bcs, want_r, dtype, interpret):
    """Banded ascent: prolong+correct (full coarse frame in VMEM),
    post-smooth [, residual], one band/program."""
    q = 2 ** (level + 1) + 2
    n = q - 2
    qc = n // 2 + 2
    dx = dx_of(level)
    T, H_lo, B, W, nb, q_pad = _band_geometry(n, nsmooth)
    qc_pad = _round8(qc)
    qL, qcL = _round128(q), _round128(qc)

    def kernel(ab_ref, v_hbm, f_hbm, vc_vmem, *rest):
        if want_r:
            vo_hbm, ro_hbm, vb, fb, resv, resr, s1, s2, s3, s4 = rest
        else:
            vo_hbm, vb, fb, resv, s1, s2, s3 = rest
        alpha, beta = ab_ref[0], ab_ref[1]
        i = pl.program_id(0)
        st8 = jnp.clip((i * T - H_lo) // 8, 0, (q_pad - B) // 8)
        start = st8 * 8
        cin = pltpu.make_async_copy(v_hbm.at[pl.ds(start, B), :], vb, s1)
        cin.start()
        cif = pltpu.make_async_copy(f_hbm.at[pl.ds(start, B), :], fb, s2)
        cif.start()
        cin.wait()
        cif.wait()
        v = vb[...] + _prolong_band(vc_vmem[...], qc, start, B, qL)
        v = _fill_ghost_band(v, bcs, q, start)
        v = _smooth_band(v, fb[...], nsmooth, q, start, dx, alpha, beta,
                         bcs)
        resv[...] = v
        vs8 = jnp.clip(i * (T // 8), 0, (q_pad - W) // 8)
        co = pltpu.make_async_copy(
            resv.at[pl.ds((vs8 - st8) * 8, W), :],
            vo_hbm.at[pl.ds(vs8 * 8, W), :], s3)
        co.start()
        if want_r:
            resr[...] = _residual_band(v, fb[...], q, start, dx, alpha,
                                       beta)
            cr = pltpu.make_async_copy(
                resr.at[pl.ds((vs8 - st8) * 8, W), :],
                ro_hbm.at[pl.ds(vs8 * 8, W), :], s4)
            cr.start()
            cr.wait()
        co.wait()

    n_out = 2 if want_r else 1
    scratch = [pltpu.VMEM((B, qL), dtype), pltpu.VMEM((B, qL), dtype),
               pltpu.VMEM((B, qL), dtype)]
    if want_r:
        scratch.append(pltpu.VMEM((B, qL), dtype))
    scratch += [pltpu.SemaphoreType.DMA(())] * (3 + (1 if want_r else 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 +
        [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out,
        scratch_shapes=scratch)

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((q_pad, qL), dtype)] * n_out,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret)

    def up(ab, v, f, vc):
        outs = call(ab, _pad2(v, q_pad, qL), _pad2(f, q_pad, qL),
                    _pad2(vc, qc_pad, qcL))
        return [o[:q, :q] for o in outs]

    return up


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

def _bc_kinds(mg):
    """The 4-edge BC kind tuple, or raise Ineligible."""
    import pyro2_tpu.mesh.boundary as bnd
    kinds = []
    for bc in mg.bc_v:
        for edge in ("xlb", "xrb", "ylb", "yrb"):
            k = getattr(bc, edge)
            if k in bnd.ext_bcs or k not in _SUPPORTED_BCS:
                raise Ineligible(f"BC '{k}' not supported by fused kernel")
        for val in (bc.xl_value, bc.xr_value, bc.yl_value, bc.yr_value):
            if val is not None:
                raise Ineligible("inhomogeneous BC values")
    bc = mg.bc_v[-1]
    return (bc.xlb, bc.xrb, bc.ylb, bc.yrb)


def build_fused_cycle(mg, interpret=False):
    """A jitted one_cycle(v, f, params) -> (v, r, rnorm) using fused
    Pallas kernels, or raise Ineligible."""
    from pyro2_tpu.multigrid.MG import CellCenterMG2d
    if type(mg) is not CellCenterMG2d:
        # the coefficient operators have their own fused kernel family
        # (per-level coefficient planes as VMEM inputs)
        from pyro2_tpu.multigrid import pallas_gen_mg
        return pallas_gen_mg.build_fused_cycle_general(
            mg, interpret=interpret)
    if mg.nx != mg.ny or (mg.nx & (mg.nx - 1)) != 0:
        raise Ineligible("requires square power-of-2 grid")
    if mg.nx > NX_MAX or mg.nx < 4:
        raise Ineligible(f"nx={mg.nx} outside fused range")
    if mg.ng != 1:
        raise Ineligible("fused kernels assume ng=1")
    # homogeneous BCs, same on all levels (coarse levels reuse the
    # homogeneous container; the fine level must match)
    bcs = _bc_kinds(mg)

    dtype = mg.v[-1].dtype
    g = mg.soln_grid
    nlevels = mg.nlevels
    dx_fine = g.dx

    def dx_of(level):
        return dx_fine * (2 ** (nlevels - 1 - level))

    # split: levels 0..core_top in the fused core, finer levels peeled
    # (whole-frame kernels up to WHOLE_MAX, row-banded kernels above)
    core_top = nlevels - 1
    while 2 ** (core_top + 1) > CORE_MAX:
        core_top -= 1
    peeled = list(range(core_top + 1, nlevels))   # coarse -> fine order

    banded = [lv for lv in peeled if 2 ** (lv + 1) > WHOLE_MAX]
    if banded and (bcs[0] == "periodic" or bcs[1] == "periodic"):
        raise Ineligible(
            "periodic x BCs need wrap-around halos at banded levels")

    core = _make_core_kernel(core_top, dx_of, mg.nsmooth,
                             mg.nsmooth_bottom, bcs,
                             want_r=not peeled, dtype=dtype,
                             interpret=interpret)
    downs = {lv: (_make_down_banded if lv in banded else
                  _make_down_kernel)(lv, dx_of, mg.nsmooth, bcs, dtype,
                                     interpret) for lv in peeled}
    ups = {lv: (_make_up_banded if lv in banded else
                _make_up_kernel)(lv, dx_of, mg.nsmooth, bcs,
                                 want_r=(lv == nlevels - 1), dtype=dtype,
                                 interpret=interpret) for lv in peeled}

    dxdy = g.dx * g.dy

    def one_cycle(v, f, params):
        ab = jnp.stack([params["alpha"], params["beta"]]).astype(dtype)
        stack = []
        for lv in reversed(peeled):               # fine -> coarse descent
            v, fc = downs[lv](ab, v, f)
            stack.append((lv, v, f))
            f = fc
            v = jnp.zeros_like(fc)
        outs = core(ab, v, f)
        vc = outs[0]
        r = outs[1] if not peeled else None
        for lv, v_lv, f_lv in reversed(stack):    # coarse -> fine ascent
            outs = ups[lv](ab, v_lv, f_lv, vc)
            vc = outs[0]
            if lv == nlevels - 1:
                r = outs[1]
        v = vc
        rnorm = jnp.sqrt(dxdy * jnp.sum(r * r))
        return v, r, rnorm

    fn = jax.jit(one_cycle)
    # force compilation now so Mosaic failures trigger the jnp fallback
    # at build time rather than erroring mid-solve
    spec = jax.ShapeDtypeStruct((g.qx, g.qy), dtype)
    pspec = {"alpha": jax.ShapeDtypeStruct((), mg._params()["alpha"].dtype),
             "beta": jax.ShapeDtypeStruct((), mg._params()["beta"].dtype)}
    fn.lower(spec, spec, pspec).compile()
    return fn
