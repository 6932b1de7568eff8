#!/usr/bin/env python3
"""What bounds the fused CTU step: transcendentals or raw vector ops?

Times the production fused kernel at 1024^2 against two NUMERICALLY
INVALID mutants with identical op structure minus transcendentals:

  A: baseline (HLLC: ~6 sqrt + 4 pow per interface via
     estimate_wave_speed, + cs in tracing);
  B: estimate_wave_speed's 2-rarefaction pow terms linearized
     (removes ~4 pow = 8 exp/log per interface);
  C: B + jax.numpy.sqrt replaced by a 2-op linear polynomial
     (removes every sqrt).

If C is much faster than A, transcendentals bind and targeted
refactoring pays; if C ~= A, the step is vector-op bound and the
measured zups IS the roofline for this op count.  Results feed
docs/DESIGN.md section "CTU roofline analysis".
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N = 1024
NSTEPS = 50


def build_and_time():
    from pyro2_tpu import Pyro
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_step_padded

    p = Pyro("compressible")
    p.initialize_problem("kh", inputs_dict={
        "mesh.nx": N, "mesh.ny": N,
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
        "compressible.small_dens": -1.e30,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
    sim, rp = p.sim, p.rp
    myg = sim.cc_data.grid
    to_p, from_p, fill_p, step_p = make_pallas_ctu_step_padded(
        N, N, myg.dx, myg.dy, rp.get_param("eos.gamma"),
        rp.params, sim.ivars, tile_rows=128)
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, jnp.float32)
    P0 = to_p(sim.cc_data.data.astype(jnp.float32))

    @jax.jit
    def many(P, dt):
        def body(P, _):
            return step_p(fill_p(P), dt), None
        P, _ = jax.lax.scan(body, P, None, length=NSTEPS)
        return P

    jax.block_until_ready(many(P0, dt))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(many(P0, dt))
        best = min(best, time.perf_counter() - t0)
    return N * N * NSTEPS / best, best / NSTEPS * 1e3


def main():
    from pyro2_tpu.solvers.compressible import riemann

    out = {}
    zups, ms = build_and_time()
    out["A_baseline"] = (zups, ms)
    print(f"A baseline      : {zups:.3e} zups  {ms:.3f} ms/step",
          flush=True)

    # B: linearize the pow terms in estimate_wave_speed
    orig_ews = riemann.estimate_wave_speed

    def ews_nopow(rho_l, u_l, p_l, c_l, rho_r, u_r, p_r, c_r, gamma):
        p_max = jnp.maximum(p_l, p_r)
        p_min = jnp.minimum(p_l, p_r)
        Q = p_max / p_min
        rho_avg = 0.5 * (rho_l + rho_r)
        c_avg = 0.5 * (c_l + c_r)
        factor = rho_avg * c_avg
        pstar0 = 0.5 * (p_l + p_r) + 0.5 * (u_l - u_r) * factor
        ustar0 = 0.5 * (u_l + u_r) + 0.5 * (p_l - p_r) / factor
        z = (gamma - 1.0) / (2.0 * gamma)
        p_lr = 1.0 + z * (p_l / p_r - 1.0)          # fake pow
        ustar_2r = (p_lr * u_l / c_l + u_r / c_r +
                    2.0 * (p_lr - 1.0) / (gamma - 1.0)) / \
            (p_lr / c_l + 1.0 / c_r)
        pstar_2r = 0.5 * (
            p_l * (1.0 + (1.0 / z) *
                   ((gamma - 1.0) * (u_l - ustar_2r) / (2.0 * c_l))) +
            p_r * (1.0 + (1.0 / z) *
                   ((gamma - 1.0) * (ustar_2r - u_r) / (2.0 * c_r))))
        A_r = 2.0 / ((gamma + 1.0) * rho_r)
        B_r = p_r * (gamma - 1.0) / (gamma + 1.0)
        A_l = 2.0 / ((gamma + 1.0) * rho_l)
        B_l = p_l * (gamma - 1.0) / (gamma + 1.0)
        p_guess = jnp.maximum(0.0, pstar0)
        g_l = jnp.sqrt(A_l / (p_guess + B_l))
        g_r = jnp.sqrt(A_r / (p_guess + B_r))
        pstar_2s = (g_l * p_l + g_r * p_r - (u_r - u_l)) / (g_l + g_r)
        ustar_2s = 0.5 * (u_l + u_r) + \
            0.5 * ((pstar_2s - p_r) * g_r - (pstar_2s - p_l) * g_l)
        upgrade = (Q > 2.0) & ((pstar0 < p_min) | (pstar0 > p_max))
        use_2r = upgrade & (pstar0 < p_min)
        use_2s = upgrade & ~(pstar0 < p_min)
        pstar = jnp.where(use_2r, pstar_2r,
                          jnp.where(use_2s, pstar_2s, pstar0))
        S_l = jnp.where(
            pstar <= p_l, u_l - c_l,
            u_l - c_l * jnp.sqrt(1.0 + ((gamma + 1.0) / (2.0 * gamma)) *
                                 (pstar / p_l - 1.0)))
        S_r = jnp.where(
            pstar <= p_r, u_r + c_r,
            u_r + c_r * jnp.sqrt(1.0 + ((gamma + 1.0) / (2.0 / gamma)) *
                                 (pstar / p_r - 1.0)))
        del ustar0, ustar_2r, ustar_2s
        return S_l, S_r

    riemann.estimate_wave_speed = ews_nopow
    try:
        zups, ms = build_and_time()
        out["B_nopow"] = (zups, ms)
        print(f"B no-pow        : {zups:.3e} zups  {ms:.3f} ms/step",
              flush=True)

        # C: + fake sqrt everywhere
        orig_sqrt = jax.numpy.sqrt
        jax.numpy.sqrt = lambda x: 0.5 + 0.5 * x
        try:
            zups, ms = build_and_time()
            out["C_nosqrt"] = (zups, ms)
            print(f"C no-pow,no-sqrt: {zups:.3e} zups  {ms:.3f} ms/step",
                  flush=True)
        finally:
            jax.numpy.sqrt = orig_sqrt
    finally:
        riemann.estimate_wave_speed = orig_ews

    import json
    print(json.dumps({k: {"zups": v[0], "ms_per_step": v[1]}
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
