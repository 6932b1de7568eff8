"""SPMD method-of-lines compressible solvers over a device mesh.

The distributed tier for compressible_rk / compressible_fv4 /
compressible_sdc (VERDICT r03 item 3).  These are the natural scale-out
solvers: one flux evaluation (substep) per RK stage / SDC node, so the
whole timestep is `stages x (halo exchange + block-local substep)` --
the simplest communication pattern in the framework (reference stage
loop: /root/reference/pyro/compressible_rk/simulation.py:73-104, SDC
sweep: compressible_sdc/simulation.py:36-85; both serial).

Reuses ShardedSim's machinery (block-local Simulation, blockwise init,
gated solid walls, per-variable halo exchange, pmin dt); only the step
body differs: the Butcher-tableau stage loop (mesh/integration.py) or
the SDC node sweep runs INSIDE one shard_map program, with a halo
exchange before each substep exactly where the serial evolve calls
fill_BC_all.  Stage starts / the final update accumulate increments over
the valid region only, as RKIntegrator does; a sharded step matches the
serial evolve to compilation ulps (the one-program step fuses FMAs
differently than the serial per-stage dispatches).

fv4/sdc note: state is cell AVERAGES; `preevolve_interior` converts the
blockwise ICs centers->averages (one halo exchange + from_centers_array
per variable, the sharded twin of fv4 preevolve).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pyro2_tpu.mesh import integration
from pyro2_tpu.mesh.fv import from_centers_array
from pyro2_tpu.parallel.sharded import ShardedSim

__all__ = ["ShardedCompressibleRK", "ShardedCompressibleFV4",
           "ShardedCompressibleSDC"]


class _ShardedMOL(ShardedSim):
    """Shared stage-loop machinery for the MOL tier."""

    _SOLVERS = ("compressible_rk", "compressible_fv4", "compressible_sdc")

    def _valid_sl(self):
        g = self.local_grid
        return (Ellipsis, slice(g.ilo, g.ihi + 1), slice(g.jlo, g.jhi + 1))

    def _pad(self, U_int):
        ng = self.ng
        pad = [(0, 0)] * U_int.ndim
        pad[-2] = (ng, ng)
        pad[-1] = (ng, ng)
        return jnp.pad(U_int, pad)

    def _build(self):
        ng = self.ng
        sl = self._valid_sl()
        method = self.rp.get_param("compressible.temporal_method")
        A = integration.a[method]
        B = integration.b[method]
        C = integration.c[method]
        substep = self.local_sim._make_substep()
        use_kernel = False
        if jax.default_backend() == "tpu":
            # eligible configurations run each stage increment as the
            # fused Pallas band kernel on the local block (the
            # single-chip MOL kernel win carried to multi-chip); the
            # jnp substep stays the fallback
            from pyro2_tpu.solvers.compressible.pallas_step import \
                IneligibleStep
            try:
                substep = self.local_sim._make_fused_substep()
                use_kernel = True
            except IneligibleStep:
                pass
            except Exception as e:
                print(f"WARNING: fused sharded MOL substep build failed "
                      f"({type(e).__name__}: {e}); using the jnp substep")

        def body(U_int, t, dt):
            self._gate_solid()
            U0 = self._pad(U_int)
            ks = []
            for s in range(len(B)):
                Us = U0
                for j in range(s):
                    if A[s, j] != 0.0:
                        Us = Us.at[sl].add(dt * A[s, j] * ks[j][sl])
                ts = t + C[s] * dt
                Us = self._fill_local(Us, ts)
                ks.append(substep(Us, ts, dt))
            out = U0
            for s in range(len(B)):
                if B[s] != 0.0:
                    out = out.at[sl].add(dt * B[s] * ks[s][sl])
            return out[..., ng:-ng, ng:-ng]

        spec = P(None, "x", "y")
        # check_vma off in kernel mode (pallas outputs don't thread
        # varying-mesh-axes metadata; see sharded_mg.py kernel mode)
        return jax.jit(jax.shard_map(body, mesh=self.mesh,
                                     in_specs=(spec, P(), P()),
                                     out_specs=spec,
                                     check_vma=not use_kernel))


class ShardedCompressibleRK(_ShardedMOL):
    def __init__(self, rp, mesh, *, problem="test", ng=4):
        super().__init__("compressible_rk", rp, mesh, problem=problem,
                         ng=ng)


class _ShardedFV4Base(_ShardedMOL):
    """Average-state (FV2d) solvers: adds the centers->averages
    preevolve conversion."""

    def preevolve_interior(self, U_int):
        """The sharded fv4 preevolve: convert blockwise cell-center ICs
        to cell averages (fv4/simulation.py preevolve; one exchange +
        from_centers_array, bitwise the serial per-variable loop)."""
        if not hasattr(self, "_preevolve_fn"):
            ng = self.ng
            g = self.local_grid

            def body(U_int):
                U = self._fill_local(self._pad(U_int))
                U = from_centers_array(U, g)
                return U[..., ng:-ng, ng:-ng]

            spec = P(None, "x", "y")
            self._preevolve_fn = jax.jit(jax.shard_map(
                body, mesh=self.mesh, in_specs=spec, out_specs=spec))
        return self._preevolve_fn(U_int)


class ShardedCompressibleFV4(_ShardedFV4Base):
    def __init__(self, rp, mesh, *, problem="test", ng=4):
        super().__init__("compressible_fv4", rp, mesh, problem=problem,
                         ng=ng)


class ShardedCompressibleSDC(_ShardedFV4Base):
    """SDC node-sweep integration, sharded (3 Gauss-Lobatto nodes, 4
    iterations; 9 substeps per step)."""

    def __init__(self, rp, mesh, *, problem="test", ng=4):
        super().__init__("compressible_sdc", rp, mesh, problem=problem,
                         ng=ng)

    def _build(self):
        ng = self.ng
        sl = self._valid_sl()
        n_nodes = self.local_sim.n_nodes
        n_iter = self.local_sim.n_iter
        substep = self.local_sim._make_substep()

        def integral(m, dt, As):
            # Simpson-rule quadrature (sdc/simulation.py sdc_integral)
            if m == 0:
                return dt / 24.0 * (5.0 * As[0] + 8.0 * As[1] - As[2])
            return dt / 24.0 * (-As[0] + 8.0 * As[1] + 5.0 * As[2])

        def body(U_int, t, dt):
            self._gate_solid()
            U0 = self._fill_local(self._pad(U_int), t)
            A0 = substep(U0, t, dt)
            A_kold = [A0] * n_nodes
            A_knew = list(A_kold)
            U_knew = [U0] * n_nodes

            for _ in range(n_iter):
                for m in range(n_nodes):
                    if m > 0:
                        A_knew[m] = substep(U_knew[m], t, dt)
                    if m < n_nodes - 1:
                        intg = integral(m, dt, A_kold)
                        upd = (U_knew[m][sl] +
                               0.5 * dt * (A_knew[m][sl] - A_kold[m][sl]) +
                               intg[sl])
                        U_next = U_knew[m + 1].at[sl].set(upd)
                        U_knew[m + 1] = self._fill_local(U_next, t)
                A_kold = list(A_knew)
            return U_knew[-1][..., ng:-ng, ng:-ng]

        spec = P(None, "x", "y")
        return jax.jit(jax.shard_map(body, mesh=self.mesh,
                                     in_specs=(spec, P(), P()),
                                     out_specs=spec))
