"""On-device chunked driver loop == host-stepped loop (same dt ladder)."""

import numpy as np
import pytest

from pyro2_tpu.pyro_sim import Pyro


def _run_host(nx, tmax):
    p = Pyro("compressible")
    p.initialize_problem("sod", inputs_dict={
        "mesh.nx": nx, "mesh.ny": 8, "driver.tmax": tmax,
        "particles.do_particles": 0})
    p.run_sim()
    return p


def _run_fast(nx, tmax, chunk_steps):
    from pyro2_tpu.driver_loop import run_sim_fast
    p = Pyro("compressible")
    p.initialize_problem("sod", inputs_dict={
        "mesh.nx": nx, "mesh.ny": 8, "driver.tmax": tmax,
        "particles.do_particles": 0})
    run_sim_fast(p, chunk_steps=chunk_steps)
    return p


@pytest.mark.parametrize("chunk_steps", [4, 64])
def test_fast_loop_matches_host_loop(chunk_steps):
    """Same final state/t/n whether the chunk divides the run or overruns."""
    nx, tmax = 32, 0.05
    ph = _run_host(nx, tmax)
    pf = _run_fast(nx, tmax, chunk_steps)

    assert pf.sim.n == ph.sim.n
    assert np.isclose(pf.sim.cc_data.t, ph.sim.cc_data.t, rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(pf.sim.cc_data.data),
                               np.asarray(ph.sim.cc_data.data),
                               rtol=1e-13, atol=1e-14)


def test_fast_loop_rejects_particles():
    from pyro2_tpu.driver_loop import make_chunk_runner
    p = Pyro("compressible")
    p.initialize_problem("sod", inputs_dict={
        "mesh.nx": 16, "mesh.ny": 8, "driver.tmax": 0.01,
        "particles.do_particles": 1})
    with pytest.raises(NotImplementedError):
        make_chunk_runner(p.sim, 4)
