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


def test_fast_loop_particles_match_host():
    """Particles ride in the scan carry: positions/active after the fast
    loop equal the host loop's (advection tophat + grid particles)."""
    from pyro2_tpu.driver_loop import run_sim_fast

    def setup():
        p = Pyro("advection")
        p.initialize_problem("tophat", inputs_dict={
            "mesh.nx": 16, "mesh.ny": 16, "driver.tmax": 0.3,
            "particles.do_particles": 1, "particles.n_particles": 25,
            "particles.particle_generator": "grid"})
        return p

    ph = setup()
    ph.run_sim()
    pf = setup()
    run_sim_fast(pf, chunk_steps=8)

    assert pf.sim.n == ph.sim.n
    np.testing.assert_allclose(
        np.asarray(pf.sim.particles.positions),
        np.asarray(ph.sim.particles.positions), rtol=1e-13, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(pf.sim.particles.active),
                                  np.asarray(ph.sim.particles.active))
    np.testing.assert_allclose(np.asarray(pf.sim.cc_data.data),
                               np.asarray(ph.sim.cc_data.data),
                               rtol=1e-13, atol=1e-14)


def test_fast_loop_output_cadence(tmp_path, monkeypatch):
    """The fast loop writes the same files (names, count, contents) as
    the host loop: the scan freezes at output-due steps (reference
    cadence simulation_null.py:200-212)."""
    import glob

    import pyro2_tpu.util.io_pyro as io_pyro
    from pyro2_tpu.driver_loop import run_sim_fast

    def run(sub, fast):
        d = tmp_path / sub
        d.mkdir()
        monkeypatch.chdir(d)
        p = Pyro("compressible")
        p.initialize_problem("sod", inputs_dict={
            "mesh.nx": 32, "mesh.ny": 8, "driver.tmax": 0.08,
            "io.dt_out": 0.025, "io.basename": "cad_",
            "particles.do_particles": 0})
        p.rp.set_param("io.do_io", 1)     # library mode forces io off
        if fast:
            run_sim_fast(p, chunk_steps=64)
        else:
            p.run_sim()
        return sorted(glob.glob(str(d / "cad_*.h5")))

    host_files = run("host", fast=False)
    fast_files = run("fast", fast=True)

    assert [f.rsplit("/", 1)[-1] for f in fast_files] ==         [f.rsplit("/", 1)[-1] for f in host_files]
    assert len(host_files) >= 4          # initial + >=2 cadence + final
    for hf, ff in zip(host_files, fast_files):
        sh = io_pyro.read(hf)
        sf = io_pyro.read(ff)
        assert sf.n == sh.n
        assert np.isclose(sf.cc_data.t, sh.cc_data.t, rtol=0, atol=1e-14)
        np.testing.assert_allclose(np.asarray(sf.cc_data.data),
                                   np.asarray(sh.cc_data.data),
                                   rtol=1e-13, atol=1e-14)
