#!/usr/bin/env python3
"""The Pyro driver: solver/problem registry, param layering, run loop.

API mirror of /root/reference/pyro/pyro_sim.py:34-460 (Pyro, PyroBenchmark,
CLI main), retargeted at the TPU-native solver package.
"""

import argparse
import importlib
import os

import jax

import pyro2_tpu.util.profile_pyro as profile
from pyro2_tpu.util import compare, msg
from pyro2_tpu.util.runparams import RuntimeParameters, _get_val

valid_solvers = ["advection",
                 "advection_nonuniform",
                 "advection_rk",
                 "advection_fv4",
                 "advection_weno",
                 "burgers",
                 "burgers_viscous",
                 "compressible",
                 "compressible_rk",
                 "compressible_fv4",
                 "compressible_sdc",
                 "compressible_react",
                 "diffusion",
                 "incompressible",
                 "incompressible_viscous",
                 "lm_atm",
                 "swe"]


class Pyro:
    """The main driver: pairs a solver with a problem and runs it."""

    def __init__(self, solver_name, *, from_commandline=False):
        if from_commandline:
            msg.bold("pyro ...")

        if solver_name not in valid_solvers:
            msg.fail(f"ERROR: {solver_name} is not a valid solver")

        self.from_commandline = from_commandline

        self.pyro_home = os.path.dirname(os.path.realpath(__file__)) + "/"
        solver_import = "pyro2_tpu.solvers." + solver_name

        self.solver = importlib.import_module(solver_import)
        self.solver_name = solver_name

        self.problem_name = None
        self.problem_func = None
        self.problem_source = None
        self.problem_params = None
        self.problem_finalize = None

        self.custom_problems = {}

        # layered runtime parameters: package defaults, then solver defaults
        self.rp = RuntimeParameters()
        self.rp.load_params(self.pyro_home + "_defaults")
        self.rp.load_params(self.pyro_home + "solvers/" + self.solver_name +
                            "/_defaults")

        self.tc = profile.TimerCollection()
        self.is_initialized = False

    def add_problem(self, name, problem_func, *, problem_params=None):
        """Register a custom problem setup for this solver."""
        if problem_params is None:
            problem_params = {}
        self.custom_problems[name] = (problem_func, problem_params)

    def initialize_problem(self, problem_name, *, inputs_file=None,
                           inputs_dict=None):
        """Set up the named problem: params, Simulation, initialize."""
        if problem_name in self.custom_problems:
            self.problem_name = problem_name
            self.problem_func, self.problem_params = \
                self.custom_problems[problem_name]
            self.problem_finalize = None
            self.problem_source = None
        else:
            problem = importlib.import_module(
                f"pyro2_tpu.solvers.{self.solver_name}.problems."
                f"{problem_name}")
            self.problem_name = problem_name
            self.problem_func = problem.init_data
            self.problem_params = getattr(problem, "PROBLEM_PARAMS", {})
            self.problem_finalize = problem.finalize
            self.problem_source = getattr(problem, "source_terms", None)

            if inputs_file is None:
                inputs_file = problem.DEFAULT_INPUTS

        for k, v in self.problem_params.items():
            self.rp.set_param(k, v, no_new=False)

        if inputs_file is not None:
            if not os.path.isfile(inputs_file):
                inputs_file = (self.pyro_home + "solvers/" +
                               self.solver_name + "/problems/" + inputs_file)
                if not os.path.isfile(inputs_file):
                    msg.fail("ERROR: inputs file does not exist")
            self.rp.load_params(inputs_file, no_new=1)

        # notebook/library mode: vis/io/verbose off by default
        if not self.from_commandline:
            self.rp.set_param("vis.dovis", 0)
            self.rp.set_param("driver.verbose", 0)
            self.rp.set_param("io.do_io", 0)

        if inputs_dict is not None:
            for k, v in inputs_dict.items():
                self.rp.set_param(k, v)

        self.rp.print_paramfile()

        self.verbose = self.rp.get_param("driver.verbose")
        self.dovis = self.rp.get_param("vis.dovis")

        # opt-in NaN trapping: the TPU analog of the reference's debug-time
        # state-validity checks (SURVEY.md section 5.2) -- every jitted
        # kernel re-runs un-jitted on NaN production and raises at the op
        if self.rp.get_param("driver.debug_nans"):
            jax.config.update("jax_debug_nans", True)

        self.sim = self.solver.Simulation(
            self.solver_name, self.problem_name, self.problem_func, self.rp,
            problem_finalize_func=self.problem_finalize,
            problem_source_func=self.problem_source,
            timers=self.tc)

        self.sim.initialize()
        self.sim.preevolve()

        if self.dovis:
            import matplotlib.pyplot as plt
            plt.ion()

        self.sim.cc_data.t = 0.0
        self.is_initialized = True

    def run_sim(self):
        """Evolve the entire simulation."""
        if not self.is_initialized:
            msg.fail("ERROR: problem has not been initialized")

        tm_main = self.tc.timer("main")
        tm_main.begin()

        basename = self.rp.get_param("io.basename")
        do_io = self.rp.get_param("io.do_io")

        if do_io:
            self.sim.write(f"{basename}{self.sim.n:04d}")

        if self.dovis:
            import matplotlib.pyplot as plt
            plt.figure(num=1, figsize=(8, 6), dpi=100, facecolor="w")
            self.sim.dovis()

        while not self.sim.finished():
            self.single_step()

        force_final_output = self.rp.get_param("io.force_final_output")
        if do_io or force_final_output:
            if self.verbose > 0:
                msg.warning("outputting...")
            basename = self.rp.get_param("io.basename")
            self.sim.write(f"{basename}{self.sim.n:04d}")

        tm_main.end()

        if self.verbose > 0:
            self.rp.print_unused_params()
            self.tc.report()

        self.sim.finalize()

    def single_step(self):
        """fill BCs -> compute dt -> evolve -> output -> vis."""
        if not self.is_initialized:
            msg.fail("ERROR: problem has not been initialized")

        self.sim.cc_data.fill_BC_all()
        self.sim.compute_timestep()
        self.sim.evolve()

        if self.verbose > 0:
            print(f"{self.sim.n:5d} {self.sim.cc_data.t:10.5f} "
                  f"{self.sim.dt:10.5f}")

        if self.sim.do_output():
            if self.verbose > 0:
                msg.warning("outputting...")
            basename = self.rp.get_param("io.basename")
            self.sim.write(f"{basename}{self.sim.n:04d}")

        if self.dovis:
            tm_vis = self.tc.timer("vis")
            tm_vis.begin()
            self.sim.dovis()
            if self.rp.get_param("vis.store_images") == 1:
                import matplotlib.pyplot as plt
                basename = self.rp.get_param("io.basename")
                plt.savefig(f"{basename}{self.sim.n:04d}.png")
            tm_vis.end()

    def __repr__(self):
        return f"Pyro('{self.solver_name}')"

    def __str__(self):
        s = f"Solver = {self.solver_name}\n"
        if self.is_initialized:
            s += f"Problem = {self.sim.problem_name}\n"
            s += f"Simulation time = {self.sim.cc_data.t}\n"
            s += f"Simulation step number = {self.sim.n}\n"
        s += "\nRuntime Parameters\n------------------\n"
        s += str(self.rp)
        return s

    def get_var(self, v):
        """The simulation data array for variable name v."""
        if not self.is_initialized:
            msg.fail("ERROR: problem has not been initialized")
        return self.sim.cc_data.get_var(v)

    def get_grid(self):
        if not self.is_initialized:
            msg.fail("ERROR: problem has not been initialized")
        return self.sim.cc_data.grid

    def get_sim(self):
        return self.sim


class PyroBenchmark(Pyro):
    """Pyro with golden-file benchmarking (regression testing) hooks."""

    def __init__(self, solver_name, *, comp_bench=False,
                 reset_bench_on_fail=False, make_bench=False):
        super().__init__(solver_name)
        self.comp_bench = comp_bench
        self.reset_bench_on_fail = reset_bench_on_fail
        self.make_bench = make_bench

    def run_sim(self, rtol=1.e-12):
        super().run_sim()

        result = 0
        if self.comp_bench:
            result = self.compare_to_benchmark(rtol)
        if self.make_bench or (result != 0 and self.reset_bench_on_fail):
            self.store_as_benchmark()
        if self.comp_bench:
            return result
        return self.sim

    def compare_to_benchmark(self, rtol):
        import pyro2_tpu.util.io_pyro as io
        basename = self.rp.get_param("io.basename")
        compare_file = (f"{self.pyro_home}solvers/{self.solver_name}/tests/"
                        f"{basename}{self.sim.n:04d}")
        msg.warning(f"comparing to: {compare_file} ")
        try:
            sim_bench = io.read(compare_file)
        except OSError:
            msg.warning("ERROR opening compare file")
            return "ERROR opening compare file"

        result = compare.compare(self.sim.cc_data, sim_bench.cc_data, rtol)
        if result == 0:
            msg.success(f"results match benchmark to within relative "
                        f"tolerance of {rtol}\n")
        else:
            msg.warning("ERROR: " + compare.errors[result] + "\n")
        return result

    def store_as_benchmark(self):
        tests_dir = f"{self.pyro_home}solvers/{self.solver_name}/tests/"
        if not os.path.isdir(tests_dir):
            try:
                os.mkdir(tests_dir)
            except (FileNotFoundError, PermissionError):
                msg.fail("ERROR: unable to create the solver's tests/ "
                         "directory")
        basename = self.rp.get_param("io.basename")
        bench_file = f"{tests_dir}{basename}{self.sim.n:04d}"
        msg.warning(f"storing new benchmark: {bench_file}\n")
        self.sim.write(bench_file)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--make_benchmark", action="store_true",
                   help="create a new benchmark file for regression testing")
    p.add_argument("--compare_benchmark", action="store_true",
                   help="compare the end result to the stored benchmark")
    p.add_argument("solver", metavar="solver-name", type=str, nargs=1,
                   help="name of the solver to use", choices=valid_solvers)
    p.add_argument("problem", metavar="problem-name", type=str, nargs=1,
                   help="name of the problem to run")
    p.add_argument("param", metavar="inputs-file", type=str, nargs=1,
                   help="name of the inputs file")
    p.add_argument("other", metavar="runtime-parameters", type=str, nargs="*",
                   help="additional runtime parameters that override the "
                        "inputs file in the format section.option=value")
    return p.parse_args()


def main():
    args = parse_args()

    if args.compare_benchmark or args.make_benchmark:
        pyro = PyroBenchmark(args.solver[0],
                             comp_bench=args.compare_benchmark,
                             make_bench=args.make_benchmark)
    else:
        pyro = Pyro(args.solver[0], from_commandline=True)

    other = {}
    for param_string in args.other:
        k, v = param_string.split("=")
        other[k] = _get_val(v)

    pyro.initialize_problem(problem_name=args.problem[0],
                            inputs_file=args.param[0],
                            inputs_dict=other)
    pyro.run_sim()


if __name__ == "__main__":
    main()
