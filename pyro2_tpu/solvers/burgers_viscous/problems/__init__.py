"""Problems shared with the inviscid burgers solver (re-exported)."""
import importlib
import sys

from pyro2_tpu.solvers.burgers import problems as _base

for _name in _base.__all__:
    sys.modules[__name__ + "." + _name] = importlib.import_module(
        "pyro2_tpu.solvers.burgers.problems." + _name)

__all__ = _base.__all__
