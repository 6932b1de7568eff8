"""Cell-centered geometric multigrid (reference: pyro/multigrid/).

The level hierarchy is a static pytree of decreasing-size arrays; one full
V-cycle (smoothing, residual, transfer operators, bottom solve) traces into a
single jitted XLA computation per instance.
"""

from pyro2_tpu.multigrid.MG import CellCenterMG2d
