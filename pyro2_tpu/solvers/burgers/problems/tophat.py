"""A circular tophat velocity region that drives an outward shock."""

import numpy as np

from pyro2_tpu.util import msg

DEFAULT_INPUTS = "inputs.tophat"

PROBLEM_PARAMS = {}


def init_data(myd, rp):
    """Initialize the tophat burgers problem."""
    if rp.get_param("driver.verbose"):
        msg.bold("initializing the tophat burgers problem...")

    g = myd.grid
    xctr = 0.5 * (g.xmin + g.xmax)
    yctr = 0.5 * (g.ymin + g.ymax)
    R = 0.1
    inside = (g.x2d - xctr) ** 2 + (g.y2d - yctr) ** 2 < R ** 2

    myd.set_var("x-velocity", np.where(inside, 1.0, 0.0))
    myd.set_var("y-velocity", np.where(inside, 1.0, 0.0))


def finalize():
    """Print out any information to the user at the end of the run."""
