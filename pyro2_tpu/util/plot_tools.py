"""Plot-layout helpers for runtime visualization.

Aspect-ratio-aware ImageGrid layout (reference: pyro/util/plot_tools.py:19+),
plus a generic field plotter shared by solver `dovis` methods.
"""

import math

import numpy as np


def _key_handler(event):
    if event.key == "ctrl+c":
        from pyro2_tpu.util import msg
        msg.fail("ABORT: KeyboardInterrupt")


def setup_axes(myg, num):
    """Create a grid of axes laid out to suit the domain aspect ratio."""
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1 import ImageGrid

    L_x = myg.xmax - myg.xmin
    L_y = myg.ymax - myg.ymin

    f = plt.figure(1)
    f.canvas.mpl_connect("key_press_event", _key_handler)

    cbar_title = False

    if L_x > 2 * L_y:
        axes = ImageGrid(f, 111, nrows_ncols=(num, 1), share_all=True,
                         cbar_mode="each", cbar_location="top",
                         cbar_pad="10%", cbar_size="25%",
                         axes_pad=(0.25, 0.65), label_mode="L")
        cbar_title = True
    elif L_y > 2 * L_x:
        axes = ImageGrid(f, 111, nrows_ncols=(1, num), share_all=True,
                         cbar_mode="each", cbar_location="right",
                         cbar_pad="10%", cbar_size="25%",
                         axes_pad=(0.65, 0.25), label_mode="L")
    else:
        ny = math.ceil(math.sqrt(num))
        nx = math.ceil(num / ny)
        axes = ImageGrid(f, 111, nrows_ncols=(nx, ny), share_all=True,
                         cbar_mode="each", cbar_location="right",
                         cbar_pad="2%", axes_pad=(0.65, 0.25), label_mode="L")

    return f, axes, cbar_title


def plot_fields(sim, fields, title=None):
    """Generic dovis body: imshow each (name, padded-array) pair."""
    import matplotlib.pyplot as plt

    from pyro2_tpu.mesh.indexer import ai

    plt.clf()
    myg = sim.cc_data.grid
    _, axes, cbar_title = setup_axes(myg, len(fields))

    for n, (name, arr) in enumerate(fields):
        ax = axes[n]
        v = np.asarray(ai(arr, myg).v())
        img = ax.imshow(np.transpose(v), interpolation="nearest",
                        origin="lower",
                        extent=[myg.xmin, myg.xmax, myg.ymin, myg.ymax],
                        cmap=sim.cm)
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        if cbar_title:
            cb = axes.cbar_axes[n].colorbar(img)
            cb.ax.set_title(name)
        else:
            axes.cbar_axes[n].colorbar(img)
            ax.set_title(name)

    if title is not None:
        plt.suptitle(title)
    plt.figtext(0.05, 0.0125, f"t = {sim.cc_data.t:10.5f}")
    plt.pause(0.001)
    plt.draw()
