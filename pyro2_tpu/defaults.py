"""Global numeric defaults.

The reference is float64 everywhere (patch.py:350-361).  On TPU hardware f64
is emulated and slow, so the working dtype is configurable: float64 when JAX
x64 mode is enabled (CPU parity/regression runs), float32 otherwise (TPU
production runs).  Solvers read the dtype from the state arrays they are
handed, so flipping `jax_enable_x64` is the only switch needed.
"""

import jax.numpy as jnp
from jax import config as _jax_config


def dtype():
    """The default floating dtype: f64 under x64 mode, else f32."""
    return jnp.float64 if _jax_config.jax_enable_x64 else jnp.float32
