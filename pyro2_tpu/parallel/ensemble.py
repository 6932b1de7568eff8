"""Ensemble (batch) parallelism: vmap a solver step over many problems.

The reference runs one problem per process (SURVEY.md section 2.9 --
its only concurrency is a test-harness process pool).  On TPU an ensemble
of same-shape problems is free by construction: vmap the pure jitted step
over a leading batch axis and XLA batches every stencil/Riemann kernel.
Combine with sharding by putting the batch axis on its own mesh axis.
"""

import jax

__all__ = ["ensemble_step", "ensemble_states"]


def ensemble_step(step, fill_bc=None):
    """Batch a pure single-state step over a leading ensemble axis.

    step:    pure fn (U, *args) -> U for ONE problem state
    fill_bc: optional pure ghost-fill fn U -> U applied before the step
             (the per-problem twin of the driver-level fill_BC_all)

    Returns a jitted fn (Us, *args) -> Us where Us has shape
    (n_ensemble, *U.shape) and *args (t, dt, ...) are shared scalars.
    """
    if fill_bc is not None:
        def one(U, *args):
            return step(fill_bc(U), *args)
    else:
        one = step

    def estep(Us, *args):
        return jax.vmap(lambda U: one(U, *args))(Us)

    return jax.jit(estep)


def ensemble_states(states):
    """Stack a list of same-shape problem states into an (n, ...) batch."""
    import jax.numpy as jnp
    return jnp.stack(list(states))
