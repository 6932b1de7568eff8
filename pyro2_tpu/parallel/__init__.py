"""Multi-chip execution: block-partitioned grids over a device mesh.

The reference has no intra-simulation parallelism (SURVEY.md section 2.9);
this layer is new.  Grids block-partition over a `jax.sharding.Mesh`
("x", "y"); ghost-cell halos are exchanged with `lax.ppermute` over ICI,
physical BCs apply only on boundary-owning blocks, and global reductions
(dt, norms) use `lax.pmin`/`psum`.
"""

from pyro2_tpu.parallel.ensemble import ensemble_states, ensemble_step
from pyro2_tpu.parallel.mesh_comm import (factor_devices, halo_exchange,
                                          make_mesh)
from pyro2_tpu.parallel.sharded import (ShardedCompressible, ShardedSim,
                                        ShardedSWE,
                                        make_sharded_compressible_step)
from pyro2_tpu.parallel.sharded_burgers_viscous import \
    ShardedBurgersViscous
from pyro2_tpu.parallel.sharded_lm_atm import ShardedLMAtm
from pyro2_tpu.parallel.sharded_mg import ShardedMG
from pyro2_tpu.parallel.sharded_mol import (ShardedCompressibleFV4,
                                            ShardedCompressibleRK,
                                            ShardedCompressibleSDC)
from pyro2_tpu.parallel.sharded_particles import \
    make_sharded_particle_advance
