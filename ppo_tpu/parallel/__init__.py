"""Device-mesh parallelism: data-parallel training via shard_map + collectives.

Replaces the reference's MPI/NCCL layer (include/distributed.h,
src/distributed.cpp): rank-0 broadcast becomes same-key replicated init,
per-minibatch gradient allreduce becomes `jax.lax.pmean` fused inside the
jitted update, and rendezvous is `jax.distributed.initialize`.
"""

from ppo_tpu.parallel.dp import (
    make_distributed_train_iteration,
    init_distributed_runner_state,
    make_mesh,
)
