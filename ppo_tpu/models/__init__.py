"""Actor-critic networks (flax.linen), matching the reference's three families."""

from ppo_tpu.models.mlp_gaussian import GaussianActorCritic
from ppo_tpu.models.mlp_beta import BetaActorCritic
from ppo_tpu.models.cnn_beta import RoachCNNActorCritic

__all__ = ["GaussianActorCritic", "BetaActorCritic", "RoachCNNActorCritic"]
