"""RL math kernels: distributions, GAE, PPO losses, running statistics."""

from ppo_tpu.ops.distributions import Beta, Dirichlet, Normal
from ppo_tpu.ops.gae import compute_gae
from ppo_tpu.ops.running_stats import RunningMeanStd, RewardNormState
from ppo_tpu.ops import ppo_loss

__all__ = [
    "Beta",
    "Dirichlet",
    "Normal",
    "compute_gae",
    "RunningMeanStd",
    "RewardNormState",
    "ppo_loss",
]
