"""Config system: dataclass defaults + CLI flags + derived-field recompute.

Mirrors the reference's GlobalConfig pattern (src/ppo_continuous_action.cpp:51-118:
defaults struct, args flags mirroring every field, derived batch/minibatch/
iteration counts recomputed after parsing, markdown hyperparameter dump for
TensorBoard) plus JSON round-trip like the CARLA config (carla_config.h:379-496).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field


@dataclass
class PPOConfig:
    # experiment
    exp_name: str = "ppo_tpu"
    seed: int = 1
    env_id: str = "HalfCheetah-v5"
    total_timesteps: int = 1_000_000
    torch_deterministic: bool = True        # accepted for CLI parity; no-op (JAX is deterministic)
    # algorithm (CleanRL defaults, ppo_continuous_action.cpp:51-76)
    learning_rate: float = 3e-4
    num_envs: int = 1
    num_steps: int = 2048
    anneal_lr: bool = True
    gamma: float = 0.99
    gae_lambda: float = 0.95
    num_minibatches: int = 32
    update_epochs: int = 10
    norm_adv: bool = True
    clip_coef: float = 0.2
    clip_vloss: bool = True
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    adam_eps: float = 1e-5                  # Adam epsilon (ppo_continuous_action.cpp:69)
    clip_actions: bool = True               # clip actions to the action space (gym.h:133-139)
    # "human" renders the final-eval trajectory to <run folder>/eval.gif via the
    # software renderer AND dumps a train_%09d.gif every render_interval
    # iterations during training (the headless analogue of the reference's
    # every-step GLFW window, mujoco_env.h:49-79, 110-134); "rgb_array"
    # disables visualization like the reference
    render: str = "rgb_array"
    # in-training dump period for render=human; 0 = num_iterations // 10
    # (about ten snapshots per run), like train_cnn's --visualize_interval
    render_interval: int = 0
    # Device guidance (reference README.md:83-84; ppo_continuous_action runs
    # CPU by default, src/ppo_continuous_action.cpp:291-295): tiny MuJoCo
    # configs (the 1x2048 CleanRL default) are op-latency-bound on an
    # accelerator and run faster on host CPU; big lockstep batches belong on
    # the TPU. "auto" picks CPU when num_envs < 4, else the accelerator.
    # "cpu" forces host execution. "tpu" keeps the platform default.
    device: str = "auto"                    # auto | cpu | tpu
    # infra
    exp_folder: str = "runs"
    num_eval_runs: int = 10
    eval_seed: int = 10_000
    checkpoint_every: int = 1
    resume_from: str = ""                   # checkpoint file or run folder to resume from
    # Newton solver iterations per physics substep. 4 warmstarted iterations
    # track MuJoCo trajectories to 1e-5..1e-4 over 50 steps
    # (tests/test_physics_step.py::test_warmstart_low_iterations_trajectory)
    solver_iterations: int = 4
    # lane-major batched physics (physics/lanes.py) vs vmapped reference path
    batch_impl: str = "lanes"               # lanes | vmap
    # dynamic top-k contact-slot selection on the lanes path (the variable-nc
    # analogue of MuJoCo's contact handling; lanes.select_topk_contacts):
    # -1 = per-model default (measured headroom, envs/mujoco_envs.py),
    # 0 = off (full static slot table), >0 = explicit k
    contact_topk: int = -1
    agent: str = "gaussian"                 # gaussian | beta
    sample_type: str = "sample"             # beta-agent collection sampling
    # AC-PPO style extensions
    pipelined: bool = False                 # overlap rollout & update (AC-PPO replacement)
    num_devices: int = 1                    # data-parallel devices (mesh axis size)
    use_dd_ppo_preempt: bool = False        # host-level straggler preemption (parallel/preempt.py)
    dd_ppo_min_perc: float = 0.25
    dd_ppo_preempt_threshold: float = 0.6
    rdzv_addr: str = "localhost"            # TCP-store host (ac_ppo_continuous_action.cpp:85)
    tcp_store_port: int = 29500             # TCP-store port (ac_ppo_continuous_action.cpp:86)
    # observability: capture a jax.profiler trace of iterations 3-5 into
    # <run folder>/profile (the TicToc/charts-SPS analogue at XLA-op depth)
    profile: bool = False
    # derived (recomputed, not flags)
    batch_size: int = field(init=False, default=0)
    minibatch_size: int = field(init=False, default=0)
    num_iterations: int = field(init=False, default=0)

    def __post_init__(self):
        self.recompute()

    def recompute(self):
        self.batch_size = self.num_steps * self.num_envs
        self.minibatch_size = max(1, self.batch_size // self.num_minibatches)
        self.num_iterations = self.total_timesteps // self.batch_size
        self.validate()
        return self

    def validate(self):
        """Divisibility checks (carla_config.h:356-370 semantics)."""
        if self.num_envs % self.num_devices != 0:
            raise ValueError("num_envs must be a multiple of num_devices.")
        if self.batch_size % self.num_minibatches != 0:
            raise ValueError("The batch size must be divisible by the minibatch size.")
        if self.batch_size % self.num_devices != 0:
            raise ValueError("The batch size must be divisible by the number of devices.")
        if self.minibatch_size % self.num_devices != 0:
            raise ValueError("The minibatch size must be divisible by the number of devices.")
        if self.render not in ("rgb_array", "human"):
            raise ValueError("render must be 'rgb_array' or 'human'.")

    # -- markdown dump for TB (to_string, ppo_continuous_action.cpp:83-117)
    def to_markdown(self) -> str:
        rows = "\n".join(
            f"|{k}|{v}|" for k, v in dataclasses.asdict(self).items()
        )
        return "|param|value|\n|-|-|\n" + rows

    # -- JSON round-trip (carla_config.h pattern)
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["py/object"] = "ppo_tpu.config.PPOConfig"
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, text: str) -> "PPOConfig":
        d = json.loads(text)
        d.pop("py/object", None)
        cfg = cls()
        for k, v in d.items():
            if hasattr(cfg, k):
                setattr(cfg, k, v)
        return cfg.recompute()


def _add_flags(parser: argparse.ArgumentParser, cfg) -> None:
    for f in dataclasses.fields(cfg):
        if not f.init:
            continue
        default = getattr(cfg, f.name)
        if isinstance(default, bool):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=default)
        else:
            parser.add_argument(f"--{f.name}", type=type(default), default=default)


def parse_config(argv=None, cls=PPOConfig):
    """CLI > loaded json > defaults (the CARLA double-parse sandwich,
    ac_ppo_carla.cpp:90-99)."""
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--load_file", type=str, default="")
    known, _ = pre.parse_known_args(argv)
    cfg = cls()
    if known.load_file:
        with open(known.load_file) as f:
            cfg = cls.from_json(f.read())
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_file", type=str, default="")
    _add_flags(parser, cfg)
    args = parser.parse_args(argv)
    for f in dataclasses.fields(cfg):
        if f.init and hasattr(args, f.name):
            setattr(cfg, f.name, getattr(args, f.name))
    return cfg.recompute()
