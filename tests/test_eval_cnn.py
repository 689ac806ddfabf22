"""Offline evaluation of a train_cnn checkpoint through eval.py.

The reference evaluates CARLA checkpoints through ppo_carla_inference
(ppo_carla_inference.cpp:95-115); eval.py's agent dispatch is the offline
analogue — a CNN run folder (config.json + state_*.msgpack) must evaluate
without the serve socket.
"""

import json

import jax
import numpy as np


def test_eval_cli_on_cnn_checkpoint(tmp_path, capsys):
    from ppo_tpu import eval as eval_cli
    from ppo_tpu.envs.synthetic_driving import SyntheticDriving
    from ppo_tpu.models import RoachCNNActorCritic
    from ppo_tpu.train_cnn import CNNConfig
    from ppo_tpu.utils import checkpoint as ckpt

    env = SyntheticDriving()
    cfg = CNNConfig(num_envs=2, num_eval_runs=2)
    model = RoachCNNActorCritic(
        act_dim=env.act_dim, image_encoder=cfg.image_encoder,
        beta_min_a_b_value=cfg.beta_min_a_b_value,
    )
    params = model.init_params(
        jax.random.PRNGKey(0), env.obs_shape, env.n_measurements, env.n_value_measurements
    )
    run = tmp_path / "run"
    run.mkdir()
    ckpt.save_state({"params": params}, run, 3)
    (run / "config.json").write_text(cfg.to_json())

    result = eval_cli.main(["--checkpoint", str(run), "--episodes", "2"])
    assert result["episodes"] == 2
    assert result["iteration"] == 3
    assert result["sample_type"] == "mean"  # deterministic default for CNN runs
    assert all(np.isfinite(r) for r in result["returns"])
    # the printed line is machine-readable JSON
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["episodes"] == 2
