"""TB event writer round-trip (read back with tensorboard's reader), checkpoints, config."""

import numpy as np


def test_tb_events_readable(tmp_path):
    from ppo_tpu.utils.tb import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.add_text("hyperparameters", "|param|value|\n|-|-|\n|lr|3e-4|")
    for i in range(5):
        w.add_scalar("charts/SPS", 100.0 + i, i)
        w.add_scalar("losses/value_loss", 0.5 * i, i)
    w.close()

    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    scalars = acc.Tags()["scalars"]
    assert "charts/SPS" in scalars and "losses/value_loss" in scalars
    ev = acc.Scalars("charts/SPS")
    assert [e.step for e in ev] == list(range(5))
    np.testing.assert_allclose([e.value for e in ev], [100, 101, 102, 103, 104])
    assert "hyperparameters" in acc.Tags()["tensors"]


def test_config_json_roundtrip(tmp_path):
    from ppo_tpu.config import PPOConfig, parse_config

    cfg = PPOConfig(env_id="Hopper-v5", num_envs=8, num_steps=128)
    p = tmp_path / "config.json"
    p.write_text(cfg.to_json())
    # CLI > json > defaults sandwich
    cfg2 = parse_config(["--load_file", str(p), "--num_envs", "16"])
    assert cfg2.env_id == "Hopper-v5"
    assert cfg2.num_envs == 16
    assert cfg2.num_steps == 128
    assert cfg2.batch_size == 16 * 128


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from ppo_tpu.utils import checkpoint as ckpt

    state = {"params": {"w": jnp.arange(4.0)}, "it": jnp.asarray(3)}
    ckpt.save_state(state, tmp_path, 1)
    ckpt.save_state(state, tmp_path, 2)
    # stale cleanup keeps only the newest
    path, it = ckpt.latest_checkpoint(tmp_path)
    assert it == 2
    files = [f.name for f in tmp_path.iterdir() if "latest" in f.name]
    assert len(files) == 1
    restored = ckpt.restore_state(path, state)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), [0, 1, 2, 3])


def test_hardcoded_obs_stats_sanitized():
    """The reference's Humanoid std table has 19 exact zeros (constant cinert
    features, ac_ppo...cpp:497) which NaN the baked (x-mean)/std normalize;
    get_obs_stats must return them as 1 (constants otherwise verbatim)."""
    import numpy as np

    from ppo_tpu.hardcoded_obs_stats import _TABLE, get_obs_stats

    raw_mean, raw_std = _TABLE["Humanoid-v4"]
    assert np.sum(np.asarray(raw_std) == 0.0) == 19  # stored verbatim
    mean, std = get_obs_stats("Humanoid-v4", 376)
    assert std.min() > 0
    nz = np.asarray(raw_std) > 0
    np.testing.assert_array_equal(std[nz], np.asarray(raw_std)[nz])
    np.testing.assert_array_equal(mean, np.asarray(raw_mean))
