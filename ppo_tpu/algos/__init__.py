"""Training algorithms: synchronous PPO and pipelined (AC-PPO-style) PPO."""
