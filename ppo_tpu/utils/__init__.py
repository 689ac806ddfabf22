"""Utilities: TensorBoard writing, phase timing, checkpointing."""
