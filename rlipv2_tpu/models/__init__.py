"""flax.linen model zoo for rlipv2_tpu."""
