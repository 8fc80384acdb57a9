"""CLI entry points: python -m howl_tpu.training.run.<tool>."""
