"""Shared utilities: logging, hashing, audio I/O, registries, argparse glue."""
