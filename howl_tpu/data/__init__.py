"""Data model, datasets, transforms, and ETL for howl_tpu."""
