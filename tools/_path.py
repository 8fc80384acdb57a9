"""Shared bootstrap: put the repo root on sys.path so every tools/ script
runs standalone (``python tools/<tool>.py``) without a manual PYTHONPATH.
Import for its side effect: ``import _path  # noqa: F401``."""

import sys
from pathlib import Path

_root = str(Path(__file__).resolve().parents[1])
if _root not in sys.path:
    sys.path.insert(0, _root)
