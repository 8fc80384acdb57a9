"""Workspace: checkpoints, settings snapshots, metrics (ref: howl/workspace.py:16-110).

Layout inside a workspace directory:
  model.flax / model-best.flax   — flax msgpack of {params, batch_stats}
  train_state.flax               — full TrainState incl. optimizer state
                                   (the reference never checkpointed optimizer
                                   state; resume here is exact)
  zmuv.json                      — fitted ZMUV statistics
  settings.json                  — settings snapshot (round-tripped at
                                   inference time, critical for reproducing
                                   the frontend geometry)
  cmd-args.json                  — CLI invocation record
  metrics.jsonl                  — append-only scalar log (step, name, value)
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Optional

import flax
import jax

from howl_tpu.ops.zmuv import ZmuvTransform
from howl_tpu.settings import SETTINGS, HowlSettings
from howl_tpu.utils.logger import Logger


class Workspace:
    def __init__(self, path: Path, best_quality: float = float("-inf"), delete_existing: bool = True):
        self.path = Path(path)
        self.best_quality = best_quality
        self.path.mkdir(parents=True, exist_ok=True)
        self._metrics_file = None
        if delete_existing:
            metrics = self.path / "metrics.jsonl"
            if metrics.exists():
                metrics.unlink()
            # stale TensorBoard event files would render dead runs' curves
            # overlaid on the new run (ref howl/workspace.py:26-28 rmtree)
            logs = self.path / "logs"
            if logs.exists():
                import shutil

                shutil.rmtree(logs)

    # ---- model checkpoints ----

    def model_path(self, best: bool = False) -> Path:
        return self.path / f"model{'-best' if best else ''}.flax"

    def save_model(self, variables: Any, best: bool = False):
        data = flax.serialization.to_bytes(jax.device_get(variables))
        self.model_path(best).write_bytes(data)

    def load_model(self, template: Any, best: bool = True) -> Any:
        data = self.model_path(best).read_bytes()
        return flax.serialization.from_bytes(template, data)

    def increment_model(self, variables: Any, quality: float):
        """Save latest; keep best by quality (ref workspace.py:44-54)."""
        if quality > self.best_quality:
            self.save_model(variables, best=True)
            self.best_quality = quality
        self.save_model(variables, best=False)

    def save_train_state(self, state: Any):
        (self.path / "train_state.flax").write_bytes(
            flax.serialization.to_bytes(jax.device_get(state))
        )

    def load_train_state(self, template: Any) -> Any:
        return flax.serialization.from_bytes(template, (self.path / "train_state.flax").read_bytes())

    def has_train_state(self) -> bool:
        return (self.path / "train_state.flax").exists()

    # ---- zmuv ----

    def save_zmuv(self, zmuv: ZmuvTransform):
        (self.path / "zmuv.json").write_text(json.dumps(zmuv.state_dict()))

    def load_zmuv(self) -> Optional[ZmuvTransform]:
        path = self.path / "zmuv.json"
        if not path.exists():
            return None
        return ZmuvTransform.from_state_dict(json.loads(path.read_text()))

    # ---- settings / args ----

    def save_settings(self, settings: HowlSettings = SETTINGS):
        data = settings.to_dict()
        for key in ("dataset", "resource"):
            data.pop(key, None)
        (self.path / "settings.json").write_text(json.dumps(data, indent=2))

    def load_settings(self, settings: HowlSettings = SETTINGS) -> HowlSettings:
        data = json.loads((self.path / "settings.json").read_text())
        settings.load_dict(data)
        return settings

    def save_config(self, training_config, training_config_path: Optional[Path] = None):
        """Persist a TrainingConfig snapshot (ref workspace.py:83-96)."""
        path = Path(training_config_path) if training_config_path else self.path / "training_config.json"
        training_config.workspace_path = str(self.path)
        path.write_text(training_config.json(indent=4))

    def load_config(self, training_config_path: Optional[Path] = None):
        from howl_tpu.config import TrainingConfig

        path = Path(training_config_path) if training_config_path else self.path / "training_config.json"
        return TrainingConfig.parse_file(path)

    def write_args(self, args):
        data = {k: v for k, v in vars(args).items() if not k.startswith("_")}
        (self.path / "cmd-args.json").write_text(json.dumps(data, indent=2, default=str))

    # ---- metrics ----

    def log_scalar(self, name: str, value: float, step: int = 0):
        if self._metrics_file is None:
            self._metrics_file = (self.path / "metrics.jsonl").open("a")
        self._metrics_file.write(
            json.dumps({"time": time.time(), "step": int(step), "name": name, "value": float(value)}) + "\n"
        )
        self._metrics_file.flush()
        # TensorBoard-readable mirror in logs/ (ref workspace.py:29 SummaryWriter)
        if getattr(self, "_tb_writer", None) is None:
            from howl_tpu.utils.tb_events import EventFileWriter

            self._tb_writer = EventFileWriter(self.path / "logs")
        self._tb_writer.add_scalar(name, value, step)

    def close(self):
        """Release the metrics jsonl and TensorBoard event file handles."""
        if self._metrics_file is not None:
            self._metrics_file.close()
            self._metrics_file = None
        if getattr(self, "_tb_writer", None) is not None:
            self._tb_writer.close()
            self._tb_writer = None

    def summary(self) -> dict:
        """Latest value per metric name."""
        out = {}
        path = self.path / "metrics.jsonl"
        if path.exists():
            for line in path.read_text().splitlines():
                rec = json.loads(line)
                out[rec["name"]] = rec["value"]
        return out

    def heading(self, msg: str):
        Logger.heading(msg)
