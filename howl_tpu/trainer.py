"""Config-driven Trainer (ref: howl/trainer.py — a WIP skeleton there; complete
here). Wraps the proven env-driven training implementation: the config is
materialized into SETTINGS and delegated to training.run.train, so both entry
paths exercise identical code.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from howl_tpu.config import TrainingConfig
from howl_tpu.context import InferenceContext
from howl_tpu.utils.logger import Logger


class Trainer:
    def __init__(self, training_cfg: TrainingConfig):
        self.training_cfg = training_cfg
        self.context_cfg = training_cfg.context_config
        self.context = InferenceContext.load_from_config(self.context_cfg)
        if self.training_cfg.workspace_path is None:
            wake_word = self.context.wake_word.replace(" ", "_")
            self.training_cfg.workspace_path = str(Path("workspaces") / wake_word)
            Logger.info(f"workspace defaulted to {self.training_cfg.workspace_path}")

    def _dataset_paths(self, dataset_cfgs) -> list:
        return [cfg.path for cfg in dataset_cfgs if cfg.path]

    def _all_dataset_paths(self) -> list:
        """Deduped union of train/val/test dataset paths. Each howl dataset
        dir carries all three split jsonls and the loader reads them all
        (train.py:248-252), so per-split dir separation is not meaningful —
        the reference's canonical config points every list at the same dir
        (ref test/test_data/test_training_config.json)."""
        seen: dict = {}
        for cfgs in (
            self.training_cfg.train_datasets,
            self.training_cfg.val_datasets,
            self.training_cfg.test_datasets,
        ):
            for path in self._dataset_paths(cfgs):
                seen.setdefault(path, None)
        return list(seen)

    def train(self, extra_args: Optional[list] = None) -> dict:
        """Train on the configured datasets; returns the eval results dict."""
        from howl_tpu.training.run.train import run as train_run

        self.training_cfg.apply_to_settings()
        dataset_paths = self._all_dataset_paths()
        if not dataset_paths:
            raise ValueError("training_cfg.train_datasets has no dataset paths")
        args = [
            "--model",
            self.training_cfg.model_config.architecture,
            "--workspace",
            self.training_cfg.workspace_path,
            "--eval-freq",
            "0",
        ]
        for path in dataset_paths:
            args += ["-i", path]
        args += list(extra_args or [])
        results = train_run(args)

        # persist the config snapshot next to the checkpoints
        from howl_tpu.workspace import Workspace

        ws = Workspace(Path(self.training_cfg.workspace_path), delete_existing=False)
        (ws.path / "training_config.json").write_text(self.training_cfg.json(indent=2))
        return results

    def evaluate(self, extra_args: Optional[list] = None) -> dict:
        from howl_tpu.training.run.train import run as train_run

        self.training_cfg.apply_to_settings()
        args = [
            "--model",
            self.training_cfg.model_config.architecture,
            "--workspace",
            self.training_cfg.workspace_path,
            "--eval",
        ]
        for path in self._all_dataset_paths():
            args += ["-i", path]
        args += list(extra_args or [])
        return train_run(args)
