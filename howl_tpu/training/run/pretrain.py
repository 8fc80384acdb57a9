"""Vision pretraining of the classifiers (weight-init experiment;
ref: training/run/pretrain.py:24-127 — CIFAR10/100 + FashionMNIST).

Images are fed to the models as if they were (C, F, T) spectrogram features
(exactly the reference's trick). Reads the CIFAR-10/100 binary format from a
local directory (no torchvision download); ``--synthetic`` trains on generated
data for smoke testing.
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path

import jax
import numpy as np

from howl_tpu.models import MODEL_REGISTRY, create_model
from howl_tpu.settings import SETTINGS
from howl_tpu.training.objectives import frame_ce_loss
from howl_tpu.training.state import create_train_state, param_count
from howl_tpu.utils.args_utils import ArgumentParserBuilder, opt
from howl_tpu.utils.logger import Logger
from howl_tpu.utils.random_utils import set_random_seed
from howl_tpu.workspace import Workspace


def load_cifar10(path: Path):
    """CIFAR-10 python pickle batches -> ((train_x, train_y), (test_x, test_y)),
    images as (N, 3, 32, 32) float32 in [0, 1]."""

    def load_batch(file):
        with file.open("rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = np.asarray(d[b"data"], np.float32).reshape(-1, 3, 32, 32) / 255.0
        y = np.asarray(d[b"labels"], np.int32)
        return x, y

    train = [load_batch(path / f"data_batch_{i}") for i in range(1, 6)]
    test_x, test_y = load_batch(path / "test_batch")
    return (
        (np.concatenate([t[0] for t in train]), np.concatenate([t[1] for t in train])),
        (test_x, test_y),
    )


def synthetic_dataset(num_classes: int = 10, n: int = 512, seed: int = 0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, n).astype(np.int32)
    x = rng.normal(0, 0.05, (n, 3, 32, 32)).astype(np.float32)
    for i in range(n):
        x[i, 0] += np.linspace(0, 1, 32)[None, :] * (y[i] + 1) / num_classes
    return (x[: int(0.8 * n)], y[: int(0.8 * n)]), (x[int(0.8 * n) :], y[int(0.8 * n) :])


def run(args=None) -> dict:
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    apb = ArgumentParserBuilder()
    apb.add_options(
        opt("--model", type=str, choices=sorted(MODEL_REGISTRY), default="res8"),
        opt("--workspace", type=str, default="workspaces/pretrain"),
        opt("--dataset-path", "-i", type=str, default=None, help="CIFAR-10 python-format dir"),
        opt("--num-labels", type=int, default=10),
        opt("--synthetic", action="store_true", help="train on synthetic data (smoke test)"),
    )
    args = apb.parser.parse_args(args)
    set_random_seed(SETTINGS.training.seed)

    if args.synthetic or args.dataset_path is None:
        Logger.info("using synthetic vision data")
        (train_x, train_y), (test_x, test_y) = synthetic_dataset(args.num_labels)
    else:
        (train_x, train_y), (test_x, test_y) = load_cifar10(Path(args.dataset_path))

    model = create_model(args.model, num_labels=args.num_labels)
    state = create_train_state(
        model,
        jax.random.PRNGKey(SETTINGS.training.seed),
        train_x[:1],
        learning_rate=SETTINGS.training.learning_rate,
        weight_decay=SETTINGS.training.weight_decay,
        lr_decay=SETTINGS.training.lr_decay,
        steps_per_epoch=max(len(train_x) // SETTINGS.training.batch_size, 1),
    )
    Logger.info(f"{param_count(state)} parameters")

    @jax.jit
    def train_step(state, x, y, key):
        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, rngs={"dropout": key}, mutable=["batch_stats"],
            )
            return frame_ce_loss(out, y), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads, batch_stats=new_stats), loss

    @jax.jit
    def eval_step(state, x):
        return state.apply_fn({"params": state.params, "batch_stats": state.batch_stats}, x, train=False)

    batch = SETTINGS.training.batch_size
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    for epoch in range(SETTINGS.training.num_epochs):
        order = rng.permutation(len(train_x))
        losses = []
        for start in range(0, len(order) - batch + 1, batch):
            idx = order[start : start + batch]
            key, sub = jax.random.split(key)
            state, loss = train_step(state, train_x[idx], train_y[idx], sub)
            losses.append(float(loss))
        Logger.info(f"epoch {epoch}: loss={np.mean(losses):.4f}")

    correct = total = 0
    for start in range(0, len(test_x) - batch + 1, batch):
        logits = np.asarray(eval_step(state, test_x[start : start + batch]))
        correct += int((logits.argmax(-1) == test_y[start : start + batch]).sum())
        total += batch
    acc = correct / max(total, 1)
    Logger.info(f"test accuracy: {acc:.4f}")

    workspace = Workspace(Path(args.workspace))
    workspace.save_model(
        {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)}, best=True
    )
    return {"test_acc": acc}


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
