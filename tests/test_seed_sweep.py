"""N-seed sweep as one sharded program (pretrain_gsc --sharded-seeds)."""

import numpy as np
import pytest

from tests.fixtures import make_gsc_corpus


@pytest.mark.slow
def test_sharded_seed_sweep_trains_distinct_models(tmp_path, monkeypatch):
    corpus = make_gsc_corpus(tmp_path / "gsc", vocab=("yes", "no"), n_per_class=20)
    ws = tmp_path / "ws"
    monkeypatch.setenv("DATASET_PATH", str(corpus))
    monkeypatch.setenv("VOCAB", '["yes","no"]')
    monkeypatch.setenv("NUM_EPOCHS", "5")
    monkeypatch.setenv("BATCH_SIZE", "8")
    monkeypatch.setenv("LEARNING_RATE", "0.01")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "1.0")
    monkeypatch.setenv("NUM_MELS", "40")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.pretrain_gsc import run

    result = run(
        [
            "--model", "res8", "--workspace", str(ws), "--num-labels", "3",
            "--no-augment", "--sharded-seeds", "2",
        ]
    )
    # both seeds learn the separable tones; the sweep trained them concurrently
    assert len(result["per_seed_dev_acc"]) == 2
    assert result["dev_acc"] >= 0.85, result
    assert result["test_acc"] >= 0.85, result
    # per-seed checkpoints were unstacked and differ (different init seeds)
    import flax
    import jax

    from howl_tpu.models import create_model
    from howl_tpu.workspace import Workspace

    model = create_model("res8", num_labels=3)
    feats0 = np.zeros((1, 3, 40, 81), np.float32)
    template = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    v0 = Workspace(ws / "seed_0", delete_existing=False).load_model(template, best=True)
    v1 = Workspace(ws / "seed_1", delete_existing=False).load_model(template, best=True)
    k0 = np.asarray(jax.tree.leaves(v0["params"])[0])
    k1 = np.asarray(jax.tree.leaves(v1["params"])[0])
    assert not np.allclose(k0, k1), "seed models should differ"
