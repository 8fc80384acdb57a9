"""bf16 mixed-precision on the flagship train path (VERDICT r3 #1).

Runs the same synthetic hey-fire-fox recipe as
tests/test_train_wakeword.py::test_train_wakeword_end_to_end with ``--bf16``
and asserts the SAME eval metrics (all positives detected, zero false alarms)
— convergence parity within the noise of a cleanly separable corpus. Params
and optimizer state stay f32 (flax ``dtype`` is compute dtype only), so the
checkpoint remains loadable by f32 serving.
"""

import numpy as np
import pytest

from tests.fixtures import make_wakeword_corpus


@pytest.mark.slow
def test_train_bf16_convergence_parity(tmp_path, monkeypatch):
    corpus = make_wakeword_corpus(tmp_path / "ww", vocab=("hey", "fire", "fox"), n_positive=12, n_negative=12)
    ws = tmp_path / "ws_bf16"
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    monkeypatch.setenv("NUM_EPOCHS", "40")
    monkeypatch.setenv("BATCH_SIZE", "16")
    monkeypatch.setenv("LEARNING_RATE", "0.02")
    monkeypatch.setenv("LR_DECAY", "0.98")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "0.5")
    monkeypatch.setenv("EVAL_STRIDE_SIZE_SECONDS", "0.063")
    monkeypatch.setenv("NUM_MELS", "40")
    monkeypatch.setenv("INFERENCE_THRESHOLD", "0")
    monkeypatch.setenv("TOLERANCE_WINDOW_MS", "500")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()

    from howl_tpu.training.run.train import run

    results = run(
        [
            "--model", "res8", "--workspace", str(ws), "-i", str(corpus),
            "--eval-freq", "0", "--steps-per-epoch", "10", "--no-augment", "--bf16",
        ]
    )
    # identical gates to the f32 recipe (test_train_wakeword.py:47-50)
    assert results["test_pos"]["tp"] == 3, results
    assert results["dev_pos"]["tp"] == 3, results
    assert results["dev_neg"]["fp"] == 0, results
    assert results["test_neg"]["fp"] == 0, results

    # the checkpoint is f32 (mixed precision keeps master weights in f32)
    import flax
    import jax

    from howl_tpu.workspace import Workspace

    ws_obj = Workspace(ws, delete_existing=False)
    saved = flax.serialization.msgpack_restore(ws_obj.model_path(best=True).read_bytes())
    leaves = jax.tree.leaves(saved["params"])
    assert leaves and all(np.asarray(leaf).dtype == np.float32 for leaf in leaves)
