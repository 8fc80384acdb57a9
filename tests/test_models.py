"""Model zoo: shapes, param counts, registry, streaming carries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

BATCH, N_MELS, FRAMES = 2, 40, 41  # 0.5 s window at default frontend geometry


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((BATCH, 3, N_MELS, FRAMES)).astype(np.float32))


def _init_and_apply(model, feats, train=False, **kwargs):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats,
        train=False,
    )
    out = model.apply(
        variables,
        feats,
        train=train,
        rngs={"dropout": jax.random.PRNGKey(2)} if train else None,
        mutable=["batch_stats"] if train else False,
        **kwargs,
    )
    return variables, out


def _param_count(variables):
    return sum(x.size for x in jax.tree.leaves(variables["params"]))


def test_registry_contents():
    from howl_tpu.models import MODEL_REGISTRY

    for name in ("res8", "mobilenet", "small-cnn", "seq-cnn", "lstm", "seq-lstm", "gru", "las"):
        assert name in MODEL_REGISTRY, name
    assert MODEL_REGISTRY["seq-lstm"].is_sequential
    assert MODEL_REGISTRY["lstm"].is_recurrent
    assert not MODEL_REGISTRY["res8"].is_sequential


def test_res8_shape_and_params(feats):
    from howl_tpu.models import create_model

    model = create_model("res8", num_labels=2)
    variables, out = _init_and_apply(model, feats)
    assert out.shape == (BATCH, 2)
    # ~111k params like the reference res8 (cnn.py:107-125): 405 + 6*18225 + head
    n = _param_count(variables)
    assert 109_000 < n < 112_000, n


def test_res8_train_updates_batch_stats(feats):
    from howl_tpu.models import create_model

    model = create_model("res8", num_labels=2)
    variables, (out, mutated) = _init_and_apply(model, feats, train=True)
    assert out.shape == (BATCH, 2)
    old = jax.tree.leaves(variables["batch_stats"])[0]
    new = jax.tree.leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_small_cnn(feats):
    from howl_tpu.models import create_model

    model = create_model("small-cnn", num_labels=10)
    _, out = _init_and_apply(model, feats)
    assert out.shape == (BATCH, 10)


def test_seq_cnn_sequential_output(feats):
    from howl_tpu.models import create_model

    model = create_model("seq-cnn", num_labels=4)
    _, out = _init_and_apply(model, feats)
    assert out.ndim == 3 and out.shape[1] == BATCH and out.shape[2] == 4
    assert out.shape[0] > 1  # per-frame outputs


def test_lstm_and_carry(feats):
    from howl_tpu.models import create_model

    model = create_model("lstm", num_labels=3)
    variables, out = _init_and_apply(model, feats)
    assert out.shape == (BATCH, 3)
    # streaming: pass carry explicitly, get carry back; use a short chunk so
    # the initial state hasn't washed out by the end of the sequence
    chunk = feats[:, :, :, :3]
    out1, carry = model.apply(variables, chunk, return_carry=True)
    out2, carry2 = model.apply(variables, chunk, carry=carry, return_carry=True)
    assert out1.shape == (BATCH, 3)
    # feeding the carried state changes the prediction (state actually flows)
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
    # chunked scan == full scan: two 3-frame chunks with carry equal one 6-frame pass
    full6 = feats[:, :, :, :6]
    chunk2 = feats[:, :, :, 3:6]
    out_chunked, carry_chunked = model.apply(variables, chunk2, carry=carry, return_carry=True)
    out_full, carry_full = model.apply(variables, full6, return_carry=True)
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out_full), atol=1e-5)


def test_seq_lstm(feats):
    from howl_tpu.models import create_model

    model = create_model("seq-lstm", num_labels=4)
    _, out = _init_and_apply(model, feats)
    assert out.shape == (FRAMES, BATCH, 4)


def test_gru(feats):
    from howl_tpu.models import create_model

    model = create_model("gru", num_labels=3)
    _, out = _init_and_apply(model, feats)
    assert out.shape == (BATCH, 3)


@pytest.mark.slow
def test_las_uses_all_channels(feats):
    from howl_tpu.models import create_model

    model = create_model("las", num_labels=5)
    variables, out = _init_and_apply(model, feats)
    assert out.shape == (BATCH, 5)
    # perturbing the delta channel changes the output (unlike res8)
    perturbed = feats.at[:, 1].add(1.0)
    out2 = model.apply(variables, perturbed, train=False)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_res8_ignores_delta_channels(feats):
    from howl_tpu.models import create_model

    model = create_model("res8", num_labels=2)
    variables, out = _init_and_apply(model, feats)
    perturbed = feats.at[:, 1:].add(5.0)
    out2 = model.apply(variables, perturbed, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


@pytest.mark.slow
def test_mobilenet(feats):
    from howl_tpu.models import create_model

    model = create_model("mobilenet", num_labels=12, width_mult=0.25)
    _, out = _init_and_apply(model, feats)
    assert out.shape == (BATCH, 12)


def test_lstm_lengths_mask(feats):
    from howl_tpu.models import create_model

    model = create_model("lstm", num_labels=3)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    lengths = jnp.array([FRAMES, 20])
    out = model.apply(variables, feats, lengths=lengths)
    # second example's hidden state should be taken at step 20: zeroing frames
    # past step 20 must not change its logits
    truncated = feats.at[1, :, :, 20:].set(0.0)
    out2 = model.apply(variables, truncated, lengths=lengths)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]), atol=1e-5)


def test_converted_static_model(feats):
    from howl_tpu.models import create_model
    from howl_tpu.models.base import ConvertedStaticModel

    inner = create_model("res8", num_labels=2)
    model = ConvertedStaticModel(inner=inner, frame_window_size=20, frame_stride_size=10)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    out = model.apply(variables, feats, train=False)
    # full coverage: every complete stride-aligned window, incl. the last
    assert out.shape == ((FRAMES - 20) // 10 + 1, BATCH, 2)
    # compute_length agrees with the emitted window count
    assert int(model.compute_length(jnp.asarray(FRAMES))) == out.shape[0]
    # too-short clips fail loudly instead of clamp-duplicating frames
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window"):
        model.apply(variables, feats[..., :10], train=False)


def test_confusion_matrix():
    from howl_tpu.models import ConfusionMatrix

    cm = ConfusionMatrix()
    cm.increment_array([True, True, False, False], [True, False, True, False])
    assert (cm.tp, cm.fp, cm.fn, cm.tn) == (1, 1, 1, 1)
    assert cm.mcc == 0.0
    assert cm.fp_per_hour(3.6e6) == 1.0  # 1 fp in one hour
    cm2 = ConfusionMatrix()
    cm2.increment(True, True)
    cm2.increment(False, False)
    assert cm2.mcc == 1.0


def test_res8_parameter_tree_is_stable():
    """The trunk/head split must keep the round-1 parameter names so saved
    workspaces keep loading (conv0..conv6, bn1..bn6, output)."""
    import jax
    import numpy as np

    from howl_tpu.models import create_model

    model = create_model("res8", num_labels=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, np.zeros((1, 3, 40, 41), np.float32), train=False
    )
    assert sorted(variables["params"]) == [f"conv{i}" for i in range(7)] + ["output"]
    assert sorted(variables["batch_stats"]) == [f"bn{i}" for i in range(1, 7)]
