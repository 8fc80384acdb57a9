"""Reference torch-workspace import: differential parity with the ACTUAL
reference model.

Builds a real reference Res8 (imported from /root/reference, torch cpu),
saves it in the reference's workspace layout (model-best.pt.bin +
zmuv.pt.bin + settings.json, ref howl/workspace.py:56-81), converts with
howl_tpu.compat.import_reference_workspace, and asserts:

  * flax logits match the torch model's logits on the same features
    (the weight-layout inversion is correct end to end, incl. BN stats),
  * ZMUV mean/std survive,
  * the settings snapshot round-trips into howl_tpu field names,
  * hub.load_workspace_engine serves the imported workspace directly.
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref_res8():
    """The actual reference Res8 class, imported read-only (stubs for the
    native libs this image lacks; none are touched by Res8 itself)."""
    torch = pytest.importorskip("torch")

    from tests.test_reference_engine_parity import _install_stub

    import pydantic

    if "BaseSettings" not in pydantic.__dict__:
        pydantic.BaseSettings = pydantic.BaseModel
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    _install_stub("coloredlogs", install=lambda *a, **k: None,
                  ColoredFormatter=type("CF", (), {"__init__": lambda self, *a, **k: None}))
    _install_stub("torchvision")
    _install_stub("torchvision.models",
                  MobileNetV2=type("MobileNetV2", (), {}),
                  mobilenet_v2=lambda *a, **k: None)

    from howl.model.cnn import Res8

    return torch, Res8


REF_SETTINGS_JSON = {
    # underscore-keyed sections exactly as ref workspace.save_settings writes
    # them (gather_dict over the SETTINGS singleton, ref workspace.py:69-73)
    "_audio": {"sample_rate": 16000, "use_mono": True},
    "_audio_transform": {"num_fft": 512, "num_mels": 40, "sample_rate": 16000,
                         "hop_length": 200, "use_meyda_spectrogram": False},
    "_inference_engine": {"inference_weights": None, "inference_sequence": [0, 1, 2],
                          "inference_window_ms": 2000.0, "smoothing_window_ms": 50.0,
                          "tolerance_window_ms": 500.0, "inference_threshold": 0.0},
    "_training": {"seed": 123, "vocab": ["hey", "fire", "fox"], "num_epochs": 300,
                  "learning_rate": 0.01, "device": "cuda:0", "batch_size": 16,
                  "lr_decay": 0.98, "max_window_size_seconds": 0.5,
                  "eval_window_size_seconds": 0.5, "eval_stride_size_seconds": 0.063,
                  "weight_decay": 0.00001, "convert_static": False,
                  "objective": "frame", "token_type": "word"},
    "_cache": {"cache_size": 128144},
}


def _make_reference_workspace(tmp_path, torch, Res8, num_labels=4):
    torch.manual_seed(7)
    model = Res8(num_labels)
    # drive BN running stats off their init (mean 0 / var 1) so a swapped or
    # dropped running_mean/var mapping cannot pass silently
    model.train()
    with torch.no_grad():
        for _ in range(3):
            model(torch.randn(4, 1, 40, 61), torch.tensor([61, 61, 61, 61]))
    model.eval()
    src = tmp_path / "ref_ws"
    src.mkdir()
    torch.save(model.state_dict(), src / "model-best.pt.bin")
    torch.save(
        {"total": torch.tensor([1000.0]), "mean": torch.tensor([-0.5]),
         "mean2": torch.tensor([1.5])},
        src / "zmuv.pt.bin",
    )
    (src / "settings.json").write_text(json.dumps(REF_SETTINGS_JSON))
    (src / "cmd-args.json").write_text(json.dumps({"model": "res8", "workspace": str(src)}))
    return src, model


def test_res8_import_logit_parity(tmp_path, ref_res8):
    torch, Res8 = ref_res8
    import jax

    from howl_tpu.compat import import_reference_workspace
    from howl_tpu.models import create_model

    src, ref_model = _make_reference_workspace(tmp_path, torch, Res8)
    ws = import_reference_workspace(src, tmp_path / "tpu_ws")

    model = create_model("res8", num_labels=4)
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 1, 40, 61)).astype(np.float32)
    template = model.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    variables = ws.load_model(template, best=True)

    ours = np.asarray(model.apply(variables, feats, train=False))
    with torch.no_grad():
        theirs = ref_model(torch.from_numpy(feats), torch.tensor([61, 61])).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)

    # zmuv: identical stats and derived std
    z = ws.load_zmuv()
    assert z.mean == pytest.approx(-0.5)
    assert z.std == pytest.approx(float(np.sqrt(1.5 - 0.25)))

    # settings snapshot lands in howl_tpu field names
    from howl_tpu.settings import HowlSettings

    s = ws.load_settings(HowlSettings())
    assert s.training.vocab == ["hey", "fire", "fox"]
    assert s.audio_transform.num_mels == 40
    assert s.inference_engine.inference_sequence == [0, 1, 2]
    assert s.training.max_window_size_seconds == 0.5


def test_imported_workspace_serves_and_decides_like_the_reference_weights(tmp_path, ref_res8):
    """End-to-end: hub loads the imported workspace and its whole-clip scores
    equal the torch model's softmax posteriors on real featurized audio."""
    torch, Res8 = ref_res8
    import jax

    from howl_tpu import hub
    from howl_tpu.compat import import_reference_workspace
    from howl_tpu.models import create_model
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

    src, ref_model = _make_reference_workspace(tmp_path, torch, Res8)
    ws = import_reference_workspace(src, tmp_path / "tpu_ws2")

    engine, ctx = hub.load_workspace_engine(ws.path, num_streams=1)
    assert engine.window_samples == 8000  # 0.5 s at 16 kHz from the snapshot
    engine.reset()
    fired = engine.infer(np.zeros((1, engine.window_samples), np.float32))
    assert not fired  # silence through random weights must not crash or fire

    # posterior parity through the real frontend: featurize one window with
    # the imported zmuv, then compare model posteriors
    frontend = FrontendConfig(n_mels=40)
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal((2, 8000)) * 0.1).astype(np.float32)
    z = ws.load_zmuv()
    feats = (log_mel_spectrogram(audio, frontend, stacked=True) - z.mean) / z.std
    feats = np.asarray(feats)
    model = create_model("res8", num_labels=4)
    template = model.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    variables = ws.load_model(template, best=True)
    ours = jax.nn.softmax(model.apply(variables, feats, train=False), -1)
    with torch.no_grad():
        theirs = torch.softmax(
            ref_model(torch.from_numpy(feats.copy()), torch.tensor([61, 61])), -1
        ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_import_unsupported_family_raises(tmp_path, ref_res8):
    torch, Res8 = ref_res8
    src, _ = _make_reference_workspace(tmp_path, torch, Res8)
    # mobilenet's torchvision backbone has no flax counterpart (PARITY.md)
    (src / "cmd-args.json").write_text(json.dumps({"model": "mobilenet"}))

    from howl_tpu.compat import import_reference_workspace

    with pytest.raises(NotImplementedError, match="res8"):
        import_reference_workspace(src, tmp_path / "tpu_ws3")
    # validation fires before anything is written — no half-imported
    # workspace dir for hub to trip over later
    assert not (tmp_path / "tpu_ws3").exists()


@pytest.fixture(scope="module")
def ref_rnn(ref_res8):
    """The actual reference RNN model classes (same stubbed import)."""
    torch, _ = ref_res8
    from howl.model.rnn import LASClassifier, SequentialLstm, SimpleGru, SimpleLstm

    return torch, {"lstm": SimpleLstm, "seq-lstm": SequentialLstm, "gru": SimpleGru, "las": LASClassifier}


@pytest.mark.parametrize("family", ["lstm", "seq-lstm", "gru", "las"])
def test_rnn_family_import_logit_parity(family, ref_rnn):
    """Converted lstm/seq-lstm/gru/las weights produce the reference model's
    outputs on the same features (gate order, bias folding, conv layout, and
    biLSTM direction mapping are all observable here)."""
    torch, classes = ref_rnn
    import zlib

    import jax

    from howl_tpu.compat import torch_state_to_variables
    from howl_tpu.models import create_model

    # crc32, not hash(): PYTHONHASHSEED would randomize the weights per run
    torch.manual_seed(zlib.crc32(family.encode()))
    ref_model = classes[family](4)
    if family == "gru":  # exercise non-init BN running stats
        ref_model.train()
        with torch.no_grad():
            for _ in range(3):
                ref_model(torch.randn(4, 1, 40, 61), torch.tensor([61] * 4))
    if family == "las":
        ref_model.train()
        with torch.no_grad():
            for _ in range(3):
                ref_model(torch.randn(4, 3, 40, 61), None)
    ref_model.eval()

    variables = torch_state_to_variables(family, ref_model.state_dict())
    model = create_model(family, num_labels=4)

    rng = np.random.default_rng(29)
    channels = 3 if family == "las" else 1
    feats = rng.standard_normal((3, channels, 40, 61)).astype(np.float32)
    lengths = np.full((3,), 61, np.int32)

    # validate the converted tree against the model's own init template
    template = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, lengths=jax.numpy.asarray(lengths), train=False,
    )
    tstruct = jax.tree_util.tree_structure(template)
    vstruct = jax.tree_util.tree_structure(
        {k: variables[k] for k in template} if set(variables) <= set(template) else variables
    )
    assert tstruct == vstruct, f"converted tree mismatch: {tstruct} vs {vstruct}"

    ours = np.asarray(
        model.apply(variables, feats, lengths=jax.numpy.asarray(lengths), train=False)
    )
    with torch.no_grad():
        t_feats = torch.from_numpy(feats.copy())
        t_lens = torch.tensor([61, 61, 61])
        theirs = ref_model(t_feats, t_lens).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_import_cli_entry_point(tmp_path, ref_res8):
    torch, Res8 = ref_res8
    src, _ = _make_reference_workspace(tmp_path, torch, Res8)
    dst = tmp_path / "cli_ws"

    from howl_tpu.training.run.import_workspace import run

    run(["-i", str(src), "-o", str(dst)])
    assert (dst / "model-best.flax").exists()
    assert (dst / "zmuv.json").exists()
    assert json.loads((dst / "cmd-args.json").read_text())["model"] == "res8"


def test_hub_serves_reference_workspace_directly(tmp_path, ref_res8):
    """hub.load_workspace_engine pointed at a RAW reference (torch) workspace
    converts in memory — same logits as the persisted import, nothing written
    into the source checkout."""
    torch, Res8 = ref_res8
    import jax

    from howl_tpu import hub
    from howl_tpu.compat import import_reference_workspace
    from howl_tpu.models import create_model

    src, ref_model = _make_reference_workspace(tmp_path, torch, Res8)
    before = sorted(p.name for p in src.iterdir())

    engine, ctx = hub.load_workspace_engine(src, num_streams=1)
    assert engine.window_samples == 8000
    assert not engine.infer(np.zeros((1, 8000), np.float32))
    assert sorted(p.name for p in src.iterdir()) == before  # source untouched

    # direct-serve weights == persisted-import weights
    ws = import_reference_workspace(src, tmp_path / "persisted")
    model = create_model("res8", num_labels=4)
    feats = np.random.default_rng(1).standard_normal((1, 1, 40, 61)).astype(np.float32)
    template = model.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    imported = ws.load_model(template, best=True)
    direct = np.asarray(model.apply(engine.variables, feats, train=False))
    persisted = np.asarray(model.apply(imported, feats, train=False))
    np.testing.assert_array_equal(direct, persisted)


def test_import_export_round_trip(tmp_path, ref_res8):
    """compat import is the exact inverse of export_honkling's mapping: a
    reference res8 state_dict -> flax -> torch-layout dict reproduces every
    original tensor bit-for-bit (pure transposes both ways)."""
    torch, Res8 = ref_res8

    from howl_tpu.compat import res8_torch_state_to_variables
    from howl_tpu.training.run.export_honkling import res8_variables_to_torch_dict

    torch.manual_seed(3)
    model = Res8(4).eval()
    sd = model.state_dict()
    variables = res8_torch_state_to_variables(sd)
    back = res8_variables_to_torch_dict(variables)
    for name, tensor in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            np.asarray(back[name], np.float32), tensor.numpy(), err_msg=name
        )


def test_import_requires_model_name_without_cmd_args(tmp_path, ref_res8):
    torch, Res8 = ref_res8
    src, _ = _make_reference_workspace(tmp_path, torch, Res8)
    (src / "cmd-args.json").unlink()

    from howl_tpu.compat import import_reference_workspace

    with pytest.raises(ValueError, match="model_name"):
        import_reference_workspace(src, tmp_path / "nowhere")
    # explicit name works without cmd-args.json
    ws = import_reference_workspace(src, tmp_path / "named", model_name="res8")
    assert ws.model_path(best=True).exists()


def test_hub_offline_streaming_engine_serves_reference_workspace(tmp_path, ref_res8):
    """hub.load_workspace_streaming_engine: the one-call offline route
    (docs/SERVING.md precision ladder) from a RAW reference torch workspace.
    Decisions must equal an engine hand-wired from the online loader's stack
    (the construction eval_wake_word_detection used before this entry point),
    and engine kwargs must pass through to StreamingEngine."""
    torch, Res8 = ref_res8
    import jax.numpy as jnp

    from howl_tpu import hub
    from howl_tpu.inference.engine import StreamingEngine

    src, _ = _make_reference_workspace(tmp_path, torch, Res8)
    engine, ctx = hub.load_workspace_streaming_engine(src)
    assert isinstance(engine, StreamingEngine)
    assert ctx.num_labels == 4

    rng = np.random.default_rng(5)
    clips = (rng.standard_normal((3, 16000)) * 0.1).astype(np.float32)
    out = engine.infer_batch(clips)

    online, _ = hub.load_workspace_engine(src, num_streams=1)
    hand = StreamingEngine(
        online.model, online.variables, online.cfg, online.frontend,
        online.zmuv_mean, online.zmuv_std, spec=engine.spec,
    )
    ref_out = hand.infer_batch(clips)
    np.testing.assert_array_equal(
        np.asarray(out["detected"]), np.asarray(ref_out["detected"])
    )

    # kwargs flow through to the engine: the bf16 + legacy-window rungs
    bf16, _ = hub.load_workspace_streaming_engine(
        src, compute_dtype=jnp.bfloat16, fused_trunk=False
    )
    assert bf16.compute_dtype == jnp.bfloat16
    assert not bf16.fused_trunk

    # the NATIVE-workspace branch (what sweep_workspace serves after
    # import_workspace): same weights -> identical decisions
    from howl_tpu.compat import import_reference_workspace

    ws = import_reference_workspace(src, tmp_path / "native_ws")
    native, _ = hub.load_workspace_streaming_engine(ws.path)
    native_out = native.infer_batch(clips)
    np.testing.assert_array_equal(
        np.asarray(out["detected"]), np.asarray(native_out["detected"])
    )
