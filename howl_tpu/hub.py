"""Pretrained-model hub (ref: hubconf.py:27-136).

Reconstructs a full inference stack — settings snapshot, InferenceContext,
ZMUV stats, model weights, OnlineEngine — from a workspace directory, and
resolves published model names against a local howl-models-style checkout
(``$HOWL_MODELS_PATH``). The reference downloads a release zip via torch.hub;
here resolution is path-based (this framework targets hermetic deployments;
wire your own fetch in front if you want remote zips).

REFERENCE (torch) workspaces serve directly: when the path holds
``model{-best}.pt.bin`` + the reference's settings.json layout, the weights
are converted in memory (howl_tpu/compat.py — nothing is written), so
pointing ``HOWL_MODELS_PATH`` at a real castorini/howl-models clone just
works; ``training.run.import_workspace`` persists the conversion instead.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

from howl_tpu.context import InferenceContext
from howl_tpu.inference.config import EngineConfig
from howl_tpu.inference.online import OnlineEngine
from howl_tpu.models import create_model
from howl_tpu.models.base import model_spec
from howl_tpu.ops.frontend import FrontendConfig
from howl_tpu.settings import SETTINGS
from howl_tpu.workspace import Workspace

# published model name -> (model architecture, workspace path inside howl-models)
PRETRAINED_MODELS = {
    "hey_fire_fox": ("res8", "howl/hey-fire-fox"),
}


def _load_workspace_stack(workspace_path, model_name: Optional[str], best: bool):
    """Shared loader: workspace dir (native or reference torch) -> the full
    inference stack (model, spec, variables, cfg, frontend, zmuv, ctx).

    Everything both hub entry points need before choosing an engine class:
    settings snapshot, InferenceContext, ZMUV stats, model build (+ the
    convert_static wrapper when the workspace was trained that way), and the
    checkpoint grafted onto the init template."""
    path = Path(workspace_path)
    ref_by_best = ref_zmuv = None
    from howl_tpu import compat

    if compat.is_reference_workspace(path):
        # a torch (castorini/howl) workspace — e.g. a real howl-models
        # checkout: convert in memory, nothing written (docs/MIGRATION.md)
        model_name, settings, ref_by_best, ref_zmuv = compat.load_reference_workspace(
            path, model_name, settings=SETTINGS
        )
        workspace = None
    else:
        workspace = Workspace(path, delete_existing=False)
        settings = workspace.load_settings(SETTINGS)
        if model_name is None:
            import json

            args_path = workspace.path / "cmd-args.json"
            if args_path.exists():
                model_name = json.loads(args_path.read_text()).get("model")
            if model_name is None:
                raise ValueError("model_name not given and cmd-args.json missing from workspace")

    use_frame = settings.training.objective == "frame"
    ctx = InferenceContext(
        vocab=settings.training.vocab,
        token_type=settings.training.token_type,
        use_blank=not use_frame,
    )
    zmuv = ref_zmuv if workspace is None else workspace.load_zmuv()
    if zmuv is None:
        raise FileNotFoundError(f"zmuv stats missing from workspace {path}")

    model = create_model(model_name, num_labels=ctx.num_labels)
    spec = model_spec(model_name)
    if settings.training.convert_static:
        # the workspace was trained with the static model wrapped into a
        # per-frame sequential one (train.py convert_static path, ref
        # train.py:247-248) — rebuild the same wrapper or the saved param
        # tree will not match the bare model's template
        from dataclasses import replace as dc_replace

        from howl_tpu.models.base import ConvertedStaticModel

        model = ConvertedStaticModel(inner=model, frame_window_size=40, frame_stride_size=10)
        spec = dc_replace(spec, is_sequential=True)
    frontend = FrontendConfig.from_settings()
    window_samples = int(settings.training.max_window_size_seconds * settings.audio.sample_rate)
    feats0 = np.zeros((1, 3, frontend.n_mels, frontend.num_frames(window_samples)), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    if workspace is None:
        # load_reference_workspace always provides a best entry; only a
        # non-best request can miss
        if not best and False not in ref_by_best:
            raise FileNotFoundError(f"{path} has no non-best model.pt.bin")
        # graft the converted tensors onto the init template: tree_map fails
        # loudly on any structure mismatch, and the shape check catches a
        # checkpoint trained with different geometry than its settings claim.
        # Read only the template's METADATA (t.dtype/t.shape) — np.asarray(t)
        # would fetch every init tensor device->host (~31 ms each on relays)
        def graft(t, v):
            v = np.asarray(v, dtype=t.dtype)
            if v.shape != t.shape:
                raise ValueError(
                    f"converted tensor shape {v.shape} != model template {t.shape} "
                    f"for {model_name!r} — checkpoint/settings geometry mismatch"
                )
            return v

        variables = jax.tree.map(graft, variables, ref_by_best[best])
    else:
        variables = workspace.load_model(variables, best=best)

    cfg = EngineConfig.from_settings(ctx)
    return model, spec, variables, cfg, frontend, zmuv, ctx


def load_workspace_engine(
    workspace_path,
    model_name: Optional[str] = None,
    best: bool = True,
    num_streams: int = 1,
    incremental: bool = False,
    streaming_trunk: bool = False,
    hop_block: int = 1,
    auto: bool = False,
    strict_capacity: bool = False,
    carry_hops: bool = False,
) -> Tuple[OnlineEngine, InferenceContext]:
    """Workspace dir -> (OnlineEngine, InferenceContext) (ref hubconf.py:33-84).

    ``carry_hops=True`` (recurrent models only) threads RNN state across
    hops; the default scores each hop's window from fresh zero state —
    the reference's actual live behavior and the offline engines' default,
    so offline-tuned thresholds transfer (see OnlineEngine.__init__).

    ``incremental=True`` returns an IncrementalOnlineEngine instead: it keeps
    a mel-frame ring in device state and featurizes only each hop's new audio
    (HowlClient supports both transparently). ``streaming_trunk=True``
    (res8-family only) returns a FusedStreamingOnlineEngine: per-layer trunk
    caches compute only each hop's new trunk frames — the cheapest per-step
    path, scoring exactly like the offline fused-trunk engine, with a
    ``schedule.lag``-hop (250 ms at defaults) decision delay. ``hop_block>1``
    (streaming_trunk only, a multiple of the engine's schedule period) scores
    that many hops per device step — same per-hop decisions, observed at the
    block boundary; the bulk/capacity serving mode.

    ``auto=True`` ignores the engine flags and picks the lowest-decision-
    latency engine that sustains ``num_streams`` on one chip (the measured
    step-time model in inference/capacity.py); it raises CapacityError when
    nothing fits single-chip. Explicit configurations are ALWAYS capacity-
    checked: an unsustainable one emits a CapacityWarning (or raises, with
    ``strict_capacity=True``) instead of silently accumulating underruns."""
    # flag validation up front — model build + weight load below can take
    # seconds (minutes through the TPU relay); don't do it for a bad call
    if auto and (incremental or streaming_trunk or hop_block != 1):
        raise ValueError("auto=True selects the engine; don't also pass engine flags")
    if streaming_trunk and incremental:
        raise ValueError(
            "streaming_trunk and incremental select different engines — pass exactly one"
        )
    if hop_block != 1 and not streaming_trunk:
        raise ValueError("hop_block requires streaming_trunk=True")
    model, spec, variables, cfg, frontend, zmuv, ctx = _load_workspace_stack(
        workspace_path, model_name, best
    )
    if auto:
        from howl_tpu.inference.capacity import recommend

        # trunk streaming needs the fused-trunk model shape (res8 family,
        # non-sequential); convert_static wrappers score per frame instead
        trunk_ok = spec.supports_trunk and not spec.is_sequential and not spec.is_recurrent
        kwargs = recommend(num_streams, supports_trunk=trunk_ok)
        incremental = bool(kwargs.get("incremental", False))
        streaming_trunk = bool(kwargs.get("streaming_trunk", False))
        hop_block = int(kwargs.get("hop_block", 1))
    if carry_hops and streaming_trunk:
        raise ValueError(
            "carry_hops applies to recurrent models on the window-scoring "
            "engines; the streaming-trunk engine serves the res8 family only"
        )
    # capacity guardrail: the serving loop never recovers from a step that
    # exceeds the hop budget, so flag it at build time (BENCH_r03: 65,536
    # incremental streams step at p99 104 ms against 62.5)
    from howl_tpu.inference.capacity import CapacityWarning, check_capacity

    kind = "streaming_trunk" if streaming_trunk else ("incremental" if incremental else "online")
    report = check_capacity(kind, num_streams, hop_block)
    if not report.ok:
        if strict_capacity:
            from howl_tpu.inference.capacity import CapacityError

            raise CapacityError(report.message)
        import warnings

        warnings.warn(report.message, CapacityWarning, stacklevel=2)
    engine_cls = OnlineEngine
    if streaming_trunk:
        from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

        engine_cls = FusedStreamingOnlineEngine
    elif incremental:
        from howl_tpu.inference.online import IncrementalOnlineEngine

        engine_cls = IncrementalOnlineEngine
    extra = {"hop_block": hop_block} if hop_block != 1 else {}
    if carry_hops:
        # validated above: never reaches the trunk engine, which has no carry
        extra["carry_hops"] = True
    engine = engine_cls(
        model,
        variables,
        cfg,
        frontend,
        zmuv.mean,
        zmuv.std,
        spec=spec,
        num_streams=num_streams,
        **extra,
    )
    return engine, ctx


def load_workspace_streaming_engine(
    workspace_path,
    model_name: Optional[str] = None,
    best: bool = True,
    **engine_kwargs,
):
    """Workspace dir -> (offline StreamingEngine, InferenceContext).

    The batch/offline counterpart to :func:`load_workspace_engine`: same
    workspace resolution (native or reference torch layout, docs/MIGRATION.md)
    but returns the whole-clip ``StreamingEngine`` (FrameInferenceEngine
    parity, ref howl/model/inference.py:203-248) instead of a per-hop online
    engine. ``engine_kwargs`` pass straight through to ``StreamingEngine`` —
    this is the one-call route to the offline precision ladder documented in
    docs/SERVING.md (``compute_dtype=jnp.bfloat16``, ``use_pallas_frontend``,
    ``use_pallas_stem``, ``use_int8_trunk`` + ``int8_calibration_audio``,
    ``dft_precision``, ``fused_trunk``, ``carry_windows``) without hand-wiring
    the engine from an online engine's internals::

        engine, ctx = hub.load_workspace_streaming_engine(
            "workspaces/hey-ff", compute_dtype=jnp.bfloat16,
            use_pallas_frontend=True, use_pallas_stem=True)
        fired = engine.infer_batch(clips)   # (B, samples) -> (B,) fire flags

    No capacity guardrail applies: offline scoring has no cadence to miss
    (throughput scales with batch; see docs/PERFORMANCE.md)."""
    from howl_tpu.inference.engine import StreamingEngine

    model, spec, variables, cfg, frontend, zmuv, ctx = _load_workspace_stack(
        workspace_path, model_name, best
    )
    engine = StreamingEngine(
        model,
        variables,
        cfg,
        frontend,
        zmuv.mean,
        zmuv.std,
        spec=spec,
        **engine_kwargs,
    )
    return engine, ctx


def load_pretrained(name: str, models_path=None, **kwargs) -> Tuple[OnlineEngine, InferenceContext]:
    """Resolve a published model name against a howl-models checkout."""
    if name not in PRETRAINED_MODELS:
        raise ValueError(f"unknown pretrained model {name!r}; available: {sorted(PRETRAINED_MODELS)}")
    models_path = models_path or os.environ.get("HOWL_MODELS_PATH")
    if not models_path:
        raise ValueError(
            "set HOWL_MODELS_PATH (or pass models_path) to a howl-models checkout "
            "containing the published workspaces"
        )
    model_name, workspace_rel = PRETRAINED_MODELS[name]
    return load_workspace_engine(Path(models_path) / workspace_rel, model_name, **kwargs)


def hey_fire_fox(**kwargs):
    """Pretrained 'hey firefox' model (ref hubconf.py:27)."""
    return load_pretrained("hey_fire_fox", **kwargs)
