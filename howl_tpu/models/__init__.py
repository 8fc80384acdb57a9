"""Wake-word classifier model zoo (flax.linen, XLA-lowered).

Registry names match the reference (`res8`, `mobilenet`, `small-cnn`,
`seq-cnn`, `lstm`, `seq-lstm`, `gru`, `las`). The reference's `converted`
wrapper is `base.ConvertedStaticModel`, applied via SETTINGS.training.convert_static.
"""

from howl_tpu.models import cnn, mobilenet, rnn  # noqa: F401 — populate registry
from howl_tpu.models.base import MODEL_REGISTRY, ModelSpec, create_model, register_model
from howl_tpu.models.metric import ConfusionMatrix

__all__ = [
    "MODEL_REGISTRY",
    "ModelSpec",
    "ConfusionMatrix",
    "create_model",
    "register_model",
]
