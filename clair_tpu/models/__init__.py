from clair_tpu.models.clair import (  # noqa: F401
    ClairModel,
    forward,
    forward_logits,
    init_params,
)
from clair_tpu.models.losses import (  # noqa: F401
    focal_loss,
    l2_regularization,
    total_loss,
    weighted_cross_entropy,
)
