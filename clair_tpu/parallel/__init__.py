from clair_tpu.parallel.mesh import make_mesh  # noqa: F401
from clair_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    make_train_step,
    param_shardings,
    replicate,
)
