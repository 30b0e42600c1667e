"""Device-mesh construction.

The reference scales out with GNU parallel over share-nothing genome chunks
(/root/reference/clair/callVarBamParallel.py:90-119) and has no distributed
backend at all (SURVEY.md §2). The TPU-native equivalent is a 2-D
('data', 'model') mesh: gradients all-reduce over ICI on the data axis, and
the post-LSTM dense trunk can optionally shard over the model axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the first n devices.

    model_parallel must divide n; data-parallel size is n // model_parallel.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"make_mesh needs {n_devices} devices but only {len(devices)} are "
            f"visible (platform={jax.devices()[0].platform if devices else '?'}). "
            "For a virtual multi-device CPU mesh, set XLA_FLAGS="
            "--xla_force_host_platform_device_count=<n> before the JAX backend "
            "initializes and force jax.config.update('jax_platforms', 'cpu')."
        )
    devices = devices[:n_devices]
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide n_devices={n_devices}"
        )
    grid = np.asarray(devices).reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))
