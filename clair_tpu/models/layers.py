"""Self-normalizing-network primitives: SELU, alpha-dropout, initializers.

SELU constants and the fixed-point-preserving alpha-dropout rescale follow
Klambauer et al. 2017 and match the reference ops
(/root/reference/clair/selu.py:26-74) so that trained checkpoints behave
identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SELU_ALPHA = 1.6732632423543772848170429916717
SELU_SCALE = 1.0507009873554804934193349852946
# the value a dropped SELU unit saturates to: -scale * alpha
ALPHA_DROPOUT_VALUE = -1.7580993408473766


def selu(x: jnp.ndarray) -> jnp.ndarray:
    return SELU_SCALE * jnp.where(x >= 0.0, x, SELU_ALPHA * jnp.expm1(x))


def alpha_dropout(
    rng: jax.Array,
    x: jnp.ndarray,
    rate: float,
    fixed_point_mean: float = 0.0,
    fixed_point_var: float = 1.0,
) -> jnp.ndarray:
    """Dropout for SELU networks: dropped units are set to alpha' and the
    output is affinely rescaled to preserve mean/variance (ref selu.py:39-69).
    """
    if rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep_prob, shape=x.shape)
    alpha_p = ALPHA_DROPOUT_VALUE
    ret = jnp.where(mask, x, alpha_p)
    a = (
        fixed_point_var
        / (keep_prob * ((1 - keep_prob) * (alpha_p - fixed_point_mean) ** 2 + fixed_point_var))
    ) ** 0.5
    b = fixed_point_mean - a * (keep_prob * fixed_point_mean + (1 - keep_prob) * alpha_p)
    return a * ret + b


def dropout(rng: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Standard inverted dropout (used between LSTM layers)."""
    if rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep_prob, shape=x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


# He/LeCun fan-in initializer (stddev = sqrt(1/fan_in), truncated normal):
# the SNN-correct weight init, same family the reference uses everywhere.
he_fan_in = jax.nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
glorot_uniform = jax.nn.initializers.glorot_uniform()
