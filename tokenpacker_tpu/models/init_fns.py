"""Named parameter-initialization schemes.

Reference MPT ships 10 init schemes (mpt/param_init_fns.py:10-180) selected
by `init_config.name`. Here the same names map to jax initializers applied
to every linear kernel of a params pytree; embeddings/norms keep their
defaults. Fan-in/fan-out follow the [in, out] kernel layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fans(shape):
    # kernels are [..., in, out]
    return shape[-2], shape[-1]


def _trunc(key, shape, std):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def _make(name: str, init_std: float = 0.02, init_gain: float = 0.0, d_model: int | None = None,
          n_layers: int | None = None):
    def baseline(key, shape):
        return _trunc(key, shape, init_std)

    def small(key, shape):
        # "small_init_fn_": std = sqrt(2/(5*d))
        d = d_model or shape[-2]
        return _trunc(key, shape, math.sqrt(2.0 / (5.0 * d)))

    def neox(key, shape):
        # wang-style scaled output init: 2/(L*sqrt(d))
        d = d_model or shape[-2]
        L = n_layers or 24
        return _trunc(key, shape, 2.0 / (L * math.sqrt(d)))

    def kaiming_normal(key, shape):
        fan_in, _ = _fans(shape)
        return jax.random.normal(key, shape) * math.sqrt(2.0 / fan_in)

    def kaiming_uniform(key, shape):
        fan_in, _ = _fans(shape)
        bound = math.sqrt(6.0 / fan_in)
        return jax.random.uniform(key, shape, minval=-bound, maxval=bound)

    def xavier_normal(key, shape):
        fan_in, fan_out = _fans(shape)
        return jax.random.normal(key, shape) * math.sqrt(2.0 / (fan_in + fan_out))

    def xavier_uniform(key, shape):
        fan_in, fan_out = _fans(shape)
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, minval=-bound, maxval=bound)

    def normal(key, shape):
        return jax.random.normal(key, shape) * init_std

    table = {
        "baseline_": baseline,
        "default_": baseline,
        "small_init_": small,
        "neox_init_": neox,
        "kaiming_normal_": kaiming_normal,
        "kaiming_uniform_": kaiming_uniform,
        "xavier_normal_": xavier_normal,
        "xavier_uniform_": xavier_uniform,
        "normal_": normal,
        "trunc_normal_": baseline,
    }
    try:
        return table[name]
    except KeyError:
        raise ValueError(f"unknown init scheme {name!r}; known: {sorted(table)}")


INIT_SCHEMES = (
    "baseline_", "default_", "small_init_", "neox_init_", "kaiming_normal_",
    "kaiming_uniform_", "xavier_normal_", "xavier_uniform_", "normal_", "trunc_normal_",
)


def reinit_kernels(key, params, name: str = "kaiming_normal_", **kwargs):
    """Re-initialize every 'kernel' leaf of `params` with the named scheme."""
    fn = _make(name, **kwargs)

    def f(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if leaf is None or "kernel" not in names or leaf.ndim < 2:
            return leaf
        k = jax.random.fold_in(key, hash(jax.tree_util.keystr(path)) % (2**31))
        return fn(k, leaf.shape).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(f, params)
