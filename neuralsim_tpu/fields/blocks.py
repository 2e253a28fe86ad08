"""MLP building blocks (functional, pytree-parameterized).

TPU-native equivalent of ``nr3d_lib.models.blocks`` (``MLP``, ``LipshitzMLP``,
``get_blocks`` — reference surface catalogued in SURVEY.md §2.9). Design:
modules are *static config objects*; parameters live in plain dict pytrees so
they jit / pjit / optax-partition cleanly and the AssetBank can hold a flat
``{model_id: params}`` dict.

Compute convention: params are stored fp32; matmuls run with
``preferred_element_type=float32`` and inputs may be bf16 — XLA places them on
the MXU. Hidden widths default to multiples of 64 so tiles map onto the
128x128 systolic array after batching.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_ACTS: Dict[str, Callable] = {
    "relu": jax.nn.relu,
    "softplus": lambda x: jax.nn.softplus(x * 100.0) / 100.0,  # beta=100 softplus (NeuS SDF nets)
    "softplus_b1": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "none": lambda x: x,
    "identity": lambda x: x,
}


def get_activation(name: Optional[str]) -> Callable:
    if name is None:
        return _ACTS["none"]
    if callable(name):
        return name
    return _ACTS[name]


def _linear_init(key, in_dim: int, out_dim: int, *, weight_norm_like: bool = False,
                 w_init: Optional[Callable] = None, b_init_val: float = 0.0):
    kw, _ = jax.random.split(key)
    if w_init is not None:
        W = w_init(kw, (in_dim, out_dim))
    else:
        # Kaiming-uniform (matches torch nn.Linear default fan-in scaling).
        bound = 1.0 / math.sqrt(in_dim)
        W = jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound)
    b = jnp.full((out_dim,), b_init_val, dtype=jnp.float32)
    return {"W": W.astype(jnp.float32), "b": b}


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # bf16 activations: match the weight operand so the MXU runs a true
    # bf16x bf16 matmul (params stay fp32 master copies; accumulation and
    # the bias add stay fp32 via preferred_element_type).
    W = p["W"].astype(x.dtype) if x.dtype == jnp.bfloat16 else p["W"]
    return jnp.dot(x, W, preferred_element_type=jnp.float32) + p["b"]


class MLP:
    """Plain MLP: D hidden layers of width W, configurable output activation.

    ``skips``: layer indices whose *input* gets the network input concatenated
    (NeRF/NeuS style skip connections).
    """

    def __init__(self, in_dim: int, out_dim: int, *, hidden: int = 64, depth: int = 2,
                 activation: str = "relu", output_activation: Optional[str] = None,
                 skips: Sequence[int] = (), w_init: Optional[Callable] = None,
                 last_w_init: Optional[Callable] = None, last_b_init: float = 0.0):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.hidden = hidden
        self.depth = depth
        self.act = get_activation(activation)
        self.out_act = get_activation(output_activation)
        self.skips = tuple(skips)
        self.w_init = w_init
        self.last_w_init = last_w_init
        self.last_b_init = last_b_init

    def layer_dims(self) -> Sequence[Tuple[int, int]]:
        dims = []
        d = self.in_dim
        for i in range(self.depth):
            d_in = d + (self.in_dim if i in self.skips and i > 0 else 0)
            dims.append((d_in, self.hidden))
            d = self.hidden
        d_in = d + (self.in_dim if self.depth in self.skips and self.depth > 0 else 0)
        dims.append((d_in, self.out_dim))
        return dims

    def init(self, key) -> Params:
        dims = self.layer_dims()
        keys = jax.random.split(key, len(dims))
        layers = []
        for i, ((di, do), k) in enumerate(zip(dims, keys)):
            is_last = i == len(dims) - 1
            layers.append(_linear_init(
                k, di, do,
                w_init=self.last_w_init if is_last else self.w_init,
                b_init_val=self.last_b_init if is_last else 0.0))
        return {"layers": layers}

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        n = len(params["layers"])
        bf16 = x.dtype == jnp.bfloat16
        for i, p in enumerate(params["layers"]):
            if i in self.skips and i > 0:
                h = jnp.concatenate([h, x], axis=-1)
            h = linear_apply(p, h)
            if i < n - 1:
                h = self.act(h)
                if bf16:  # keep hidden activations bf16; the OUTPUT stays f32
                    h = h.astype(jnp.bfloat16)
        return self.out_act(h)


class LipschitzMLP(MLP):
    """MLP with per-layer learned Lipschitz bound c_l; weights row-normalized
    so that ||W row||_1 <= softplus(c_l).

    Reference analog: ``nr3d_lib.models.blocks.LipshitzMLP`` used by the color
    nets under ``ColorLipshitzRegLoss`` (SURVEY.md §2.4). The product of
    softplus(c_l) is the regularized Lipschitz constant.
    """

    def init(self, key) -> Params:
        base = super().init(key)
        base["c"] = [jnp.asarray(jnp.log(jnp.exp(jnp.max(jnp.sum(jnp.abs(p["W"]), axis=0))) - 1.0 + 1e-8))
                     for p in base["layers"]]
        return base

    @staticmethod
    def _normalize_W(W, c):
        softplus_c = jax.nn.softplus(c)
        scale = jnp.minimum(1.0, softplus_c / jnp.clip(jnp.sum(jnp.abs(W), axis=0), 1e-12))
        return W * scale[None, :]

    def __call__(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        n = len(params["layers"])
        for i, (p, c) in enumerate(zip(params["layers"], params["c"])):
            if i in self.skips and i > 0:
                h = jnp.concatenate([h, x], axis=-1)
            W = self._normalize_W(p["W"], c)
            h = jnp.dot(h, W, preferred_element_type=jnp.float32) + p["b"]
            if i < n - 1:
                h = self.act(h)
        return self.out_act(h)

    @staticmethod
    def lipschitz_bound(params: Params) -> jnp.ndarray:
        """prod_l softplus(c_l) — the quantity ColorLipshitzRegLoss penalizes."""
        out = jnp.asarray(1.0)
        for c in params["c"]:
            out = out * jax.nn.softplus(c)
        return out


def geometric_init_mlp(in_dim: int, out_dim: int, *, hidden: int, depth: int,
                       skips: Sequence[int] = (), radius_init: float = 0.5,
                       inside_out: bool = False) -> MLP:
    """SDF MLP with SAL geometric initialization: the network starts out
    approximating the SDF of a sphere of radius ``radius_init``.

    Reference analog: the geometric init used by nr3d_lib's MLP SDF decoders
    (standard for MlpPENeuSModel-class fields; see SURVEY.md §2.9 fields row).
    The raw-xyz slice of the first layer gets normal init; PE channels are
    zeroed; the last layer is initialized to mean sqrt(pi/hidden) with bias
    -radius (so sdf(0)= -r, growing outward).
    """
    sign = -1.0 if inside_out else 1.0

    def w_init_first(key, shape):
        di, do = shape
        W = jax.random.normal(key, shape) * (math.sqrt(2.0) / math.sqrt(do))
        if di > 3:  # zero the PE channels, keep raw xyz
            W = W.at[3:, :].set(0.0)
        return W

    def w_init_hidden(key, shape):
        di, do = shape
        return jax.random.normal(key, shape) * (math.sqrt(2.0) / math.sqrt(do))

    def w_init_last(key, shape):
        di, do = shape
        mean = sign * math.sqrt(math.pi) / math.sqrt(di)
        return jax.random.normal(key, shape) * 1e-4 + mean

    mlp = MLP(in_dim, out_dim, hidden=hidden, depth=depth, activation="softplus",
              skips=skips, w_init=w_init_hidden, last_w_init=w_init_last,
              last_b_init=-sign * radius_init)

    # first layer gets its own init: wrap init()
    orig_init = mlp.init

    def init(key):
        p = orig_init(key)
        k = jax.random.fold_in(key, 1337)
        di, do = mlp.layer_dims()[0]
        p["layers"][0]["W"] = w_init_first(k, (di, do))
        return p

    mlp.init = init  # type: ignore[method-assign]
    return mlp
