"""Policy / value networks as plain JAX pytrees.

Mirrors the reference model zoo needed for copycat training:
* MLP trunk (uhc/khrylib/models/mlp.py:5) with tanh/relu/sigmoid/gelu,
* PolicyGaussian: trunk -> mean head (0.1-scaled init), state-independent
  learnable log_std (khrylib/rl/core/policy_gaussian.py:8),
* PolicyMCP: multiplicative compositional policy — num_primitive trunks with
  action heads + softmax composer over primitives, shared log_std
  (uhc/models/policy_mcp.py:9),
* Value: trunk -> scalar head (khrylib/rl/core/critic.py:5).

Parameters are nested dicts; apply functions are pure and batched (MXU-sized
matmuls when the env batch is large, which is the whole point on TPU).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
}


def _linear_init(key, fan_in, fan_out, scale=None, dtype=jnp.float32):
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    k1, k2 = jax.random.split(key)
    lim = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), dtype, -lim, lim)
    b = jax.random.uniform(k2, (fan_out,), dtype, -lim, lim)
    if scale is not None:
        w = w * scale
        b = b * 0.0
    return {"w": w, "b": b}


def mlp_init(key, in_dim: int, hidden: Sequence[int], dtype=jnp.float32):
    params = []
    last = in_dim
    for h in hidden:
        key, sub = jax.random.split(key)
        params.append(_linear_init(sub, last, h, dtype=dtype))
        last = h
    return params


def mlp_apply(params, x, activation: str):
    act = ACTIVATIONS[activation]
    for layer in params:
        x = act(x @ layer["w"] + layer["b"])
    return x


# -- Gaussian policy ---------------------------------------------------------


def policy_gaussian_init(key, state_dim, action_dim, hidden, log_std,
                         dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "trunk": mlp_init(k1, state_dim, hidden, dtype),
        "mean": _linear_init(k2, hidden[-1], action_dim, scale=0.1, dtype=dtype),
        "log_std": jnp.full((action_dim,), log_std, dtype),
    }


def policy_gaussian_mean(params, x, activation):
    h = mlp_apply(params["trunk"], x, activation)
    return h @ params["mean"]["w"] + params["mean"]["b"]


# -- MCP policy --------------------------------------------------------------


def policy_mcp_init(key, state_dim, action_dim, hidden, composer_hidden,
                    num_primitive, log_std, dtype=jnp.float32):
    keys = jax.random.split(key, num_primitive + 2)
    prims = []
    for i in range(num_primitive):
        ka, kb = jax.random.split(keys[i])
        prims.append({
            "trunk": mlp_init(ka, state_dim, hidden, dtype),
            "head": _linear_init(kb, hidden[-1], action_dim, scale=0.1, dtype=dtype),
        })
    # stack primitives on a leading axis so the forward pass is one batched
    # matmul over primitives instead of a python loop
    prims = jax.tree.map(lambda *xs: jnp.stack(xs), *prims)
    kc, kd = jax.random.split(keys[-1])
    composer = {
        "trunk": mlp_init(kc, state_dim, list(composer_hidden) + [num_primitive], dtype),
    }
    return {"prims": prims, "composer": composer,
            "log_std": jnp.full((action_dim,), log_std, dtype)}


def policy_mcp_mean(params, x, activation):
    def one_prim(p):
        h = mlp_apply(p["trunk"], x, activation)
        return h @ p["head"]["w"] + p["head"]["b"]

    means = jax.vmap(one_prim)(params["prims"])       # (P, B, A)
    # composer MLP ends in a num_primitive layer then softmax
    # (policy_mcp.py:26: MLP(...composer_dim+[P]) -> Softmax)
    w = mlp_apply(params["composer"]["trunk"], x, activation)
    w = jax.nn.softmax(w, axis=-1)                     # (B, P)
    return jnp.einsum("bp,pba->ba", w, means)


# -- TCN (khrylib/models/tcn.py twin) ------------------------------------------


def tcn_init(key, num_inputs: int, num_channels: Sequence[int],
             kernel_size: int = 3, dtype=jnp.float32):
    """Dilated temporal conv net: per level a residual block of two convs
    (dilation 2^i) + optional 1x1 downsample (TemporalConvNet)."""
    layers = []
    last = num_inputs
    for i, ch in enumerate(num_channels):
        key, k1, k2, k3 = jax.random.split(key, 4)
        block = {
            "conv1": {"w": 0.01 * jax.random.normal(
                k1, (ch, last, kernel_size), dtype),
                "b": jnp.zeros((ch,), dtype)},
            "conv2": {"w": 0.01 * jax.random.normal(
                k2, (ch, ch, kernel_size), dtype),
                "b": jnp.zeros((ch,), dtype)},
        }
        if last != ch:
            block["downsample"] = {
                "w": 0.01 * jax.random.normal(k3, (ch, last, 1), dtype),
                "b": jnp.zeros((ch,), dtype)}
        layers.append(block)
        last = ch
    return layers


def _conv1d(p, x, dilation: int, causal: bool):
    """x: (B, C_in, T) -> (B, C_out, T), 'same' length (Chomp1d for
    causal)."""
    k = p["w"].shape[-1]
    pad = (k - 1) * dilation
    padding = [(pad, 0)] if causal else [(pad // 2, pad - pad // 2)]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + p["b"][None, :, None]


def tcn_apply(params, x, causal: bool = False):
    """(B, C, T) -> (B, C_last, T) (TemporalConvNet.forward)."""
    for i, block in enumerate(params):
        dilation = 2 ** i
        out = jax.nn.relu(_conv1d(block["conv1"], x, dilation, causal))
        out = jax.nn.relu(_conv1d(block["conv2"], out, dilation, causal))
        res = (_conv1d(block["downsample"], x, 1, causal)
               if "downsample" in block else x)
        x = jax.nn.relu(out + res)
    return x


# -- Discriminator (khrylib/models/discriminator.py twin) -----------------------


def discriminator_init(key, in_dim: int, hidden: Sequence[int],
                       dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"trunk": mlp_init(k1, in_dim, hidden, dtype),
            "logic": _linear_init(k2, hidden[-1], 1, scale=0.1, dtype=dtype)}


def discriminator_apply(params, x, activation: str = "relu"):
    h = mlp_apply(params["trunk"], x, activation)
    return jax.nn.sigmoid(h @ params["logic"]["w"] + params["logic"]["b"])[..., 0]


# -- GRU (khrylib/models/rnn.py step-mode twin) --------------------------------


def gru_init(key, in_dim: int, hidden_dim: int, dtype=jnp.float32):
    """GRU cell parameters (torch nn.GRUCell layout: reset/update/new gates
    stacked)."""
    k1, k2 = jax.random.split(key)
    lim = 1.0 / jnp.sqrt(hidden_dim)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -lim, lim)
    ki, kh = jax.random.split(k1)
    kbi, kbh = jax.random.split(k2)
    return {
        "w_ih": u(ki, (in_dim, 3 * hidden_dim)),
        "w_hh": u(kh, (hidden_dim, 3 * hidden_dim)),
        "b_ih": u(kbi, (3 * hidden_dim,)),
        "b_hh": u(kbh, (3 * hidden_dim,)),
    }


def gru_apply(params, x, h):
    """One GRU step: (B, in), (B, H) -> (B, H)."""
    H = h.shape[-1]
    gi = x @ params["w_ih"] + params["b_ih"]
    gh = h @ params["w_hh"] + params["b_hh"]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


# -- Policy distribution helpers ---------------------------------------------


def gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    lp = -((action - mean) ** 2) / (2 * var) - 0.5 * jnp.log(2 * jnp.pi) - log_std
    return jnp.sum(lp, axis=-1)


def gaussian_sample(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)


def gaussian_kl(mean0, log_std0, mean1, log_std1):
    """KL(N(mean0,std0) || N(mean1,std1)) summed over action dims
    (khrylib/rl/core/distributions.py DiagGaussian.kl; the reference
    evaluates it between the detached snapshot and the live dist — here the
    caller passes both explicitly, e.g. stop_gradient'ed old params)."""
    var0 = jnp.exp(2.0 * log_std0)
    var1 = jnp.exp(2.0 * log_std1)
    kl = (log_std1 - log_std0
          + (var0 + (mean0 - mean1) ** 2) / (2.0 * var1) - 0.5)
    return jnp.sum(kl, axis=-1)


# -- Discrete policy (khrylib/rl/core/policy_disc.py:6 twin) -------------------


def policy_discrete_init(key, state_dim, action_num, hidden,
                         dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"trunk": mlp_init(k1, state_dim, hidden, dtype),
            "head": _linear_init(k2, hidden[-1], action_num, scale=0.1,
                                 dtype=dtype)}


def policy_discrete_logits(params, x, activation: str = "relu"):
    h = mlp_apply(params["trunk"], x, activation)
    return h @ params["head"]["w"] + params["head"]["b"]


def categorical_sample(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def categorical_log_prob(logits, action):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action[..., None], axis=-1)[..., 0]


def categorical_kl(logits_p, logits_q):
    """KL(p ‖ q) between two categorical heads (distributions.py:29)."""
    lp = jax.nn.log_softmax(logits_p, axis=-1)
    lq = jax.nn.log_softmax(logits_q, axis=-1)
    return jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)


# -- Value -------------------------------------------------------------------


def value_init(key, state_dim, hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "trunk": mlp_init(k1, state_dim, hidden, dtype),
        "head": _linear_init(k2, hidden[-1], 1, scale=0.1, dtype=dtype),
    }


def value_apply(params, x, activation):
    h = mlp_apply(params["trunk"], x, activation)
    return (h @ params["head"]["w"] + params["head"]["b"])[..., 0]


def make_policy(cfg, state_dim, action_dim, key, dtype=jnp.float32):
    """Factory: returns (params, mean_fn(params, obs) -> action mean).
    Registry twin of uhc/models/__init__.py policy_dict."""
    if cfg.actor_type == "mcp":
        params = policy_mcp_init(key, state_dim, action_dim, cfg.policy_hsize,
                                 cfg.composer_dim, cfg.num_primitive,
                                 cfg.log_std, dtype)
        fn = lambda p, x: policy_mcp_mean(p, x, cfg.policy_htype)
    else:
        params = policy_gaussian_init(key, state_dim, action_dim,
                                      cfg.policy_hsize, cfg.log_std, dtype)
        fn = lambda p, x: policy_gaussian_mean(p, x, cfg.policy_htype)
    return params, fn
