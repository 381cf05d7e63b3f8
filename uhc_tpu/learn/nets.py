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

import numpy as np

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


# -- Transformer policy (uhc/models/tf_policy.py:11 PolicyTransformer) -------
# The reference policy tokenizes the robot per body (attr/sim/design obs per
# node), runs a TransformerEncoder with sinusoidal positions and reads the
# action from per-token heads. Here: tokens = per-body observation rows plus
# the broadcast global block; per-token heads emit the 3 joint dofs, a
# pooled head emits the remaining (root/RFC/meta-PD) action dims.


def _pos_encoding(n, d):
    pos = np.arange(n)[:, None]
    i = np.arange(d)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / d)
    enc = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return jnp.asarray(enc, jnp.float32)


def policy_transformer_init(key, n_tokens, token_dim, global_dim, action_dim,
                            log_std, d_model=128, nhead=4, ff_dim=256,
                            nlayers=2, dtype=jnp.float32):
    ks = jax.random.split(key, 4 + 6 * nlayers)
    tok_in = token_dim + global_dim
    params = {
        "embed": _linear_init(ks[0], tok_in, d_model, dtype=dtype),
        "layers": [],
        "head_tok": _linear_init(ks[1], d_model, 3, scale=0.01, dtype=dtype),
        "head_glob": _linear_init(ks[2], d_model,
                                  action_dim - 3 * n_tokens,
                                  scale=0.01, dtype=dtype),
        "log_std": jnp.full((action_dim,), log_std, dtype),
    }
    for li in range(nlayers):
        k = ks[4 + 6 * li:4 + 6 * (li + 1)]
        params["layers"].append({
            "wqkv": _linear_init(k[0], d_model, 3 * d_model, dtype=dtype),
            "wo": _linear_init(k[1], d_model, d_model, dtype=dtype),
            "ff1": _linear_init(k[2], d_model, ff_dim, dtype=dtype),
            "ff2": _linear_init(k[3], ff_dim, d_model, dtype=dtype),
            "ln1": {"g": jnp.ones(d_model, dtype),
                    "b": jnp.zeros(d_model, dtype)},
            "ln2": {"g": jnp.ones(d_model, dtype),
                    "b": jnp.zeros(d_model, dtype)},
        })
    meta = dict(n_tokens=n_tokens, token_dim=token_dim,
                global_dim=global_dim, d_model=d_model, nhead=nhead)
    return params, meta


def _ln(x, p):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def policy_transformer_mean(params, meta, obs):
    """obs (B, global_dim + n_tokens*token_dim) -> action mean
    (B, 3*n_tokens + rest). Pre-norm transformer encoder."""
    B = obs.shape[0]
    nt, td, gd = meta["n_tokens"], meta["token_dim"], meta["global_dim"]
    d, nh = meta["d_model"], meta["nhead"]
    g = obs[:, :gd]
    toks = obs[:, gd:].reshape(B, nt, td)
    x = jnp.concatenate(
        [toks, jnp.broadcast_to(g[:, None, :], (B, nt, gd))], axis=-1)
    h = x @ params["embed"]["w"] + params["embed"]["b"]
    h = h + _pos_encoding(nt, d)[None]
    hd = d // nh
    for lp in params["layers"]:
        hn = _ln(h, lp["ln1"])
        qkv = hn @ lp["wqkv"]["w"] + lp["wqkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, nt, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, nt, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, nt, nh, hd).transpose(0, 2, 1, 3)
        att = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2)
                             / np.sqrt(hd), axis=-1)
        o = (att @ v).transpose(0, 2, 1, 3).reshape(B, nt, d)
        h = h + o @ lp["wo"]["w"] + lp["wo"]["b"]
        hn = _ln(h, lp["ln2"])
        h = h + jax.nn.gelu(hn @ lp["ff1"]["w"] + lp["ff1"]["b"]) \
            @ lp["ff2"]["w"] + lp["ff2"]["b"]
    per_tok = (h @ params["head_tok"]["w"]
               + params["head_tok"]["b"]).reshape(B, 3 * nt)
    pooled = jnp.mean(h, axis=1)
    rest = pooled @ params["head_glob"]["w"] + params["head_glob"]["b"]
    return jnp.concatenate([per_tok, rest], axis=-1)


def make_policy(cfg, state_dim, action_dim, key, dtype=jnp.float32,
                n_tokens=None, token_dim=None):
    """Factory: returns (params, mean_fn(params, obs) -> action mean).
    Registry twin of uhc/models/__init__.py policy_dict."""
    if cfg.actor_type == "mcp":
        params = policy_mcp_init(key, state_dim, action_dim, cfg.policy_hsize,
                                 cfg.composer_dim, cfg.num_primitive,
                                 cfg.log_std, dtype)
        fn = lambda p, x: policy_mcp_mean(p, x, cfg.policy_htype)
    elif cfg.actor_type == "transformer":
        if n_tokens is None or token_dim is None:
            raise ValueError("actor_type=transformer needs n_tokens and "
                             "token_dim (per-body observation rows)")
        global_dim = state_dim - n_tokens * token_dim
        params, meta = policy_transformer_init(
            key, n_tokens, token_dim, global_dim, action_dim, cfg.log_std,
            dtype=dtype)
        fn = lambda p, x: policy_transformer_mean(p, meta, x)
    else:
        params = policy_gaussian_init(key, state_dim, action_dim,
                                      cfg.policy_hsize, cfg.log_std, dtype)
        fn = lambda p, x: policy_gaussian_mean(p, x, cfg.policy_htype)
    return params, fn


# ---------------------------------------------------------------------------
# NN-zoo remnants (uhc/khrylib/models): ERD, conditioned MLP, LSTM cell,
# SimpleCNN, ResNet feature net, VideoStateNet. None are on the release
# training path (SURVEY.md §2.3 "NN zoo"); provided for inventory parity
# with the reference model zoo.
# ---------------------------------------------------------------------------


def lstm_init(key, in_dim: int, hidden_dim: int, dtype=jnp.float32):
    """LSTM cell (khrylib/models/rnn.py 'lstm' cell type)."""
    k1, k2 = jax.random.split(key)
    return {
        "wi": _linear_init(k1, in_dim + hidden_dim, 4 * hidden_dim,
                           dtype=dtype),
        "hdim": hidden_dim,
    }


def lstm_apply(params, x, state):
    """One step. state = (h, c); returns (out, (h', c'))."""
    h, c = state
    hd = params["hdim"]
    z = jnp.concatenate([x, h], axis=-1) @ params["wi"]["w"] \
        + params["wi"]["b"]
    i, f, g, o = (jax.nn.sigmoid(z[..., :hd]),
                  jax.nn.sigmoid(z[..., hd:2 * hd]),
                  jnp.tanh(z[..., 2 * hd:3 * hd]),
                  jax.nn.sigmoid(z[..., 3 * hd:]))
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return h2, (h2, c2)


def erd_init(key, state_dim: int, dtype=jnp.float32):
    """ERDNet (khrylib/models/erd_net.py:7): MLP(500) encoder -> linear ->
    LSTM(1000) x2 -> MLP(500,100) decoder -> linear(state_dim)."""
    ks = jax.random.split(key, 6)
    return {
        "enc_mlp": mlp_init(ks[0], state_dim, (500,), dtype),
        "enc_lin": _linear_init(ks[1], 500, 500, dtype=dtype),
        "lstm1": lstm_init(ks[2], 500, 1000, dtype),
        "lstm2": lstm_init(ks[3], 1000, 1000, dtype),
        "dec_mlp": mlp_init(ks[4], 1000, (500, 100), dtype),
        "dec_lin": _linear_init(ks[5], 100, state_dim, dtype=dtype),
    }


def erd_apply(params, x_seq, state=None):
    """(T, B, state_dim) -> (T, B, state_dim) (erd_net.py:27 forward,
    'batch' mode). `state` optionally carries (h1,c1,h2,c2) across calls."""
    T, B, _ = x_seq.shape
    if state is None:
        z = jnp.zeros((B, 1000), x_seq.dtype)
        state = (z, z, z, z)

    def enc(x):
        e = mlp_apply(params["enc_mlp"], x, "relu")
        return e @ params["enc_lin"]["w"] + params["enc_lin"]["b"]

    def step(carry, x):
        h1, c1, h2, c2 = carry
        e = enc(x)
        o1, (h1, c1) = lstm_apply(params["lstm1"], e, (h1, c1))
        o2, (h2, c2) = lstm_apply(params["lstm2"], o1, (h2, c2))
        return (h1, c1, h2, c2), o2

    state, outs = jax.lax.scan(step, state, x_seq)
    d = mlp_apply(params["dec_mlp"], outs, "relu")
    return d @ params["dec_lin"]["w"] + params["dec_lin"]["b"], state


def cmlp_init(key, input_dim: int, cond_dim: int, hidden=(128, 128),
              dtype=jnp.float32):
    """Conditioned MLP (khrylib/models/cmlp.py:5): every layer re-reads the
    conditioning vector."""
    ks = jax.random.split(key, len(hidden))
    layers, last = [], input_dim
    for k, nh in zip(ks, hidden):
        layers.append(_linear_init(k, last + cond_dim, nh, dtype=dtype))
        last = nh
    return {"layers": layers}


def cmlp_apply(params, c, x, activation: str = "tanh"):
    act = {"tanh": jnp.tanh, "relu": jax.nn.relu,
           "sigmoid": jax.nn.sigmoid}[activation]
    for lin in params["layers"]:
        x = jnp.concatenate([c, x], axis=-1)
        x = act(x @ lin["w"] + lin["b"])
    return x


def _conv2d_init(key, cin, cout, ksize, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(cin * ksize * ksize)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (cout, cin, ksize, ksize),
                                    dtype, -scale, scale),
            "b": jax.random.uniform(k2, (cout,), dtype, -scale, scale)}


def _conv2d(p, x, stride):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def simple_cnn_init(key, out_dim: int, dtype=jnp.float32):
    """SimpleCNN (khrylib/models/simple_cnn.py:5): 3 stride-4 convs + fc,
    224x224x3 input -> out_dim."""
    ks = jax.random.split(key, 4)
    return {
        "c1": _conv2d_init(ks[0], 3, 32, 4, dtype),
        "c2": _conv2d_init(ks[1], 32, 32, 4, dtype),
        "c3": _conv2d_init(ks[2], 32, 16, 4, dtype),
        "fc": _linear_init(ks[3], 144, out_dim, dtype=dtype),
    }


def simple_cnn_apply(params, x):
    """x: (B, 3, 224, 224) -> (B, out_dim)."""
    x = jax.nn.relu(_conv2d(params["c1"], x, 4))
    x = jax.nn.relu(_conv2d(params["c2"], x, 4))
    x = jax.nn.relu(_conv2d(params["c3"], x, 4))
    x = x.reshape(x.shape[0], -1)
    return x @ params["fc"]["w"] + params["fc"]["b"]


def resnet_feat_init(key, out_dim: int, width: int = 32, blocks: int = 3,
                     dtype=jnp.float32):
    """Compact residual CNN feature extractor — the role of
    khrylib/models/resnet.py (a torchvision-ResNet18 wrapper whose fc is
    replaced): stride-2 stem, `blocks` residual conv blocks, global average
    pool, linear head."""
    ks = jax.random.split(key, 2 + 2 * blocks)
    p = {"stem": _conv2d_init(ks[0], 3, width, 4, dtype), "blocks": []}
    for b in range(blocks):
        p["blocks"].append({
            "a": _conv2d_init(ks[1 + 2 * b], width, width, 3, dtype),
            "b": _conv2d_init(ks[2 + 2 * b], width, width, 3, dtype)})
    p["fc"] = _linear_init(ks[-1], width, out_dim, dtype=dtype)
    return p


def resnet_feat_apply(params, x):
    """x: (B, 3, H, W) -> (B, out_dim)."""
    x = jax.nn.relu(_conv2d(params["stem"], x, 4))
    for blk in params["blocks"]:
        y = jax.lax.conv_general_dilated(
            x, blk["a"]["w"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = jax.nn.relu(y + blk["a"]["b"][None, :, None, None])
        y = jax.lax.conv_general_dilated(
            y, blk["b"]["w"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + y + blk["b"]["b"][None, :, None, None])
    x = jnp.mean(x, axis=(2, 3))
    return x @ params["fc"]["w"] + params["fc"]["b"]


def video_state_net_init(key, cnn_feat_dim: int, v_hdim: int = 128,
                         v_net_type: str = "gru", tcn_size=(64, 128),
                         kernel_size: int = 3, dtype=jnp.float32):
    """VideoStateNet (khrylib/models/video_state_net.py:7): temporal net
    (GRU or TCN) over per-frame CNN features -> per-frame state feature."""
    if v_net_type == "tcn":
        return {"type": "tcn",
                "net": tcn_init(key, cnn_feat_dim, tcn_size, kernel_size,
                                dtype)}
    return {"type": "gru", "hdim": v_hdim,
            "net": gru_init(key, cnn_feat_dim, v_hdim, dtype)}


def video_state_net_apply(params, feats, causal: bool = False):
    """feats: (T, feat_dim) -> (T, v_hdim)."""
    if params["type"] == "tcn":
        y = tcn_apply(params["net"], feats.T[None], causal)   # (1, C, T)
        return y[0].T
    h0 = jnp.zeros((params["hdim"],), feats.dtype)

    def step(h, x):
        h2 = gru_apply(params["net"], x, h)
        return h2, h2

    _, outs = jax.lax.scan(step, h0, feats)
    return outs

def _dwconv2d_init(key, cin, ksize, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(ksize * ksize)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (cin, 1, ksize, ksize), dtype,
                                    -scale, scale),
            "b": jax.random.uniform(k2, (cin,), dtype, -scale, scale)}


_MOBILE_STAGES = ((32, 64, 1), (64, 128, 2), (128, 128, 1), (128, 256, 2),
                  (256, 256, 1), (256, 512, 2), (512, 512, 1), (512, 512, 1),
                  (512, 512, 1), (512, 512, 1), (512, 512, 1), (512, 1024, 2),
                  (1024, 1024, 1))


def mobile_net_init(key, out_dim: int, dtype=jnp.float32):
    """MobileNet-v1 feature net (khrylib/models/mobile_net.py:5): stride-2
    stem then 13 depthwise-separable stages, pool, linear. BatchNorm is
    replaced by the conv biases (these zoo nets are inventory twins, not
    pretrained-weight loaders), and the fixed AvgPool2d(7) by a global mean
    pool — identical at the canonical 224×224 input, size-agnostic
    elsewhere."""
    ks = jax.random.split(key, 2 + 2 * len(_MOBILE_STAGES))
    p = {"stem": _conv2d_init(ks[0], 3, 32, 3, dtype), "stages": []}
    for i, (cin, cout, _) in enumerate(_MOBILE_STAGES):
        p["stages"].append({
            "dw": _dwconv2d_init(ks[1 + 2 * i], cin, 3, dtype),
            "pw": _conv2d_init(ks[2 + 2 * i], cin, cout, 1, dtype)})
    p["fc"] = _linear_init(ks[-1], 1024, out_dim, dtype=dtype)
    return p


def mobile_net_apply(params, x):
    """x: (B, 3, H, W) -> (B, out_dim)."""
    x = jax.lax.conv_general_dilated(
        x, params["stem"]["w"], (2, 2), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.nn.relu(x + params["stem"]["b"][None, :, None, None])
    for st, (cin, _, stride) in zip(params["stages"], _MOBILE_STAGES):
        y = jax.lax.conv_general_dilated(
            x, st["dw"]["w"], (stride, stride), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=cin)
        y = jax.nn.relu(y + st["dw"]["b"][None, :, None, None])
        y = jax.lax.conv_general_dilated(
            y, st["pw"]["w"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(y + st["pw"]["b"][None, :, None, None])
    x = jnp.mean(x, axis=(2, 3))
    return x @ params["fc"]["w"] + params["fc"]["b"]


def video_reg_net_init(key, out_dim: int, v_hdim: int, cnn_fdim: int,
                       cnn_type: str = "resnet", v_net_type: str = "gru",
                       mlp_dim=(300, 200), tcn_size=(64, 128),
                       dtype=jnp.float32):
    """VideoRegNet (khrylib/models/video_reg_net.py:10): per-frame CNN ->
    temporal net -> MLP -> linear regression head. The reference's LSTM
    option maps onto the zoo GRU (video_state_net)."""
    ks = jax.random.split(key, 4)
    cnn = (mobile_net_init(ks[0], cnn_fdim, dtype) if cnn_type == "mobile"
           else resnet_feat_init(ks[0], cnn_fdim, dtype=dtype))
    return {
        "cnn_type": cnn_type,
        "cnn": cnn,
        "v_net": video_state_net_init(ks[1], cnn_fdim, v_hdim, v_net_type,
                                      tcn_size, dtype=dtype),
        "mlp": mlp_init(ks[2], v_hdim, tuple(mlp_dim), dtype),
        "fc": _linear_init(ks[3], mlp_dim[-1], out_dim, dtype=dtype),
    }


def video_reg_net_apply(params, frames, causal: bool = False):
    """frames: (T, 3, H, W) -> (T, out_dim) (video_reg_net.py:59 forward)."""
    cnn_apply = (mobile_net_apply if params["cnn_type"] == "mobile"
                 else resnet_feat_apply)
    feats = cnn_apply(params["cnn"], frames)          # (T, cnn_fdim)
    v = video_state_net_apply(params["v_net"], feats, causal)
    y = mlp_apply(params["mlp"], v, "relu")
    return y @ params["fc"]["w"] + params["fc"]["b"]


def video_forecast_net_init(key, cnn_feat_dim: int, state_dim: int,
                            v_hdim: int = 128, v_margin: int = 10,
                            s_net_type: str = "id", s_hdim=None,
                            dtype=jnp.float32):
    """VideoForecastNet (khrylib/models/video_forecast_net.py:7): a video
    branch summarizes the first `v_margin` frames' CNN features into a fixed
    context; a state branch ('id' passthrough or GRU) encodes the running
    sim state; the policy consumes their concatenation."""
    s_hdim = state_dim if s_hdim is None else s_hdim
    k1, k2 = jax.random.split(key)
    p = {"v_margin": v_margin, "s_net_type": s_net_type,
         "out_dim": v_hdim + s_hdim,
         "v_net": video_state_net_init(k1, cnn_feat_dim, v_hdim)}
    if s_net_type == "gru":
        p["s_net"] = gru_init(k2, state_dim, s_hdim, dtype)
        p["s_hdim"] = s_hdim
    return p


def video_forecast_initialize(params, cnn_feats):
    """Test-mode initialize (video_forecast_net.py:58): run the causal video
    net over the margin window, keep the last output as the episode's fixed
    video context. Returns (v_out, s_state)."""
    v = video_state_net_apply(params["v_net"],
                              cnn_feats[:params["v_margin"]], causal=True)
    s_state = (jnp.zeros((params["s_hdim"],), cnn_feats.dtype)
               if params["s_net_type"] == "gru" else None)
    return v[-1], s_state


def video_forecast_step(params, v_out, s_state, state):
    """Per-step feature (video_forecast_net.py:95 forward, test mode):
    concat(video context, state encoding). Returns (feature, s_state')."""
    if params["s_net_type"] == "gru":
        s_state = gru_apply(params["s_net"], state, s_state)
        s = s_state
    else:
        s = state
    return jnp.concatenate([v_out, s], axis=-1), s_state
