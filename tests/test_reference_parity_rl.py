"""RL-core parity vs the REFERENCE'S OWN torch code (GAE, DiagGaussian,
ZFilter) — these modules import without mujoco_py, so the exact advantage
recursion, gaussian log-prob/KL, and the running-stat normalization that
is pickled into checkpoints are compared against the reference
implementations directly."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.append("/root/reference")

torch = pytest.importorskip("torch")
common = pytest.importorskip("uhc.khrylib.rl.core.common")
dists = pytest.importorskip("uhc.khrylib.rl.core.distributions")
zfilter = pytest.importorskip("uhc.khrylib.utils.zfilter")

RNG = np.random.RandomState(11)


def test_gae_matches_reference():
    """Single-env episode stream: (T,1) flat batch == our (T,B=1) scan
    with a zero bootstrap (the reference never bootstraps)."""
    from uhc_tpu.learn.gae import estimate_advantages

    T = 64
    rewards = RNG.rand(T).astype(np.float64)
    masks = np.ones(T); masks[20] = 0.0; masks[47] = 0.0; masks[-1] = 0.0
    values = RNG.randn(T).astype(np.float64)
    gamma, tau = 0.95, 0.95

    ref_adv, ref_ret = common.estimate_advantages(
        torch.from_numpy(rewards[:, None]),
        torch.from_numpy(masks[:, None]),
        torch.from_numpy(values[:, None]), gamma, tau)

    adv, ret = estimate_advantages(
        jnp.asarray(rewards[:, None], jnp.float32),
        jnp.asarray(masks[:, None], jnp.float32),
        jnp.asarray(values[:, None], jnp.float32),
        jnp.zeros((1,), jnp.float32), gamma, tau)

    np.testing.assert_allclose(np.asarray(ret).ravel(),
                               ref_ret.numpy().ravel(), atol=1e-4)
    # whitening: torch .std() is Bessel (N-1), jnp.std is N — rescale
    corr = np.std(ref_adv.numpy().ravel())  # N-normalized std of ref out
    np.testing.assert_allclose(np.asarray(adv).ravel() * corr,
                               ref_adv.numpy().ravel(), atol=1e-3)


def test_gaussian_log_prob_and_kl():
    from uhc_tpu.learn.nets import gaussian_kl, gaussian_log_prob

    B, A = 16, 7
    mean = RNG.randn(B, A); log_std = RNG.randn(A) * 0.3 - 1.0
    act = RNG.randn(B, A)
    d = dists.DiagGaussian(torch.from_numpy(mean),
                           torch.from_numpy(np.exp(log_std))
                           .expand(B, A))
    ref_lp = d.log_prob(torch.from_numpy(act)).numpy().ravel()
    lp = np.asarray(gaussian_log_prob(jnp.asarray(mean),
                                      jnp.asarray(log_std),
                                      jnp.asarray(act)))
    np.testing.assert_allclose(lp, ref_lp, atol=1e-4)

    # KL between two explicit diagonal gaussians, matching the reference
    # formula (distributions.py:18) with (mean0,std0) as the detached dist
    mean1 = mean + RNG.randn(B, A) * 0.1
    log_std1 = log_std + 0.05
    ref_kl = (torch.from_numpy(log_std1 - log_std)
              + (torch.from_numpy(np.exp(log_std) ** 2)
                 + torch.from_numpy((mean - mean1) ** 2))
              / (2.0 * torch.from_numpy(np.exp(log_std1) ** 2))
              - 0.5).sum(1).numpy()
    kl = np.asarray(gaussian_kl(jnp.asarray(mean), jnp.asarray(log_std),
                                jnp.asarray(mean1), jnp.asarray(log_std1)))
    np.testing.assert_allclose(kl, ref_kl, atol=1e-4)


def test_running_stats_match_zfilter():
    """Welford stream == the reference ZFilter(RunningStat) that gets
    pickled into checkpoints (demean + destd + clip5)."""
    from uhc_tpu.learn import running_norm as RN

    D = 5
    zf = zfilter.ZFilter((D,), clip=5.0)
    rs = RN.RunningStats(jnp.zeros(()), jnp.zeros(D), jnp.zeros(D))
    xs = RNG.randn(40, D) * 3.0 + 1.0
    outs_ref = np.stack([zf(x.copy()) for x in xs])
    outs = []
    for x in xs:
        rs = RN.update_batch(rs, jnp.asarray(x[None]))
        outs.append(np.asarray(RN.normalize(rs, jnp.asarray(x))))
    np.testing.assert_allclose(np.stack(outs), outs_ref, atol=1e-4)
