"""ESS / split-Rhat diagnostic tests.

Mirrors /root/reference/tests/testthat/test-ESS.R and test-rhat.R, plus a
naive O(m^2) re-implementation of the reference's exact algorithm to verify
the FFT-based fast path numerically.
"""

import numpy as np
import pytest

from bayesssm_tpu.diagnostics import ess, rhat


def naive_ess(mat):
    """Direct transcription of R/ESS.R:32-103 in numpy (float64)."""
    m, k = mat.shape
    chain_means = mat.mean(0)
    overall = chain_means.mean()
    b = m / (k - 1) * ((chain_means - overall) ** 2).sum()
    chain_vars = mat.var(0, ddof=1)
    if (chain_vars == 0).any():
        return np.nan
    w = chain_vars.mean()
    var_hat = (m - 1) / m * w + b / m
    # R acf: c_t = (1/m) sum (x_s - xbar)(x_{s+t} - xbar)
    acfm = np.empty((m, k))
    for i in range(k):
        x = mat[:, i] - mat[:, i].mean()
        c = np.array([(x[: m - t] * x[t:]).sum() / m for t in range(m)])
        acfm[:, i] = c / c[0]
    hat_rho = np.array(
        [1 - (w - (chain_vars * acfm[t]).mean()) / var_hat for t in range(m)]
    )
    max_pairs = (m - 1) // 2
    pairs = np.array(
        [hat_rho[2 * t - 1] + hat_rho[2 * t] for t in range(1, max_pairs + 1)]
    )
    for t in range(1, len(pairs)):
        pairs[t] = min(pairs[t], pairs[t - 1])
    s = 0.0
    for p in pairs:
        if p < 0:
            break
        s += p
    tau = 1 + 2 * s
    return (k * m) / tau


def naive_rhat(mat):
    """Direct transcription of R/rhat.R:28-67."""
    m, k = mat.shape
    if m % 2 == 1:
        mat = mat[:-1]
        m -= 1
    half = m // 2
    split = np.concatenate([mat[:half], mat[half:]], axis=1)
    chain_means = split.mean(0)
    overall = chain_means.mean()
    b = m / (2 * k - 1) * ((chain_means - overall) ** 2).sum()
    chain_vars = split.var(0, ddof=1)
    if (chain_vars == 0).any():
        return np.nan
    w = chain_vars.mean()
    var_hat = (m - 1) / m * w + b / m
    r = np.sqrt(var_hat / w)
    return 1.0 if 0.99 <= r <= 1.0 else r


class TestESS:
    def test_iid_chains_near_full(self):
        # test-ESS.R:1-10 — iid chains: ESS ~ total draws (within 5%).
        rng = np.random.default_rng(1405)
        mat = rng.normal(size=(1000, 3))
        val = ess(mat)
        assert abs(val - 3000) / 3000 < 0.05

    def test_ar1_chains_reduced(self):
        # test-ESS.R:12-22 — strongly autocorrelated chains: ESS << n.
        rng = np.random.default_rng(7)
        m, k = 2000, 3
        mat = np.zeros((m, k))
        for i in range(k):
            x = rng.normal()
            for t in range(m):
                x = 0.9 * x + rng.normal() * np.sqrt(1 - 0.81)
                mat[t, i] = x
        val = ess(mat)
        assert val < 0.5 * m * k

    def test_matches_naive_reference_algorithm(self):
        rng = np.random.default_rng(3)
        for m, k in [(50, 2), (101, 3), (400, 4)]:
            x = rng.normal(size=(m, k))
            # add autocorrelation
            for t in range(1, m):
                x[t] += 0.5 * x[t - 1]
            np.testing.assert_allclose(ess(x), naive_ess(x), rtol=1e-4)

    def test_errors(self):
        with pytest.raises(ValueError, match="at least 2"):
            ess(np.zeros((1, 3)))
        with pytest.raises(ValueError, match="at least 2"):
            ess(np.zeros((10, 1)))
        with pytest.raises(ValueError):
            ess("nope")

    def test_zero_variance_warns_nan(self):
        rng = np.random.default_rng(0)
        mat = rng.normal(size=(100, 3))
        mat[:, 1] = 2.0
        with pytest.warns(UserWarning, match="zero variance"):
            val = ess(mat)
        assert np.isnan(val)

    def test_dict_input(self):
        rng = np.random.default_rng(5)
        chains = {
            "a": rng.normal(size=(3, 500)),
            "b": rng.normal(size=(3, 500)),
        }
        vals = ess(chains)
        assert set(vals) == {"a", "b"}
        np.testing.assert_allclose(vals["a"], naive_ess(chains["a"].T), rtol=1e-4)


class TestRhat:
    def test_stationary_below_101(self):
        rng = np.random.default_rng(1405)
        mat = rng.normal(size=(1000, 3))
        assert rhat(mat) < 1.01

    def test_shifted_chain_above_2(self):
        rng = np.random.default_rng(2)
        mat = rng.normal(size=(1000, 3))
        mat[:, 2] += 10.0
        assert rhat(mat) > 2.0

    def test_snap_to_one(self):
        # R/rhat.R:63-65 — values in [0.99, 1] snap to exactly 1.00. With all
        # split-half means identical, B = 0 and r = sqrt((m-1)/m) < 1.
        rng = np.random.default_rng(8)
        base = rng.normal(size=100)
        cols = [
            np.concatenate([rng.permutation(base), rng.permutation(base)])
            for _ in range(4)
        ]
        mat = np.stack(cols, axis=1)
        assert rhat(mat) == 1.0

    def test_matches_naive(self):
        rng = np.random.default_rng(9)
        for m, k in [(51, 2), (200, 3)]:
            x = rng.normal(size=(m, k)) + np.linspace(0, 1, m)[:, None]
            np.testing.assert_allclose(rhat(x), naive_rhat(x), rtol=1e-5)

    def test_odd_iterations_dropped(self):
        rng = np.random.default_rng(10)
        x = rng.normal(size=(201, 3))
        np.testing.assert_allclose(rhat(x), naive_rhat(x), rtol=1e-5)

    def test_errors(self):
        with pytest.raises(ValueError, match="at least 2"):
            rhat(np.zeros((1, 3)))

    def test_zero_variance_warns(self):
        mat = np.ones((100, 2))
        with pytest.warns(UserWarning, match="zero variance"):
            assert np.isnan(rhat(mat))


class TestDataFrameInput:
    """Long-data.frame input mode (test-ESS.R:24-33,57-75; test-rhat.R)."""

    def _df(self, n=3000, k=3, seed=11):
        import pandas as pd

        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "chain": np.repeat(np.arange(1, k + 1), n // k),
                "param1": rng.normal(size=n),
                "param2": rng.normal(size=n),
            }
        )

    def test_ess_dataframe_iid(self):
        n = 3000
        out = ess(self._df(n))
        assert set(out) == {"param1", "param2"}
        for v in out.values():
            # Geyer-truncated ESS on iid chains fluctuates well beyond the
            # nominal 5%; bound it loosely (the reference's testthat
            # tolerance is relative and effectively looser still).
            assert 0.7 * n < v <= n + 1

    def test_rhat_dataframe_stationary(self):
        out = rhat(self._df())
        assert all(v < 1.01 for v in out.values())

    def test_missing_chain_column(self):
        import pandas as pd

        df = pd.DataFrame({"a": [1.0, 2, 3], "b": [4.0, 5, 6]})
        with pytest.raises(ValueError, match="must contain a 'chain' column"):
            ess(df)
        with pytest.raises(ValueError, match="must contain a 'chain' column"):
            rhat(df)

    def test_unequal_chain_lengths(self):
        import pandas as pd

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "chain": [1, 1, 1, 1, 1, 2, 2, 2],
                "param1": rng.normal(size=8),
            }
        )
        with pytest.raises(ValueError, match="same number of iterations"):
            ess(df)
        with pytest.raises(ValueError, match="same number of iterations"):
            rhat(df)

    def test_pmmh_output_roundtrip(self):
        from bayesssm_tpu.output import PMMHOutput

        rng = np.random.default_rng(5)
        theta = {"phi": rng.normal(size=(2, 100)), "sig": rng.normal(size=(2, 100))}
        out = PMMHOutput(theta_chain=theta, diagnostics={})
        df = out.chains_dataframe()
        assert list(df.columns) == ["phi", "sig", "chain"]
        assert len(df) == 200
        e = ess(df)
        r = rhat(df)
        assert set(e) == set(r) == {"phi", "sig"}
        # column content matches the per-chain layout
        np.testing.assert_allclose(
            df["phi"][df["chain"] == 1], theta["phi"][0]
        )
