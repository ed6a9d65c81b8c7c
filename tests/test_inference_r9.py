"""Round-9 inference family properties: each operator checked against an
INDEPENDENT third implementation (plain pandas/Python over the same
parquet — not the DuckDB oracle, which the sweep replays), statistical
first-principles cross-checks, and the cross-engine degenerate guards."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from p6_spark.plans import get_queries
from p6_spark.plans.inference_r9 import _CONF_ALPHAS

SF = "/root/testdata/sf0.001"


def _li() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/orders.parquet")


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


# ---------------------------------------------------------------------------
# ml_conformal_threshold
# ---------------------------------------------------------------------------


def _conformal_ref():
    li = _li()
    score = (
        (li["l_extendedprice"] * 100).round(0).astype("int64")
        - li["l_quantity"].astype("int64") * 100000
    ).abs()
    is_cal = (li["l_orderkey"] % 2 == 0).to_numpy()
    cal = np.sort(score[is_cal].to_numpy())
    hold = score[~is_cal].to_numpy()
    out = {}
    for a in _CONF_ALPHAS:
        k = -(-(len(cal) + 1) * (100 - a) // 100)  # ceil
        thr = int(cal[k - 1])
        cov = (int((hold <= thr).sum()) * 1_000_000) // len(hold)
        out[a] = (len(cal), int(k), thr, len(hold), cov)
    return out


def test_conformal_matches_numpy_reference(spark):
    ref = _conformal_ref()
    rows = {
        r["alpha_x100"]: r
        for r in get_queries()["ml_conformal_threshold"](spark, SF).collect()
    }
    for a, (n_cal, k, thr, n_hold, cov) in ref.items():
        r = rows[a]
        assert (r["n_cal"], r["k"], r["threshold"]) == (n_cal, k, thr)
        assert (r["n_holdout"], r["coverage_x1e6"]) == (n_hold, cov)
        assert r["target_x1e6"] == (100 - a) * 10000


def test_conformal_coverage_and_monotonicity(spark):
    """Thresholds widen as alpha shrinks, and empirical holdout coverage
    sits near the guaranteed level (the guarantee is >= 1 - alpha in
    expectation over splits; one fixed split sits within sampling
    noise — +-2.5% at this panel size)."""
    rows = sorted(
        get_queries()["ml_conformal_threshold"](spark, SF).collect(),
        key=lambda r: -r["alpha_x100"],
    )
    thrs = [r["threshold"] for r in rows]
    assert thrs == sorted(thrs)  # 90% -> 95% -> 99%: wider intervals
    for r in rows:
        assert r["coverage_x1e6"] >= r["target_x1e6"] - 25_000
        assert r["k"] <= r["n_cal"]


def test_conformal_small_calibration_raises_identically(spark, tmp_path):
    """n_cal < 99 makes k > n_cal at alpha = 1%: both engines raise the
    same loud error instead of silently emitting a NULL threshold."""
    sf_dir = str(tmp_path)
    rows = [(i, float(i % 7 + 1), 100.0 * (i % 5 + 1)) for i in range(40)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_quantity double, l_extendedprice double"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    )
    q = get_queries()["ml_conformal_threshold"]
    with pytest.raises(Exception, match="ml_conformal_threshold"):
        q(spark, sf_dir).collect()

    from p6_spark.plans.registry import QUERIES

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "lineitem.parquet", "*.parquet")
            )
        )
        with pytest.raises(duckdb.Error, match="ml_conformal_threshold"):
            con.execute(QUERIES["ml_conformal_threshold"].oracle).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# ml_ips_offpolicy
# ---------------------------------------------------------------------------


def test_ips_matches_pandas_reference(spark):
    ev = _events()
    ctx = (ev["user_id"] % 10).astype(int)
    df = pd.DataFrame(
        {
            "ctx": ctx,
            "action": ev["event_type"],
            "r": (ev["value"] >= 50).astype(int),
        }
    )
    cells = (
        df.groupby(["ctx", "action"])
        .agg(n_xa=("r", "size"), r_xa=("r", "sum"))
        .reset_index()
    )
    ctxs = cells.groupby("ctx").agg(
        n_x=("n_xa", "sum"), n_actions=("n_xa", "size")
    )
    n = int(cells["n_xa"].sum())
    n_rewarded = int(cells["r_xa"].sum())
    sum_rw = sum_w = 0
    for row in cells.itertuples():
        x = ctxs.loc[row.ctx]
        w = (int(x["n_x"]) * 1_000_000) // (int(x["n_actions"]) * int(row.n_xa))
        sum_rw += int(row.r_xa) * w
        sum_w += int(row.n_xa) * w
    got = get_queries()["ml_ips_offpolicy"](spark, SF).first()
    assert got["n"] == n and got["n_rewarded"] == n_rewarded
    assert got["logging_value_x1e6"] == (n_rewarded * 1_000_000) // n
    assert got["ips_x1e6"] == sum_rw // n
    assert got["snips_x1e6"] == (sum_rw * 1_000_000) // sum_w


def test_ips_near_uniform_logging_recovers_logging_value(spark):
    """The logged policy IS near-uniform over 5 actions on this panel,
    so evaluating the uniform target off-policy must land close to the
    on-policy mean reward — the classic IPS self-consistency check
    (exact equality would need exactly-uniform logs)."""
    got = get_queries()["ml_ips_offpolicy"](spark, SF).first()
    assert abs(got["snips_x1e6"] - got["logging_value_x1e6"]) < 60_000
    assert abs(got["ips_x1e6"] - got["logging_value_x1e6"]) < 60_000
    # and the self-normalized estimator is the variance-safe one
    assert got["snips_x1e6"] > 0


# ---------------------------------------------------------------------------
# ml_design_effect
# ---------------------------------------------------------------------------


def _deff_ref():
    o = _orders()
    y = (o["o_totalprice"] * 100).round(0).astype("int64")
    cl = o["o_custkey"]
    g = pd.DataFrame({"cl": cl, "y": y}).groupby("cl")["y"]
    n_j = g.size().astype(int)
    s_j = g.sum().astype(int)
    ssq = int((y.astype(object) ** 2).sum())
    k, n, s = len(n_j), int(n_j.sum()), int(s_j.sum())
    ssb_part = sum((int(sj) ** 2) // int(nj) for sj, nj in zip(s_j, n_j))
    sum_nj2 = int((n_j**2).sum())
    msb = (n * ssb_part - s * s) // ((k - 1) * n)
    msw = (ssq - ssb_part) // (n - k)
    n0 = ((n - sum_nj2 // n) * 1_000_000) // (k - 1)
    mbar = (n * 1_000_000) // k

    def tdiv(a, b):
        sign = -1 if (a < 0) != (b < 0) else 1
        return sign * (abs(a) // abs(b))

    icc = tdiv((msb - msw) * 10**12, msb * 1_000_000 + (n0 - 1_000_000) * msw)
    deff = 1_000_000 + tdiv((mbar - 1_000_000) * icc, 1_000_000)
    return dict(
        k=k, n=n, msb=msb, msw=msw, n0_x1e6=n0, mbar_x1e6=mbar,
        icc_x1e6=icc, deff_x1e6=deff,
    )


def test_design_effect_matches_python_reference(spark):
    ref = _deff_ref()
    got = get_queries()["ml_design_effect"](spark, SF).first()
    for key, want in ref.items():
        assert got[key] == want, key


def test_design_effect_agrees_with_float_anova():
    """The integer spec IS one-way ANOVA: recompute MSB/MSW/ICC in
    floats from first principles and demand agreement to trunc noise."""
    o = _orders()
    y = (o["o_totalprice"] * 100).round(0).astype("float64")
    df = pd.DataFrame({"cl": o["o_custkey"], "y": y})
    k = df["cl"].nunique()
    n = len(df)
    grand = y.mean()
    g = df.groupby("cl")["y"]
    ssb = float((g.size() * (g.mean() - grand) ** 2).sum())
    ssw = float(((df["y"] - g.transform("mean")) ** 2).sum())
    msb_f, msw_f = ssb / (k - 1), ssw / (n - k)
    ref = _deff_ref()
    assert abs(ref["msb"] - msb_f) / msb_f < 1e-6
    assert abs(ref["msw"] - msw_f) / msw_f < 1e-6
    n0_f = (n - float((g.size() ** 2).sum()) / n) / (k - 1)
    icc_f = (msb_f - msw_f) / (msb_f + (n0_f - 1) * msw_f)
    assert abs(ref["icc_x1e6"] / 1e6 - icc_f) < 1e-4


def test_design_effect_single_cluster_raises_identically(spark, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, 7, 100.0), (2, 7, 200.0), (3, 7, 300.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "orders.parquet")
    )
    q = get_queries()["ml_design_effect"]
    with pytest.raises(Exception, match="ml_design_effect"):
        q(spark, sf_dir).collect()

    from p6_spark.plans.registry import QUERIES

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "orders.parquet", "*.parquet")
            )
        )
        with pytest.raises(duckdb.Error, match="ml_design_effect"):
            con.execute(QUERIES["ml_design_effect"].oracle).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# ml_isotonic_calibration
# ---------------------------------------------------------------------------


def _bins_ref():
    li = _li()
    conf = (li["l_quantity"].astype("int64") * 20000).clip(0, 1_000_000)
    y = (li["l_extendedprice"] >= 30000).astype(int)
    b = (conf // 100_000).clip(upper=9)
    g = pd.DataFrame({"b": b, "y": y, "conf": conf}).groupby("b")
    return (
        g.size().astype(int),
        g["y"].sum().astype(int),
        g["conf"].sum().astype(int),
    )


def test_isotonic_matches_minimax_reference(spark):
    n, pos, _ = _bins_ref()
    bins = sorted(n.index)
    cn = n.cumsum()
    cp = pos.cumsum()

    def interval_avg(j, k):
        num = int(cp[k]) - (int(cp[j]) - int(pos[j]))
        den = int(cn[k]) - (int(cn[j]) - int(n[j]))
        return (num * 1_000_000) // den

    iso_ref = {}
    for i in bins:
        iso_ref[i] = max(
            min(interval_avg(j, k) for k in bins if k >= i)
            for j in bins
            if j <= i
        )
    rows = get_queries()["ml_isotonic_calibration"](spark, SF).collect()
    got = {r["bin"]: r for r in rows}
    for i in bins:
        assert got[i]["n"] == int(n[i])
        assert got[i]["iso_x1e6"] == iso_ref[i], i


def test_isotonic_is_monotone_and_tracks_pav(spark):
    """The fit is nondecreasing by construction AND within trunc noise
    of a real pool-adjacent-violators run on the same bins."""
    rows = sorted(
        get_queries()["ml_isotonic_calibration"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_x1e6"] for r in rows]
    assert iso == sorted(iso)
    # classic PAV with float pooling
    n, pos, _ = _bins_ref()
    blocks = [[float(pos[b]), float(n[b])] for b in sorted(n.index)]
    out: list[list[float]] = []
    for blk in blocks:
        out.append(blk)
        while len(out) > 1 and out[-2][0] / out[-2][1] >= out[-1][0] / out[-1][1]:
            p2, n2 = out.pop()
            out[-1][0] += p2
            out[-1][1] += n2
    # expand back to bins by walking block sizes in bin units
    pav_bins = []
    sizes = [int(m) for _, m in out]
    vals = [p / m for p, m in out]
    bin_sizes = [int(n[b]) for b in sorted(n.index)]
    bi = 0
    for v, m in zip(vals, sizes):
        acc = 0
        while acc < m and bi < len(bin_sizes):
            pav_bins.append(v)
            acc += bin_sizes[bi]
            bi += 1
    assert len(pav_bins) == len(iso)
    for got_v, pav_v in zip(iso, pav_bins):
        assert abs(got_v / 1e6 - pav_v) < 2e-6


def test_isotonic_shares_binning_with_calibration_bins(spark):
    """Same bins, same n, same acc as ml_calibration_bins — one binning
    definition, the two reports cannot drift."""
    iso = {
        r["bin"]: r
        for r in get_queries()["ml_isotonic_calibration"](spark, SF).collect()
    }
    cal = {
        r["bin"]: r
        for r in get_queries()["ml_calibration_bins"](spark, SF).collect()
    }
    assert set(iso) == set(cal)
    for b in iso:
        assert iso[b]["n"] == cal[b]["n"]
        assert iso[b]["acc_x1e6"] == cal[b]["acc_x1e6"]
        assert iso[b]["mean_conf_x1e6"] == cal[b]["mean_conf_x1e6"]


# ---------------------------------------------------------------------------
# ml_mde_power
# ---------------------------------------------------------------------------


def test_mde_z_literals_are_the_inverse_normal_table():
    """The embedded z quantiles ARE round(Phi^-1 * 1e6) — recomputed
    via statistics.NormalDist so a typo cannot survive."""
    from statistics import NormalDist

    from p6_spark.plans.inference_r9 import (
        _POWERS,
        _Z_ALPHA_X1E6,
        _Z_ONESIDED_X1E6,
    )

    nd = NormalDist()
    assert _Z_ALPHA_X1E6 == round(nd.inv_cdf(0.975) * 1e6)
    assert _Z_ONESIDED_X1E6 == round(nd.inv_cdf(0.95) * 1e6)
    assert dict(_POWERS) == {
        80: round(nd.inv_cdf(0.80) * 1e6),
        90: round(nd.inv_cdf(0.90) * 1e6),
    }


def test_mde_matches_python_reference(spark):
    from p6_spark.plans.inference_r9 import _POWERS, _Z_ALPHA_X1E6

    o = _orders()
    y = (o["o_totalprice"] * 100).round(0).astype("int64")
    n, s = len(y), int(y.sum())
    ssq = int((y.astype(object) ** 2).sum())
    var_c2 = (n * ssq - s * s) // (n * (n - 1))
    n_arm, mean_cents = n // 2, s // n
    deff = _deff_ref()["deff_x1e6"]
    rows = {
        r["power_x100"]: r
        for r in get_queries()["ml_mde_power"](spark, SF).collect()
    }
    for p, z in _POWERS:
        arg_srs = (2 * var_c2) // n_arm
        arg_deff = (2 * var_c2 * deff) // (n_arm * 1_000_000)
        mde = round(((_Z_ALPHA_X1E6 + z) / 1e6) * arg_srs**0.5)
        mde_d = round(((_Z_ALPHA_X1E6 + z) / 1e6) * arg_deff**0.5)
        r = rows[p]
        assert (r["n_arm"], r["mean_cents"], r["var_c2"]) == (
            n_arm,
            mean_cents,
            var_c2,
        )
        assert r["mde_cents"] == mde
        assert r["mde_deff_cents"] == mde_d
        assert r["mde_rel_x1e6"] == (mde * 1_000_000) // mean_cents
        # cluster randomization can only WIDEN the MDE (deff >= 1 here)
        assert r["mde_deff_cents"] >= r["mde_cents"]
    # more power demands a bigger detectable effect
    assert rows[90]["mde_cents"] > rows[80]["mde_cents"]


def test_mde_agrees_with_float_power_formula():
    """Sanity vs the textbook formula in pure floats: MDE =
    (z_a + z_b) * sqrt(2 sigma^2 / n) within trunc noise."""
    o = _orders()
    y = (o["o_totalprice"] * 100).round(0).astype("float64")
    n = len(y)
    sigma2 = float(y.var(ddof=1))
    mde80 = (1.959964 + 0.841621) * (2 * sigma2 / (n // 2)) ** 0.5
    ref = _deff_ref()  # noqa: F841 — ensures panel consistency
    s = int((o["o_totalprice"] * 100).round(0).astype("int64").sum())
    ssq = int(
        ((o["o_totalprice"] * 100).round(0).astype("int64").astype(object) ** 2).sum()
    )
    var_c2 = (n * ssq - s * s) // (n * (n - 1))
    got = round(((1_959_964 + 841_621) / 1e6) * ((2 * var_c2) // (n // 2)) ** 0.5)
    assert abs(got - mde80) / mde80 < 1e-3


# ---------------------------------------------------------------------------
# ml_tost_equivalence
# ---------------------------------------------------------------------------


def test_tost_matches_python_reference(spark):
    ev = _events()
    sub = ev[ev["event_type"].isin(["click", "purchase"])]
    v = (sub["value"] * 1_000_000).round(0).astype("int64")
    is_a = (sub["event_type"] == "click").to_numpy()
    out = {}
    for flag, tag in ((True, "a"), (False, "b")):
        vv = v[is_a == flag]
        n, s = len(vv), int(vv.sum())
        ssq = int((vv.astype(object) ** 2).sum())
        out[tag] = (n, s, ssq)
    (n_a, s_a, ssq_a), (n_b, s_b, ssq_b) = out["a"], out["b"]
    mean_a, mean_b = s_a // n_a, s_b // n_b
    var_a = (n_a * ssq_a - s_a * s_a) // (n_a * (n_a - 1))
    var_b = (n_b * ssq_b - s_b * s_b) // (n_b * (n_b - 1))
    delta = ((s_a + s_b) // (n_a + n_b)) * 5 // 100
    se2 = var_a // n_a + var_b // n_b
    z_lo = round((mean_a - mean_b + delta) * 1e6 / se2**0.5)
    z_hi = round((mean_a - mean_b - delta) * 1e6 / se2**0.5)
    r = get_queries()["ml_tost_equivalence"](spark, SF).first()
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    assert (r["mean_a_x1e6"], r["mean_b_x1e6"]) == (mean_a, mean_b)
    assert (r["delta_x1e6"], r["se2"]) == (delta, se2)
    assert (r["z_lower_x1e6"], r["z_upper_x1e6"]) == (z_lo, z_hi)
    want = (
        "equivalent"
        if z_lo >= 1_644_854 and z_hi <= -1_644_854
        else "not_equivalent"
    )
    assert r["verdict"] == want


def test_tost_single_sample_arm_raises_identically(spark, tmp_path):
    sf_dir = str(tmp_path)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": [1, 2, 3],
            "event_type": ["click", "purchase", "purchase"],
            "value": [10.0, 20.0, 30.0],
            "props": ["{}"] * 3,
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    with pytest.raises(Exception, match="ml_tost_equivalence"):
        get_queries()["ml_tost_equivalence"](spark, sf_dir).collect()

    from p6_spark.plans.registry import QUERIES

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
                os.path.join(sf_dir, "events.parquet", "*.parquet")
            )
        )
        with pytest.raises(duckdb.Error, match="ml_tost_equivalence"):
            con.execute(QUERIES["ml_tost_equivalence"].oracle).fetchall()
    finally:
        con.close()
