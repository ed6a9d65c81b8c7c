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
