"""Independent differentials for the statistical-tests family.

The DuckDB oracle twins (tests/test_oracle_parity.py) prove cross-engine
parity; these tests prove the STATISTICS themselves — each query result
is re-derived with a brute-force numpy/pure-Python computation over the
collected sf0.001 approved frame (~6k rows), the reference style scipy
would use, with no shared code path."""

from __future__ import annotations

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def approved_rows(spark, sf_dir):
    from banking_streaming_etl_spark.plans.dashboard import _approved

    rows = (
        _approved(spark, sf_dir)
        .select(
            "id_transacao",
            "valor_transacao",
            "score_medio",
            "transacao_aprovada",
            "saldo_aprovado",
            "limite_aprovado",
            "modalidade_pagamento",
        )
        .collect()
    )
    assert len(rows) >= 1000
    return rows


def _brute_ks(values_a, values_b):
    """Two-sample KS by literal ECDF evaluation at every distinct value."""
    xs = sorted(set(values_a) | set(values_b))
    a = sorted(values_a)
    b = sorted(values_b)
    import bisect

    best = 0.0
    for x in xs:
        fa = bisect.bisect_right(a, x) / len(a)
        fb = bisect.bisect_right(b, x) / len(b)
        best = max(best, abs(fa - fb))
    return best


def test_ks_matches_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats

    out = stats.ks_test_value_by_approval(spark, sf_dir).collect()[0]
    va = [r.valor_transacao for r in approved_rows if r.transacao_aprovada]
    vd = [r.valor_transacao for r in approved_rows if not r.transacao_aprovada]
    assert out.n_aprovadas == len(va) and out.n_negadas == len(vd)
    assert out.ks_stat == pytest.approx(_brute_ks(va, vd), abs=1e-12)
    # the integer numerator reproduces the statistic exactly
    assert out.ks_stat == out.ks_num / (len(va) * len(vd))


def _avg_ranks(values):
    """scipy.stats.rankdata(method='average') reimplemented."""
    order = np.argsort(np.asarray(values), kind="stable")
    ranks = np.empty(len(values), dtype=float)
    sv = np.asarray(values)[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j + 2) / 2.0  # 1-based average rank
        i = j + 1
    return ranks


def test_spearman_matches_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats

    out = stats.spearman_value_score(spark, sf_dir).collect()[0]
    rx = _avg_ranks([r.valor_transacao for r in approved_rows])
    ry = _avg_ranks([r.score_medio for r in approved_rows])
    rho = np.corrcoef(rx, ry)[0, 1]
    assert out.n_linhas == len(approved_rows)
    assert out.rho_spearman == pytest.approx(rho, abs=1e-9)


def test_chi2_cells_match_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats

    cells = {}
    for r in approved_rows:
        k = (r.modalidade_pagamento, r.transacao_aprovada)
        cells[k] = cells.get(k, 0) + 1
    n = len(approved_rows)
    row_m = {}
    col_m = {}
    for (mod, ap), c in cells.items():
        row_m[mod] = row_m.get(mod, 0) + c
        col_m[ap] = col_m.get(ap, 0) + c
    out = stats.chi2_cells_modality_approval(spark, sf_dir).collect()
    assert len(out) == len(cells)
    for r in out:
        k = (r.modalidade_pagamento, r.transacao_aprovada)
        e = row_m[k[0]] * col_m[k[1]] / n
        assert r.n_celula == cells[k]
        assert r.esperado == pytest.approx(e, rel=1e-12)
        assert r.qui2_contrib == pytest.approx(
            (cells[k] - e) ** 2 / e, rel=1e-9
        )
        assert r.residuo_pearson == pytest.approx(
            (cells[k] - e) / math.sqrt(e), rel=1e-9
        )


def test_kappa_matches_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats

    s = [bool(r.saldo_aprovado) for r in approved_rows]
    l = [bool(r.limite_aprovado) for r in approved_rows]
    n = len(s)
    po = sum(a == b for a, b in zip(s, l)) / n
    pa1, pb1 = sum(s) / n, sum(l) / n
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    out = stats.cohens_kappa_flags(spark, sf_dir).collect()[0]
    assert out.n_linhas == n
    assert out.kappa == pytest.approx((po - pe) / (1 - pe), rel=1e-9)


def test_js_divergence_properties(spark, sf_dir, approved_rows):
    """JS total is symmetric-bounded: 0 <= JS <= ln 2, and the per-bin
    counts reproduce the collected histogram."""
    from banking_streaming_etl_spark.plans import stats

    out = stats.js_divergence_value_by_approval(spark, sf_dir).collect()
    na = sum(r.n_aprovadas for r in out)
    nd = sum(r.n_negadas for r in out)
    assert na == sum(1 for r in approved_rows if r.transacao_aprovada)
    assert nd == sum(1 for r in approved_rows if not r.transacao_aprovada)
    total = sum(r.js_contrib for r in out)
    assert -1e-9 <= total <= math.log(2) + 1e-9
    # brute-force the contributions
    bins_a, bins_d = {}, {}
    for r in approved_rows:
        b = math.floor(r.valor_transacao / stats.JS_BIN_WIDTH)
        (bins_a if r.transacao_aprovada else bins_d)[b] = (
            (bins_a if r.transacao_aprovada else bins_d).get(b, 0) + 1
        )
    for r in out:
        p = bins_a.get(r.balde, 0) / na
        q = bins_d.get(r.balde, 0) / nd
        m = (p + q) / 2
        expect = 0.5 * (p * math.log(p / m) if p > 0 else 0.0) + 0.5 * (
            q * math.log(q / m) if q > 0 else 0.0
        )
        assert r.js_contrib == pytest.approx(expect, abs=5e-7)


def test_cv_folds_partition_and_loo(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats

    out = stats.cv_fold_metrics(spark, sf_dir).collect()
    assert sorted(r.fold for r in out) == list(range(stats.CV_FOLDS))
    assert sum(r.n_linhas for r in out) == len(approved_rows)
    # LOO mean complements the fold mean against the global totals
    tot = sum(r.n_linhas * r.valor_medio for r in out)
    n = sum(r.n_linhas for r in out)
    for r in out:
        expect = (tot - r.n_linhas * r.valor_medio) / (n - r.n_linhas)
        assert r.valor_medio_loo == pytest.approx(expect, rel=1e-9)


def test_loo_target_encode_is_leak_free(spark, sf_dir, approved_rows):
    """Each row's encoding equals the group's approval rate EXCLUDING
    that row — verified against collected group stats; and the smoothed
    variant sits between the LOO rate and the global prior."""
    from banking_streaming_etl_spark.plans import stats

    grp_n, grp_ap, n_tot, ap_tot = {}, {}, 0, 0
    for r in approved_rows:
        grp_n[r.modalidade_pagamento] = grp_n.get(r.modalidade_pagamento, 0) + 1
        grp_ap[r.modalidade_pagamento] = grp_ap.get(
            r.modalidade_pagamento, 0
        ) + int(r.transacao_aprovada)
        n_tot += 1
        ap_tot += int(r.transacao_aprovada)
    prior = ap_tot / n_tot
    out = stats.loo_target_encode_modality(spark, sf_dir).collect()
    assert len(out) == len(approved_rows)
    for r in out[:500]:
        g = r.modalidade_pagamento
        loo = (grp_ap[g] - r.aprovada) / (grp_n[g] - 1)
        assert r.codif_loo == pytest.approx(loo, rel=1e-12)
        lo, hi = sorted((loo, prior))
        assert lo - 1e-12 <= r.codif_loo_suave <= hi + 1e-12


def test_group_holdout_no_source_straddles_splits(spark, sf_dir):
    """The leakage guarantee itself: every source maps to exactly one
    split, and the split sizes cover the corpus."""
    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.functions import portable
    from banking_streaming_etl_spark.plans import curation
    from pyspark.sql import functions as F

    d = datamodel.load_table(spark, sf_dir, "documents")
    per_source = (
        d.groupBy("source")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "bucket",
            portable.md5_48(F.col("source")) % curation.HOLDOUT_BUCKETS,
        )
        .collect()
    )
    out = {
        r.split: r
        for r in curation.group_holdout_split_docs(spark, sf_dir).collect()
    }
    expect = {"train": 0, "val": 0, "test": 0}
    fontes = {"train": 0, "val": 0, "test": 0}
    for r in per_source:
        s = (
            "train"
            if r.bucket < curation.HOLDOUT_TRAIN_LT
            else ("val" if r.bucket < curation.HOLDOUT_VAL_LT else "test")
        )
        expect[s] += r.n
        fontes[s] += 1
    for s, row in out.items():
        assert row.n_docs == expect[s]
        assert row.n_fontes == fontes[s]
    assert sum(expect.values()) == d.count()


def test_isotonic_matches_sequential_pav(spark, sf_dir):
    """The declarative minimax fit equals the classic sequential PAV
    (weights = bin sizes), and is non-decreasing across bins."""
    from banking_streaming_etl_spark.plans import stats

    out = sorted(
        stats.isotonic_calibration_bins(spark, sf_dir).collect(),
        key=lambda r: r.faixa,
    )
    assert [r.faixa for r in out] == list(range(1, stats.ISO_BINS + 1))
    # brute-force PAV per BIN (weight = n): expand one value per bin
    blocks = [[r.n, r.n_negadas / r.n] for r in out]
    fitted = []
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] > blocks[i + 1][1] + 1e-15:
            w = blocks[i][0] + blocks[i + 1][0]
            m = (
                blocks[i][0] * blocks[i][1]
                + blocks[i + 1][0] * blocks[i + 1][1]
            ) / w
            blocks[i] = [w, m]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # map pooled blocks back onto bins
    expect = []
    bi = 0
    for w, m in blocks:
        consumed = 0
        while consumed < w:
            consumed += out[bi].n
            expect.append(m)
            bi += 1
    assert len(expect) == len(out)
    for r, e in zip(out, expect):
        assert r.taxa_isotonica == pytest.approx(e, abs=1e-12)
    # monotone non-decreasing
    for a, b in zip(out, out[1:]):
        assert a.taxa_isotonica <= b.taxa_isotonica + 1e-15


def _rank_map(values):
    """value -> average 1-based rank over the pooled list (tie-average)."""
    s = sorted(values)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_mannwhitney_matches_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats

    out = stats.mannwhitney_value_by_approval(spark, sf_dir).collect()[0]
    va = [r.valor_transacao for r in approved_rows if r.transacao_aprovada]
    vd = [r.valor_transacao for r in approved_rows if not r.transacao_aprovada]
    pooled = va + vd
    ranks = _rank_map(pooled)
    n1, n2 = len(va), len(vd)
    r_ap = sum(ranks[v] for v in va)
    u_ap = r_ap - n1 * (n1 + 1) / 2.0
    assert out.n_aprovadas == n1 and out.n_negadas == n2
    assert out.u_aprovadas == pytest.approx(u_ap, abs=1e-6)
    assert out.u_negadas == pytest.approx(n1 * n2 - u_ap, rel=1e-12)
    assert out.cles_aprovadas == pytest.approx(u_ap / (n1 * n2), rel=1e-12)
    # tie-corrected normal approximation
    from collections import Counter

    tt = sum(t**3 - t for t in Counter(pooled).values())
    n = n1 + n2
    mu = n1 * n2 / 2.0
    sig2 = (n1 * n2 / 12.0) * ((n + 1) - tt / (n * (n - 1)))
    assert out.z_u == pytest.approx((u_ap - mu) / math.sqrt(sig2), rel=1e-10)
    # U identity: U_ap + U_den = n1*n2
    assert out.u_aprovadas + out.u_negadas == pytest.approx(n1 * n2)


def test_kruskal_matches_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats
    from collections import Counter, defaultdict

    rows = sorted(
        stats.kruskal_value_by_modality(spark, sf_dir).collect(),
        key=lambda r: r.modalidade_pagamento,
    )
    pooled = [r.valor_transacao for r in approved_rows]
    ranks = _rank_map(pooled)
    groups = defaultdict(list)
    for r in approved_rows:
        groups[r.modalidade_pagamento].append(r.valor_transacao)
    n = len(pooled)
    s = 0.0
    for g in sorted(groups):
        rg = sum(ranks[v] for v in groups[g])
        s += rg * rg / len(groups[g])
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    tt = sum(t**3 - t for t in Counter(pooled).values())
    h_corr = h / (1.0 - tt / (n**3 - n))
    assert [r.modalidade_pagamento for r in rows] == sorted(groups)
    for r in rows:
        rg = sum(ranks[v] for v in groups[r.modalidade_pagamento])
        assert r.n == len(groups[r.modalidade_pagamento])
        assert r.soma_postos == pytest.approx(rg, abs=1e-6)
        assert r.posto_medio == pytest.approx(rg / r.n, rel=1e-12)
        assert r.n_total == n
        assert r.h_stat == pytest.approx(h, rel=1e-9)
        assert r.h_corrigido == pytest.approx(h_corr, rel=1e-9)


def test_anova_matches_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats
    from collections import defaultdict

    rows = sorted(
        stats.anova_value_by_modality(spark, sf_dir).collect(),
        key=lambda r: r.modalidade_pagamento,
    )
    groups = defaultdict(list)
    for r in approved_rows:
        groups[r.modalidade_pagamento].append(round(r.valor_transacao, 6))
    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    gmean = sum(allv) / n
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - gmean) ** 2 for vs in groups.values()
    )
    ssw = sum(
        sum((v - sum(vs) / len(vs)) ** 2 for v in vs)
        for vs in groups.values()
    )
    sst = ssb + ssw
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert [r.modalidade_pagamento for r in rows] == sorted(groups)
    for r in rows:
        vs = groups[r.modalidade_pagamento]
        assert r.n == len(vs)
        assert r.media == pytest.approx(sum(vs) / len(vs), rel=1e-9)
        assert r.ssb == pytest.approx(ssb, rel=1e-6)
        assert r.sst == pytest.approx(sst, rel=1e-6)
        assert r.f_stat == pytest.approx(f, rel=1e-6)
        assert r.eta_sq == pytest.approx(ssb / sst, rel=1e-6)


def test_stratified_ate_matches_bruteforce(spark, sf_dir, approved_rows):
    """Textbook re-derivation: group rows into (modality, value band)
    strata, compute standardization and Horvitz-Thompson IPW estimates
    with literal per-unit weights, trimming non-positivity strata."""
    from collections import defaultdict

    from banking_streaming_etl_spark.plans import stats

    out = stats.stratified_ate_balance_gate(spark, sf_dir).collect()

    def band(v):
        e = stats.ATE_VALUE_EDGES
        return ("baixo" if v < e[0] else "medio" if v < e[1]
                else "alto" if v < e[2] else "muito_alto")

    strata = defaultdict(list)
    for r in approved_rows:
        # score gate: score_medio-based flag is not collected; re-derive
        # from the collected columns via the approval identity
        # transacao_aprovada = score & saldo & limite is NOT invertible,
        # so pull the flag directly from the frame instead
        pass
    from banking_streaming_etl_spark.plans.dashboard import _approved

    rows = (
        _approved(spark, sf_dir)
        .select("modalidade_pagamento", "valor_transacao",
                "saldo_aprovado", "score_aprovado")
        .collect()
    )
    for r in rows:
        strata[(r.modalidade_pagamento, band(r.valor_transacao))].append(
            (int(r.saldo_aprovado), int(r.score_aprovado))
        )
    std_num = ipw_num = 0.0
    n_ok = 0
    n_bad = 0
    for key in sorted(strata):
        units = strata[key]
        n = len(units)
        n1 = sum(t for t, _ in units)
        if n1 == 0 or n1 == n:
            n_bad += 1
            continue
        n_ok += n
        y1 = sum(y for t, y in units if t) / n1
        y0 = sum(y for t, y in units if not t) / (n - n1)
        std_num += n * (y1 - y0)
        e = n1 / n
        ipw_num += (
            sum(y for t, y in units if t) / e
            - sum(y for t, y in units if not t) / (1 - e)
        )
    ate_std = std_num / n_ok
    ate_ipw = ipw_num / n_ok
    seen = set()
    for r in out:
        assert r.ate_padronizacao == pytest.approx(ate_std, rel=1e-9)
        assert r.ate_ipw == pytest.approx(ate_ipw, rel=1e-9)
        assert r.estratos_sem_posicao == n_bad
        key = (r.modalidade_pagamento, r.faixa_valor)
        assert key in strata
        seen.add(key)
        units = strata[key]
        assert r.n == len(units) and r.n1 == sum(t for t, _ in units)
    assert seen == set(strata)


def test_two_proportion_matches_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats

    out = {r.grupo: r for r in
           stats.two_proportion_approval_test(spark, sf_dir).collect()}
    hi = [r for r in approved_rows
          if r.valor_transacao > stats.ATE_VALUE_EDGES[1]]
    lo = [r for r in approved_rows
          if not r.valor_transacao > stats.ATE_VALUE_EDGES[1]]
    a1 = sum(r.transacao_aprovada for r in hi)
    a2 = sum(r.transacao_aprovada for r in lo)
    n1, n2 = len(hi), len(lo)
    pp = (a1 + a2) / (n1 + n2)
    z = (a1 / n1 - a2 / n2) / math.sqrt(
        pp * (1 - pp) * (1 / n1 + 1 / n2)
    )
    zq = stats.WILSON_Z
    for grupo, n, a in (("alto_valor", n1, a1), ("baixo_valor", n2, a2)):
        r = out[grupo]
        assert (r.n, r.aprovadas) == (n, a)
        p = a / n
        assert r.taxa == pytest.approx(p, rel=1e-12)
        denom = 1 + zq * zq / n
        center = p + zq * zq / (2 * n)
        half = zq * math.sqrt(p * (1 - p) / n + zq * zq / (4 * n * n))
        assert r.wilson_inf == pytest.approx((center - half) / denom, rel=1e-10)
        assert r.wilson_sup == pytest.approx((center + half) / denom, rel=1e-10)
        assert r.z_duas_proporcoes == pytest.approx(z, rel=1e-10)
        assert r.wilson_inf <= p <= r.wilson_sup


def test_ucb1_matches_bruteforce(spark, sf_dir, approved_rows):
    from banking_streaming_etl_spark.plans import stats

    out = {r.modalidade_pagamento: r
           for r in stats.ucb1_modality_ranking(spark, sf_dir).collect()}
    from collections import defaultdict

    arms = defaultdict(lambda: [0, 0])
    for r in approved_rows:
        a = arms[r.modalidade_pagamento]
        a[0] += 1
        a[1] += int(r.transacao_aprovada)
    n_tot = sum(a[0] for a in arms.values())
    ln6 = round(math.log(n_tot), 6)
    for m, (n, s) in arms.items():
        r = out[m]
        assert (r.n_puxadas, r.recompensas) == (n, s)
        assert r.recompensa_media == pytest.approx(s / n, rel=1e-12)
        assert r.bonus_exploracao == pytest.approx(
            math.sqrt(2 * ln6 / n), rel=1e-12
        )
        assert r.ucb_score == pytest.approx(
            s / n + math.sqrt(2 * ln6 / n), rel=1e-12
        )
    # a less-pulled arm gets a strictly larger bonus
    rows = sorted(out.values(), key=lambda r: r.n_puxadas)
    for a, b in zip(rows, rows[1:]):
        if a.n_puxadas < b.n_puxadas:
            assert a.bonus_exploracao > b.bonus_exploracao


def test_class_rebalance_matches_bruteforce(spark, sf_dir, approved_rows):
    """The kept set is exactly the first-m-per-class in portable-hash
    order, and both classes end at m = min class size."""
    from collections import Counter

    from banking_streaming_etl_spark.functions import portable
    from banking_streaming_etl_spark.plans import stats

    out = stats.class_rebalance_downsample(spark, sf_dir).collect()
    by_class: dict[bool, list] = {}
    for r in approved_rows:
        h = ((r.id_transacao % portable.M31) * portable.LCG_A
             + portable.LCG_B) % portable.M31
        by_class.setdefault(r.transacao_aprovada, []).append(
            (h, r.id_transacao, r.modalidade_pagamento)
        )
    m = min(len(v) for v in by_class.values())
    expect: Counter = Counter()
    for cls, rows in by_class.items():
        rows.sort()
        for h, i, mod in rows[:m]:
            expect[(cls, mod)] += 1
    got = Counter()
    for r in out:
        assert r.n_antes_classe == len(by_class[r.classe])
        assert r.n_depois_classe == m
        got[(r.classe, r.modalidade_pagamento)] = r.n_mantidas
    assert got == expect
    per_class: Counter = Counter()
    for (cls, _), n in got.items():
        per_class[cls] += n
    assert all(v == m for v in per_class.values())


def test_cramers_v_matches_bruteforce(spark, sf_dir, approved_rows):
    from collections import Counter

    from banking_streaming_etl_spark.plans import stats

    r = stats.cramers_v_modality_approval(spark, sf_dir).collect()[0]
    cells = Counter(
        (x.modalidade_pagamento, x.transacao_aprovada) for x in approved_rows
    )
    rows = Counter()
    cols = Counter()
    for (m, a), n in cells.items():
        rows[m] += n
        cols[a] += n
    n_tot = sum(cells.values())
    chi2 = sum(
        (n - rows[m] * cols[a] / n_tot) ** 2 / (rows[m] * cols[a] / n_tot)
        for (m, a), n in cells.items()
    )
    rr, cc = len(rows), len(cols)
    v = math.sqrt((chi2 / n_tot) / min(rr - 1, cc - 1))
    assert (r.n_total, r.r, r.c) == (n_tot, rr, cc)
    assert r.qui2 == pytest.approx(chi2, rel=1e-9)
    assert r.v_cramer == pytest.approx(v, rel=1e-9)
    phi2c = max(0.0, chi2 / n_tot - (rr - 1) * (cc - 1) / (n_tot - 1))
    rc = rr - (rr - 1) ** 2 / (n_tot - 1)
    cc2 = cc - (cc - 1) ** 2 / (n_tot - 1)
    assert r.v_corrigido == pytest.approx(
        math.sqrt(phi2c / min(rc - 1, cc2 - 1)), rel=1e-9
    )
    assert 0.0 <= r.v_corrigido <= r.v_cramer + 1e-12 <= 1.0 + 1e-12


def test_brown_forsythe_matches_bruteforce(spark, sf_dir, approved_rows):
    """scipy.stats.levene(center='median') re-derived literally, with
    the query's documented 6-rounding of deviations."""
    from collections import defaultdict

    from banking_streaming_etl_spark.plans import stats

    out = sorted(
        stats.brown_forsythe_value_by_modality(spark, sf_dir).collect(),
        key=lambda r: r.modalidade_pagamento,
    )
    groups = defaultdict(list)
    for r in approved_rows:
        groups[r.modalidade_pagamento].append(r.valor_transacao)
    meds = {}
    for g, vs in groups.items():
        s = sorted(vs)
        n = len(s)
        lo, hi = (n + 1) // 2 - 1, (n + 2) // 2 - 1
        meds[g] = (s[lo] + s[hi]) / 2
    zs = {
        g: [round(abs(v - meds[g]), 6) for v in vs]
        for g, vs in groups.items()
    }
    allz = [z for v in zs.values() for z in v]
    n, k = len(allz), len(zs)
    gmean = sum(allz) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gmean) ** 2 for v in zs.values())
    ssw = sum(
        sum((z - sum(v) / len(v)) ** 2 for z in v) for v in zs.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert [r.modalidade_pagamento for r in out] == sorted(groups)
    for r in out:
        assert r.n == len(groups[r.modalidade_pagamento])
        assert r.mediana == pytest.approx(
            meds[r.modalidade_pagamento], rel=1e-12
        )
        v = zs[r.modalidade_pagamento]
        assert r.desvio_abs_medio == pytest.approx(
            sum(v) / len(v), rel=1e-6
        )
        assert r.f_brown_forsythe == pytest.approx(f, rel=1e-5)


def test_cusum_matches_sequential_recursion(spark, sf_dir, approved_rows):
    """The closed form S_t - min S_u equals the textbook recursion
    g_t = max(0, g_{t-1} + x_t - k) applied to hourly count excesses."""
    from collections import defaultdict

    from banking_streaming_etl_spark.plans import stats

    rows = sorted(
        stats.cusum_hourly_drift(spark, sf_dir).collect(),
        key=lambda r: r.hora,
    )
    from banking_streaming_etl_spark.plans.dashboard import _approved

    ts_rows = (
        _approved(spark, sf_dir)
        .select("data_horario", "transacao_aprovada")
        .collect()
    )
    hours = defaultdict(lambda: [0, 0])
    for r in ts_rows:
        h = r.data_horario.replace(minute=0, second=0, microsecond=0)
        hours[h][0] += 1
        hours[h][1] += int(r.transacao_aprovada)
    n_tot = sum(v[0] for v in hours.values())
    a_tot = sum(v[1] for v in hours.values())
    rate = a_tot / n_tot
    slack = stats.CUSUM_SLACK_PCT / 100.0
    gp = gn = 0.0
    assert [r.hora.replace(tzinfo=None) for r in rows] == sorted(hours)
    for r, h in zip(rows, sorted(hours)):
        n, a = hours[h]
        assert (r.n, r.aprovadas) == (n, a)
        gp = max(0.0, gp + (a - (rate + slack) * n))
        gn = max(0.0, gn + ((rate - slack) * n - a))
        assert r.cusum_pos == pytest.approx(gp, abs=1e-6)
        assert r.cusum_neg == pytest.approx(gn, abs=1e-6)
        assert r.alarme_alta == (r.cusum_pos > stats.CUSUM_H_COUNTS)
        assert r.alarme_baixa == (r.cusum_neg > stats.CUSUM_H_COUNTS)


def test_cochran_armitage_matches_bruteforce(spark, sf_dir, approved_rows):
    """statsmodels' Cochran-Armitage recipe re-derived literally from
    the band counts (T / sqrt(p(1-p)(S2 - S1^2/N)))."""
    from collections import defaultdict

    from banking_streaming_etl_spark.plans import stats

    rows = stats.cochran_armitage_trend(spark, sf_dir).collect()
    edges = stats.ATE_VALUE_EDGES
    bands = defaultdict(lambda: [0, 0])
    for r in approved_rows:
        v = r.valor_transacao
        w = 0 if v < edges[0] else 1 if v < edges[1] else 2 if v < edges[2] else 3
        bands[w][0] += 1
        bands[w][1] += int(r.transacao_aprovada)
    n_tot = sum(v[0] for v in bands.values())
    a_tot = sum(v[1] for v in bands.values())
    p = a_tot / n_tot
    t_stat = sum(a - n * p for w, (n, a) in bands.items() for a, n in [(w * a, w * n)])
    s1 = sum(w * n for w, (n, _) in bands.items())
    s2 = sum(w * w * n for w, (n, _) in bands.items())
    var = p * (1 - p) * (s2 - s1 * s1 / n_tot)
    z = t_stat / math.sqrt(var)
    for r in rows:
        n, a = bands[r.peso]
        assert (r.n, r.aprovadas) == (n, a)
        assert r.taxa == pytest.approx(a / n, rel=1e-12)
        assert r.z_tendencia == pytest.approx(z, rel=1e-9)
    assert len(rows) == len(bands)


def test_ols_hourly_trend_matches_numpy(spark, sf_dir):
    """numpy.polyfit / corrcoef re-derivation of the per-modality hourly
    regression (same hour bucketing, same centered x)."""
    from collections import defaultdict

    from banking_streaming_etl_spark.plans import stats
    from banking_streaming_etl_spark.plans.dashboard import _approved

    out = {
        r.modalidade_pagamento: r
        for r in stats.ols_hourly_trend_by_modality(spark, sf_dir).collect()
    }
    rows = (
        _approved(spark, sf_dir)
        .select("modalidade_pagamento", "data_horario", "transacao_aprovada")
        .collect()
    )
    series = defaultdict(lambda: defaultdict(int))
    for r in rows:
        h = r.data_horario.replace(minute=0, second=0, microsecond=0)
        series[r.modalidade_pagamento][h] += int(r.transacao_aprovada)
    h0 = min(h for s in series.values() for h in s)
    assert set(out) == set(series)
    for m, s in series.items():
        xs = np.array([(h - h0).total_seconds() / 3600.0 for h in s])
        ys = np.array([float(s[h]) for h in sorted(s)])
        xs = np.array(sorted(xs))
        r = out[m]
        assert r.horas == len(s)
        assert r.aprovadas == int(ys.sum())
        if len(xs) < 2 or np.allclose(xs, xs[0]):
            assert r.inclinacao is None
            continue
        slope, intercept = np.polyfit(xs, ys, 1)
        assert r.inclinacao == pytest.approx(slope, rel=1e-9)
        assert r.intercepto == pytest.approx(intercept, rel=1e-9)
        if np.allclose(ys, ys[0]):
            assert r.r2 is None
        else:
            assert r.r2 == pytest.approx(np.corrcoef(xs, ys)[0, 1] ** 2,
                                         rel=1e-9)


def test_hill_tail_index_matches_bruteforce(spark, sf_dir):
    """Hill estimator re-derived from the literal sorted value list with
    the query's documented 6-rounding of each log term."""
    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.plans import stats

    r = stats.hill_tail_index(spark, sf_dir).collect()[0]
    vals = sorted(
        (
            (x.valor_transacao, x.id_transacao)
            for x in datamodel.transactions(spark, sf_dir)
            .select("id_transacao", "valor_transacao")
            .collect()
            if x.valor_transacao > 0
        ),
        key=lambda p: (-p[0], p[1]),
    )
    n = len(vals)
    k = max(1, math.ceil(math.sqrt(n)))
    thr = vals[k][0]
    s = sum(round(math.log(v / thr), 6) for v, _ in vals[:k])
    assert (r.n, r.n_caudal) == (n, k)
    assert r.limiar == thr
    assert r.soma_log == pytest.approx(s, abs=1e-9)
    assert r.alfa_hill == pytest.approx(round(k / s, 6), abs=1e-9)
    assert r.alfa_hill > 0


def test_hill_tail_index_degenerate_tiny_corpus(spark, tmp_path):
    """With N <= 2 positive values, k+1 exceeds N so no threshold order
    statistic exists: the plan must emit ZERO rows (matching the SQL
    twin's empty GROUP BY), never a single all-null row."""
    import pandas as pd

    from banking_streaming_etl_spark.plans import stats

    pdf = pd.DataFrame(
        {
            "event_id": pd.array([1, 2], dtype="int64"),
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "user_id": pd.array([10, 20], dtype="int64"),
            "event_type": ["pix", "ted"],
            "value": [100.0, 200.0],
            "props": ['{"k": 3}', '{"k": 4}'],
        }
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = stats.hill_tail_index(spark, str(tmp_path))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "n", "n_caudal", "limiar", "soma_log", "alfa_hill",
    ]


def test_data_contract_audit_matches_bruteforce(spark, sf_dir):
    """Violation counts re-derived with literal Python checks over the
    collected tables."""
    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.plans.governance import (
        data_contract_audit,
    )

    got = {
        (r.tabela, r.verificacao): r
        for r in data_contract_audit(spark, sf_dir).collect()
    }
    orders = datamodel.load_table(spark, sf_dir, "orders").collect()
    lineitem = datamodel.load_table(spark, sf_dir, "lineitem").collect()
    custkeys = {
        r.c_custkey
        for r in datamodel.load_table(spark, sf_dir, "customer").collect()
    }
    events = (
        datamodel.load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    orderkeys = {r.o_orderkey for r in orders}
    expect = {
        ("orders", "o_custkey_nulo"):
            (len(orders), sum(r.o_custkey is None for r in orders)),
        ("orders", "o_totalprice_nao_positivo"):
            (len(orders), sum(r.o_totalprice <= 0 for r in orders)),
        ("orders", "o_custkey_orfao"):
            (len(orders), sum(r.o_custkey not in custkeys for r in orders)),
        ("lineitem", "l_quantity_fora_faixa"):
            (len(lineitem),
             sum(not (1 <= r.l_quantity <= 50) for r in lineitem)),
        ("lineitem", "l_discount_fora_faixa"):
            (len(lineitem),
             sum(not (0 <= r.l_discount <= 1) for r in lineitem)),
        ("lineitem", "l_orderkey_orfao"):
            (len(lineitem),
             sum(r.l_orderkey not in orderkeys for r in lineitem)),
        ("events", "user_id_nulo"):
            (len(events), sum(r.user_id is None for r in events)),
        ("events", "ts_nulo"):
            (len(events), sum(r.ts is None for r in events)),
        ("events", "value_negativo"):
            (len(events), sum(r.value < 0 for r in events)),
    }
    assert set(got) == set(expect)
    for key, (n, v) in expect.items():
        r = got[key]
        assert (r.n_linhas, r.n_violacoes) == (n, v), key
        assert r.fracao == pytest.approx(v / n, rel=1e-12)


def test_calibration_error_matches_bruteforce(spark, sf_dir, approved_rows):
    """ECE/MCE/Brier re-derived from the literal NTILE binning and the
    query's documented 6-rounding of the normalized forecast."""
    from collections import defaultdict

    from banking_streaming_etl_spark.plans import stats

    rows = stats.calibration_error_metrics(spark, sf_dir).collect()
    scored = sorted(
        ((r.score_medio, r.id_transacao, int(not r.transacao_aprovada))
         for r in approved_rows)
    )
    mn = min(s for s, _, _ in scored)
    mx = max(s for s, _, _ in scored)
    n = len(scored)
    k = stats.ECE_BINS
    bins = defaultdict(list)
    i = 0
    for b in range(1, k + 1):
        size = n // k + (1 if b <= n % k else 0)
        for s, _, y in scored[i : i + size]:
            bins[b].append((round((s - mn) / (mx - mn), 6), y))
        i += size
    per = {}
    brier_num = 0.0
    for b, terms in bins.items():
        conf = sum(round(p, 6) for p, _ in terms) / len(terms)
        acc = sum(y for _, y in terms) / len(terms)
        brier_num += sum(round((p - y) * (p - y), 6) for p, y in terms)
        per[b] = (len(terms), conf, acc, abs(conf - acc))
    ece = sum(nb / n * gap for nb, _, _, gap in per.values())
    mce = max(gap for _, _, _, gap in per.values())
    brier = brier_num / n
    assert {r.decil for r in rows} == set(per)
    for r in rows:
        nb, conf, acc, gap = per[r.decil]
        assert r.n == nb
        assert r.confianca_media == pytest.approx(conf, rel=1e-9)
        assert r.taxa_negacao == pytest.approx(acc, rel=1e-12)
        assert r.gap_calibracao == pytest.approx(gap, abs=1e-9)
        assert r.brier == pytest.approx(brier, rel=1e-9)
        assert r.ece == pytest.approx(ece, rel=1e-9)
        assert r.mce == pytest.approx(mce, abs=1e-9)
    r0 = rows[0]
    assert 0.0 <= r0.ece <= r0.mce + 1e-12
    assert 0.0 <= r0.brier <= 1.0


def test_neyman_allocation_matches_bruteforce(spark, sf_dir, approved_rows):
    """N_h*S_h proportional allocation with largest-remainder rounding,
    re-derived with statistics.stdev over the 6-rounded values."""
    import statistics
    from collections import defaultdict

    from banking_streaming_etl_spark.plans import stats

    rows = {r.modalidade_pagamento: r
            for r in stats.neyman_allocation(spark, sf_dir).collect()}
    by_mod = defaultdict(list)
    for r in approved_rows:
        by_mod[r.modalidade_pagamento].append(round(r.valor_transacao, 6))
    assert set(rows) == set(by_mod)
    w = {m: len(v) * statistics.stdev(v) for m, v in by_mod.items()}
    tw = sum(w[m] for m in sorted(w))
    base = {m: int(stats.NEYMAN_BUDGET * w[m] / tw) for m in w}
    rem = {m: stats.NEYMAN_BUDGET * w[m] / tw - base[m] for m in w}
    lo = stats.NEYMAN_BUDGET - sum(base.values())
    order = sorted(w, key=lambda m: (-rem[m], m))
    alloc = {m: base[m] + (1 if i < lo else 0) for i, m in enumerate(order)}
    for m, r in rows.items():
        assert r.n_h == len(by_mod[m])
        assert r.desvio == pytest.approx(statistics.stdev(by_mod[m]),
                                         rel=1e-6)
        assert r.fracao == pytest.approx(w[m] / tw, rel=1e-6)
        assert r.alocacao == alloc[m]
    assert sum(r.alocacao for r in rows.values()) == stats.NEYMAN_BUDGET


def test_hhi_matches_bruteforce(spark, sf_dir):
    """HHI re-derived from literal per-payer Decimal totals."""
    from collections import defaultdict
    from decimal import Decimal

    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.plans.dashboard import hhi_by_region

    rows = (
        datamodel.transactions(spark, sf_dir)
        .select("id_regiao", "id_usuario_pagador", "valor_transacao")
        .collect()
    )
    per = defaultdict(lambda: defaultdict(Decimal))
    for r in rows:
        per[r.id_regiao][r.id_usuario_pagador] += Decimal(
            str(round(r.valor_transacao, 6))
        )
    got = {r.id_regiao: r for r in hhi_by_region(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for reg, pays in per.items():
        mics = [int(v * 1_000_000) for v in pays.values()]
        m_tot = sum(mics)
        hhi = sum(m * m for m in mics) / (m_tot * m_tot)
        r = got[reg]
        assert r.n_pagadores == len(mics)
        assert r.valor_total == pytest.approx(m_tot / 1e6, rel=1e-12)
        assert r.hhi == pytest.approx(hhi, rel=1e-12)
        n = len(mics)
        if n > 1:
            assert r.hhi_normalizado == pytest.approx(
                (hhi - 1 / n) / (1 - 1 / n), rel=1e-9
            )
        assert 0.0 < r.hhi <= 1.0


def test_dsir_ess_matches_bruteforce(spark, sf_dir):
    """Kish ESS re-derived from the collected DSIR log-ratios with the
    query's documented max-shift and 6-roundings."""
    from collections import defaultdict

    from banking_streaming_etl_spark.plans.curation import (
        dsir_effective_sample_size,
        dsir_importance_weights,
    )

    lr = [
        (r.source, r.dsir_logratio)
        for r in dsir_importance_weights(spark, sf_dir).collect()
    ]
    mx = max(v for _, v in lr)
    per = defaultdict(list)
    for src, v in lr:
        per[src].append(round(math.exp(v - mx), 6))
    got = {
        r.source: r
        for r in dsir_effective_sample_size(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for src, ws in per.items():
        r = got[src]
        sw = sum(ws)
        sw2 = sum(round(w * w, 6) for w in ws)
        assert r.n_docs == len(ws)
        assert r.soma_pesos == pytest.approx(sw, abs=1e-6)
        if sw2 > 0:
            assert r.ess == pytest.approx(sw * sw / sw2, rel=1e-6)
            assert r.ess_fracao == pytest.approx(
                sw * sw / sw2 / len(ws), rel=1e-6
            )
            assert 0.0 < r.ess_fracao <= 1.0 + 1e-9


def test_g_test_matches_bruteforce(spark, sf_dir, approved_rows):
    """scipy.stats.chi2_contingency(lambda_='log-likelihood') re-derived
    literally with the query's documented 6-rounding per cell."""
    from collections import Counter

    from banking_streaming_etl_spark.plans import stats

    rows = stats.g_test_modality_approval(spark, sf_dir).collect()
    cells = Counter(
        (x.modalidade_pagamento, x.transacao_aprovada) for x in approved_rows
    )
    nr = Counter()
    nc = Counter()
    for (m, a), n in cells.items():
        nr[m] += n
        nc[a] += n
    nt = sum(cells.values())
    contribs = {
        k: round(2.0 * n * math.log(n / (nr[k[0]] * nc[k[1]] / nt)), 6)
        if n > 0 else 0.0
        for k, n in cells.items()
    }
    g = sum(contribs.values())
    assert {(r.modalidade_pagamento, r.transacao_aprovada)
            for r in rows} == set(cells)
    for r in rows:
        k = (r.modalidade_pagamento, r.transacao_aprovada)
        assert r.n_celula == cells[k]
        assert r.esperado == pytest.approx(nr[k[0]] * nc[k[1]] / nt,
                                           rel=1e-12)
        assert r.g_contrib == pytest.approx(contribs[k], abs=1e-9)
        assert r.g_total == pytest.approx(g, abs=1e-6)
    # G and Pearson chi2 agree asymptotically: same order of magnitude
    assert rows[0].g_total > 0


def test_mcnemar_matches_bruteforce(spark, sf_dir, approved_rows):
    """statsmodels mcnemar(exact=False, correction=...) and the Woolf
    odds-ratio interval re-derived literally."""
    from banking_streaming_etl_spark.plans import stats

    from banking_streaming_etl_spark.plans.dashboard import _approved

    r = stats.mcnemar_gates_2x2(spark, sf_dir).collect()[0]
    gates = (
        _approved(spark, sf_dir)
        .select("saldo_aprovado", "score_aprovado")
        .collect()
    )
    a = sum(x.saldo_aprovado and x.score_aprovado for x in gates)
    b = sum(x.saldo_aprovado and not x.score_aprovado for x in gates)
    c = sum((not x.saldo_aprovado) and x.score_aprovado for x in gates)
    d = sum((not x.saldo_aprovado) and not x.score_aprovado for x in gates)
    assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
    assert r.mcnemar_qui2 == pytest.approx((b - c) ** 2 / (b + c), rel=1e-12)
    assert r.mcnemar_corrigido == pytest.approx(
        (abs(b - c) - 1) ** 2 / (b + c), rel=1e-12
    )
    orr = (a * d) / (b * c)
    assert r.razao_chances == pytest.approx(orr, rel=1e-12)
    assert r.ln_rc == pytest.approx(round(math.log(orr), 6), abs=1e-9)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    lo = round(math.exp(round(math.log(orr), 6) - stats.WILSON_Z * se), 6)
    hi = round(math.exp(round(math.log(orr), 6) + stats.WILSON_Z * se), 6)
    assert r.rc_ic_inf == pytest.approx(lo, abs=1e-9)
    assert r.rc_ic_sup == pytest.approx(hi, abs=1e-9)
    assert r.rc_ic_inf < r.razao_chances < r.rc_ic_sup


def test_naive_bayes_matches_bruteforce(spark, sf_dir, approved_rows):
    """Laplace-smoothed NB log-odds and training accuracy re-derived
    with Counters and the query's documented 6-roundings."""
    from collections import Counter

    from banking_streaming_etl_spark.plans import stats

    edges = stats.ATE_VALUE_EDGES

    def band(v):
        return ("baixo" if v < edges[0] else "medio" if v < edges[1]
                else "alto" if v < edges[2] else "muito_alto")

    data = [
        (r.modalidade_pagamento, band(r.valor_transacao),
         int(r.transacao_aprovada))
        for r in approved_rows
    ]
    cm = Counter()
    cf = Counter()
    cells = Counter()
    for m, f, y in data:
        cm[(m, y)] += 1
        cf[(f, y)] += 1
        cells[(m, f, y)] += 1
    ty = sum(y for _, _, y in data)
    tn = len(data) - ty
    nm = len({m for m, _, _ in data})
    nf = len({f for _, f, _ in data})
    got = {
        (r.modalidade_pagamento, r.faixa_valor): r
        for r in stats.naive_bayes_approval(spark, sf_dir).collect()
    }
    pairs = {(m, f) for m, f, _ in data}
    assert set(got) == pairs
    correct = 0
    for m, f in pairs:
        lm = round(
            math.log((cm[(m, 1)] + 1) / (ty + nm))
            - math.log((cm[(m, 0)] + 1) / (tn + nm)), 6,
        )
        lf = round(
            math.log((cf[(f, 1)] + 1) / (ty + nf))
            - math.log((cf[(f, 0)] + 1) / (tn + nf)), 6,
        )
        prior = round(math.log(ty) - math.log(tn), 6)
        r = got[(m, f)]
        assert r.n == cells[(m, f, 1)] + cells[(m, f, 0)]
        assert r.n_y == cells[(m, f, 1)]
        assert r.llr_modalidade == pytest.approx(lm, abs=1e-9)
        assert r.llr_faixa == pytest.approx(lf, abs=1e-9)
        assert r.log_odds == pytest.approx(lm + lf + prior, abs=1e-9)
        pred = lm + lf + prior > 0
        assert r.previsto == pred
        correct += cells[(m, f, 1)] if pred else cells[(m, f, 0)]
    r0 = next(iter(got.values()))
    assert r0.acuracia_treino == pytest.approx(correct / len(data),
                                               rel=1e-12)
    assert 0.5 <= r0.acuracia_treino <= 1.0  # beats coin flip in-sample


def test_classification_report_matches_sklearn_formulas(
    spark, sf_dir, approved_rows
):
    from banking_streaming_etl_spark.plans import stats
    from banking_streaming_etl_spark.plans.dashboard import _approved

    r = stats.classification_report_gate(spark, sf_dir).collect()[0]
    rows = (
        _approved(spark, sf_dir)
        .select("score_aprovado", "transacao_aprovada")
        .collect()
    )
    tp = sum(x.score_aprovado and x.transacao_aprovada for x in rows)
    fp = sum(x.score_aprovado and not x.transacao_aprovada for x in rows)
    fn = sum((not x.score_aprovado) and x.transacao_aprovada for x in rows)
    tn = sum((not x.score_aprovado) and not x.transacao_aprovada
             for x in rows)
    assert (r.vp, r.fp, r.fn, r.vn) == (tp, fp, fn, tn)
    prec, rec, spec = tp / (tp + fp), tp / (tp + fn), tn / (tn + fp)
    assert r.acuracia == pytest.approx((tp + tn) / len(rows), rel=1e-12)
    assert r.precisao == pytest.approx(prec, rel=1e-12)
    assert r.revocacao == pytest.approx(rec, rel=1e-12)
    assert r.especificidade == pytest.approx(spec, rel=1e-12)
    assert r.f1 == pytest.approx(2 * prec * rec / (prec + rec), rel=1e-12)
    assert r.acuracia_balanceada == pytest.approx((rec + spec) / 2,
                                                  rel=1e-12)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert r.mcc == pytest.approx(mcc, rel=1e-9)
    assert -1.0 <= r.mcc <= 1.0


def test_interarrival_percentiles_match_bruteforce(spark, sf_dir):
    """Inter-arrival percentiles re-derived from the literal sorted
    per-modality arrival sequence with the ceil(p*N) rank rule."""
    from collections import defaultdict

    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.plans.dashboard import (
        EXACT_PCTS,
        interarrival_percentiles_by_modality,
    )

    rows = (
        datamodel.transactions(spark, sf_dir)
        .select("modalidade_pagamento", "data_horario", "id_transacao")
        .collect()
    )
    arr = defaultdict(list)
    for r in rows:
        us = int(r.data_horario.timestamp() * 1_000_000)
        arr[r.modalidade_pagamento].append((us, r.id_transacao))
    got = defaultdict(dict)
    for r in interarrival_percentiles_by_modality(spark, sf_dir).collect():
        got[r.modalidade][r.pct] = r.intervalo_s
    assert set(got) == set(arr)
    for m, seq in arr.items():
        seq.sort()
        deltas = sorted(
            (b[0] - a[0], b[1]) for a, b in zip(seq, seq[1:])
        )
        n = len(deltas)
        for p in EXACT_PCTS:
            want = deltas[math.ceil(p * n) - 1][0] / 1e6
            assert got[m][p] == pytest.approx(want, rel=1e-12), (m, p)


def test_markov_entropy_rate_matches_bruteforce(spark, sf_dir):
    """Entropy rate re-derived from the literal per-payer transition
    sequence with the query's documented 6-rounding per term."""
    from collections import Counter, defaultdict

    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.plans.behavior import (
        markov_entropy_rate,
    )

    rows = (
        datamodel.transactions(spark, sf_dir)
        .select("id_usuario_pagador", "modalidade_pagamento",
                "data_horario", "id_transacao")
        .collect()
    )
    seqs = defaultdict(list)
    for r in rows:
        seqs[r.id_usuario_pagador].append(
            (r.data_horario, r.id_transacao, r.modalidade_pagamento)
        )
    trans = Counter()
    for s in seqs.values():
        s.sort()
        for a, b in zip(s, s[1:]):
            trans[(a[2], b[2])] += 1
    outs = Counter()
    for (a, _), n in trans.items():
        outs[a] += n
    nn = sum(outs.values())
    ent = {
        a: -sum(
            round(n / outs[a] * math.log(n / outs[a]), 6)
            for (x, _), n in trans.items() if x == a
        )
        for a in outs
    }
    rate = sum(outs[a] / nn * ent[a] for a in sorted(outs))
    got = {r.anterior: r for r in markov_entropy_rate(spark, sf_dir).collect()}
    assert set(got) == set(outs)
    for a, r in got.items():
        assert r.n_saidas == outs[a]
        assert r.pi == pytest.approx(outs[a] / nn, rel=1e-12)
        assert r.entropia_estado == pytest.approx(ent[a], abs=1e-9)
        assert r.taxa_entropia == pytest.approx(rate, abs=1e-9)
        assert -1e-9 <= r.entropia_estado <= math.log(len(got)) + 1e-6


def test_cohens_d_matches_bruteforce(spark, sf_dir, approved_rows):
    import statistics

    from banking_streaming_etl_spark.plans import stats

    r = stats.cohens_d_value_by_approval(spark, sf_dir).collect()[0]
    va = [round(x.valor_transacao, 6) for x in approved_rows
          if x.transacao_aprovada]
    vd = [round(x.valor_transacao, 6) for x in approved_rows
          if not x.transacao_aprovada]
    assert (r.n1, r.n0) == (len(va), len(vd))
    m1, m0 = statistics.mean(va), statistics.mean(vd)
    v1, v0 = statistics.variance(va), statistics.variance(vd)
    sp = math.sqrt(
        ((len(va) - 1) * v1 + (len(vd) - 1) * v0)
        / (len(va) + len(vd) - 2)
    )
    d = (m1 - m0) / sp
    assert r.media_aprovadas == pytest.approx(m1, rel=1e-9)
    assert r.media_negadas == pytest.approx(m0, rel=1e-9)
    assert r.desvio_agrupado == pytest.approx(sp, rel=1e-6)
    assert r.cohen_d == pytest.approx(d, rel=1e-6)
    assert r.hedges_g == pytest.approx(
        d * (1 - 3 / (4 * (len(va) + len(vd)) - 9)), rel=1e-6
    )
