"""Differential tests for the greedy join tail — the rows-only part of
the engine whose semantics cannot be SQL-oracled (order-dependent greedy
control flow).

Each test re-implements the REFERENCE's algorithm in plain Python,
mirroring ``validator/join.py`` / ``validator/validator.py`` line by
line, and asserts the engine matches PAIR-FOR-PAIR on small fixtures:

- limited many-to-many greedy assignment (``join.py:724-767``):
  prob-desc stable sort over generation-ordered candidates, accept
  while both rows are under the per-row cap; ``max_matches = 0`` =
  unlimited (every thresholded pair, generation order).
- retention gate (``join.py:797-830``): retention = matched pairs /
  denominator (can exceed 1.0 for many-to-many), compatible iff
  retention >= threshold; the orchestrator's denominator is GLOBAL —
  min rows over all unioned groups (``validator.py:323-325``).
- stage-1 best-partner control flow (``join.py:886-983``): every i
  seeks its best partner among j > i, partners NOT consumed, ties keep
  the first best, never-joined groups pass through at the end.
- stage-2 first-compatible-wins (``join.py:985-1053``) and the
  ``any_joins_succeeded`` stage-2 skip (``validator.py:353-391``).
"""

from __future__ import annotations

import pytest

from dynamic_etl_pipeline_thesis_ii_spark.config import EngineConfig
from dynamic_etl_pipeline_thesis_ii_spark.operators import similarity_join as SJ
from dynamic_etl_pipeline_thesis_ii_spark.operators.integration import (
    _best_partner_join,
    _join_the_joined,
)

CFG = EngineConfig()


# ---------------------------------------------------------------------------
# reference re-implementation (mirrors validator/join.py semantics)
# ---------------------------------------------------------------------------

def ref_greedy_assign(candidates: list[tuple], max_matches: int) -> list[tuple]:
    """``join.py:724-767`` verbatim: candidates arrive in generation
    order; ``sort(key=prob, reverse=True)`` is STABLE, so equal-prob
    pairs keep generation order; scan accepts while both rows are under
    the cap. ``max_matches = 0`` returns every candidate unchanged."""
    if max_matches == 0:
        return list(candidates)
    ordered = sorted(candidates, key=lambda x: x[2], reverse=True)
    final, per_1, per_2 = [], {}, {}
    for i, j, prob in ordered:
        count_i = per_1.get(i, 0)
        count_j = per_2.get(j, 0)
        if count_i < max_matches and count_j < max_matches:
            final.append((i, j, prob))
            per_1[i] = count_i + 1
            per_2[j] = count_j + 1
    return final


def ref_check_compatibility(matches: list[tuple], denominator: int,
                            retention_threshold: float) -> tuple[bool, float]:
    """``join.py:797-830``: retention = output rows / denominator
    (0.0 when the denominator is 0), compatible iff >= threshold."""
    if not matches:
        return False, 0.0
    retention = len(matches) / denominator if denominator > 0 else 0.0
    return retention >= retention_threshold, retention


def ref_stage1(n_groups: int, compat) -> tuple[list, set, bool]:
    """``join.py:886-983``: outputs = joined (i, j) tags in i order,
    then never-joined group tags; compat(i, j) -> (compatible,
    retention). Returns (outputs, created_pairs, any_joins_succeeded)."""
    outputs, created, any_ok = [], set(), False
    for i in range(n_groups):
        best_j, best_ret = None, 0.0
        for j in range(i + 1, n_groups):
            if (i, j) in created or (j, i) in created:
                continue
            ok, ret = compat(i, j)
            if ok and ret > best_ret:
                best_j, best_ret = j, ret
        if best_j is not None:
            outputs.append(("join", i, best_j))
            created.add((i, best_j))
            any_ok = True
    for i in range(n_groups):
        if not any(i in pair for pair in created):
            outputs.append(("solo", i))
    return outputs, created, any_ok


def ref_stage2(n_frames: int, compat) -> list:
    """``join.py:985-1053``: (i, j) scan order, first compatible wins,
    both marked processed; leftovers appended in order."""
    outputs, processed = [], set()
    for i in range(n_frames):
        for j in range(i + 1, n_frames):
            if i in processed or j in processed:
                continue
            ok, _ = compat(i, j)
            if ok:
                outputs.append(("join", i, j))
                processed.add(i)
                processed.add(j)
    for i in range(n_frames):
        if i not in processed:
            outputs.append(("solo", i))
    return outputs


# ---------------------------------------------------------------------------
# greedy assignment: engine vs reference, pair-for-pair
# ---------------------------------------------------------------------------

# fixtures cover: caps 1/2/3, cap-0 unlimited, prob ties, one side
# saturating the other, chains where an early accept blocks later pairs
GREEDY_FIXTURES = [
    # (name, candidates [(id_a, id_b, prob) in generation order], cap)
    ("cap2_block", [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7),
                    (2, 10, 0.6)], 2),
    ("cap1_chain", [(1, 10, 0.95), (2, 10, 0.9), (2, 11, 0.85),
                    (3, 11, 0.8), (3, 12, 0.75)], 1),
    ("unlimited", [(1, 10, 0.9), (1, 11, 0.5), (2, 10, 0.5),
                   (2, 11, 0.9)], 0),
    ("ties_generation_order", [(1, 10, 0.8), (1, 11, 0.8), (2, 10, 0.8),
                               (2, 11, 0.8), (3, 12, 0.8)], 1),
    ("one_side_saturates", [(1, 10, 0.9), (2, 10, 0.8), (3, 10, 0.7),
                            (4, 10, 0.6), (4, 11, 0.5)], 3),
    ("cap2_dense", [(i, 10 + (i * 3) % 4, round(0.99 - 0.01 * k, 6))
                    for k, i in enumerate(range(1, 9))], 2),
]


@pytest.mark.parametrize("name,cands,cap",
                         GREEDY_FIXTURES, ids=[f[0] for f in GREEDY_FIXTURES])
def test_assign_greedy_matches_reference(spark, name, cands, cap):
    """Engine assign_greedy == reference greedy, pair-for-pair AND in
    order. The engine sorts (prob desc, id_a, id_b); the reference's
    stable sort over generation-ordered candidates yields the same
    order whenever generation order is (id_a, id_b)-sorted — which it
    is, both here and in the engine's candidate generation."""
    expected = ref_greedy_assign(cands, cap)
    df = spark.createDataFrame(cands, ["id_a", "id_b", "prob"])
    got = SJ.assign_greedy(df, max_matches=cap)
    if cap == 0:
        # unlimited mode: the reference keeps generation order, the
        # engine returns prob-sorted — the accepted SET is the contract
        # (the list feeds an unordered join); capped modes below are
        # order-exact because order IS the acceptance semantics
        assert sorted(got) == sorted(expected), f"{name}"
    else:
        assert got == expected, f"{name}: {got} != {expected}"


def test_assign_greedy_cap0_returns_all_thresholded(spark):
    """The MAX_MATCHES_PER_ROW=0 edge (``join.py:728-731``): unlimited
    many-to-many returns every thresholded pair with no cap state."""
    cands = [(i, j, 0.5 + 0.01 * ((i + j) % 7))
             for i in range(5) for j in range(10, 14)]
    df = spark.createDataFrame(cands, ["id_a", "id_b", "prob"])
    got = SJ.assign_greedy(df, max_matches=0)
    assert sorted(got) == sorted(ref_greedy_assign(cands, 0))
    assert len(got) == 20


# ---------------------------------------------------------------------------
# retention gate: engine vs reference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_matched,denominator", [
    (5, 10), (0, 10), (3, 0), (25, 10),   # >1.0 retention is legal
    (1, 1),
])
def test_retention_matches_reference(n_matched, denominator):
    matches = [(k, k, 0.9) for k in range(n_matched)]
    _, ref_ret = ref_check_compatibility(matches, denominator, 0.2)
    assert SJ.retention(n_matched, denominator) == ref_ret


# ---------------------------------------------------------------------------
# stage-1 / stage-2 control flow: engine vs reference over compat tables
# ---------------------------------------------------------------------------

# each table: {(i, j): retention} for compatible pairs (i < j); anything
# absent is incompatible. Chosen to exercise: partner reuse (one group
# best-partnering several i), tie-keeps-first, no-join passthrough,
# stage-2 skip, first-compatible-wins vs best-wins difference.
COMPAT_TABLES = [
    ("disjoint_pairs", 4, {(0, 1): 0.9, (2, 3): 0.8}),
    ("shared_partner", 3, {(0, 2): 0.9, (1, 2): 0.85}),
    ("all_incompatible", 3, {}),
    ("chain", 4, {(0, 1): 0.5, (1, 2): 0.6, (2, 3): 0.7}),
    ("tie_first_wins", 3, {(0, 1): 0.7, (0, 2): 0.7}),
    ("dense", 5, {(i, j): 0.3 + 0.1 * ((i * j) % 5)
                  for i in range(5) for j in range(i + 1, 5)}),
]


def _engine_stage_runner(stage_fn, n: int, table: dict):
    """Run the engine stage over integer 'frames' with _join_pair
    stubbed to the compat table — isolates the CONTROL FLOW under test
    from the (oracle-checked) pair scoring."""
    def join_pair(a, b):
        key = (a, b) if (a, b) in table else None
        if key is None:
            return None, {"status": "no_matches", "retention": 0.0}
        return ("join", a, b), {"status": "joined",
                                "retention": table[key]}
    reports: list[dict] = []
    if stage_fn is _best_partner_join:
        out, any_ok = stage_fn(list(range(n)), CFG, reports,
                               join_pair=join_pair)
        return out, any_ok, reports
    out = stage_fn(list(range(n)), CFG, reports, join_pair=join_pair)
    return out, None, reports


@pytest.mark.parametrize("name,n,table",
                         COMPAT_TABLES, ids=[t[0] for t in COMPAT_TABLES])
def test_stage1_control_flow_matches_reference(name, n, table):
    def compat(i, j):
        return ((i, j) in table, table.get((i, j), 0.0))
    ref_out, ref_created, ref_any = ref_stage1(n, compat)
    got, any_ok, _ = _engine_stage_runner(_best_partner_join, n, table)
    # normalize: engine emits ('join', i, j) stubs and raw ints for solo
    norm = [g if isinstance(g, tuple) else ("solo", g) for g in got]
    assert norm == ref_out, f"{name}: {norm} != {ref_out}"
    assert any_ok == ref_any


@pytest.mark.parametrize("name,n,table",
                         COMPAT_TABLES, ids=[t[0] for t in COMPAT_TABLES])
def test_stage2_control_flow_matches_reference(name, n, table):
    def compat(i, j):
        return ((i, j) in table, table.get((i, j), 0.0))
    ref_out = ref_stage2(n, compat)
    got, _, _ = _engine_stage_runner(_join_the_joined, n, table)
    norm = [g if isinstance(g, tuple) else ("solo", g) for g in got]
    assert norm == ref_out, f"{name}: {norm} != {ref_out}"


# ---------------------------------------------------------------------------
# seeded differential fuzz: random candidate sets / compat tables
# ---------------------------------------------------------------------------

# Probabilities come from a coarse grid so ties are FREQUENT (the
# tie-handling paths are where greedy implementations usually diverge);
# candidate generation order is (id_a, id_b)-sorted, matching the
# engine's candidate generation, so capped modes compare order-exact.
_PROB_GRID = [0.5, 0.6, 0.7, 0.7, 0.8, 0.8, 0.9]


def _random_candidates(rng) -> list[tuple]:
    n_a, n_b = rng.randint(1, 8), rng.randint(1, 8)
    pairs = [(i, 100 + j) for i in range(n_a) for j in range(n_b)]
    chosen = sorted(rng.sample(pairs, rng.randint(1, len(pairs))))
    return [(i, j, rng.choice(_PROB_GRID)) for i, j in chosen]


@pytest.mark.parametrize("seed", range(20))
def test_assign_greedy_fuzz_matches_reference(spark, seed):
    """100 random candidate sets (5 per seed x 20 seeds): engine
    assign_greedy == reference greedy under random caps 0-3, heavy
    prob ties, one side saturating, sparse and dense blocks alike."""
    import random
    rng = random.Random(31_000 + seed)
    for case in range(5):
        cands = _random_candidates(rng)
        cap = rng.choice([0, 1, 2, 3])
        expected = ref_greedy_assign(cands, cap)
        df = spark.createDataFrame(cands, ["id_a", "id_b", "prob"])
        got = SJ.assign_greedy(df, max_matches=cap)
        tag = f"seed={seed} case={case} cap={cap} cands={cands}"
        if cap == 0:
            assert sorted(got) == sorted(expected), tag
        else:
            assert got == expected, tag


def _random_compat_table(rng) -> tuple[int, dict]:
    """Random n and {(i, j) i<j: retention} with retention from a tie-
    heavy grid; ~half of all pairs compatible on average."""
    n = rng.randint(2, 6)
    table = {}
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.5:
                table[(i, j)] = rng.choice([0.3, 0.5, 0.5, 0.7, 0.7, 0.9])
    return n, table


@pytest.mark.parametrize("seed", range(10))
def test_stage_control_flow_fuzz_matches_reference(seed):
    """200 random compat tables (20 per seed x 10 seeds), each run
    through BOTH stage-1 (best-partner, ties keep first, partners not
    consumed) and stage-2 (first-compatible-wins) against the reference
    re-implementation. Pure control flow — no Spark session needed."""
    import random
    rng = random.Random(77_000 + seed)
    for case in range(20):
        n, table = _random_compat_table(rng)

        def compat(i, j):
            return ((i, j) in table, table.get((i, j), 0.0))

        tag = f"seed={seed} case={case} n={n} table={table}"
        ref_out, _, ref_any = ref_stage1(n, compat)
        got1, any_ok, _ = _engine_stage_runner(_best_partner_join, n, table)
        norm1 = [g if isinstance(g, tuple) else ("solo", g) for g in got1]
        assert norm1 == ref_out, f"stage1 {tag}: {norm1} != {ref_out}"
        assert any_ok == ref_any, f"stage1 any_ok {tag}"

        ref2 = ref_stage2(n, compat)
        got2, _, _ = _engine_stage_runner(_join_the_joined, n, table)
        norm2 = [g if isinstance(g, tuple) else ("solo", g) for g in got2]
        assert norm2 == ref2, f"stage2 {tag}: {norm2} != {ref2}"


def test_stage2_skipped_iff_no_stage1_join(spark):
    """``validator.py:353-391``: stage 2 runs only when at least one
    stage-1 join succeeded — integrate() must emit the skip report for
    incompatible groups and omit it when a join lands."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.integration import (
        integrate,
    )
    # two union-incompatible, join-incompatible frames -> skip report
    a = spark.createDataFrame([(i, float(i)) for i in range(6)],
                              ["qq", "ww"])
    b = spark.createDataFrame(
        [(f"s{i}", f"t{i}", float(i * 997 % 91) * 1e6) for i in range(6)],
        ["zz", "yy", "xx"])
    outputs, reports = integrate([a, b], CFG)
    ops = [r["operation"] for r in reports]
    assert "skip_stage2" in ops
    assert "join_stage2" not in ops
    assert len(outputs) == 2

    # equi-joinable frames -> stage 1 joins, no skip report
    bars = spark.createDataFrame(
        [("A", 1, 10.0, 11.0), ("A", 2, 11.0, 12.0), ("B", 1, 20.0, 2.0)],
        ["ticker", "ts", "open_px", "close_px"])
    funds = spark.createDataFrame(
        [("A", 1, 5.0, 7.0, 9.0, 1.0, 2.0, 3.0, 4.0, 5.0),
         ("A", 2, 6.0, 8.0, 9.5, 1.1, 2.1, 3.1, 4.1, 5.1),
         ("B", 1, 1.0, 2.0, 3.0, 6.0, 7.0, 8.0, 9.0, 1.5)],
        ["ticker", "ts", "revenue_m", "ebitda_m", "assets_m",
         "liab_m", "equity_m", "eps_q", "dps_q", "capex_m"])
    outputs2, reports2 = integrate([bars, funds], CFG)
    ops2 = [r["operation"] for r in reports2]
    assert "join_stage1" in ops2
    assert "skip_stage2" not in ops2


def test_global_denominator_used_for_retention(spark):
    """``validator.py:323-325``: the retention denominator is the MIN
    row count over all groups, fixed for every pair — a 3-row group
    joining a 30-row group divides by the global min, not the pair
    min."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.integration import (
        integrate,
    )
    small = spark.createDataFrame(
        [("A", 1, 10.0, 11.0), ("A", 2, 11.0, 12.0), ("B", 1, 20.0, 2.0)],
        ["ticker", "ts", "open_px", "close_px"])
    big = spark.createDataFrame(
        [(t, s, float(s), float(s) * 2, float(s) * 3, 1.0, 2.0, 3.0, 4.0, 5.0)
         for t in ("A", "B", "C") for s in range(1, 11)],
        ["ticker", "ts", "revenue_m", "ebitda_m", "assets_m",
         "liab_m", "equity_m", "eps_q", "dps_q", "capex_m"])
    outputs, reports = integrate([small, big], CFG)
    denom = [r for r in reports if r["operation"] == "join_denominator"]
    assert denom and denom[0]["rows"] == 3
    joins = [r for r in reports if r["operation"] == "join_stage1"]
    # equi-join matches (A,1),(A,2),(B,1): retention = 3/3 vs the
    # pair-min 3 — here they coincide; the report must carry the
    # global-denominator value exactly
    assert joins and joins[0]["retention"] == pytest.approx(1.0)


def test_empty_group_zeroes_global_denominator(spark):
    """Reference semantics (validator.py:324 + join.py:809): the global
    denominator min INCLUDES empty groups, and retention at denominator
    0 is 0.0 — so one empty union-incompatible group disables every
    stage-1/2 join. The engine mirrors this and surfaces it with an
    explicit report instead of silent pass-throughs."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.integration import (
        integrate,
    )
    bars = spark.createDataFrame(
        [("A", 1, 10.0, 11.0), ("A", 2, 11.0, 12.0), ("B", 1, 20.0, 2.0)],
        ["ticker", "ts", "open_px", "close_px"])
    funds = spark.createDataFrame(
        [("A", 1, 5.0, 7.0, 9.0, 1.0, 2.0, 3.0, 4.0, 5.0),
         ("B", 1, 1.0, 2.0, 3.0, 6.0, 7.0, 8.0, 9.0, 1.5)],
        ["ticker", "ts", "revenue_m", "ebitda_m", "assets_m",
         "liab_m", "equity_m", "eps_q", "dps_q", "capex_m"])
    empty = spark.createDataFrame(
        [], "zzz_a string, zzz_b string, zzz_c double, zzz_d double, "
            "zzz_e double, zzz_f double, zzz_g double, zzz_h double")
    outputs, reports = integrate([bars, funds, empty], CFG)
    ops = [r["operation"] for r in reports]
    assert "join_denominator_zero" in ops
    assert "join_stage1" not in ops          # the equi-join is gated off
    # drop the empty group and the same pair joins fine
    outputs2, reports2 = integrate([bars, funds], CFG)
    assert any(r["operation"] == "join_stage1" for r in reports2)
