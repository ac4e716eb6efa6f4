"""Token-budget mixing + deterministic training order
(operators/sampling.py round-5 additions)."""
from __future__ import annotations

import hashlib

import pytest

from ocr_system_spark.operators.sampling import budget_sample, training_order


def _md5(i):
    return hashlib.md5(str(i).encode()).hexdigest()


def _rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, grp string, w long")


def _py_budget(rows, budgets, default):
    keep = []
    for g in sorted({r[1] for r in rows}):
        b = budgets.get(g, default)
        cum = 0
        for i, _, w in sorted((r for r in rows if r[1] == g),
                              key=lambda r: (_md5(r[0]), r[0])):
            cum += w
            if b is None or cum <= b:
                keep.append((i, g, w))
    return sorted(keep)


ROWS = [(i, ["a", "b", "c"][i % 3], 10 + (i * 7) % 13) for i in range(60)]


class TestBudgetSample:
    def test_matches_naive_mirror(self, spark):
        budgets = {"a": 100, "b": 0}
        got = sorted(map(tuple,
                         budget_sample(_rows(spark, ROWS), "grp", budgets,
                                       weight_col="w",
                                       default_budget=55).collect()))
        assert got == _py_budget(ROWS, budgets, 55)
        # the 'b' group is zeroed out entirely
        assert not any(g == "b" for _, g, _ in got)

    def test_none_default_keeps_unlisted_groups_whole(self, spark):
        got = budget_sample(_rows(spark, ROWS), "grp", {"a": 40},
                            weight_col="w", default_budget=None).collect()
        assert sorted((r["doc_id"], r["grp"], r["w"]) for r in got) == \
            _py_budget(ROWS, {"a": 40}, None)
        assert sum(1 for r in got if r["grp"] == "c") == \
            sum(1 for r in ROWS if r[1] == "c")

    def test_exact_boundary_is_kept(self, spark):
        """A row whose inclusive cumulative weight EQUALS the budget is
        kept (≤, not <)."""
        rows = [(0, "g", 5), (1, "g", 5), (2, "g", 5)]
        order = sorted(rows, key=lambda r: (_md5(r[0]), r[0]))
        budget = order[0][2] + order[1][2]
        got = sorted(r["doc_id"] for r in
                     budget_sample(_rows(spark, rows), "grp",
                                   {"g": budget}, weight_col="w").collect())
        assert got == sorted(r[0] for r in order[:2])

    def test_partitioning_invariance(self, spark):
        df = _rows(spark, ROWS)
        kw = dict(budgets={"a": 100, "c": 70}, weight_col="w",
                  default_budget=50)
        a = sorted(map(tuple,
                       budget_sample(df, "grp", **kw).collect()))
        b = sorted(map(tuple,
                       budget_sample(df.repartition(11), "grp", **kw)
                       .collect()))
        assert a == b

    def test_validation(self, spark):
        df = _rows(spark, ROWS)
        with pytest.raises(ValueError):
            budget_sample(df, "grp", {"a": -1}, weight_col="w")
        with pytest.raises(ValueError):
            budget_sample(df, "grp", {}, weight_col="w", default_budget=-5)

    def test_null_weight_counts_as_zero(self, spark):
        """NULL weights are pinned to 0 — the row is free and is kept
        whenever the running total is still within budget."""
        rows = [(0, "g", 4), (1, "g", None), (2, "g", None), (3, "g", 4)]
        df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
        order = sorted(rows, key=lambda r: (_md5(r[0]), r[0]))
        cum, exp = 0, []
        for i, _, w in order:
            cum += w or 0
            if cum <= 4:
                exp.append(i)
        got = sorted(r["doc_id"] for r in
                     budget_sample(df, "grp", {"g": 4},
                                   weight_col="w").collect())
        assert got == sorted(exp)
        # an all-null corpus is entirely free
        nul = spark.createDataFrame([(i, "g", None) for i in range(4)],
                                    "doc_id long, grp string, w long")
        assert len(budget_sample(nul, "grp", {"g": 0},
                                 weight_col="w").collect()) == 4

    def test_no_nested_loop_or_cartesian(self, spark):
        plan = (budget_sample(_rows(spark, ROWS), "grp", {"a": 100},
                              weight_col="w", default_budget=50)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def _py_order(ids, n_shards):
    out = []
    by_shard: dict = {}
    for i in ids:
        tk = _md5(i)
        sh = (int(tk[0], 16) * 16 + int(tk[1], 16)) % n_shards
        by_shard.setdefault(sh, []).append((tk, i))
    for sh, rows in by_shard.items():
        for pos, (_, i) in enumerate(sorted(rows), start=1):
            out.append((i, sh, pos))
    return sorted(out)


class TestTrainingOrder:
    def test_matches_python_mirror(self, spark):
        ids = list(range(100))
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        got = sorted((r["doc_id"], r["shard"], r["pos"])
                     for r in training_order(df, n_shards=7).collect())
        assert got == _py_order(ids, 7)

    def test_pos_dense_per_shard(self, spark):
        df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        rows = training_order(df, n_shards=5).collect()
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for sh, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1))
        assert set(by_shard) <= set(range(5))

    def test_partitioning_invariance(self, spark):
        df = spark.createDataFrame([(i,) for i in range(80)], "doc_id long")
        a = sorted(map(tuple, training_order(df, 9).collect()))
        b = sorted(map(tuple, training_order(df.repartition(13), 9)
                       .collect()))
        assert a == b

    def test_validation(self, spark):
        df = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError):
            training_order(df, 0)
        with pytest.raises(ValueError):
            training_order(df, 257)
