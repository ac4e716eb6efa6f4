"""Round-5 Bloom-gated decontamination: filter-kernel guarantees (pure
numpy) and bit-identity of the gated operator vs the exact one."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_system_spark.operators.decontaminate import (
    _bloom_build, _bloom_params, _bloom_probe,
    decontaminate, decontaminate_bloom)


class TestBloomKernel:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(42)
        items = rng.integers(0, 2**63, size=50_000, dtype=np.int64) \
                   .view(np.uint64)
        m, k = _bloom_params(len(items), 0.01)
        bits = _bloom_build(items, m, k)
        assert bool(_bloom_probe(items, bits, k).all())

    def test_fp_rate_near_target(self):
        rng = np.random.default_rng(7)
        items = rng.integers(0, 2**63, size=50_000, dtype=np.int64) \
                   .view(np.uint64)
        probes = rng.integers(0, 2**63, size=100_000, dtype=np.int64) \
                    .view(np.uint64)
        probes = np.setdiff1d(probes, items)
        m, k = _bloom_params(len(items), 0.01)
        bits = _bloom_build(items, m, k)
        fp = _bloom_probe(probes, bits, k).mean()
        assert fp < 0.03, fp          # target 0.01; generous noise margin
        assert fp > 0.0005, fp        # and the filter isn't degenerate

    def test_params_shrink_with_fpp(self):
        m1, _ = _bloom_params(1000, 0.01)
        m2, _ = _bloom_params(1000, 0.10)
        assert m1 > m2 > 0


class TestDecontaminateBloomParity:
    SF = "/root/testdata/sf0.001"

    @pytest.mark.parametrize("fpp", [0.3, 0.01])
    def test_bit_identical_to_exact(self, spark, fpp):
        # fpp=0.3 makes gate false positives near-certain at this scale —
        # the verify stage must cancel every one of them
        d = (spark.read.parquet(f"{self.SF}/documents.parquet")
             .select("doc_id", "text"))
        words = F.split(F.trim(F.col("text")), r"\s+")
        bench = d.filter(F.col("doc_id") % 10 == 0).select(
            F.array_join(F.slice(words, 3, 10), " ").alias("text"))
        exact = sorted(r["doc_id"] for r in
                       decontaminate(d, bench, n=5).select("doc_id").collect())
        gated = sorted(r["doc_id"] for r in
                       decontaminate_bloom(d, bench, n=5, fpp=fpp)
                       .select("doc_id").collect())
        assert gated == exact
        assert 0 < len(exact) < d.count()   # the construction plants leaks

    def test_empty_benchmark_keeps_everything(self, spark):
        d = (spark.read.parquet(f"{self.SF}/documents.parquet")
             .select("doc_id", "text").limit(50))
        bench = d.filter(F.lit(False)).select("text")
        assert decontaminate_bloom(d, bench, n=5).count() == 50
