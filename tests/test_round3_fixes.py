"""Round-3 ADVICE fixes: worker-gated sitecustomize, xlsx sheet-name
hardening, ASCII-pinned tokenization in the quality kernels."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKERENV = str(REPO / "ocr_system_spark" / "_workerenv")

_MARKERS = ("PYTHON_WORKER_FACTORY_SECRET", "PYTHON_WORKER_FACTORY_PORT",
            "SPARK_REUSE_WORKER", "PYSPARK_WORKER")


def _probe(env_extra: dict) -> str:
    env = {k: v for k, v in os.environ.items() if k not in _MARKERS}
    env["PYTHONPATH"] = WORKERENV
    env.pop("OCR_SPARK_KEEP_ZIPIMPORT_INVALIDATION", None)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, "-c",
         "import zipimport;"
         "print(zipimport.zipimporter.invalidate_caches.__name__)"],
        env=env, capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip()


def test_sitecustomize_patches_only_pyspark_workers():
    # a plain subprocess of the driver environment: stock behavior
    assert _probe({}) == "invalidate_caches"
    # a process carrying Spark's worker-factory marker: patched
    assert _probe({"PYTHON_WORKER_FACTORY_SECRET": "x"}) == "<lambda>"
    # escape hatch wins even inside a worker
    assert _probe({"PYTHON_WORKER_FACTORY_SECRET": "x",
                   "OCR_SPARK_KEEP_ZIPIMPORT_INVALIDATION": "1"}) \
        == "invalidate_caches"


def test_sitecustomize_chains_shadowed_sitecustomize(tmp_path):
    (tmp_path / "sitecustomize.py").write_text("print('CHAINED-OK')\n")
    env = {k: v for k, v in os.environ.items() if k not in _MARKERS}
    env["PYTHONPATH"] = WORKERENV + os.pathsep + str(tmp_path)
    out = subprocess.run([sys.executable, "-c", "pass"],
                         env=env, capture_output=True, text=True, timeout=60)
    assert "CHAINED-OK" in out.stdout


# ---------------------------------------------------------------------------
# xlsx sheet names
# ---------------------------------------------------------------------------

def test_xlsx_sheet_name_quote_is_escaped(spark, tmp_path):
    from ocr_system_spark.plans.sinks import export_xlsx
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    path = str(tmp_path / "q.xlsx")
    export_xlsx(df, path, sheet_name='My "Q1" Sheet')
    with zipfile.ZipFile(path) as z:
        wb = z.read("xl/workbook.xml").decode()
    assert 'name="My &quot;Q1&quot; Sheet"' in wb
    # still one well-formed attribute — parseable XML
    import xml.dom.minidom
    xml.dom.minidom.parseString(wb)


@pytest.mark.parametrize("bad", ["", "x" * 32, "a/b", "a\\b", "q?",
                                 "his[1]", "a:b", "p*q"])
def test_xlsx_sheet_name_excel_rules_enforced(spark, tmp_path, bad):
    from ocr_system_spark.plans.sinks import export_xlsx
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        export_xlsx(df, str(tmp_path / "bad.xlsx"), sheet_name=bad)


# ---------------------------------------------------------------------------
# ASCII-pinned tokenization (gopher / repetition kernels)
# ---------------------------------------------------------------------------

def test_quality_kernels_pin_ascii_whitespace(spark):
    """NBSP (U+00A0) is NOT a token separator — matching the simhash /
    winnowing convention and the RE2 oracles; str.split() would split."""
    from ocr_system_spark.operators.textstats import (with_gopher_quality,
                                                      with_repetition_stats)
    df = spark.createDataFrame(
        [(1, "a\xa0b c d"), (2, "x\u2028y z")],
        "doc_id long, text string")
    g = {r.doc_id: r for r in with_gopher_quality(df).collect()}
    # doc 1: "a\xa0b", "c", "d" → 3 tokens (4 under str.split)
    assert g[1]["n_words"] == 3
    # doc 2: U+2028 line separator is also token-internal → 2 tokens
    assert g[2]["n_words"] == 2
    r = {x.doc_id: x for x in with_repetition_stats(df).collect()}
    assert r[1]["total_bigrams"] == 2
    assert r[2]["total_bigrams"] == 1
