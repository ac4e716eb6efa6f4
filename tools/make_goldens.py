"""Generate golden fixtures by running the REFERENCE extractor itself.

The reference's text layer (/root/reference/ocr/{patterns,extract,dynamic,
postprocess}.py) is pure stdlib+re and imports standalone, so the reference
IS the oracle (SURVEY.md §5.2.1). This script:

1. builds the deterministic synthetic pages table (seed=42);
2. loads the reference modules via an isolated package shim (no PIL/cv2
   needed — we never import ocr/__init__.py);
3. applies the reference functions per url over the ``text`` column;
4. pins (pages, goldens) as parquet under tests/fixtures/.

Run once at fixture-build time:  python tools/make_goldens.py
Tests then assert byte-identity WITHOUT needing the reference at runtime.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
FIXDIR = REPO / "tests" / "fixtures"

sys.path.insert(0, str(REPO))

from ocr_system_spark.sources.pages import generate_pages  # noqa: E402


def load_reference_text_layer():
    """Import the reference's text-layer modules under an isolated package
    name ('refocr') so relative imports resolve without executing the heavy
    ocr/__init__.py (which pulls PIL/cv2/pytesseract)."""
    pkg = types.ModuleType("refocr")
    pkg.__path__ = [str(REF / "ocr")]
    sys.modules["refocr"] = pkg
    mods = {}
    for name in ["patterns", "extract", "dynamic", "postprocess"]:
        spec = importlib.util.spec_from_file_location(
            f"refocr.{name}", REF / "ocr" / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refocr.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def main() -> None:
    FIXDIR.mkdir(parents=True, exist_ok=True)
    mods = load_reference_text_layer()
    ext, dyn, post = mods["extract"], mods["dynamic"], mods["postprocess"]

    pages = generate_pages(2000, seed=42)
    texts = pages["text"].tolist()
    urls = pages["url"].tolist()

    rows = []
    for url, text in zip(urls, texts):
        lic_id, date, ref_id = ext.extract_fields(text)
        address = ext.extract_address_between_markers(text)
        start_date, end_date = ext.extract_date_range(text)
        # first-page-only, first-license-only, '; '-joined (F13)
        lic_rows = dyn.bulk_extract_licenses([{"File Name": url, "Text": text}])
        licenses = lic_rows[0]["Licenses"]
        # derived 'Renew Times' column (F14) over {Licenses, Address}
        post_rows = post.postprocess_results(
            [{"Licenses": licenses, "Address": address or ""}],
            new_column_name="Renew Times",
        )
        renew_times = post_rows[0]["Renew Times"]
        notes = (
            "No patterns matched"
            if lic_id is None and date is None and ref_id is None
            else None
        )
        rows.append({
            "url": url,
            "license_id": lic_id,
            "date": date,
            "reference_id": ref_id,
            "address": address,
            "start_date": start_date,
            "end_date": end_date,
            "licenses": licenses,
            "renew_times": renew_times,
            "notes": notes,
        })

    golden = pd.DataFrame(rows)

    # dynamic-field golden (F9): a fixed user field config, '' for misses
    field_cfg = {
        "permit": [r"\bLIC[-_\s]?(\d{3,})\b", r"\bNo\.?\s*(\d{1,10})\b"],
        "year": [r"\b(20\d{2})\b"],
        "badpat": [r"([unclosed", r"\bREF[-_\s]*([A-Z0-9]{4,10})\b"],
    }
    dyn_rows = dyn.bulk_extract(
        [{"File Name": u, "Text": t} for u, t in zip(urls, texts)], field_cfg
    )
    dyn_df = pd.DataFrame(dyn_rows).rename(columns={"File Name": "url"})
    golden = golden.merge(dyn_df, on="url", how="left")

    pages_out = pages.copy()
    pages_out.to_parquet(FIXDIR / "pages_2000.parquet", index=False)
    golden.to_parquet(FIXDIR / "golden_fields_2000.parquet", index=False)
    print(f"pinned {len(pages_out)} pages and {len(golden)} golden rows -> {FIXDIR}")
    print("non-null counts:")
    print(golden.notna().sum().to_string())
    print("sample:")
    print(golden[golden["licenses"] != ""].head(3).to_string())


if __name__ == "__main__":
    main()
