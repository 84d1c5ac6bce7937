"""Build the spark-submit artifact: a zip of inverted_index_spark/
suitable for --py-files (north-rule ship path).

Usage:
    python scripts/package.py                 # → dist/inverted_index_spark.zip
    spark-submit --py-files dist/inverted_index_spark.zip your_job.py
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> Path:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "inverted_index_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "inverted_index_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(f"wrote {out} ({out.stat().st_size} bytes)")
    return out


if __name__ == "__main__":
    main()
