"""Build dist/gsap_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "geotiff_scalable_analysis_pipeline_spark"


def main():
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "gsap_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((REPO / PKG).rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
