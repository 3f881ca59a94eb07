"""Build dist/kmers_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main() -> None:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "kmers_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "kmers_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
