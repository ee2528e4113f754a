"""Package the engine for spark-submit: dist/blacklab_spark.zip.

Usage:
    python scripts/package.py
    spark-submit --py-files dist/blacklab_spark.zip jobs/build_and_query.py \
        --input /path/transcripts.parquet --index /path/index --query "fox" --k 10
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "blacklab_spark.zip")
    pkg = os.path.join(REPO, "blacklab_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
