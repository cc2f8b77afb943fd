#!/usr/bin/env python
"""Build dist/dqa_spark.zip for `spark-submit --py-files` deployment.

The zip contains only the package (no tests/fixtures); executors need
nothing beyond numpy/pandas/pyarrow, which ship with any PySpark image —
the langid/perplexity models are trained on the driver from the embedded
seed corpus and broadcast, so no model files travel with the code.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "data_quality_analyzer_spark"
OUT = os.path.join(REPO, "dist", "dqa_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    print(OUT)


if __name__ == "__main__":
    main()
