#!/usr/bin/env python
"""Build dist/oni_indexer_spark.zip for spark-submit --py-files."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "oni_indexer_spark")
OUT = os.path.join(ROOT, "dist", "oni_indexer_spark.zip")

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with zipfile.ZipFile(OUT, "w") as zf:
    for dirpath, _, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, ROOT))
print(OUT)
