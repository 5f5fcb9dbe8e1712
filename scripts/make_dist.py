#!/usr/bin/env python
"""Build dist/s2geometry_spark.zip for spark-submit --py-files."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    os.makedirs(f"{ROOT}/dist", exist_ok=True)
    out = f"{ROOT}/dist/s2geometry_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = f"{ROOT}/s2geometry_spark"
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, ROOT))
        zf.write(f"{ROOT}/__spark_entry__.py", "__spark_entry__.py")
    print(out)


if __name__ == "__main__":
    main()
