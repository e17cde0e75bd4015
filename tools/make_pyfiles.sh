#!/bin/sh
# Package dint_spark for spark-submit --py-files (north rule run shape):
#   tools/make_pyfiles.sh && \
#   spark-submit --py-files dist/dint_spark.zip jobs/build_index.py ...
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/dint_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/dint_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("dint_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith((".py", ".tsv")):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/dint_spark.zip written")
EOF
