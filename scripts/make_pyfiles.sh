#!/bin/sh
# Build dist/mre.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/mre.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/mre.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("mre"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/mre.zip")
EOF
