#!/bin/sh
# Build the spark-submit --py-files artifact.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/slog_agent_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/slog_agent_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("slog_agent_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith((".py", ".yml")):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/slog_agent_spark.zip")
EOF
