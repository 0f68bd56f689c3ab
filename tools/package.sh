#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north_rule launch mode).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/harvesting_validator_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/harvesting_validator_spark.zip", "w") as z:
    for p in sorted(root.glob("harvesting_validator_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/harvesting_validator_spark.zip")
EOF
