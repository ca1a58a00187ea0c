#!/usr/bin/env bash
# Deployment lifecycle for the engine — the Layer-A parity piece for the
# reference's CI deploy (deploy_iceberg_tables.yml:26-111): sequence
# dependency install → Iceberg runtime JAR fetch (network-gated) →
# spark-submit smoke (cli diagnose) → table creation from YAML specs.
#
# Honest about this sandbox: no network means no JAR, so the Iceberg
# fetch SKIPS LOUDLY and the engine runs its capability-gated parquet
# fallback (session.py). In CI/production both gates pass and the same
# script exercises the real Iceberg runtime.
#
# Usage: scripts/deploy.sh [--specs-dir tablespecs] [--warehouse /tmp/wh]
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
SPECS_DIR="$REPO/tablespecs"
WAREHOUSE="${SPARK_GRAFT_WAREHOUSE:-$(mktemp -d /tmp/spark_graft_wh.XXXXXX)}"
ICEBERG_JAR_URL="${ICEBERG_JAR_URL:-https://repo1.maven.org/maven2/org/apache/iceberg/iceberg-spark-runtime-4.0_2.13/1.10.0/iceberg-spark-runtime-4.0_2.13-1.10.0.jar}"
JAR_DIR="${SPARK_GRAFT_JAR_DIR:-$REPO/.jars}"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --specs-dir) SPECS_DIR="$2"; shift 2 ;;
    --warehouse) WAREHOUSE="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

step() { printf '\n== %s ==\n' "$*"; }

step "toolchain versions"
python --version
java -version 2>&1 | head -1

step "python dependencies"
if python -c "import pyspark, yaml" 2>/dev/null; then
  echo "pyspark + pyyaml already present — skipping pip install"
else
  pip install pyspark pyyaml
fi

step "iceberg runtime jar (network-gated)"
mkdir -p "$JAR_DIR"
JAR_PATH="$JAR_DIR/$(basename "$ICEBERG_JAR_URL")"
if [[ -f "$JAR_PATH" ]]; then
  echo "already fetched: $JAR_PATH"
  export SPARK_GRAFT_ICEBERG_JAR="$JAR_PATH"
elif curl -fsSL --connect-timeout 5 -o "$JAR_PATH.part" "$ICEBERG_JAR_URL" 2>/dev/null; then
  mv "$JAR_PATH.part" "$JAR_PATH"
  echo "fetched: $JAR_PATH"
  export SPARK_GRAFT_ICEBERG_JAR="$JAR_PATH"
else
  rm -f "$JAR_PATH.part"
  echo "SKIPPED: no network access to Maven Central — engine will run the"
  echo "capability-gated parquet fallback (Iceberg-native paths fail loudly)."
fi

step "smoke: session/catalog diagnose"
# spark-submit when a Spark distribution is installed; the pip-installed
# pyspark path is the same JVM either way.
if command -v spark-submit >/dev/null 2>&1 && [[ -n "${SPARK_HOME:-}" ]]; then
  spark-submit ${SPARK_GRAFT_ICEBERG_JAR:+--jars "$SPARK_GRAFT_ICEBERG_JAR"} \
    "$REPO/scripts/run_cli.py" diagnose
else
  python "$REPO/scripts/run_cli.py" diagnose
fi

step "create tables from YAML specs ($SPECS_DIR)"
shopt -s nullglob
specs=("$SPECS_DIR"/*.yml "$SPECS_DIR"/*.yaml)
if [[ ${#specs[@]} -eq 0 ]]; then
  echo "no specs found in $SPECS_DIR" >&2
  exit 1
fi
for spec in "${specs[@]}"; do
  echo "-- $spec"
  python "$REPO/scripts/run_cli.py" create-table "$spec" --warehouse "$WAREHOUSE"
done

step "deploy complete"
echo "warehouse: $WAREHOUSE"
