#!/bin/sh
# spark-submit --py-files shipping smoke: package the library as a zip and
# run tools/submit_smoke.py with the REPO PACKAGE DIR ABSENT from every
# import path — the job must come entirely from the shipped artifact, as it
# would on a real multi-executor cluster (north rule: "ships via
# spark-submit --py-files"). Run from the repo root.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

(cd "$REPO" && zip -qr "$WORK/pkg.zip" mcp_crawl4ai_rag_spark -x '*__pycache__*')
cp "$REPO/tools/submit_smoke.py" "$WORK/"

cd "$WORK"   # NOT the repo: only the zip provides the package
spark-submit \
    --master "local[${SPARK_GRAFT_CPUS:-8}]" \
    --conf spark.sql.shuffle.partitions=8 \
    --conf spark.sql.adaptive.enabled=true \
    --py-files "$WORK/pkg.zip" \
    "$WORK/submit_smoke.py"
