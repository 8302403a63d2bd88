#!/usr/bin/env bash
# Fetch the SPICE-1.0 jar (caption metric) and point virtex_tpu at it.
# Mirrors the reference's asset bootstrap (virtex/utils/assets/download_spice.sh):
# SPICE needs java plus the Stanford jar; CIDEr is pure python and needs nothing.
set -euo pipefail

DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
cd "$DIR"

SPICE_ZIP="SPICE-1.0.zip"
URL="https://panderson.me/images/SPICE-1.0.zip"

if [ ! -f "SPICE-1.0/spice-1.0.jar" ]; then
    echo "Downloading SPICE-1.0 ..."
    curl -fLO "$URL"
    unzip -o "$SPICE_ZIP"
    rm -f "$SPICE_ZIP"
fi

echo "export VIRTEX_TPU_SPICE_JAR=$DIR/SPICE-1.0/spice-1.0.jar"
echo "(add the line above to your shell profile)"
