#!/bin/sh
# The hardware regression ritual (CLAUDE.md): run the Mosaic-only kernel
# contracts on the real chip after ANY kernel-touching change, and append
# a dated, commit-stamped record to HW_RITUAL.log so the ritual leaves an
# auditable trail instead of relying on the honor system.
#
# Usage (from the repo root, NEVER concurrently with other TPU work):
#   sh scripts/hw_ritual.sh
set -e
cd "$(dirname "$0")/.."
if BAYESSSM_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q; then
    echo "$(date -u '+%Y-%m-%dT%H:%M:%SZ') $(git rev-parse --short HEAD) PASS" >> HW_RITUAL.log
    tail -1 HW_RITUAL.log
else
    echo "$(date -u '+%Y-%m-%dT%H:%M:%SZ') $(git rev-parse --short HEAD) FAIL" >> HW_RITUAL.log
    tail -1 HW_RITUAL.log
    exit 1
fi
