#!/bin/bash
# Round-closing ritual: the full dual-SF oracle sweep (272 queries vs
# DuckDB at sf0.01 AND sf0.1) that caught q_path_analysis's
# microsecond-floor bug in r7 — run before declaring a round done.
# Fails non-zero on the first SF that has any failure.
set -e
cd "$(dirname "$0")/.."
echo "=== sweep sf0.01 ==="
DRIVE_SF_DIR=/root/testdata/sf0.01 python scripts/drive_driver.py
echo "=== sweep sf0.1 ==="
DRIVE_SF_DIR=/root/testdata/sf0.1 python scripts/drive_driver.py
echo "close_round: both sweeps green"
