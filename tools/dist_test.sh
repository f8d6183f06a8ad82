#!/usr/bin/env bash
# Evaluation launcher (scenes stream through one device; multi-host eval
# shards scans by rank via the loader's EpochSampler).
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")"/test.py "$CONFIG" --checkpoint "$CHECKPOINT" "$@"
