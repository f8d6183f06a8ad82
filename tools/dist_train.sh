#!/usr/bin/env bash
# Data-parallel training across all local devices (single host) — the mesh
# equivalent of the reference's torchrun launcher.  Multi-host: set
# COORDINATOR/NUM_PROCS/PROC_ID env vars (jax.distributed).
CONFIG=$1
shift
python "$(dirname "$0")"/train.py "$CONFIG" --num-devices 0 "$@"
