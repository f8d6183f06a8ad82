#!/usr/bin/env bash
set -e
python prepare_data_inst_stpls3d.py
