#!/usr/bin/env bash
set -e
python prepare_data_inst.py
python prepare_data_inst_gttxt.py
