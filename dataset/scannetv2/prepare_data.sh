#!/usr/bin/env bash
# End-to-end ScanNet v2 preparation: raw scans -> per-split .pth + gt txt
set -e
python prepare_data_inst.py --data_split train
python prepare_data_inst.py --data_split test --scans_dir scans_test
python split_data.py
python prepare_data_inst_gttxt.py
