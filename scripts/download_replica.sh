#!/usr/bin/env bash
# Replica (NICE-SLAM preprocessed release) -> data/Replica/{room0,...}
set -e
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
