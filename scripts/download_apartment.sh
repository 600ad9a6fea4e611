#!/usr/bin/env bash
# NICE-SLAM Apartment sequence (Azure loader)
set -e
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Apartment.zip
unzip Apartment.zip
